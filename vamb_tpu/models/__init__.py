"""Model layer: JAX/Optax autoencoders over contig features.

* `vae` — the flagship variational autoencoder (reference vamb/encode.py).
* `dataset` — the normalization contract + device-resident batching.
* `layers` — functional Dense/BatchNorm/Dropout building blocks.
"""

from .dataset import VAEDataset, make_dataset  # noqa: F401
from .vae import VAE  # noqa: F401


def __getattr__(name):
    # lazy: the heavier model families import hier/optax machinery
    if name == "Taxometer":
        from .taxometer import Taxometer

        return Taxometer
    if name == "VAEVAE":
        from .vaevae import VAEVAE

        return VAEVAE
    if name == "AAE":
        from .aae import AAE

        return AAE
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

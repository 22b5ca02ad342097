"""Model layer: JAX/Optax autoencoders over contig features.

* `vae` — the flagship variational autoencoder (reference vamb/encode.py).
* `dataset` — the normalization contract + device-resident batching.
* `layers` — functional Dense/BatchNorm/Dropout building blocks.
"""

from .dataset import VAEDataset, make_dataset  # noqa: F401
from .vae import VAE  # noqa: F401

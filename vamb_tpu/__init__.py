"""vamb_tpu — a TPU-native metagenomic binning engine.

A from-scratch reimplementation of the capabilities of Vamb
(https://github.com/RasmussenLab/vamb) designed for TPU hardware:

* Feature extraction: streaming FASTA -> 4-mer counts (C++ / numpy) ->
  103-dim TNF projection as a batched JAX matmul.
* Abundance: per-sample depths from TSV (and BAM via native reader).
* Models: JAX/Optax variational autoencoder (plus semi-supervised and
  adversarial variants) trained with a D-Adaptation Adam optimizer.
* Clustering: iterative medoid cosine clustering where every inner-loop
  distance/density/histogram computation is a fused device kernel over a
  row-sharded latent matrix.
* Parallelism: SPMD over a `jax.sharding.Mesh` (data-parallel training via
  sharding-annotated jit; row-sharded clustering matvecs).

The public API mirrors the reference's CLI surface (`vamb_tpu bin default`,
`taxometer`, `recluster`, ...); the library layer is organized as
`utils/ ops/ models/ parallel/` plus `composition`, `abundance`, `cluster`.
"""

from . import utils  # noqa: F401
from . import cluster  # noqa: F401
from . import taxonomy  # noqa: F401
from .abundance import Abundance  # noqa: F401
from .composition import Composition, CompositionMetaData  # noqa: F401
from .markers import Markers  # noqa: F401

__version__ = "0.5.0"

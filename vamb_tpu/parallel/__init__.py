"""SPMD parallelism over a `jax.sharding.Mesh`.

The reference is strictly single-device (SURVEY §2.3); this package is the
TPU build's addition. The scale axis of the problem is N contigs (rows of the
feature/latent matrices), so the core strategy is:

* **Data-parallel VAE training**: batches row-sharded over the `dp` mesh
  axis, parameters replicated. Expressed as sharding annotations on the
  jitted epoch program — XLA GSPMD inserts the gradient psums, and because
  the program is written over the *global* batch, BatchNorm batch statistics
  are global-batch exact (no periodic stat sync needed).
* **Row-sharded clustering**: the latent matrix is sharded over rows; each
  per-medoid distance matvec computes locally per shard, and the tiny
  reductions (histogram 60 floats, density scalar, top-k candidates) ride
  the ICI as psums/gathers inserted by XLA.
* **Multi-host**: `jax.distributed.initialize()` + the same mesh spanning
  all hosts; collectives ride ICI within a slice and DCN across slices.
"""

from .mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_rows,
    distributed_init,
    process_info,
)

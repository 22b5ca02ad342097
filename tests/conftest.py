"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests never need TPU hardware; multi-chip sharding paths are exercised on
virtual CPU devices. Two subtleties:

* XLA_FLAGS must be set before the first `import jax` for the virtual device
  count to take effect.
* This machine's TPU tunnel registers its backend via sitecustomize and pins
  `jax_platforms` in jax's config, so the JAX_PLATFORMS env var alone is NOT
  sufficient — we must override the config value after import. Without this,
  tests silently run on (and serialize over) the single real TPU chip.
* BLAS/OpenMP threadpools are capped (the reference does the same before
  importing numpy, vamb/__main__.py:36-40); unbounded pools from torch and
  the 8-device virtual JAX CPU backend degrade each other in one process.
"""

import os

for var in ("MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS", "OMP_NUM_THREADS"):
    os.environ.setdefault(var, "4")

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

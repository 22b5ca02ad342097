"""TNF projection as a batched device matmul.

Reference semantics (vamb/parsecontigs.py:140-158): normalize each 256-dim
4-mer count row to frequencies (zero-sum rows are kept at zero), subtract
1/256, then project with the (256, 103) kernel — all in float32.

On TPU the projection runs as one jitted `counts @ kernel` per streaming
batch with `Precision.HIGHEST` (full-f32 MXU passes) so results are stable
to within a couple of ulps of the float32 reference; the 12-bit mantissa
masking applied at the serialization boundary removes the residual noise.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .kernel import load_tnf_kernel


@partial(jax.jit, static_argnames=())
def _project_jit(fourmers: jax.Array, kernel: jax.Array) -> jax.Array:
    s = jnp.sum(fourmers, axis=1, keepdims=True)
    s = jnp.where(s == 0, 1.0, s)
    freqs = fourmers / s - (1.0 / 256.0)
    return jnp.dot(freqs, kernel, precision=jax.lax.Precision.HIGHEST)


def project_fourmers(fourmers: np.ndarray, kernel: np.ndarray = None) -> np.ndarray:
    """Project (N, 256) float32 4-mer counts to (N, 103) TNF features.

    Mutates nothing; returns a float32 numpy array (device round-trip).
    """
    if kernel is None:
        kernel = load_tnf_kernel()
    assert fourmers.dtype == np.float32
    out = _project_jit(fourmers, kernel)
    return np.asarray(out, dtype=np.float32)


def project_fourmers_device(fourmers: np.ndarray, kernel: np.ndarray = None):
    """Like `project_fourmers` but returns the device array without pulling,
    with the device->host copy already started — the streaming extractor
    overlaps these transfers with parsing the next chunk and gathers all
    chunks at the end (one sync instead of one per flush)."""
    if kernel is None:
        kernel = load_tnf_kernel()
    assert fourmers.dtype == np.float32
    out = _project_jit(fourmers, kernel)
    try:
        out.copy_to_host_async()
    except Exception:
        pass
    return out


def project_fourmers_numpy(fourmers: np.ndarray, kernel: np.ndarray = None) -> np.ndarray:
    "Host (numpy/BLAS) fallback of `project_fourmers`; mutates its input."
    if kernel is None:
        kernel = load_tnf_kernel()
    s = fourmers.sum(axis=1).reshape(-1, 1)
    s[s == 0] = 1.0
    fourmers *= 1 / s
    fourmers += -(1 / 256)
    return np.dot(fourmers, kernel)

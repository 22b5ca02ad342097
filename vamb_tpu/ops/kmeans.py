"""Weighted K-means (Lloyd's algorithm) in JAX.

Replaces the reference's sklearn.cluster.KMeans usage in reclustering
(reference vamb/reclustering.py:141-147: explicit init centers, n_init=1,
length sample weights). Semantics match sklearn: squared-Euclidean
assignment, weighted centroid update, convergence when the squared
center shift falls below tol * mean(var(X, axis=0)), max_iter 300.

Shapes are static, so one compiled program serves every bin of the same
(padded) size; empty clusters keep their previous center (sklearn instead
reassigns the farthest point — a rare case that only matters for degenerate
seeds; documented divergence).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n_clusters", "max_iter"))
def _lloyd(x, weights, mask, init_centers, tol, n_clusters, max_iter):
    """Run weighted Lloyd iterations.

    x: (N, D) padded points; weights: (N,) (0 for padding); mask: (N,) bool;
    init_centers: (K, D). Returns (labels (N,), centers (K, D)).
    """
    w = jnp.where(mask, weights, 0.0)

    def assign(centers):
        d2 = (
            jnp.sum(x * x, axis=1, keepdims=True)
            - 2 * jnp.dot(x, centers.T, precision=jax.lax.Precision.HIGHEST)
            + jnp.sum(centers * centers, axis=1)[None, :]
        )
        return jnp.argmin(d2, axis=1)

    def update(centers, labels):
        onehot = jax.nn.one_hot(labels, n_clusters, dtype=x.dtype) * w[:, None]
        sums = jnp.dot(onehot.T, x, precision=jax.lax.Precision.HIGHEST)
        counts = jnp.sum(onehot, axis=0)
        return jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1e-30)[:, None], centers
        )

    def cond(state):
        _, centers, prev_centers, it, done = state
        return (~done) & (it < max_iter)

    def body(state):
        labels, centers, _, it, _ = state
        labels = assign(centers)
        new_centers = update(centers, labels)
        shift = jnp.sum(jnp.square(new_centers - centers))
        return (labels, new_centers, centers, it + 1, shift <= tol)

    labels0 = assign(init_centers)
    state = (labels0, update(init_centers, labels0), init_centers, jnp.int32(1),
             jnp.bool_(False))
    labels, centers, _, _, _ = jax.lax.while_loop(cond, body, state)
    # final assignment against converged centers
    return assign(centers), centers


def kmeans(
    x: np.ndarray,
    n_clusters: int,
    init_centers: np.ndarray,
    sample_weight: np.ndarray,
    tol: float = 1e-4,
    max_iter: int = 300,
) -> np.ndarray:
    "Weighted K-means labels for `x` given explicit initial centers."
    x = np.asarray(x, np.float32)
    assert init_centers.shape == (n_clusters, x.shape[1])
    scaled_tol = tol * float(np.mean(np.var(x, axis=0)))
    n = len(x)
    # pad rows to a power of two to bound compile count
    n_pad = 1 << max(3, (n - 1).bit_length())
    xp = np.zeros((n_pad, x.shape[1]), np.float32)
    xp[:n] = x
    wp = np.zeros(n_pad, np.float32)
    wp[:n] = sample_weight
    mask = np.zeros(n_pad, bool)
    mask[:n] = True
    labels, _ = _lloyd(
        jnp.asarray(xp),
        jnp.asarray(wp),
        jnp.asarray(mask),
        jnp.asarray(init_centers.astype(np.float32)),
        jnp.float32(scaled_tol),
        n_clusters,
        max_iter,
    )
    return np.asarray(labels)[:n]

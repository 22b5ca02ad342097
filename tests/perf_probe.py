"""Ad-hoc microbenchmarks of the clustering engine's building blocks on TPU.

Not a test — run manually: python tests/perf_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20  # 1M
F = 32

rng = np.random.default_rng(0)
mT = jnp.asarray(rng.standard_normal((F, N)).astype(np.float32))
lengths = jnp.asarray(rng.integers(2000, 100000, N).astype(np.float32))
kept = jnp.asarray(np.ones(N, bool))
key = jax.random.PRNGKey(0)


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:45s} {dt*1e3:8.3f} ms")
    return dt


prec = jax.lax.Precision.HIGHEST


@jax.jit
def matvec1(mT):
    row = mT[:, 0]
    return 0.5 - row @ mT


@jax.jit
def matmul8(mT):
    rows = mT[:, :8]
    return 0.5 - jnp.einsum("fc,fn->cn", rows, mT, precision=prec,
                            preferred_element_type=jnp.float32)


@jax.jit
def matmul25(mT):
    rows = mT[:, :25]
    return 0.5 - jnp.einsum("fc,fn->cn", rows, mT, precision=prec,
                            preferred_element_type=jnp.float32)


@jax.jit
def matmul25_default_prec(mT):
    rows = mT[:, :25]
    return 0.5 - jnp.einsum("fc,fn->cn", rows, mT,
                            preferred_element_type=jnp.float32)


@jax.jit
def wander_like(mT, lengths, kept, key):
    "One full wander step as the engine does it."
    iota = jnp.arange(N)
    d = matvec1(mT)
    elig = (d <= 0.05) & kept
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, (N,)) + 1e-20) + 1e-20)
    score = jnp.where(elig, gumbel, -jnp.inf)
    _, cand = jax.lax.approx_max_k(score, 25)
    rows = mT[:, cand]
    D = 0.5 - jnp.einsum("fc,fn->cn", rows, mT, precision=prec,
                         preferred_element_type=jnp.float32)
    D = jnp.where(iota[None, :] == cand[:, None], 0.0, D)
    within = (D <= 0.05) & kept[None, :]
    dens = jnp.sum(jnp.where(within, lengths[None, :] * (0.05 - D), 0.0), axis=1)
    return dens


@jax.jit
def rng_uniform(key):
    return jax.random.uniform(key, (N,))


@jax.jit
def gumbel_topk(key, kept):
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, (N,)) + 1e-20) + 1e-20)
    score = jnp.where(kept, gumbel, -jnp.inf)
    return jax.lax.approx_max_k(score, 25)


@jax.jit
def topk_only(score):
    return jax.lax.approx_max_k(score, 25)


@jax.jit
def hist_compare(d, lengths, kept):
    bins = jnp.clip((d / 0.005).astype(jnp.int32), 0, 59)
    w = jnp.where((d >= 0.0) & (d <= 0.3) & kept, lengths, 0.0)
    return jnp.sum(
        jnp.where(bins[:, None] == jnp.arange(60)[None, :], w[:, None], 0.0),
        axis=0,
    )


@jax.jit
def dens_reduce(D, lengths, kept):
    within = (D <= 0.05) & kept[None, :]
    return jnp.sum(jnp.where(within, lengths[None, :] * (0.05 - D), 0.0), axis=1)


@jax.jit
def seed_scan(kept):
    iota = jnp.arange(N)
    first_ahead = jnp.min(jnp.where(kept & (iota >= 17), iota, N))
    first_any = jnp.min(jnp.where(kept, iota, N))
    return jnp.where(first_ahead < N, first_ahead, first_any)


@jax.jit
def emit_mask(kept, labels, d):
    sel = (d <= 0.04) & kept
    return kept & ~sel, jnp.where(sel, 7, labels)


if __name__ == "__main__":
    print(f"N={N}, F={F}, devices={jax.devices()}")
    d = matvec1(mT)
    D = matmul25(mT)
    score = jnp.where(kept, d, -jnp.inf)
    labels = jnp.full(N, -1, jnp.int32)

    t_mv = timeit("matvec (1,F)x(F,N)", matvec1, mT)
    timeit("matmul (8,F)x(F,N)", matmul8, mT)
    t_mm = timeit("matmul (25,F)x(F,N)", matmul25, mT)
    timeit("matmul (25,F)x(F,N) default prec", matmul25_default_prec, mT)
    timeit("threefry uniform (N,)", rng_uniform, key)
    timeit("gumbel+approx_max_k", gumbel_topk, key, kept)
    timeit("approx_max_k only", topk_only, score)
    timeit("histogram compare-reduce", hist_compare, d, lengths, kept)
    timeit("density reduce over (25,N)", dens_reduce, D, lengths, kept)
    timeit("seed scan (masked min)", seed_scan, kept)
    timeit("emit mask+labels", emit_mask, kept, labels, d)
    t_w = timeit("full wander step (fused)", wander_like, mT, lengths, kept, key)

    bw = 4 * F * N / t_mv / 1e9
    print(f"\nmatvec effective bandwidth: {bw:.0f} GB/s (matrix read only)")
    bw25 = (4 * F * N + 2 * 4 * 25 * N) / t_mm / 1e9
    print(f"matmul25 eff bandwidth (read mat + write/read D): {bw25:.0f} GB/s")

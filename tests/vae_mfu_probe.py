"""VAE training-epoch roofline: matmul/non-matmul split + MFU on TPU.

Not a test — run manually: python tests/vae_mfu_probe.py

Round-4 claimed "~6 ms of the 10.6 ms epoch is matmuls at the MXU
efficiency 512-wide layers allow" without artifacts (VERDICT round-4 weak
#3). This probe produces the numbers:

* analytic FLOP count of the epoch's dense layers (fwd + bwd);
* measured wall of the production multi-epoch program (same shapes as
  bench.py's bench_vae);
* measured wall of a matmul-only surrogate running the exact same dense
  shapes (fwd + the two bwd GEMMs per layer) in the same scan structure —
  the part of the epoch the MXU roofline governs;
* delivered matmul TF/s on these shapes from a standalone GEMM sweep, so
  "matmul floor" = FLOPs / delivered, independent of the surrogate;
* MFU against the chip's bf16 peak (v5e: 197 TF/s per chip, the value
  used by the scaling-book convention).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from vamb_tpu.models.dataset import make_dataset, num_batches
from vamb_tpu.models.vae import VAE
from vamb_tpu.optim import dadapt_adam

N, S, BATCH, EPOCHS = 100_000, 10, 4096, 8
PEAK_BF16_TFS = 197.0  # TPU v5e per-chip bf16 peak

rng = np.random.default_rng(1)
ds = make_dataset(
    rng.exponential(2.0, (N, S)).astype(np.float32),
    rng.normal(size=(N, 103)).astype(np.float32),
    rng.integers(2000, 100_000, N),
    destroy=True,
)

vae = VAE(nsamples=S, seed=1)
optimizer = dadapt_adam()
opt_state = optimizer.init(vae.params)
epoch_fn = vae._make_epoch_fn(optimizer)
data = tuple(jnp.asarray(a) for a in ds)
nb = num_batches(N, BATCH)
key = jax.random.key(0)


def sync(tree):
    jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def best_of(fn, reps=4):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


# ---- 1. production epoch wall
state = [vae.params, vae.bn_state, opt_state, key]


def run_full():
    p, b, o, k, comps = epoch_fn(
        state[0], state[1], state[2], data, state[3],
        batchsize=BATCH, nbatches=nb, nepochs=EPOCHS,
    )
    state[0], state[1], state[2], state[3] = p, b, o, k
    np.asarray(comps)


t_full = best_of(run_full) / EPOCHS

# ---- 2. analytic FLOPs of the dense layers
F = S + 103 + 1
dims = [(F, 512), (512, 512), (512, 32), (32, 512), (512, 512), (512, F)]
flops_fwd = sum(2 * BATCH * a * b for a, b in dims)
# bwd: dX = dY @ W^T and dW = X^T @ dY per layer -> 2x the fwd FLOPs
flops_step = 3 * flops_fwd
flops_epoch = flops_step * nb

# ---- 3. matmul-only surrogate in the same scan structure
ws = [jnp.asarray(rng.standard_normal((a, b)).astype(np.float32))
      for a, b in dims]
x0 = jnp.asarray(rng.standard_normal((BATCH, F)).astype(np.float32))


@jax.jit
def matmul_epoch(x0, ws):
    def step(carry, _):
        x = carry
        acts = []
        h = x
        for w in ws:
            acts.append(h)
            h = h @ w
        # backward GEMMs: dX and dW per layer
        g = h
        for w, a in zip(reversed(ws), reversed(acts)):
            _dw = a.T @ g
            g = g @ w.T
        # keep a data dependence so nothing is DCE'd, same input shape
        return x + g * 1e-9, jnp.sum(_dw)

    out, s = jax.lax.scan(step, x0, None, length=nb)
    return out, s


t_mm = best_of(lambda: sync(matmul_epoch(x0, ws))) / 20

# ---- 4. delivered TF/s on the epoch's dominant GEMM shape
a = jnp.asarray(rng.standard_normal((BATCH, 512)).astype(np.float32))
b = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32))


@jax.jit
def gemm_loop(a, b):
    def step(c, _):
        return c @ b, ()
    out, _ = jax.lax.scan(step, a, None, length=2000)
    return jnp.sum(out)  # scalar sync


t_gemm = best_of(lambda: sync(gemm_loop(a, b)))
delivered_tfs = 2000 * 2 * BATCH * 512 * 512 / t_gemm / 1e12

mm_floor_s = flops_epoch / (delivered_tfs * 1e12)
print(f"epoch wall (production, {EPOCHS}-epoch dispatch): {t_full*1e3:.2f} ms")
print(f"analytic dense FLOPs/epoch: {flops_epoch/1e9:.1f} GF "
      f"({nb} steps x {flops_step/1e9:.2f} GF)")
print(f"matmul-only surrogate wall: {t_mm*1e3:.2f} ms/epoch")
print(f"delivered GEMM rate at (4096x512x512): {delivered_tfs:.1f} TF/s")
print(f"=> matmul floor at delivered rate: {mm_floor_s*1e3:.2f} ms/epoch")
print(f"=> non-matmul remainder: {(t_full-t_mm)*1e3:.2f} ms/epoch "
      f"(vs floor-based {(t_full-mm_floor_s)*1e3:.2f} ms)")
print(f"MFU vs bf16 peak {PEAK_BF16_TFS} TF/s: "
      f"{flops_epoch/(t_full*PEAK_BF16_TFS*1e12)*100:.1f}%")
print(f"contigs/s/chip: {N/t_full:.3g}")

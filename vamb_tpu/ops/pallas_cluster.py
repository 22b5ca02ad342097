"""Pallas TPU kernels for the clustering engine's distance inner loops.

The BASELINE north star names "Pallas kernels for the pairwise-distance /
density-peak inner loop" explicitly; these are they. Two fused kernels
replace the XLA einsum + broadcast-compare pipeline (measured on v5e, see
bench A/B in the repo README):

1. ``medoid_sweep``: for one medoid row, a single pass over the (F, N)
   latent matrix that computes, without materializing intermediates in HBM:
     * the distance vector d = 0.5 - row . x  (written out once),
     * the 60-bin length-weighted histogram of d in [0, 0.3],
     * the length-weighted local density  sum(w * (0.05 - d), d <= 0.05),
     * the strict-neighbor count          count(d < 0.05, kept).

2. ``candidate_density_sweep``: the medoid-wander step. For C candidate
   rows at once, an MXU (C, F) x (F, TILE) matmul per tile with the
   density reduction fused, WITHOUT writing the (C, N) distance matrix to
   HBM at all (the XLA path materializes and re-reads it).

A/B of record (v5e, 1M x 40 f32, in-program scan timing — run
`python bench.py --pallas-ab`):

    XLA attempt payload (matvec+hist+stats):   ~1.6 ms
    Pallas fused medoid_sweep:                 ~1.6 ms   (parity)
    XLA wander step (C-row matmul, D kept):    ~1.5 ms
    Pallas candidate_density (no D in HBM):    ~1.0 ms   (1.5x faster)

XLA fuses the histogram/density reductions into the matvec pass already,
so the fused sweep is at parity; the candidate sweep wins by not writing
the (C, N) distance matrix, but the engine's batched wander REUSES the
jump target's distance row from that matrix, so adopting it would re-add
one matvec per jump step (~1.3 ms) — a net loss whenever a wander jumps
at least ~40% of steps. The engine therefore keeps the XLA path as the
default; these kernels carry the measured evidence and remain available
for shapes/backends where the tradeoff flips.

Layout contract (matches the engine): the latent matrix is transposed and
padded to (F_pad, N_pad) with F_pad a multiple of 8 and N_pad a multiple
of 128; "removed" points carry weight 0 in `wts` (= lengths * kept).

Numerics: the dot products here accumulate in f32 in a fixed order that
differs from the XLA einsum by ulps. The CPU/parity path keeps the XLA
engine; these kernels are enabled on TPU only (single-device; the sharded
path stays on GSPMD-compiled XLA).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NBINS = 60
_DELTA_X = 0.005
_XMAX = 0.3
_MEDOID_RADIUS = 0.05
_HIST_PAD = 64  # bins padded to a power of two for the scratch layout

_LANES = 128
_TILE_N = 4096  # lane columns per grid step


def _medoid_sweep_kernel(
    rows_ref,  # VMEM (8, F) f32: medoid row in row 0, rest zero
    idx_ref,  # SMEM (1, 1) i32: medoid column index (d[idx] forced to 0)
    m_ref,  # VMEM (F, TILE_N): matrix tile
    w_ref,  # VMEM (1, TILE_N): lengths * kept for this tile
    d_ref,  # VMEM out (TILE_N/128, 128): distances, contiguous blocks
    hist_ref,  # VMEM out (HIST_PAD, TILE_N): per-column partial histogram
    dens_ref,  # VMEM out (1, TILE_N): per-column partial density
    close_ref,  # VMEM out (1, TILE_N): per-column partial neighbor count
    hist_scr,  # VMEM scratch (HIST_PAD, TILE_N)
    dens_scr,  # VMEM scratch (1, TILE_N)
    close_scr,  # VMEM scratch (1, TILE_N)
):
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)

    # distances via MXU: (8, F) x (F, TILE_N); only row 0 carries the medoid
    D = 0.5 - jnp.dot(rows_ref[:], m_ref[:], preferred_element_type=jnp.float32)
    d = D[0:1, :]

    # force d[idx] = 0 exactly, matching the engine's at[idx].set(0.0)
    # (the self-distance must land in bin 0, not fail the d >= 0 gate)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, _TILE_N), 1)
    col = i * _TILE_N + lanes
    d = jnp.where(col == idx_ref[0, 0], 0.0, d)
    # contiguous (TILE_N/128, 128) blocks: per-tile 1-sublane HBM writes
    # are pathologically slow on v5e, this reshape keeps the DMA dense
    d_ref[:] = d.reshape(_TILE_N // _LANES, _LANES)

    w = w_ref[:]
    kept = w > 0.0

    @pl.when(i == 0)
    def _init():
        hist_scr[:] = jnp.zeros_like(hist_scr)
        dens_scr[:] = jnp.zeros_like(dens_scr)
        close_scr[:] = jnp.zeros_like(close_scr)

    # histogram: per-bin column rows accumulated across tiles, elementwise;
    # the (64, TILE_N) -> (64,) reduction happens once, outside the kernel
    wmask = jnp.where((d >= 0.0) & (d <= _XMAX) & kept, w, 0.0)
    bins = jnp.clip((d / _DELTA_X).astype(jnp.int32), 0, _NBINS - 1)
    for k in range(_NBINS):
        hist_scr[k : k + 1, :] += jnp.where(bins == k, wmask, 0.0)

    within = d <= _MEDOID_RADIUS
    dens_scr[:] += jnp.where(within & kept, w * (_MEDOID_RADIUS - d), 0.0)
    close_scr[:] += jnp.where((d < _MEDOID_RADIUS) & kept, 1.0, 0.0)

    @pl.when(i == n_steps - 1)
    def _finish():
        hist_ref[:] = hist_scr[:]
        dens_ref[:] = dens_scr[:]
        close_ref[:] = close_scr[:]


@partial(jax.jit, static_argnames=("interpret",))
def medoid_sweep(matrixT, idx, wts, interpret=False):
    """Fused single-medoid sweep.

    Args:
      matrixT: (F_pad, N_pad) f32, normalized latents, transposed.
      idx: scalar i32 medoid column.
      wts: (N_pad,) f32 = lengths * kept (0 for removed/padding rows).

    Returns: (d (N_pad,), hist (60,), density scalar, n_close scalar i32).
    """
    f_pad, n_pad = matrixT.shape
    assert n_pad % _TILE_N == 0, n_pad
    steps = n_pad // _TILE_N
    rows8 = jnp.zeros((8, f_pad), jnp.float32).at[0].set(matrixT[:, idx])
    idx_arr = jnp.asarray(idx, jnp.int32).reshape(1, 1)

    d, hist_cols, dens_cols, close_cols = pl.pallas_call(
        _medoid_sweep_kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(
                (8, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (f_pad, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (_TILE_N // _LANES, _LANES),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_HIST_PAD, _TILE_N), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, _TILE_N), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, _TILE_N), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // _LANES, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((_HIST_PAD, _TILE_N), jnp.float32),
            jax.ShapeDtypeStruct((1, _TILE_N), jnp.float32),
            jax.ShapeDtypeStruct((1, _TILE_N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_HIST_PAD, _TILE_N), jnp.float32),
            pltpu.VMEM((1, _TILE_N), jnp.float32),
            pltpu.VMEM((1, _TILE_N), jnp.float32),
        ],
        interpret=interpret,
    )(rows8, idx_arr, matrixT, wts.reshape(1, n_pad))
    return (
        d.reshape(n_pad),
        jnp.sum(hist_cols, axis=1)[:_NBINS],
        jnp.sum(dens_cols),
        jnp.sum(close_cols).astype(jnp.int32),
    )


_C_PAD = 32  # candidate rows padded to the f32 sublane-tile multiple


def _candidate_density_kernel(
    cand_ref,  # VMEM (C_PAD, 128) i32: candidate ids, repeated along lanes
    rows_ref,  # VMEM (C_PAD, F): candidate feature rows
    m_ref,  # VMEM (F, TILE_N): matrix tile
    w_ref,  # VMEM (1, TILE_N): lengths * kept
    dens_ref,  # VMEM out (C_PAD,): densities, written at the last step
    dens_scr,  # VMEM scratch (C_PAD, TILE_N): elementwise accumulator
):
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)

    d = 0.5 - jnp.dot(
        rows_ref[:], m_ref[:], preferred_element_type=jnp.float32
    )  # (C_PAD, TILE_N) via MXU

    # zero self-distances: column id == candidate id per row
    lanes = jax.lax.broadcasted_iota(jnp.int32, (_C_PAD, _TILE_N), 1)
    col = i * _TILE_N + lanes
    cand = cand_ref[:, 0:1]  # (C_PAD, 1)
    d = jnp.where(col == cand, 0.0, d)

    @pl.when(i == 0)
    def _init():
        dens_scr[:] = jnp.zeros_like(dens_scr)

    w = w_ref[0, :].reshape(1, _TILE_N)
    kept = w > 0.0
    dens_scr[:] += jnp.where(
        (d <= _MEDOID_RADIUS) & kept, w * (_MEDOID_RADIUS - d), 0.0
    )

    @pl.when(i == n_steps - 1)
    def _finish():
        dens_ref[:] = jnp.sum(dens_scr[:], axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def candidate_density_sweep(matrixT, cand, wts, interpret=False):
    """Densities of C candidate medoids in one matrix pass, no (C, N)
    distance matrix in HBM.

    Args:
      matrixT: (F_pad, N_pad) f32.
      cand: (C,) i32 candidate columns, C <= 32.
      wts: (N_pad,) f32 = lengths * kept.

    Returns: dens (C,) f32.
    """
    f_pad, n_pad = matrixT.shape
    assert n_pad % _TILE_N == 0, n_pad
    (c,) = cand.shape
    assert c <= _C_PAD, c
    cand_pad = jnp.concatenate(
        [cand.astype(jnp.int32), jnp.full((_C_PAD - c,), -1, jnp.int32)]
    )
    rows = jnp.where(
        (jnp.arange(_C_PAD) < c)[:, None],
        matrixT[:, jnp.clip(cand_pad, 0, n_pad - 1)].T,
        0.0,
    )
    steps = n_pad // _TILE_N

    dens = pl.pallas_call(
        _candidate_density_kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(
                (_C_PAD, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_C_PAD, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (f_pad, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (_C_PAD,), lambda i: (0,), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((_C_PAD,), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_C_PAD, _TILE_N), jnp.float32)],
        interpret=interpret,
    )(
        jnp.broadcast_to(cand_pad[:, None], (_C_PAD, _LANES)),
        rows,
        matrixT,
        wts.reshape(1, n_pad),
    )
    return dens[:c]


def pallas_pad_multiple() -> int:
    "Column padding the fused kernels require of the engine."
    return _TILE_N

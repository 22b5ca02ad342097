"""Pallas TPU kernels for the clustering engine's distance inner loops.

The BASELINE north star names "Pallas kernels for the pairwise-distance /
density-peak inner loop" explicitly; these are they. The engine's wander
step needs, per iteration, (a) the local density of C candidate medoids
and (b) the full distance row of the chosen jump target. XLA fuses the
density reduce into the (C, F) x (F, N) dot (kind=kOutput fusion) but must
*materialize the (C, N) distance matrix in HBM* to do it — ~234 MB of
traffic per step at 1M x 32. The kernels here avoid that:

1. ``candidate_density_sweep``: densities of C candidates in ONE pass over
   the matrix, no (C, N) matrix in HBM (~132 MB of traffic).
2. ``row_sweep``: the distance row of one medoid (self-distance zeroed) in
   one pass — the engine runs it once per wander step for the (possibly
   unchanged) current medoid; branching on whether the step jumped costs
   more in lax.cond result copies than the sweep.
3. ``medoid_sweep``: one medoid's distance row + 60-bin length-weighted
   histogram + density + strict-neighbor count fused in one pass (the
   full "attempt payload"; kept for A/B and as an alternative epilogue).

Numbers of record (v5e-1, 1M x 32 f32, from jax.profiler device traces —
wall-clock probes through the tunneled runtime carry a ~0.5 ms dispatch
floor that masks sub-ms ops; see tests/dispatch_probe.py):

    XLA fused dot+density (writes D):      0.41 ms / step
    candidate_density_sweep (tile 32768):  0.185 ms / step   (2.2x)
    row_sweep:                             ~0.19 ms / step

The engine (vamb_tpu/cluster.py) uses 1+2 for its wander loop on TPU when
unsharded; the XLA expressions remain the reference semantics and the
path used on CPU (where the parity oracles run) and under a sharded mesh
(GSPMD partitions the einsum; pallas_call would need a shard_map port).

Layout contract (matches the engine): the latent matrix is transposed and
padded to (F_pad, N_pad) with F_pad a multiple of 8 and N_pad a multiple
of 128; "removed" points carry weight 0 in `wts` (= lengths * kept).

Numerics: dot products accumulate f32 on the MXU in a tile order that
differs from the XLA einsum by ulps, so TPU results can differ from the
CPU/XLA path in ulp-tie decisions — the same class of divergence the
mantissa-masking contract already accepts across backends.
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
_SWEEP_TILE = 4096  # medoid_sweep's histogram scratch is (64, TILE): keep small
_C_PAD = 32  # candidate rows padded to the f32 sublane-tile multiple
_MAX_TILE = 32768
_VMEM_BLOCK_BUDGET = 4 << 20  # bytes for one matrix block (double-buffered)


def _pick_tile(f_pad: int, n_pad: int) -> int:
    """Largest power-of-two-x-128 tile dividing n_pad under the VMEM budget.

    Bigger tiles amortize per-grid-step overhead (measured: 4096 -> 32768
    is 1.4x at 1M x 32); the budget keeps (f_pad, TILE) f32 blocks (and
    their double buffers) inside VMEM for wide latents (AAE uses F=283).
    """
    tile = _LANES
    while (
        tile * 2 <= _MAX_TILE
        and n_pad % (tile * 2) == 0
        and f_pad * tile * 2 * 4 <= _VMEM_BLOCK_BUDGET
    ):
        tile *= 2
    return tile


def _medoid_sweep_kernel(
    rows_ref,  # VMEM (8, F) f32: medoid row in row 0, rest zero
    idx_ref,  # SMEM (1, 1) i32: medoid column index (d[idx] forced to 0)
    m_ref,  # VMEM (F, TILE): matrix tile
    w_ref,  # VMEM (1, TILE): lengths * kept for this tile
    d_ref,  # VMEM out (TILE/128, 128): distances, contiguous blocks
    hist_ref,  # VMEM out (HIST_PAD, TILE): per-column partial histogram
    dens_ref,  # VMEM out (1, TILE): per-column partial density
    close_ref,  # VMEM out (1, TILE): per-column partial neighbor count
    hist_scr,  # VMEM scratch (HIST_PAD, TILE)
    dens_scr,  # VMEM scratch (1, TILE)
    close_scr,  # VMEM scratch (1, TILE)
):
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    tile = m_ref.shape[1]

    # distances via MXU: (8, F) x (F, TILE); only row 0 carries the medoid
    D = 0.5 - jnp.dot(rows_ref[:], m_ref[:], preferred_element_type=jnp.float32)
    d = D[0:1, :]

    # force d[idx] = 0 exactly, matching the engine's at[idx].set(0.0)
    # (the self-distance must land in bin 0, not fail the d >= 0 gate)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    col = i * tile + lanes
    d = jnp.where(col == idx_ref[0, 0], 0.0, d)
    # contiguous (TILE/128, 128) blocks: per-tile 1-sublane HBM writes
    # are pathologically slow on v5e, this reshape keeps the DMA dense
    d_ref[:] = d.reshape(tile // _LANES, _LANES)

    w = w_ref[:]
    kept = w > 0.0

    @pl.when(i == 0)
    def _init():
        hist_scr[:] = jnp.zeros_like(hist_scr)
        dens_scr[:] = jnp.zeros_like(dens_scr)
        close_scr[:] = jnp.zeros_like(close_scr)

    # histogram: per-bin column rows accumulated across tiles, elementwise;
    # the (64, TILE) -> (64,) reduction happens once, outside the kernel
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
    tile = min(_pick_tile(f_pad, n_pad), _SWEEP_TILE)
    steps = n_pad // tile
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
                (f_pad, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile // _LANES, _LANES),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_HIST_PAD, tile), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // _LANES, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((_HIST_PAD, tile), jnp.float32),
            jax.ShapeDtypeStruct((1, tile), jnp.float32),
            jax.ShapeDtypeStruct((1, tile), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_HIST_PAD, tile), jnp.float32),
            pltpu.VMEM((1, tile), jnp.float32),
            pltpu.VMEM((1, tile), jnp.float32),
        ],
        interpret=interpret,
    )(rows8, idx_arr, matrixT, wts.reshape(1, n_pad))
    return (
        d.reshape(n_pad),
        jnp.sum(hist_cols, axis=1)[:_NBINS],
        jnp.sum(dens_cols),
        jnp.sum(close_cols).astype(jnp.int32),
    )


def _row_sweep_kernel(rows_ref, idx_ref, m_ref, d_ref):
    i = pl.program_id(0)
    tile = m_ref.shape[1]
    D = 0.5 - jnp.dot(rows_ref[:], m_ref[:], preferred_element_type=jnp.float32)
    d = D[0:1, :]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    d = jnp.where(i * tile + lanes == idx_ref[0, 0], 0.0, d)
    d_ref[:] = d.reshape(tile // _LANES, _LANES)


@partial(jax.jit, static_argnames=("interpret",))
def row_sweep(matrixT, idx, row=None, interpret=False):
    """Distance row of one medoid, self-distance forced to exactly 0.

    One pass over the matrix, writing only the (N_pad,) row — the per-step
    companion of ``candidate_density_sweep`` (the XLA wander step gets this
    row as a slice of the (C, N) matrix it materializes; this path never
    materializes that matrix). Callers holding the medoid's (F_pad,)
    feature row (e.g. from a row-major matrix copy) can pass `row` to skip
    the lane-axis column gather. (The engine measured *slower* threading a
    row-major copy through its while loop, so it relies on the in-kernel
    gather; the parameter remains for other layouts.)
    """
    f_pad, n_pad = matrixT.shape
    tile = _pick_tile(f_pad, n_pad)
    if row is None:
        row = matrixT[:, idx]
    rows8 = jnp.zeros((8, f_pad), jnp.float32).at[0].set(row)
    idx_arr = jnp.asarray(idx, jnp.int32).reshape(1, 1)
    d = pl.pallas_call(
        _row_sweep_kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((8, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (f_pad, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile // _LANES, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad // _LANES, _LANES), jnp.float32),
        interpret=interpret,
    )(rows8, idx_arr, matrixT)
    return d.reshape(n_pad)


def _candidate_density_kernel(
    cand_ref,  # VMEM (C_PAD, 128) i32: candidate ids, repeated along lanes
    rows_ref,  # VMEM (C_PAD, F): candidate feature rows
    m_ref,  # VMEM (F, TILE): matrix tile
    w_ref,  # VMEM (1, TILE): lengths * kept
    dens_ref,  # VMEM out (C_PAD, 128): densities in lane 0
    acc,  # VMEM scratch (C_PAD, 128): running per-candidate partials
):
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    tile = m_ref.shape[1]

    D = 0.5 - jnp.dot(
        rows_ref[:], m_ref[:], preferred_element_type=jnp.float32
    )  # (C_PAD, TILE) via MXU, VMEM-resident only

    # zero self-distances: column id == candidate id per row
    lanes = jax.lax.broadcasted_iota(jnp.int32, (_C_PAD, tile), 1)
    Dz = jnp.where(i * tile + lanes == cand_ref[:, 0:1], 0.0, D)

    w = w_ref[:]
    part = jnp.sum(
        jnp.where((Dz <= _MEDOID_RADIUS) & (w > 0.0), w * (_MEDOID_RADIUS - Dz), 0.0),
        axis=1,
        keepdims=True,
    )  # (C_PAD, 1)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    acc[:, 0:1] += part

    @pl.when(i == n_steps - 1)
    def _finish():
        dens_ref[:] = acc[:]


@partial(jax.jit, static_argnames=("interpret",))
def candidate_density_sweep(matrixT, cand, wts, cand_rows=None, interpret=False):
    """Densities of C candidate medoids in one matrix pass, no (C, N)
    distance matrix in HBM.

    Args:
      matrixT: (F_pad, N_pad) f32.
      cand: (C,) i32 candidate columns, C <= 32.
      wts: (N_pad,) f32 = lengths * kept.
      cand_rows: optional (C, F_pad) pre-gathered candidate feature rows
        for callers that hold a row-major matrix copy (the lane-axis
        column gather otherwise used costs a shuffle pass; the engine
        measured slower overall with a row-major copy, so it doesn't).

    Returns: dens (C,) f32.
    """
    f_pad, n_pad = matrixT.shape
    tile = _pick_tile(f_pad, n_pad)
    (c,) = cand.shape
    assert c <= _C_PAD, c
    cand_pad = jnp.concatenate(
        [cand.astype(jnp.int32), jnp.full((_C_PAD - c,), -1, jnp.int32)]
    )
    if cand_rows is None:
        cand_rows = matrixT[:, jnp.clip(cand_pad[:c], 0, n_pad - 1)].T
    rows = jnp.where(
        (jnp.arange(_C_PAD) < c)[:, None],
        jnp.concatenate(
            [cand_rows, jnp.zeros((_C_PAD - c, f_pad), jnp.float32)]
        ),
        0.0,
    )
    steps = n_pad // tile

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
                (f_pad, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (_C_PAD, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((_C_PAD, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_C_PAD, _LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(
        jnp.broadcast_to(cand_pad[:, None], (_C_PAD, _LANES)),
        rows,
        matrixT,
        wts.reshape(1, n_pad),
    )
    return dens[:c, 0]


def _block_gather_kernel(_bids_ref, m_ref, out_ref):
    out_ref[:] = m_ref[:]


@partial(jax.jit, static_argnames=("block", "interpret"))
def gather_blocks(matrixT, bids, block=_LANES, interpret=False):
    """Gather KB column-blocks of width `block` from (F, N) into (F, KB*block).

    The subset wander's per-attempt ball gather. The XLA equivalent
    (`jnp.take(matrixT.reshape(F, NB, B), bids, axis=1)`) materializes a
    layout-changed copy of the ENTIRE (F, N) matrix for the reshape —
    0.4 ms of pure relayout per attempt at 1M x 32 (seen in HLO as a
    f32[32,8192,128]{2,0,1} kLoop fusion). Here the block ids drive the
    input BlockSpec's index_map via scalar prefetch, so each grid step is
    one contiguous (F, 128) tile DMA and nothing else moves. With the
    geometry-local column order the ball spans ~KB=64 blocks, so this is
    ~64 small DMAs (~tens of us). Pure data movement: the gathered values
    are bit-identical to the XLA path, so the CPU oracle can keep the
    jnp.take formulation with no parity implications.
    """
    f_pad, n_pad = matrixT.shape
    kb = bids.shape[0]
    return pl.pallas_call(
        _block_gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(kb,),
            in_specs=[
                pl.BlockSpec((f_pad, block), lambda i, bids: (0, bids[i])),
            ],
            out_specs=pl.BlockSpec((f_pad, block), lambda i, bids: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((f_pad, kb * block), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(bids, matrixT)


def pallas_pad_multiple() -> int:
    """Smallest column padding the kernels themselves accept (tests pad to
    this). The ENGINE pads further — to 32768 multiples (cluster.py) — so
    its compaction ladder keeps power-of-two tiles under the VMEM budget;
    callers wiring these kernels into other layouts need only this value.
    """
    return _SWEEP_TILE

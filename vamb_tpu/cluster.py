"""Iterative medoid clustering of L2-normalized latents, TPU-first.

Behavioral spec: reference vamb/cluster.py (the GPU `kept_mask` variant,
cluster.py:174-177 — masking, not row deletion, which is exactly the
XLA-friendly formulation). Constants and decision rules are identical:

* normalization: zero rows -> uniform, divide by row norm * sqrt(2) so
  cosine distance = 0.5 - x.y lies in [0, 1] (cluster.py:653-669).
* seeds tried in descending contig-length order, cyclically (:275, :342-384).
* medoid wandering: hill-climb on length-weighted local density within
  radius 0.05, <=25 sampled untried candidates per step (:415-450).
* threshold: length-weighted histogram of distances <=0.3 in 60 bins,
  smoothed with a 31-tap N(0, 0.01) kernel, first-peak/valley scan with the
  adaptive peak-valley-ratio acceptance rules (:452-543).
* pvr feedback: starts 0.1, +0.1 whenever <15 of the last 300 candidate
  clusters were accepted; radius-0.06 fallback once pvr > 0.55
  (:282-283, :403-413, :566-580).

TPU-first architecture (a re-design, not a port):

* **One device program per K clusters.** The reference dispatches thousands
  of tiny ops per cluster from Python; on an accelerator every host
  roundtrip costs dispatch latency. Here the ENTIRE clustering loop — seed
  scan, medoid wander, histogram, smoothing, valley scan, pvr feedback,
  emission bookkeeping — runs inside a single jitted program
  (`lax.while_loop`) that emits up to K=1024 clusters per call and returns
  two packed record arrays plus a narrow batch-local label delta.
  Dispatches are pipelined: the next batch launches before the current
  one's results are pulled, overlapping host decode with device compute.
* **Transposed (F, N) layout.** Latent dim (default 32) is far below the
  128-lane TPU tile, so an (N, F) matrix physically pads F to 128 lanes and
  reads 4x the data per matvec. Storing (F, N) puts the big dim on lanes:
  a medoid distance sweep streams exactly F*N floats.
* **Batched wander.** All <=25 candidates of a wander step are evaluated in
  ONE (C,F)x(F,N) matmul, and the jump target's distance row is reused as
  the next medoid's distances — the reference instead does one matvec per
  candidate with a 64-entry LRU cache (cluster.py:606-637).
* **Speculative seed cache.** Distance rows for the next 8 seeds of the
  cycling scan are computed in one matmul and served to later attempts on
  exact seed-id match (see _SPEC_SEEDS), amortizing the per-attempt seed
  sweep in rejection-heavy phases without touching any decision.
* **Loner bursts.** A seed with no other kept point within the medoid
  radius is a fully determined attempt (wander is a no-op, the cluster is
  a loner, no pvr/histogram effects), and removing a loner cannot change
  any other point's neighborhood — so consecutive cached seeds that are
  loners are emitted in one iteration, refilling the cache in place (one
  matmul per _SPEC_SEEDS loners), emission-identical to sequential play.
* **Neighborhood-subset wander** (round 3, the large-N fast path): the
  hill climb runs over a seed-centered ball whose 128-row blocks are
  gathered once per attempt (contiguous DMAs, block ids from a top_k over
  N/128 block flags) — (C,F)x(F,Q≈64k) matmuls instead of two full
  128 MB HBM passes per step; ball overflow or medoid drift falls back
  mid-attempt to the classic full-sweep loop with all state carried over.
  An APPROXIMATE medoid-selection heuristic: d is half squared chord
  distance, so an exact ball needs radius 9r = 0.45 (a third of all
  points at dim 32), which would defeat the subset — see the analysis at
  _SUBSET_RADIUS. The locality bias affects only which medoid the walk
  settles on; thresholds, members, and loner/fallback classification all
  come from exact full-length rows. Emission-pinned against the
  sequential oracle's mirror of the same kernels and quality-pinned
  against the exact full-scope path (bench A/B + wide-cluster CPU test).
  1.45x full-run wall at 1M on v5e; auto above 2^18 padded points (f32
  only); `wander_scope="full"` restores exactness. Under a sharded mesh
  the ball is gathered via one-hot block matmuls (shard-local partials +
  one Q-sized all-reduce per attempt — never an N-sized collective) and
  the climb runs replicated on every device; emission is identical to the
  single-device path (tests/test_parallel.py::TestMeshSubsetWander).
* **Pallas wander kernels on TPU** (`ops/pallas_cluster.py`): candidate
  densities in one matrix pass with no (C, N) distance matrix in HBM, and
  the medoid's row recomputed each step in one pass — the full-sweep
  path's TPU default (used by subset-mode fallbacks and the final row
  sweep). CPU (where the parity oracles run), sharded meshes and bf16
  keep the XLA expressions.
* **Masking with device-side compaction**: clustered points are masked out
  of every reduction, and when survivors fall to half the live padded size
  the surviving columns are gathered into a half-size buffer (programs for
  the halving ladder pre-compile on a background thread).
* **Row-sharded on a mesh**: with `mesh=...`, the matrix is sharded over
  the contig axis; distance sweeps compute shard-locally and only the tiny
  reductions (60-bin histogram, densities, top-k candidates) cross the ICI.

Distance matmuls run with `precision=HIGHEST`: histogram bins are 0.005
wide, so bf16-level error (~1e-3) would misbin points.
"""

from functools import partial
from math import ceil
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

_DEFAULT_RADIUS = 0.06
_MEDOID_RADIUS = 0.05
_DELTA_X = 0.005
_XMAX = 0.3
_NBINS = ceil(_XMAX / _DELTA_X)  # 60

# PDF of N(0, 0.01) sampled at _DELTA_X intervals over [-0.075, 0.075],
# scaled by _DELTA_X (31 taps; reference cluster.py:39-73).
_PDF_X = np.arange(-15, 16) * _DELTA_X
_NORMALPDF = (
    _DELTA_X / (0.01 * np.sqrt(2 * np.pi)) * np.exp(-0.5 * (_PDF_X / 0.01) ** 2)
).astype(np.float32)

# Histogram smoothing as one (60,)x(60,60) dot with the banded Toeplitz
# matrix of the 31-tap kernel, NOT jnp.convolve: a dot's accumulation
# order is fixed per shape/backend, while a convolve's rounding can change
# with the fusion context it compiles in. The engine evaluates the scan
# inside a fused while_loop and the parity oracle in standalone programs;
# a last-ulp difference between those two convolve compilations flipped a
# knife-edge accept/reject on a palindromic histogram whose post-peak bins
# tied exactly (caught by tests/test_parity_golden.py). The distance
# matmuls already rely on this same dot determinism.
_SMOOTH_MATRIX = np.zeros((_NBINS, _NBINS), np.float32)
for _i in range(_NBINS):
    for _j in range(_NBINS):
        if abs(_j - _i) <= 15:
            _SMOOTH_MATRIX[_i, _j] = _NORMALPDF[_j - _i + 15]
del _i, _j


def smooth_histogram(hist):
    "Shared engine/oracle smoothing contract (see _SMOOTH_MATRIX note)."
    return jnp.dot(
        hist,
        jnp.asarray(_SMOOTH_MATRIX),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


# The valley scan's x grid, replicating the reference's float64 accumulation
# `x += XMAX / len(histogram)` (cluster.py:487,532) — accumulated binary64
# sums differ from i * dx in the last ulp, and the `x > 0.1` dead-check
# (cluster.py:511) sits exactly on such a boundary at bin 20.
_X_GRID = np.concatenate(
    [[0.0], np.add.accumulate(np.full(_NBINS - 1, _XMAX / _NBINS))]
)
_X_GT_01 = _X_GRID > 0.1  # static: x strictly past 0.1 per bin

_LANES = 128
_SUBLANES = 8
# Clusters emitted per device dispatch. Each dispatch costs a fixed host
# round trip (~25 ms through a tunneled runtime), and loner bursts make
# single attempts emit many clusters, so K bounds the tail throughput:
# a 316k-cluster run at K=128 is 2469 round trips. 1024 keeps the packed
# record transfers tiny while making round trips negligible.
_DEFAULT_BATCH = 1024

# Speculative seed cache: distance rows for the next S likely seeds are
# computed in ONE (S,F)x(F,N) matmul (same cost as a single matvec sweep —
# the matrix read dominates) and consumed across subsequent attempts. A
# cached row is used only when its seed id EXACTLY equals the freshly
# computed next_seed, so decisions are independent of the cache; rejected
# attempts don't change the kept mask, making hits the common case, and
# emission merely skips the removed seeds. This amortizes the per-attempt
# seed sweep ~S-fold in rejection-heavy (high-pvr) phases.
_SPEC_SEEDS = 8

# Candidate sampling uses top-k of Gumbel noise (= uniform sample without
# replacement). On TPU, exact top_k sorts the full vector; approx_max_k is a
# single-pass kernel with >=0.95 recall — for *sampling*, any deviation just
# picks different random candidates, so it is the default on TPU. CPU always
# uses exact top_k (approx falls back to it anyway), keeping tests exact.
_USE_APPROX_TOPK = True

# 60-bin histogram strategy: "compare" broadcasts against the bin index
# vector and reduces; "scatter" uses XLA scatter-add. Measured on v5e the
# compare-reduce fuses into a single pass and wins; kept switchable for
# A/B on other backends.
_HIST_MODE = "compare"

_KIND_NORMAL = 0
_KIND_LONER = 1
_KIND_FALLBACK = 2


class Cluster:
    "One emitted cluster; indices refer to rows of the input matrix."

    __slots__ = [
        "medoid",
        "seed",
        "members",
        "maximal_pvr",
        "observed_pvr",
        "radius",
        "successes",
        "attempts",
    ]

    def __init__(
        self,
        medoid: int,
        seed: int,
        members: np.ndarray,
        maximal_pvr: float,
        observed_pvr: Optional[float],
        radius: Optional[float],
        successes: int,
        attempts: int,
    ):
        self.medoid = medoid
        self.seed = seed
        self.members = members
        self.maximal_pvr = maximal_pvr
        self.observed_pvr = observed_pvr
        self.radius = radius
        self.successes = successes
        self.attempts = attempts

    @property
    def kind_str(self) -> str:
        if self.observed_pvr is not None:
            return "normal"
        return "loner" if self.radius is None else "fallback"

    def as_tuple(self) -> tuple[int, np.ndarray]:
        return (self.medoid, self.members)


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def engine_order(
    matrix: np.ndarray, lengths: np.ndarray, rng_seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Geometry-local engine column order + per-column seed ranks.

    Columns are sorted by the sign pattern of 16 seeded random projections
    (an RP-tree-style locality code): points of the same latent cluster
    agree on almost every hyperplane and land contiguously, so the subset
    wander's seed ball touches a handful of 128-column blocks instead of
    one block per member (measured at 1M x 32: a 497-member ball spans 6
    distinct blocks in this order vs 491 in length order — the ball gather
    drops from ~0.4 ms of scattered DMAs to microseconds). The reference's
    descending-length SEED order is preserved logically through `ranks`:
    ranks[i] is column i's position in the stable descending-length
    ordering, and the on-device seed scan takes a masked argmin over
    ranks instead of assuming rank == row index.

    Returns (order, ranks): `order` maps engine column -> original row;
    `ranks` is int32 per engine column. Deterministic for a given
    (matrix, lengths, rng_seed); `matrix` must already be normalized.
    """
    n = len(matrix)
    by_len = np.argsort(lengths.astype(np.float32), kind="stable")[::-1]
    rank_of_original = np.empty(n, np.int64)
    rank_of_original[by_len] = np.arange(n)
    rng = np.random.default_rng(rng_seed)
    proj = matrix @ rng.standard_normal((matrix.shape[1], 16)).astype(np.float32)
    code = np.zeros(n, np.uint32)
    for k in range(16):
        code = (code << np.uint32(1)) | (proj[:, k] > 0)
    order = np.argsort(code, kind="stable")
    ranks = rank_of_original[order].astype(np.int32)
    return order, ranks


def normalize(matrix: np.ndarray, inplace: bool = False) -> np.ndarray:
    """Prepare latents for cosine distance: dist = 0.5 - x.y in [0, 1].

    All-zero rows are replaced by the uniform vector first (reference
    cluster.py:653-669).
    """
    if not inplace:
        matrix = matrix.copy()
    zero_rows = (matrix == 0).all(axis=1)
    matrix[zero_rows] = 1 / matrix.shape[1]
    norms = np.linalg.norm(matrix, axis=1, keepdims=True) * np.sqrt(2)
    matrix /= norms
    return matrix


# ---------------------------------------------------------- device engine


def _find_threshold_device(hist, pvr):
    """Smoothed-histogram valley scan (reference cluster.py:483-543).

    The reference's sequential 60-step state machine is re-expressed in
    closed form with cummax/cummin so it compiles to a handful of vector
    ops instead of 60 serialized scan steps (each scan step costs fixed
    device overhead, which dominated per-cluster wall time). Equivalence
    with the sequential semantics is property-tested in
    tests/test_cluster.py.

    Returns (threshold, observed_pvr, found). threshold < 0 => none.
    """
    densities = smooth_histogram(hist)
    xs = jnp.asarray(_X_GRID.astype(np.float32))
    x_gt_01 = jnp.asarray(_X_GT_01)
    i = jnp.arange(_NBINS)
    inf = jnp.float32(jnp.inf)

    # Running peak: until the peak is over, peak == cumulative max
    # (initialized at 0.0, densities are nonnegative).
    run_max_incl = jax.lax.cummax(densities)
    run_max_excl = jnp.concatenate([jnp.zeros(1, jnp.float32), run_max_incl[:-1]])

    # Peak is over at the first index with density < 60% of running max.
    po_mask = densities < 0.6 * run_max_incl
    po_exists = jnp.any(po_mask)
    po_idx = jnp.argmax(po_mask)
    peak = run_max_incl[po_idx]

    # Dead: still rising (strictly above the pre-peak max) past x = 0.1
    # while the peak is not over.
    pre_po = jnp.where(po_exists, i < po_idx, True)
    rising = densities > run_max_excl
    dead = jnp.any(rising & x_gt_01 & pre_po)

    # After the peak: running minimum seeded with densities[po_idx].
    seeded = jnp.where(i >= po_idx, densities, inf)
    cummin_incl = jax.lax.cummin(seeded)
    m_prev = jnp.concatenate([jnp.full(1, inf), cummin_incl[:-1]])
    after = i > po_idx

    # Second peak (> 1.5x the minimum so far) stops the scan.
    brk = after & (densities > 1.5 * m_prev)
    brk_exists = jnp.any(brk)
    brk_idx = jnp.argmax(brk)
    in_range = after & jnp.where(brk_exists, i < brk_idx, True)

    # New-minimum events; the threshold is the x of the last one, which is
    # the first index attaining the final minimum (strict decreases).
    new_min = in_range & (densities < m_prev)
    range_min = jnp.min(jnp.where(in_range, densities, inf))
    dam = jnp.minimum(densities[po_idx], range_min)
    has_event = jnp.any(new_min)
    thr_pos = jnp.argmax(new_min & (densities == dam))
    thr = jnp.where(po_exists & has_event & (dam < pvr * peak), xs[thr_pos], -1.0)

    found = (~dead) & (thr >= 0.0) & (thr <= 0.2 + pvr)
    observed_pvr = dam / jnp.maximum(peak, 1e-30)
    return thr, observed_pvr, found


class _State(NamedTuple):
    "All cross-cluster control state, device-resident between dispatches."

    kept: jax.Array  # (N,) bool
    labels: jax.Array  # (N,) int32, -1 = unassigned
    order_pos: jax.Array  # i32: next position in the seed order
    pvr: jax.Array  # f32: peak_valley_ratio
    attempts: jax.Array  # (windowsize,) bool circular buffer
    attempts_len: jax.Array  # i32
    attempts_head: jax.Array  # i32
    successes: jax.Array  # i32
    n_remaining: jax.Array  # i32
    next_cid: jax.Array  # i32: next cluster id to assign
    key: jax.Array  # PRNG key
    n_dists: jax.Array  # f32 counter of raw distance evaluations
    # reference-equivalent distance work: what the reference's sequential
    # sampler would have computed — one matvec per seed plus one per
    # candidate actually visited before the first improvement (ref
    # cluster.py:606-637 evaluates candidates one at a time and stops on
    # the first jump; the engine's batched matmul evaluates all C at once,
    # so raw n_dists overstates cross-comparable work)
    n_dists_eff: jax.Array
    spec_seeds: jax.Array  # (_SPEC_SEEDS,) i32, -1 = empty slot
    spec_d: jax.Array  # (_SPEC_SEEDS, N) f32 cached distance rows
    # first cache slot the seed scan may consume next. Cached slots are
    # exactly the true scan sequence from the fill position, so consuming
    # the first ALIVE slot >= spec_next IS the scan (removals only delete
    # points; a pvr bump resets order_pos and forces a refill by setting
    # this to _SPEC_SEEDS) — replacing three O(N) rank reductions per
    # attempt with an 8-element slot test.
    spec_next: jax.Array  # i32


class _Records(NamedTuple):
    "Per-cluster outputs of one emit_batch dispatch; all (K,) arrays."

    medoid: jax.Array  # i32
    seed: jax.Array  # i32
    kind: jax.Array  # i32: 0 normal / 1 loner / 2 fallback
    radius: jax.Array  # f32 (nan for loner)
    observed_pvr: jax.Array  # f32 (nan unless normal)
    pvr: jax.Array  # f32 at emission
    successes: jax.Array  # i32
    attempts: jax.Array  # i32
    n_emitted: jax.Array  # scalar i32


# Neighborhood-subset wander (the large-N fast path): the hill climb runs
# over points gathered from a seed-centered ball of radius _SUBSET_RADIUS,
# with (C,F)x(F,Q) matmuls instead of two full 128 MB HBM passes per step
# at 1M contigs. The walk falls back to the full-sweep loop (exactly the
# classic body, with all state carried over) when the ball overflows the
# block budget or the medoid drifts past _SUBSET_ABORT from the seed.
#
# This is a deliberately APPROXIMATE medoid-selection heuristic, not an
# exact restriction. d = 0.5 - x.y is HALF SQUARED chord distance on the
# 1/sqrt(2)-sphere, so the triangle inequality holds in sqrt(d): an
# eligible candidate (within r=_MEDOID_RADIUS of a medoid that has
# drifted at most A=_SUBSET_ABORT) can sit at d0 up to (sqrt(A)+sqrt(r))^2
# = 0.2 from the seed, and its density contributors at up to
# (sqrt(A)+2*sqrt(r))^2 = 0.45 — beyond the 0.15 ball. A sound radius is
# therefore >= 9r = 0.45 even with zero drift, and at latent dimension 32
# such a ball typically covers a third of ALL points, which defeats the
# subset entirely: exactness and the speedup are incompatible under this
# metric. The bias is a pure locality preference in WHICH medoid the walk
# settles on (edge candidates may be invisible or density-undercounted);
# everything downstream of the medoid — the threshold histogram, member
# selection, loner/fallback classification — is computed from exact
# full-length distance rows. Validation is therefore two-level: the
# sequential oracle mirrors these kernels so emission tests pin the
# implementation (a transcription check, not a reference-exactness
# proof), and quality-level equivalence against the exact full-scope path
# is asserted every round by the bench A/B and the wide-cluster CPU test
# (tests/test_cluster_quality_ab.py). `wander_scope="full"` restores the
# exact path.
_SUBSET_BLOCK = 128  # block-granular gathers: contiguous 128-row DMA chunks
_SUBSET_Q = 1 << 13  # max gathered elements (= _SUBSET_BLOCK * max blocks)
# Seed-rank sentinels, shared with the oracle (decision parity depends on
# both sides using identical values and on RANK_PAD_BASE < RANK_NONE):
# padding columns get distinct ranks >= RANK_PAD_BASE (they are never
# kept, so they never win a scan); RANK_NONE is the masked-scan identity.
RANK_PAD_BASE = 1 << 29
RANK_NONE = 1 << 30
_SUBSET_RADIUS = 0.15
_SUBSET_ABORT = _SUBSET_RADIUS - 2 * _MEDOID_RADIUS  # drift boundary
_SUBSET_AUTO_MIN = 1 << 18  # auto mode: subset wander above this padded N


def _make_emit_batch(
    windowsize: int,
    minsuccesses: int,
    maxsteps: int,
    batch_clusters: int,
    distance_dtype=jnp.float32,
    use_pallas: bool = False,
    replicate_outputs=None,
    use_subset: bool = False,
    subset_q: int = _SUBSET_Q,
    use_lanes: bool = False,
    repl_constraint=None,
):
    """Build the fused device program emitting up to `batch_clusters` clusters.

    Signature: emit_batch(matrixT (F,N), ranks (N,) i32, lengths (N,),
    state[donated]) ->
    (state, ints (5K+1,) i32, flts (3K+3,) f32, delta (N,) uint). `matrixT`
    is the transposed, normalized, padded latent matrix in geometry-local
    column order; `ranks` carries each column's descending-length seed
    rank (see engine_order). `ints` packs
    [medoid, seed, kind, successes, attempts_len, n_emitted]; `flts` packs
    [radius, observed_pvr, pvr, n_dists, n_dists_eff, post-batch pvr];
    `delta` holds batch-local cluster ids + 1 (0 = not assigned this
    batch) — the packing exists so one dispatch costs three host
    transfers, decoded by ClusterGenerator._dispatch.
    """
    K = batch_clusters
    C = maxsteps
    pdf = jnp.asarray(_NORMALPDF)
    if use_pallas:
        from vamb_tpu.ops.pallas_cluster import (
            candidate_density_sweep,
            row_sweep,
        )
    # f32 sweeps use HIGHEST precision (bins are 0.005 wide); the opt-in
    # bf16 path halves HBM traffic at ~1e-4 mean distance error.
    _prec = (
        jax.lax.Precision.HIGHEST
        if distance_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def sharded_at(arr, i):
        """arr[i] for a column-sharded (N,) array as a masked one-element
        reduction: a dynamic_slice at a traced index on a sharded dim makes
        GSPMD all-gather the whole array (N-sized, once per attempt);
        the masked reduce is a shard-local pass + scalar all-reduce.
        Single-device keeps the plain dynamic index."""
        if repl_constraint is None:
            return arr[i]
        iota = jnp.arange(arr.shape[0])
        if arr.dtype == jnp.bool_:
            return jnp.any((iota == i) & arr)
        return jnp.sum(jnp.where(iota == i, arr, jnp.zeros((), arr.dtype)))

    def sharded_at_vec(arr, idxs):
        "arr[idxs] for (N,)-sharded arr and a small replicated index vector."
        if repl_constraint is None:
            return arr[idxs]
        iota = jnp.arange(arr.shape[0])
        m = iota[None, :] == idxs[:, None]
        if arr.dtype == jnp.bool_:
            return jnp.any(m & arr[None, :], axis=1)
        return jnp.sum(
            jnp.where(m, arr[None, :], jnp.zeros((), arr.dtype)), axis=1
        )

    def spec_batch(matrixT, seeds):
        """Distance rows for S seeds in one matmul, self-distances zeroed.

        Also the subset path's FINAL-ROW kernel (broadcast one medoid over
        the S rows and take row 0): a batched (S,F)x(F,N) dot rounds
        differently from the single "fn,f->n" matvec in the last ulp, but
        each output row depends only on its own id (composition-
        independent — pinned by tests/test_cluster.py::
        test_batched_row_composition_independent), so the classic
        single-attempt path, the speculative attempt lanes, and the parity
        oracle all read bit-identical rows from this one expression.
        """
        rows = matrixT[:, seeds]  # (F, S)
        D = 0.5 - jnp.einsum(
            "fc,fn->cn", rows, matrixT, precision=_prec,
            preferred_element_type=jnp.float32,
        )
        iota = jnp.arange(matrixT.shape[1])
        return jnp.where(iota[None, :] == seeds[:, None], 0.0, D)

    def density_of(d, lengths, kept):
        return jnp.sum(
            jnp.where((d <= _MEDOID_RADIUS) & kept, lengths * (_MEDOID_RADIUS - d), 0.0)
        )

    _RANK_BIG = jnp.int32(RANK_NONE)

    def next_seed(kept, ranks, start):
        """Kept column with the smallest seed rank >= `start`; wrap to the
        overall smallest kept rank only when none remains ahead (reference
        get_next_seed cycling semantics, cluster.py:342-384).

        Columns live in geometry order (see engine_order), so the
        descending-length seed order is carried by the constant `ranks`
        array and the scan is a masked argmin over it — still no O(N)
        gather. Returns (column, rank).
        """
        key_ahead = jnp.where(kept & (ranks >= start), ranks, _RANK_BIG)
        r_ahead = jnp.min(key_ahead)
        key_any = jnp.where(kept, ranks, _RANK_BIG)
        r_any = jnp.min(key_any)
        rank_sel = jnp.where(r_ahead < _RANK_BIG, r_ahead, r_any)
        col = jnp.argmax(kept & (ranks == rank_sel)).astype(jnp.int32)
        return col, rank_sel

    def next_seeds_batch(kept, ranks, start):
        "The next S seed columns the cycling scan would produce from `start`."

        def step(pos, _):
            s, r = next_seed(kept, ranks, pos)
            return r + 1, s

        _, seeds = jax.lax.scan(
            step, start, None, length=_SPEC_SEEDS
        )
        return seeds.astype(jnp.int32)

    def subset_phase1(
        matrixT, lengths, kept, seed, d0, no_cand, key, n_dists, n_dists_eff
    ):
        """Seed-ball gather + in-subset hill climb (phase 1 of the subset
        wander), shared between the classic single-attempt path and the
        speculative attempt lanes.

        Block-granular gather: flag the _SUBSET_BLOCK-wide blocks that
        contain any ball member, pick their ids with a top_k over N/128
        block flags (trivial), and gather WHOLE blocks — every DMA is a
        contiguous 128-row chunk. Elementwise index compaction
        (nonzero / full-length top_k / cumsum+searchsorted) all cost
        ~1 ms per attempt at 1M on this chip; the block scheme is ~50 us.
        Non-members ride along as padding, masked out of every reduction
        by kept_sub/ball membership tests — exactness is untouched.

        Returns (medoid, need_full, ok, idx, valid, tried_s, s_density,
        key, n_dists, n_dists_eff, blocks): `medoid` is a full-space
        column; `need_full` means the climb must continue in the classic
        full-sweep loop (ball overflow or drift past _SUBSET_ABORT);
        `blocks` is the (N/_SUBSET_BLOCK,) gathered-block mask the lane
        conflict regions are built from (dead code for the classic path —
        XLA drops it).
        """
        N = matrixT.shape[1]
        Q = subset_q
        B = _SUBSET_BLOCK
        KB = Q // B
        NB = N // B
        iq = jnp.arange(Q)
        ball = kept & (d0 <= _SUBSET_RADIUS)
        block_any = jnp.any(ball.reshape(NB, B), axis=1)
        nb = jnp.sum(block_any)
        ok = nb <= KB
        _, bids = jax.lax.top_k(
            jnp.where(block_any, -jnp.arange(NB, dtype=jnp.int32), -NB), KB
        )
        valid_b = jnp.arange(KB) < jnp.minimum(nb, KB)
        bids = jnp.where(valid_b, bids, 0).astype(jnp.int32)
        idx = (bids[:, None] * B + jnp.arange(B)[None, :]).reshape(-1)  # (Q,)
        valid = jnp.repeat(valid_b, B)
        F = matrixT.shape[0]
        if use_pallas:
            # the XLA take would relayout-copy the whole (F, N) matrix for
            # its reshape (0.4 ms/attempt at 1M); the kernel is KB block
            # DMAs driven by scalar-prefetched ids, bit-identical values
            from vamb_tpu.ops.pallas_cluster import gather_blocks

            xsT = gather_blocks(matrixT, bids, block=B)
            w_sub_raw = jnp.take(lengths.reshape(NB, B), bids, axis=0).reshape(-1)
            kept_sub_raw = jnp.take(kept.reshape(NB, B), bids, axis=0).reshape(-1)
            d0_sub_raw = jnp.take(d0.reshape(NB, B), bids, axis=0).reshape(-1)
        elif repl_constraint is not None:
            # Sharded mesh: a take along the column-sharded block dim makes
            # GSPMD all-gather the WHOLE (F, N) operand per attempt. A
            # one-hot (KB, NB) selection matmul instead partitions cleanly
            # — each shard multiplies its own blocks, one (F, Q)-sized
            # all-reduce replicates the ball — and is bit-exact (every
            # output element is a single-term sum). The climb then runs
            # replicated on every device; per-attempt ICI traffic is
            # Q-sized, never N-sized (pinned by the collective-inventory
            # test in tests/test_parallel.py).
            onehot = (
                bids[:, None] == jnp.arange(NB, dtype=jnp.int32)[None, :]
            ).astype(jnp.float32)  # (KB, NB)
            rc = lambda a: jax.lax.with_sharding_constraint(a, repl_constraint)  # noqa: E731
            xsT = rc(
                jnp.einsum(
                    "fnb,kn->fkb", matrixT.reshape(F, NB, B), onehot,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                ).reshape(F, Q)
            )
            gathered = rc(
                jnp.einsum(
                    "nbx,kn->kbx",
                    jnp.stack(
                        [
                            lengths.reshape(NB, B),
                            kept.astype(jnp.float32).reshape(NB, B),
                            d0.reshape(NB, B),
                        ],
                        axis=2,
                    ),
                    onehot,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
            )
            w_sub_raw = gathered[:, :, 0].reshape(-1)
            kept_sub_raw = gathered[:, :, 1].reshape(-1) > 0.5
            d0_sub_raw = gathered[:, :, 2].reshape(-1)
        else:
            xsT = jnp.take(
                matrixT.reshape(F, NB, B), bids, axis=1
            ).reshape(F, Q)
            w_sub_raw = jnp.take(lengths.reshape(NB, B), bids, axis=0).reshape(-1)
            kept_sub_raw = jnp.take(kept.reshape(NB, B), bids, axis=0).reshape(-1)
            d0_sub_raw = jnp.take(d0.reshape(NB, B), bids, axis=0).reshape(-1)
        w_sub = jnp.where(valid, w_sub_raw, 0.0)
        kept_sub = valid & kept_sub_raw
        d0_sub = jnp.where(valid, d0_sub_raw, jnp.inf)
        seed_slot = (
            jnp.argmax(bids == seed // B).astype(jnp.int32) * B + seed % B
        )  # seed has d0 = 0, so its block is always flagged
        density0_sub = jnp.sum(
            jnp.where(
                (d0_sub <= _MEDOID_RADIUS) & kept_sub,
                w_sub * (_MEDOID_RADIUS - d0_sub),
                0.0,
            )
        )
        tried0_sub = (iq == seed_slot)

        def sub_cond(carry):
            return ~carry[0] & ~carry[1]

        def sub_body(carry):
            _done, _abort, slot, d_s, density, tried_s, key, nd, nde = carry
            key, k1 = jax.random.split(key)
            elig = (d_s <= _MEDOID_RADIUS) & kept_sub & ~tried_s & (iq != slot)
            gumbel = -jnp.log(
                -jnp.log(jax.random.uniform(k1, (Q,)) + 1e-20) + 1e-20
            )
            score = jnp.where(elig, gumbel, -jnp.inf)
            if _USE_APPROX_TOPK:
                _, cand = jax.lax.approx_max_k(score, C)
            else:
                _, cand = jax.lax.top_k(score, C)
            cand_valid = elig[cand]
            rows = xsT[:, cand]  # (F, C)
            D = 0.5 - jnp.einsum(
                "fc,fq->cq", rows, xsT, precision=_prec,
                preferred_element_type=jnp.float32,
            )  # (C, Q)
            self_m = iq[None, :] == cand[:, None]
            kept_b = kept_sub[None, :]
            dens = jnp.sum(
                jnp.where(
                    self_m & kept_b,
                    w_sub[None, :] * _MEDOID_RADIUS,
                    jnp.where(
                        (D <= _MEDOID_RADIUS) & kept_b & ~self_m,
                        w_sub[None, :] * (_MEDOID_RADIUS - D),
                        0.0,
                    ),
                ),
                axis=1,
            )
            better = cand_valid & (dens > density)
            any_better = jnp.any(better)
            j = jnp.argmax(better)
            upto = jnp.where(any_better, j + 1, jnp.sum(cand_valid))
            mark_idx = jnp.where(jnp.arange(C) < upto, cand, Q)
            tried_s = tried_s.at[mark_idx].set(True, mode="drop")
            slot = jnp.where(any_better, cand[j], slot)
            d_jump = jnp.where(iq == cand[j], 0.0, D[j])
            d_s = jnp.where(any_better, d_jump, d_s)
            density = jnp.where(any_better, dens[j], density)
            done = ~any_better
            # drift guard: the NEXT step's candidates sit within
            # _MEDOID_RADIUS of the new medoid and their density balls
            # another _MEDOID_RADIUS out, so the ball stays sufficient only
            # while d(seed, medoid) <= _SUBSET_ABORT
            abort = any_better & (d0_sub[slot] > _SUBSET_ABORT)
            return (
                done, abort, slot, d_s, density, tried_s, key,
                nd + jnp.float32(C) * Q,
                nde + upto.astype(jnp.float32) * N,
            )

        sub_init = (
            no_cand | ~ok,  # overflow: skip straight to the full loop
            False,
            seed_slot,
            d0_sub,
            density0_sub,
            tried0_sub,
            key,
            n_dists,
            n_dists_eff,
        )
        (_s_done, s_abort, slot, _d_s, s_density, tried_s, key, n_dists,
         n_dists_eff) = jax.lax.while_loop(sub_cond, sub_body, sub_init)

        medoid = jnp.where(ok, idx[slot], seed)
        need_full = (s_abort | ~ok) & ~no_cand
        blocks = jnp.zeros(NB, bool).at[
            jnp.where(valid_b, bids, NB)
        ].set(True, mode="drop")
        return (
            medoid, need_full, ok, idx, valid, tried_s, s_density, key,
            n_dists, n_dists_eff, blocks,
        )

    def wander(matrixT, lengths, kept, seed, d0, key, n_dists, n_dists_eff):
        """Hill-climb from `seed` given its distance row `d0`; returns
        (medoid, d, n_dists', n_dists_eff').

        With `use_subset`, the climb first runs inside the seed's gathered
        _SUBSET_RADIUS ball (phase 1, (C,F)x(F,Q) matmuls); it continues in
        the classic full-sweep loop (phase 2) only if the ball overflowed Q
        or the medoid drifted to the ball's safety boundary. Without it,
        each step evaluates all sampled candidates in one (C,F)x(F,N)
        matmul and the jump target's distance row becomes the next medoid's
        distances for free.
        """
        N = matrixT.shape[1]
        iota = jnp.arange(N)
        tried0 = jnp.zeros(N, bool).at[seed].set(True)
        if use_pallas:
            wk = jnp.where(kept, lengths, 0.0)  # kept is frozen per attempt

        def cond(carry):
            return ~carry[0]

        def body(carry):
            _done, medoid, d, density, tried, key, n_dists, n_dists_eff = carry
            key, k1 = jax.random.split(key)
            elig = (d <= _MEDOID_RADIUS) & kept & ~tried & (iota != medoid)
            gumbel = -jnp.log(
                -jnp.log(jax.random.uniform(k1, (N,)) + 1e-20) + 1e-20
            )
            score = jnp.where(elig, gumbel, -jnp.inf)
            if _USE_APPROX_TOPK:
                _, cand = jax.lax.approx_max_k(score, C)
            else:
                _, cand = jax.lax.top_k(score, C)
            cand_valid = elig[cand]

            if use_pallas:
                # One matrix pass, no (C, N) distance matrix in HBM; the
                # kernel's column-id == candidate-id zeroing reproduces the
                # XLA path's explicit self term (w * (r - 0)).
                dens = candidate_density_sweep(matrixT, cand, wk)
            else:
                rows = matrixT[:, cand]  # (F, C)
                D = 0.5 - jnp.einsum(
                    "fc,fn->cn", rows, matrixT, precision=_prec,
                    preferred_element_type=jnp.float32,
                )
                # Self-distance handling without materializing a zeroed copy
                # of the (C, N) matrix: the self column's term is written
                # directly (lengths * (r - 0) ≡ lengths * r, bit-identical),
                # all other columns use the raw distances.
                self_m = iota[None, :] == cand[:, None]
                kept_b = kept[None, :]
                dens = jnp.sum(
                    jnp.where(
                        self_m & kept_b,
                        lengths[None, :] * _MEDOID_RADIUS,
                        jnp.where(
                            (D <= _MEDOID_RADIUS) & kept_b & ~self_m,
                            lengths[None, :] * (_MEDOID_RADIUS - D),
                            0.0,
                        ),
                    ),
                    axis=1,
                )
            better = cand_valid & (dens > density)
            any_better = jnp.any(better)
            j = jnp.argmax(better)
            # mark tried: cand[0..j] on jump, all valid candidates otherwise
            upto = jnp.where(any_better, j + 1, jnp.sum(cand_valid))
            mark_idx = jnp.where(jnp.arange(C) < upto, cand, N)
            tried = tried.at[mark_idx].set(True, mode="drop")

            medoid = jnp.where(any_better, cand[j], medoid)
            if use_pallas:
                # Recompute the (possibly unchanged) medoid's distance row
                # unconditionally — the kernel never materialized the (C, N)
                # matrix to slice, and a lax.cond here costs more in branch
                # result copies than the one extra final-step sweep
                # (measured 0.06 ms/step of cond overhead vs a 0.02-0.19 ms
                # sweep). Recomputing the same medoid's row moves the final
                # d by dot-order ulps vs the carried row — the TPU path's
                # accepted divergence class.
                d = row_sweep(matrixT, medoid)
            else:
                # D rows are raw; the jump target's self-distance is forced
                # to exactly 0 here (the zeroed-copy variant did it
                # matrix-wide)
                d_jump = jnp.where(iota == cand[j], 0.0, D[j])
                d = jnp.where(any_better, d_jump, d)
            density = jnp.where(any_better, dens[j], density)
            done = ~any_better
            # pallas steps recompute the medoid's row (one extra sweep)
            row_extra = jnp.float32(N) if use_pallas else 0.0
            # `upto` is exactly the number of candidates the reference's
            # one-at-a-time sampler would have evaluated this step
            return (
                done, medoid, d, density, tried, key,
                n_dists + C * N + row_extra,
                n_dists_eff + upto.astype(jnp.float32) * N,
            )

        no_cand = jnp.sum(kept & (d0 <= _MEDOID_RADIUS) & ~tried0) == 0
        n_dists_eff = n_dists_eff + N  # the reference computes one matvec per seed

        if not use_subset:
            init = (no_cand, seed, d0, density_of(d0, lengths, kept),
                    tried0, key, n_dists, n_dists_eff)
            out = jax.lax.while_loop(cond, body, init)
            return out[1], out[2], out[6], out[7]

        (medoid, need_full, ok, idx, valid, tried_s, s_density, key,
         n_dists, n_dists_eff, _blocks) = subset_phase1(
            matrixT, lengths, kept, seed, d0, no_cand, key,
            n_dists, n_dists_eff,
        )
        # expand subset state to full space for the (rare) phase-2 loop;
        # the N-sized scatter only runs when that loop actually will
        tried_full = jax.lax.cond(
            need_full & ok,
            lambda: jnp.zeros(N, bool).at[jnp.where(valid, idx, N)].set(
                tried_s, mode="drop"
            ),
            lambda: tried0,
        )
        density_full = jax.lax.cond(
            ok,
            lambda: s_density,
            lambda: density_of(d0, lengths, kept),
        )

        def full_row(m):
            if use_pallas:
                return row_sweep(matrixT, m)
            iota = jnp.arange(matrixT.shape[1])
            if repl_constraint is None:
                col = matrixT[:, m]
            else:
                # one-hot contraction: a dynamic column slice on the
                # sharded dim would all-gather the whole matrix (see
                # sharded_at); this is shard-local + an (F,) all-reduce,
                # bit-exact (single-term sums)
                col = jnp.einsum(
                    "fn,n->f", matrixT, (iota == m).astype(matrixT.dtype),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                ).astype(matrixT.dtype)
            d = 0.5 - jnp.einsum(
                "fn,f->n", matrixT, col, precision=_prec,
                preferred_element_type=jnp.float32,
            )
            return jnp.where(iota == m, 0.0, d)

        d_init = jax.lax.cond(
            need_full & (medoid != seed),
            lambda: full_row(medoid),
            lambda: d0,
        )
        n_dists = n_dists + jnp.where(
            need_full & (medoid != seed), jnp.float32(N), 0.0
        )
        out = jax.lax.while_loop(
            cond,
            body,
            (~need_full, medoid, d_init, density_full, tried_full, key,
             n_dists, n_dists_eff),
        )
        medoid, n_dists, n_dists_eff = out[1], out[6], out[7]
        # Final full distance row (histogram/members need all N distances),
        # recomputed unconditionally: a lax.cond(medoid != seed, sweep, d0)
        # copies its 4 MB branch result, which measures as expensive as the
        # sweep itself (0.17 ms each at 1M). When the medoid never moved
        # this differs from the cached d0 row by dot-order ulps — the
        # subset path's accepted divergence class, mirrored by the oracle.
        # The XLA row comes from the SHARED batched kernel (spec_batch with
        # the medoid broadcast) so classic attempts, speculative lanes and
        # the oracle read bit-identical final rows; pallas keeps the
        # row_sweep kernel (TPU's accepted divergence class).
        if use_pallas:
            d = row_sweep(matrixT, medoid)
            n_dists = n_dists + jnp.float32(N)
        else:
            d = spec_batch(
                matrixT, jnp.full((_SPEC_SEEDS,), medoid, jnp.int32)
            )[0]
            n_dists = n_dists + jnp.float32(_SPEC_SEEDS) * N
        return medoid, d, n_dists, n_dists_eff

    def histogram(d, lengths, kept):
        "Length-weighted 60-bin histogram of kept distances in [0, 0.3]."
        bins = jnp.clip((d / _DELTA_X).astype(jnp.int32), 0, _NBINS - 1)
        w = jnp.where((d >= 0.0) & (d <= _XMAX) & kept, lengths, 0.0)
        if _HIST_MODE == "scatter":
            return jnp.zeros(_NBINS, jnp.float32).at[bins].add(w)
        return jnp.sum(
            jnp.where(
                bins[:, None] == jnp.arange(_NBINS)[None, :], w[:, None], 0.0
            ),
            axis=0,
        )

    def find_threshold(hist, pvr):
        return _find_threshold_device(hist, pvr)

    def win_update(attempts, length, head, successes, pvr, order_pos, success):
        """Success-window step on bare fields (reference cluster.py:386-413,
        with a circular buffer for the deque); shared by the per-attempt
        state update and the speculative-lane acceptance scan. Returns the
        updated fields plus the bump flag."""
        full = length == windowsize
        popped = attempts[head]
        successes = successes - jnp.where(full, popped.astype(jnp.int32), 0)
        head = jnp.where(full, (head + 1) % windowsize, head)
        length = jnp.where(full, length - 1, length)
        attempts = attempts.at[(head + length) % windowsize].set(success)
        length = length + 1
        successes = successes + success.astype(jnp.int32)
        bump = (length == windowsize) & (successes < minsuccesses)
        return (
            attempts,
            jnp.where(bump, 0, length),
            jnp.where(bump, 0, head),
            jnp.where(bump, 0, successes),
            jnp.where(bump, pvr + jnp.float32(0.1), pvr),
            jnp.where(bump, 0, order_pos),
            bump,
        )

    def update_successes(state: _State, success):
        "win_update applied to the engine state."
        attempts, length, head, successes, pvr, order_pos, _bump = win_update(
            state.attempts,
            state.attempts_len,
            state.attempts_head,
            state.successes,
            state.pvr,
            state.order_pos,
            success,
        )
        return state._replace(
            attempts=attempts,
            attempts_len=length,
            attempts_head=head,
            successes=successes,
            pvr=pvr,
            order_pos=order_pos,
        )

    # Batch-local labels ride back to the host as the narrowest dtype that
    # can hold 1..K (0 = not assigned this batch): a 4x smaller transfer
    # than re-pulling the int32 labels array every dispatch.
    if K < 256:
        _delta_dtype = jnp.uint8
    elif K < 32768:
        _delta_dtype = jnp.int16
    else:
        _delta_dtype = jnp.int32

    @partial(jax.jit, donate_argnums=(3,))
    def emit_batch(matrixT, ranks, lengths, state: _State):
        N = matrixT.shape[1]
        first_cid = state.next_cid

        def emit(state: _State, recs: _Records, sel, emitted, medoid, seed, kind, radius, opvr):
            """Write one cluster predicated on `emitted`: mask members,
            assign labels, record metadata. When `emitted` is False every
            field keeps its prior value — this replaces the old
            compute-then-merge pattern, whose jax.tree.map(where) over the
            WHOLE state re-wrote the 32 MB speculative-distance cache and
            every other large array once per attempt."""
            i = recs.n_emitted
            cid = state.next_cid
            sel_eff = sel & emitted
            count = jnp.sum(sel_eff)
            state = state._replace(
                kept=state.kept & ~sel_eff,
                labels=jnp.where(sel_eff, cid, state.labels),
                n_remaining=state.n_remaining - count,
                next_cid=cid + emitted.astype(jnp.int32),
            )
            step = emitted.astype(jnp.int32)

            def w(arr, val):
                return arr.at[i].set(jnp.where(emitted, val, arr[i]))

            recs = _Records(
                medoid=w(recs.medoid, medoid),
                seed=w(recs.seed, seed),
                kind=w(recs.kind, kind),
                radius=w(recs.radius, radius),
                observed_pvr=w(recs.observed_pvr, opvr),
                pvr=w(recs.pvr, state.pvr),
                successes=w(recs.successes, state.successes),
                attempts=w(recs.attempts, state.attempts_len),
                n_emitted=i + step,
            )
            return state, recs

        def attempt(carry):
            "One seed -> wander -> threshold -> (emit | reject) round."
            state, recs = carry

            # Slot-based seed scan: cached slots are the true scan sequence
            # from the fill position (next_seeds_batch computed them with
            # the scan itself), points are only ever removed, and order_pos
            # moves only by slot consumption (a pvr bump resets it AND
            # forces a refill via spec_next), so the first ALIVE slot at or
            # after spec_next is exactly the seed the O(N) rank scan would
            # find — three full-length reductions per attempt replaced by
            # an 8-element test. On exhaustion, refill from order_pos with
            # the true scan (slot 0 = this attempt's seed).
            def alive_slots(st):
                seeds_c = st.spec_seeds
                safe = jnp.where(seeds_c >= 0, seeds_c, 0)
                return (
                    (jnp.arange(_SPEC_SEEDS) >= st.spec_next)
                    & (seeds_c >= 0)
                    & sharded_at_vec(st.kept, safe)
                )

            def refill(st):
                seeds = next_seeds_batch(st.kept, ranks, st.order_pos)
                return st._replace(
                    spec_seeds=seeds,
                    spec_d=spec_batch(matrixT, seeds),
                    spec_next=jnp.int32(0),
                    n_dists=st.n_dists + jnp.float32(_SPEC_SEEDS) * N,
                )

            state = jax.lax.cond(
                jnp.any(alive_slots(state)), lambda st: st, refill, state
            )
            slot = jnp.argmax(alive_slots(state)).astype(jnp.int32)
            seed = state.spec_seeds[slot]
            seed_rank = sharded_at(ranks, seed)
            # read the slot's row as a one-hot masked sum: a dynamic slice
            # along the sublane axis of the (S, N) cache costs a full
            # shuffle pass (~1 ms at 1M); the masked sum streams the cache
            # once and adds only zeros to the selected row (bit-exact).
            onehot = jnp.arange(_SPEC_SEEDS) == slot
            d0 = jnp.sum(
                jnp.where(onehot[:, None], state.spec_d, 0.0), axis=0
            )
            state = state._replace(
                order_pos=seed_rank + 1, spec_next=slot + 1
            )

            # Loner-seed marker for the burst extension below: the seed has
            # NO other kept point within the medoid radius, so this attempt
            # is fully determined (wander is a no-op, the cluster is a
            # loner, no pvr/histogram effects).
            seed_is_loner = jnp.sum((d0 <= _MEDOID_RADIUS) & state.kept) == 1
            slot0 = slot

            def flags_of(st):
                # a cached row's distances never change; kept-masked
                # neighbor counts decide loner-ness per slot
                return (
                    jnp.sum(
                        (st.spec_d <= _MEDOID_RADIUS) & st.kept[None, :],
                        axis=1,
                    )
                    == 1
                )

            def burst_extension(state, recs):
                """Emit the consecutive cached seeds after a loner seed.

                Because a loner has no neighbor within the radius, removing
                it cannot change any other point's neighborhood, so cached
                seeds that are loners can all be emitted right away,
                emission-identical to sequential play (the parity oracle
                asserts this), with the RNG key advanced once per emitted
                loner exactly as the per-attempt splits would. This runs as
                a plain while loop appended to every attempt — branching
                instead (lax.cond) costs more in branch-result copies per
                attempt than the loop's zero-iteration case — and turns the
                loner-dominated tail from one full iteration per point into
                up to _SPEC_SEEDS emits per iteration.
                """

                def consume(state, recs, flags, slot_start):
                    """Emit loner/dead slots from slot_start until a stop.

                    All S slots decided at once with prefix logic
                    (bit-equivalent to the sequential walk: a slot is
                    reached iff every in-range slot before it emitted or
                    was dead, and capacity blocks everything after). The
                    old per-slot fori_loop sequenced ~80 tiny device ops
                    per burst of 8, which dominated the loner-tail regime.
                    """

                    s_arr = jnp.arange(_SPEC_SEEDS)
                    seeds = state.spec_seeds
                    in_range = s_arr >= slot_start
                    safe_seed = jnp.where(seeds >= 0, seeds, 0)
                    # Near the end of a run the seed scan wraps and the
                    # cache holds the same seed in several slots. Within
                    # THIS consume call, a repeat is dead exactly when an
                    # earlier IN-RANGE duplicate exists: if that one emits,
                    # the point is gone by the time the walk reaches the
                    # repeat; if it stops the chain, the repeat is never
                    # reached (marking it dead is then harmless). A
                    # duplicate whose earlier occurrence sits BEFORE
                    # slot_start (served to a prior attempt that may have
                    # rejected, leaving the point kept) must NOT be
                    # masked — the sequential walk re-examines live kept[]
                    # there, and so does `alive` below.
                    is_dup = jnp.any(
                        (seeds[:, None] == seeds[None, :])
                        & (s_arr[None, :] < s_arr[:, None])
                        & (s_arr[None, :] >= slot_start),
                        axis=1,
                    )
                    alive = (seeds >= 0) & sharded_at_vec(state.kept, safe_seed) & ~is_dup
                    # slot lets the walk continue: emit (alive loner) or
                    # skip (dead); an alive non-loner stops it
                    ok = jnp.where(in_range, jnp.where(alive, flags, True), True)
                    reached = jnp.concatenate(
                        [jnp.ones(1, bool), jnp.cumprod(ok)[:-1].astype(bool)]
                    )
                    emit_try = in_range & alive & flags & reached
                    rank = jnp.cumsum(emit_try) - emit_try
                    capacity = K - recs.n_emitted
                    emit = emit_try & (rank < capacity)
                    count = jnp.sum(emit)
                    # sequential cont survives the batch iff no stop and no
                    # capacity block occurred
                    cont = jnp.all(ok) & (count == jnp.sum(emit_try))

                    scatter_at = jnp.where(emit, seeds, N)
                    cids = state.next_cid + rank.astype(jnp.int32)
                    # key chain: one split per emitted loner, exactly the
                    # sequential per-attempt splits
                    def key_step(key, e):
                        return jnp.where(e, jax.random.split(key)[0], key), None
                    new_key, _ = jax.lax.scan(key_step, state.key, emit)
                    last_slot = (
                        _SPEC_SEEDS - 1 - jnp.argmax(emit[::-1])
                    )
                    any_emit = count > 0
                    countf = count.astype(jnp.float32)
                    state = state._replace(
                        kept=state.kept.at[scatter_at].set(False, mode="drop"),
                        labels=state.labels.at[scatter_at].set(
                            cids, mode="drop"
                        ),
                        n_remaining=state.n_remaining - count,
                        next_cid=state.next_cid + count,
                        order_pos=jnp.where(
                            any_emit,
                            sharded_at(ranks, safe_seed[last_slot]) + 1,
                            state.order_pos,
                        ),
                        key=new_key,
                        # mirror the sequential loner attempt's accounting:
                        # one seed sweep (effective) + one histogram pass
                        n_dists=state.n_dists + countf * N,
                        n_dists_eff=state.n_dists_eff + countf * N,
                    )
                    rec_pos = jnp.where(emit, recs.n_emitted + rank, K)

                    def w(arr, vals):
                        return arr.at[rec_pos].set(vals, mode="drop")

                    ones = jnp.ones(_SPEC_SEEDS)
                    recs = _Records(
                        medoid=w(recs.medoid, seeds),
                        seed=w(recs.seed, seeds),
                        kind=w(recs.kind, jnp.full(_SPEC_SEEDS, _KIND_LONER, jnp.int32)),
                        radius=w(recs.radius, ones * jnp.nan),
                        observed_pvr=w(recs.observed_pvr, ones * jnp.nan),
                        pvr=w(recs.pvr, ones * state.pvr),
                        successes=w(recs.successes, jnp.full(_SPEC_SEEDS, 1, jnp.int32) * state.successes),
                        attempts=w(recs.attempts, jnp.full(_SPEC_SEEDS, 1, jnp.int32) * state.attempts_len),
                        n_emitted=recs.n_emitted + count,
                    )
                    return state, recs, cont

                # Outer loop: when every remaining slot was consumed as a
                # loner (or dead), refill the cache — exactly what the next
                # sequential attempt's miss would do, at the same order_pos
                # and with no RNG consumption — and keep bursting. One
                # matmul + one flags pass per _SPEC_SEEDS loners drains a
                # loner-dominated tail at full speed.
                def outer_cond(c):
                    state, recs, _flags, _start, cont = c
                    return cont & (recs.n_emitted < K) & (state.n_remaining > 0)

                def outer_body(c):
                    state, recs, flags, slot_start, _cont = c
                    state, recs, cont = consume(state, recs, flags, slot_start)
                    keep_going = (
                        cont & (recs.n_emitted < K) & (state.n_remaining > 0)
                    )
                    state = jax.lax.cond(
                        keep_going, refill, lambda st: st, state
                    )
                    return state, recs, flags_of(state), jnp.int32(0), keep_going

                ext0 = (
                    seed_is_loner
                    & (recs.n_emitted < K)
                    & (state.n_remaining > 0)
                )
                state, recs, _, _, _ = jax.lax.while_loop(
                    outer_cond,
                    outer_body,
                    (state, recs, flags_of(state), slot0 + 1, ext0),
                )
                return state, recs

            def normal_attempt(state, recs):
                key, sub = jax.random.split(state.key)
                state = state._replace(key=key)
                medoid, d, n_dists, n_dists_eff = wander(
                    matrixT, lengths, state.kept, seed, d0, sub,
                    state.n_dists, state.n_dists_eff,
                )
                # histogram pass reuses the wander distances in the
                # reference, so only raw count includes it
                state = state._replace(
                    n_dists=n_dists + N, n_dists_eff=n_dists_eff
                )

                n_close = jnp.sum((d < _MEDOID_RADIUS) & state.kept)
                hist = histogram(d, lengths, state.kept)
                thr, opvr, found = find_threshold(hist, state.pvr)

                is_loner = n_close == 1
                is_normal = (~is_loner) & found
                is_fallback = (~is_loner) & (~found) & (state.pvr > 0.55)
                is_reject = (~is_loner) & (~found) & (state.pvr <= 0.55)

                sel_loner = (jnp.arange(N) == medoid) & state.kept
                radius = jnp.where(
                    is_normal, thr, jnp.where(is_fallback, _DEFAULT_RADIUS, jnp.nan)
                )
                sel_thr = (d <= jnp.where(jnp.isnan(radius), -1.0, radius)) & state.kept
                sel = jnp.where(is_loner, sel_loner, sel_thr)
                emitted = ~is_reject

                # success accounting BEFORE recording (reference emits the
                # then-current successes/attempts into the Cluster record,
                # but updates the window before returning for normal
                # clusters at :599-600 -> actually after constructing the
                # record; we record pre-update values to match :589-598)
                state, recs = emit(
                    state,
                    recs,
                    sel,
                    emitted,
                    medoid,
                    seed,
                    jnp.where(
                        is_loner,
                        _KIND_LONER,
                        jnp.where(is_fallback, _KIND_FALLBACK, _KIND_NORMAL),
                    ),
                    radius,
                    jnp.where(is_normal, opvr, jnp.nan),
                )

                # pvr feedback: False on reject; True on normal emit while
                # pvr<0.55. update_successes only touches the success-window
                # fields, so only those are merged (never the big arrays).
                do_update = is_reject | (is_normal & (state.pvr < 0.55))
                upd_state = update_successes(state, is_normal & (state.pvr < 0.55))
                # a bump (attempts_len cleared to 0) resets order_pos to 0,
                # breaking the slot-scan invariant — force a refill
                bumped = do_update & (upd_state.attempts_len == 0)
                state = state._replace(
                    attempts=jnp.where(do_update, upd_state.attempts, state.attempts),
                    attempts_len=jnp.where(do_update, upd_state.attempts_len, state.attempts_len),
                    attempts_head=jnp.where(do_update, upd_state.attempts_head, state.attempts_head),
                    successes=jnp.where(do_update, upd_state.successes, state.successes),
                    pvr=jnp.where(do_update, upd_state.pvr, state.pvr),
                    order_pos=jnp.where(do_update, upd_state.order_pos, state.order_pos),
                    spec_next=jnp.where(
                        bumped, jnp.int32(_SPEC_SEEDS), state.spec_next
                    ),
                )
                return state, recs

            def lanes_extension(state, recs):
                """Speculative attempt lanes: after the exact attempt above,
                evaluate the REMAINING alive speculative-cache slots as
                independent attempts against the current state, then admit a
                sequential prefix of them whose computations provably equal
                sequential play (docs/engine_roadmap.md design).

                Soundness: lane s's entire computation depends on the kept
                mask only inside region_s = (its gathered ball blocks) ∪
                {d_s <= 0.3}: the no-candidate test and the climb see kept
                only through the gathered blocks, and the histogram, member
                selection, and loner count all gate on d_s <= XMAX (the
                negative-d corner included, since negatives pass <=). A
                sequential acceptance scan therefore admits lane s only
                while (a) no earlier-admitted lane removed a point in
                region_s — including lane s's own seed, which always lies
                within region_s because the drift guard bounds
                d(seed, medoid) <= _SUBSET_ABORT < XMAX; (b) no earlier
                lane bumped the pvr (which would reseat seed order and the
                threshold rule); (c) lane s completed inside the subset
                (full-sweep fallbacks rerun exactly as the next classic
                attempt); (d) capacity and remaining-point gates that end
                the sequential loop have not fired. Any admissible prefix
                is emission-identical to sequential play; a cut merely
                defers the lane, which then recomputes from live state.

                RNG: the key chain advances exactly once per PROCESSED
                attempt (reject or emit), so lane keys are the precomputed
                chain links in alive-slot order and a cut consumes nothing
                — identical to the sequential splits.

                Loner lanes are processed inline (one chain split per
                emitted loner, exactly the burst extension's accounting);
                slot exhaustion simply ends the batch — the next classic
                iteration refills, as sequential play would.

                Numerics are the classic path's own: per-lane climbs replay
                subset_phase1 with the lane's chain key, per-lane histogram
                and threshold scans run on (N,)/(60,) shapes identical to
                the classic attempt, and the batched final rows share the
                spec_batch expression whose rows the classic path and the
                oracle read (composition-independence pinned in
                tests/test_cluster.py). The sequential oracle therefore
                needs NO batching awareness: these lanes are pinned by the
                existing emission-parity suite with attempt batching on.
                """
                N = matrixT.shape[1]
                s_arr = jnp.arange(_SPEC_SEEDS)

                def l_pred(state, recs):
                    seeds = state.spec_seeds
                    safe = jnp.where(seeds >= 0, seeds, 0)
                    return (
                        jnp.any(
                            (s_arr >= state.spec_next)
                            & (seeds >= 0)
                            & sharded_at_vec(state.kept, safe)
                        )
                        & (recs.n_emitted < K)
                        & (state.n_remaining > 0)
                    )

                def run_once(carry):
                    state, recs, _flag = carry
                    seeds = state.spec_seeds
                    safe = jnp.where(seeds >= 0, seeds, 0)
                    alive = (
                        (s_arr >= state.spec_next)
                        & (seeds >= 0)
                        & sharded_at_vec(state.kept, safe)
                    )
                    ranks_at = sharded_at_vec(ranks, safe)

                    # chain links: one split per processed attempt
                    def chain(k, _):
                        k2 = jax.random.split(k)
                        return k2[0], (k2[0], k2[1])

                    _, (keys_after, subs) = jax.lax.scan(
                        chain, state.key, None, length=_SPEC_SEEDS
                    )
                    key_rank = jnp.clip(
                        jnp.cumsum(alive) - 1, 0, _SPEC_SEEDS - 1
                    )
                    lane_sub = subs[key_rank]

                    # ---- lane climbs against the current (frozen) state --
                    def climb(_, xs):
                        al, seed, d0, sub = xs
                        seed = jnp.where(al, seed, jnp.int32(0))
                        d0 = jnp.where(al, d0, jnp.inf)
                        iota = jnp.arange(N)
                        tried0 = iota == seed
                        no_cand = (
                            jnp.sum(
                                state.kept & (d0 <= _MEDOID_RADIUS) & ~tried0
                            )
                            == 0
                        ) | ~al
                        (medoid, need_full, _ok, _idx, _valid, _tried,
                         _dens, _key, nd, nde, blocks) = subset_phase1(
                            matrixT, lengths, state.kept, seed, d0, no_cand,
                            sub, jnp.float32(0), jnp.float32(N),
                        )
                        return None, (medoid, need_full, nd, nde, blocks)

                    _, (medoids, need_full, nd_l, nde_l, blocks) = (
                        jax.lax.scan(
                            climb, None,
                            (alive, seeds, state.spec_d, lane_sub),
                        )
                    )

                    # ---- batched final rows + per-lane decisions ---------
                    rows8 = spec_batch(matrixT, medoids)  # (S, N)

                    def decide(_, d):
                        n_close = jnp.sum((d < _MEDOID_RADIUS) & state.kept)
                        hist = histogram(d, lengths, state.kept)
                        thr, opvr, found = find_threshold(hist, state.pvr)
                        return None, (n_close, thr, opvr, found)

                    _, (n_close_l, thr_l, opvr_l, found_l) = jax.lax.scan(
                        decide, None, rows8
                    )
                    is_loner_l = n_close_l == 1
                    is_normal_l = ~is_loner_l & found_l
                    is_fallback_l = ~is_loner_l & ~found_l & (state.pvr > 0.55)
                    is_reject_l = ~is_loner_l & ~found_l & (state.pvr <= 0.55)
                    radius_l = jnp.where(
                        is_normal_l,
                        thr_l,
                        jnp.where(is_fallback_l, _DEFAULT_RADIUS, jnp.nan),
                    )
                    iota = jnp.arange(N)
                    sel = (
                        jnp.where(
                            is_loner_l[:, None],
                            iota[None, :] == medoids[:, None],
                            rows8
                            <= jnp.where(
                                jnp.isnan(radius_l), -1.0, radius_l
                            )[:, None],
                        )
                        & state.kept[None, :]
                    )
                    sel_counts = jnp.sum(sel, axis=1)
                    region = (rows8 <= _XMAX) | jnp.repeat(
                        blocks, _SUBSET_BLOCK, axis=1
                    )
                    # pairwise emit-vs-region conflicts in one small matmul
                    M = (
                        jnp.einsum(
                            "kn,sn->ks",
                            sel.astype(jnp.float32),
                            region.astype(jnp.float32),
                        )
                        > 0.0
                    )

                    # ---- sequential acceptance scan (unrolled) -----------
                    att = state.attempts
                    alen = state.attempts_len
                    ahead = state.attempts_head
                    succ = state.successes
                    pvr0 = state.pvr
                    pvr_r = state.pvr
                    base = recs.n_emitted
                    n_em = recs.n_emitted
                    n_rem = state.n_remaining
                    order_pos_r = state.order_pos
                    spec_next_r = state.spec_next
                    go = jnp.bool_(True)
                    emit_mask = jnp.zeros(_SPEC_SEEDS, bool)
                    proc_mask = jnp.zeros(_SPEC_SEEDS, bool)
                    emit_pos = jnp.zeros(_SPEC_SEEDS, jnp.int32)
                    succ_rec = jnp.zeros(_SPEC_SEEDS, jnp.int32)
                    att_rec = jnp.zeros(_SPEC_SEEDS, jnp.int32)
                    proc_count = jnp.int32(0)
                    for s in range(_SPEC_SEEDS):
                        conflict = jnp.any(emit_mask & M[:, s])
                        can = (
                            go
                            & alive[s]
                            & ~conflict
                            & ~need_full[s]
                            & (n_em < K)
                            & (n_rem > 0)
                        )
                        # a reachable lane that can't run cuts the batch
                        go = go & (~alive[s] | can)
                        emit_s = can & (
                            is_loner_l[s] | is_normal_l[s] | is_fallback_l[s]
                        )
                        succ_rec = succ_rec.at[s].set(succ)
                        att_rec = att_rec.at[s].set(alen)
                        emit_pos = emit_pos.at[s].set(n_em)
                        emit_mask = emit_mask.at[s].set(emit_s)
                        proc_mask = proc_mask.at[s].set(can)
                        proc_count = proc_count + can.astype(jnp.int32)
                        n_em = n_em + emit_s.astype(jnp.int32)
                        n_rem = n_rem - jnp.where(emit_s, sel_counts[s], 0)
                        op_here = jnp.where(
                            can, ranks_at[s] + 1, order_pos_r
                        )
                        do_upd = can & (
                            is_reject_l[s]
                            | (is_normal_l[s] & (pvr0 < 0.55))
                        )
                        (att2, alen2, ahead2, succ2, pvr2, op2, bump) = (
                            win_update(
                                att, alen, ahead, succ, pvr0, op_here,
                                is_normal_l[s] & (pvr0 < 0.55),
                            )
                        )
                        bumped = do_upd & bump
                        att = jnp.where(do_upd, att2, att)
                        alen = jnp.where(do_upd, alen2, alen)
                        ahead = jnp.where(do_upd, ahead2, ahead)
                        succ = jnp.where(do_upd, succ2, succ)
                        pvr_r = jnp.where(bumped, pvr2, pvr_r)
                        order_pos_r = jnp.where(
                            can, jnp.where(bumped, op2, op_here), order_pos_r
                        )
                        spec_next_r = jnp.where(
                            can,
                            jnp.where(
                                bumped, jnp.int32(_SPEC_SEEDS), jnp.int32(s + 1)
                            ),
                            spec_next_r,
                        )
                        go = go & ~bumped

                    # ---- apply the admitted prefix -----------------------
                    cid_l = state.next_cid + (emit_pos - base)
                    lab_sel = emit_mask[:, None] & sel
                    lab_val = jnp.max(
                        jnp.where(lab_sel, cid_l[:, None], -1), axis=0
                    )
                    key_new = jnp.where(
                        proc_count > 0,
                        keys_after[
                            jnp.clip(proc_count - 1, 0, _SPEC_SEEDS - 1)
                        ],
                        state.key,
                    )
                    state = state._replace(
                        kept=state.kept & ~jnp.any(lab_sel, axis=0),
                        labels=jnp.where(lab_val >= 0, lab_val, state.labels),
                        n_remaining=n_rem,
                        next_cid=state.next_cid + (n_em - base),
                        order_pos=order_pos_r,
                        spec_next=spec_next_r,
                        key=key_new,
                        attempts=att,
                        attempts_len=alen,
                        attempts_head=ahead,
                        successes=succ,
                        pvr=pvr_r,
                        # raw counts the work actually done (all lanes'
                        # climbs, the 8-row final matmul and 8 histograms);
                        # effective counts only processed lanes — what the
                        # reference's sequential loop would have computed
                        n_dists=state.n_dists
                        + jnp.sum(nd_l)
                        + jnp.float32(2 * _SPEC_SEEDS) * N,
                        n_dists_eff=state.n_dists_eff
                        + jnp.sum(jnp.where(proc_mask, nde_l, 0.0)),
                    )
                    rec_pos = jnp.where(emit_mask, emit_pos, K)

                    def w(arr, vals):
                        return arr.at[rec_pos].set(vals, mode="drop")

                    recs = _Records(
                        medoid=w(recs.medoid, medoids),
                        seed=w(recs.seed, seeds),
                        kind=w(
                            recs.kind,
                            jnp.where(
                                is_loner_l,
                                _KIND_LONER,
                                jnp.where(
                                    is_fallback_l, _KIND_FALLBACK, _KIND_NORMAL
                                ),
                            ).astype(jnp.int32),
                        ),
                        radius=w(recs.radius, radius_l),
                        observed_pvr=w(
                            recs.observed_pvr,
                            jnp.where(is_normal_l, opvr_l, jnp.nan),
                        ),
                        pvr=w(recs.pvr, jnp.full(_SPEC_SEEDS, pvr0)),
                        successes=w(recs.successes, succ_rec),
                        attempts=w(recs.attempts, att_rec),
                        n_emitted=n_em,
                    )
                    return state, recs, jnp.bool_(False)

                # one-shot while loop: zero-cost skip when no lanes remain
                # (a lax.cond would copy the large state arrays per branch)
                state, recs, _ = jax.lax.while_loop(
                    lambda c: c[2],
                    run_once,
                    (state, recs, l_pred(state, recs)),
                )
                return state, recs

            # A loner seed flows through the normal attempt unchanged (its
            # wander has zero iterations and it emits as a loner); the
            # extension then drains any further consecutive cached loners,
            # and the speculative lanes batch whatever alive slots remain.
            state, recs = normal_attempt(state, recs)
            state, recs = burst_extension(state, recs)
            if use_lanes:
                state, recs = lanes_extension(state, recs)
            return state, recs

        def cond(carry):
            state, recs = carry
            return (recs.n_emitted < K) & (state.n_remaining > 0)

        recs0 = _Records(
            medoid=jnp.zeros(K, jnp.int32),
            seed=jnp.zeros(K, jnp.int32),
            kind=jnp.zeros(K, jnp.int32),
            radius=jnp.zeros(K, jnp.float32),
            observed_pvr=jnp.zeros(K, jnp.float32),
            pvr=jnp.zeros(K, jnp.float32),
            successes=jnp.zeros(K, jnp.int32),
            attempts=jnp.zeros(K, jnp.int32),
            n_emitted=jnp.int32(0),
        )
        state, recs = jax.lax.while_loop(cond, attempt, (state, recs0))
        # Pack the per-cluster records into exactly two host transfers (the
        # tunnel's per-transfer round trip dwarfs the bytes: 8 tiny pulls
        # cost ~8x one) plus the compact batch-local label delta.
        ints = jnp.concatenate(
            [
                recs.medoid,
                recs.seed,
                recs.kind,
                recs.successes,
                recs.attempts,
                recs.n_emitted[None],
            ]
        )
        # Distance counters and the post-batch pvr ride along so the
        # host-side properties reflect exactly the decoded batches (and
        # never force a device sync).
        flts = jnp.concatenate(
            [
                recs.radius,
                recs.observed_pvr,
                recs.pvr,
                state.n_dists[None],
                state.n_dists_eff[None],
                state.pvr[None],
            ]
        )
        delta = jnp.where(
            state.labels >= first_cid, state.labels - first_cid + 1, 0
        ).astype(_delta_dtype)
        if replicate_outputs is not None:
            # Multi-host: the host decode loop runs on EVERY process (it
            # drives the global-mesh device programs), so each must fetch
            # these three arrays — force-replicate them on device so the
            # all-gather rides ICI/DCN once instead of failing as a
            # non-addressable fetch.
            ints = jax.lax.with_sharding_constraint(ints, replicate_outputs)
            flts = jax.lax.with_sharding_constraint(flts, replicate_outputs)
            delta = jax.lax.with_sharding_constraint(delta, replicate_outputs)
        return state, ints, flts, delta

    return emit_batch


@jax.jit
def _compact_arrays(matrixT, ranks, lengths, state: _State, idx2old, valid):
    """Gather the surviving columns into a smaller buffer (device-side).

    `idx2old[i]` is the old column of new column i; `valid` masks the new
    padding tail. Seed ranks are sparse global values that travel with
    their columns, so `order_pos` (a rank threshold, not an index) needs
    no remapping. The speculative seed cache is invalidated (exact-id
    matching makes that decision-neutral). The reference shrinks its
    matrix the same way — CPU-mode row packing, vamb/cluster.py:318-335.
    """
    mT2 = jnp.take(matrixT, idx2old, axis=1)
    new_pad = idx2old.shape[0]
    ranks2 = jnp.where(
        valid,
        ranks[idx2old],
        jnp.arange(new_pad, dtype=jnp.int32) + RANK_PAD_BASE,
    )
    lengths2 = jnp.where(valid, lengths[idx2old], 0.0)
    kept2 = jnp.where(valid, state.kept[idx2old], False)
    labels2 = jnp.where(valid, state.labels[idx2old], -1)
    state2 = state._replace(
        kept=kept2,
        labels=labels2,
        spec_seeds=jnp.full((_SPEC_SEEDS,), -1, jnp.int32),
        spec_d=jnp.zeros((_SPEC_SEEDS, new_pad), jnp.float32),
        spec_next=jnp.int32(0),
    )
    return mT2, ranks2, lengths2, state2


# Process-level cache of AOT-compiled emit programs, keyed by every static
# program input (see ClusterGenerator._exec_cache_key): repeat generators
# of the same geometry become trace-free. FIFO-bounded so long-lived
# processes clustering many distinct sizes (test sessions, services) don't
# accumulate executables without limit (~5 ladder entries per run).
_EXEC_CACHE: dict = {}
_EXEC_CACHE_MAX = 48


def _exec_cache_put(key, compiled) -> None:
    if len(_EXEC_CACHE) >= _EXEC_CACHE_MAX:
        _EXEC_CACHE.pop(next(iter(_EXEC_CACHE)))
    _EXEC_CACHE[key] = compiled


# ------------------------------------------------------------- host wrapper


class ClusterGenerator:
    """Iterative medoid cluster generator. Iterate to get `Cluster`s.

    Inputs mirror the reference (cluster.py:122-133):
        matrix: (obs x features) float32 latent matrix
        lengths: contig lengths (density/histogram weights)
        maxsteps: candidates sampled per medoid-wander step [25]
        windowsize: window length for success counting [300]
        minsuccesses: min successes per window before pvr bump [15]
        destroy: normalize `matrix` in place to save memory
        normalized: matrix is already normalized
        rng_seed: seed for the candidate-sampling RNG
        mesh: optional 1-D jax Mesh to row-shard the engine over
        batch_clusters: clusters emitted per device dispatch [1024]
        compact: shrink the device matrix as points are clustered (see below)
        compact_min_pad: never compact below this padded column count
        compact_async: pre-compile smaller-size programs on a background
            thread so compaction never stalls the dispatch loop
        attempt_batch: "auto"/"on"/"off" — speculative attempt lanes: after
            each exact attempt, the remaining alive speculative-cache slots
            are evaluated as independent attempts in one device iteration
            (batched final-row matmul, per-lane climbs) and a provably
            sequential-equivalent prefix is admitted (see lanes_extension).
            Rides the subset wander path; "auto" enables it wherever subset
            wander is active

    Compaction: every sweep streams the full padded matrix, so once most
    points are clustered the engine pays for dead columns. When the
    survivor count falls to half the live padded size (and stays above
    `compact_min_pad`), surviving columns are gathered into a buffer of
    half the size (the reference's CPU mode packs rows identically,
    vamb/cluster.py:318-335). Candidate sampling draws one uniform per
    column, so compaction — like the reference's pack-vs-mask mode choice —
    re-seats the RNG stream: results stay deterministic for a given
    dataset but differ from a compaction-free run. Cluster *quality* is
    unaffected (the sampler is a hill-climb heuristic); the parity oracles
    run below the size floor and are unaffected.
    """

    def __init__(
        self,
        matrix: np.ndarray,
        lengths: np.ndarray,
        maxsteps: int = 25,
        windowsize: int = 300,
        minsuccesses: int = 15,
        destroy: bool = False,
        normalized: bool = False,
        rng_seed: int = 0,
        mesh=None,
        batch_clusters: int = _DEFAULT_BATCH,
        distance_dtype: str = "float32",
        compact: bool = True,
        compact_min_pad: int = 1 << 16,
        compact_async: bool = True,
        wander_kernel: str = "auto",
        wander_scope: str = "auto",
        attempt_batch: str = "auto",
    ):
        if matrix.dtype != np.float32:
            raise ValueError("Matrix must be of dtype float32")
        if maxsteps < 1:
            raise ValueError(f"maxsteps must be a positive integer, not {maxsteps}")
        if windowsize < 1:
            raise ValueError(f"windowsize must be at least 1, not {windowsize}")
        if minsuccesses < 1 or minsuccesses > windowsize:
            raise ValueError(
                f"minsuccesses must be between 1 and windowsize, not {minsuccesses}"
            )
        if len(matrix) < 1:
            raise ValueError("Matrix must have at least 1 observation.")
        if len(lengths) != len(matrix):
            raise ValueError("N sequences in lengths and matrix do not match")

        if not normalized:
            matrix = normalize(matrix, inplace=destroy)

        if distance_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"distance_dtype must be float32/bfloat16, not {distance_dtype}")
        ddtype = jnp.bfloat16 if distance_dtype == "bfloat16" else jnp.float32
        if wander_kernel not in ("auto", "pallas", "xla"):
            raise ValueError(f"wander_kernel must be auto/pallas/xla, not {wander_kernel}")

        n, f = matrix.shape
        # Pallas wander path: TPU-only (CPU — where the parity oracles run —
        # and sharded meshes keep the XLA expressions; see
        # ops/pallas_cluster.py). "auto" also requires a matrix large enough
        # for the kernels' per-pass savings to beat their fixed overhead.
        if wander_kernel == "pallas":
            # forcing the kernels must honor the same constraints "auto"
            # checks — otherwise failures surface as opaque lowering errors
            problems = []
            if jax.default_backend() != "tpu":
                problems.append("requires a TPU backend")
            if mesh is not None:
                problems.append("does not support a sharded mesh")
            if ddtype != jnp.float32:
                problems.append("requires float32 distances")
            if maxsteps > 32:
                problems.append("requires maxsteps <= 32")
            if problems:
                raise ValueError(
                    "wander_kernel='pallas' " + "; ".join(problems)
                )
        use_pallas = wander_kernel == "pallas" or (
            wander_kernel == "auto"
            and jax.default_backend() == "tpu"
            and mesh is None
            and ddtype == jnp.float32
            and n >= (1 << 16)
            and maxsteps <= 32  # the candidate kernel's row-padding limit
        )
        # Neighborhood-subset wander (see _make_emit_batch): the dominant
        # large-N fast path on any backend, including sharded meshes (the
        # ball replicates via one-hot block matmuls — Q-sized collectives
        # only); bf16 distance mode keeps the classic path (subset gathers
        # and matmuls are written f32).
        if wander_scope not in ("auto", "subset", "full"):
            raise ValueError(
                f"wander_scope must be auto/subset/full, not {wander_scope}"
            )
        if wander_scope == "subset" and ddtype != jnp.float32:
            raise ValueError("wander_scope='subset' requires float32 distances")
        col_tile = _LANES * (mesh.devices.size if mesh is not None else 1)
        if use_pallas:
            # the kernels' (tile//128, 128) output blocks need tile >= 1024;
            # padding every (ladder) size to a 32768 multiple guarantees
            # power-of-two tiles up to the VMEM budget (<= 3.2% waste)
            col_tile = max(col_tile, 32768)
        n_pad = _pad_to(n, col_tile)
        f_pad = _pad_to(f, _SUBLANES)
        # Columns live in the geometry-local engine order (see
        # engine_order); the reference's descending-length SEED order is
        # carried by the constant `ranks` array consumed by the on-device
        # seed scan (reference seeds in length order, :275). Outputs map
        # back through `_order` on the host.
        order, ranks_np = engine_order(matrix, lengths, rng_seed)
        padded_t = np.zeros((f_pad, n_pad), np.float32)
        padded_t[:f, :n] = matrix.T[:, order]
        ranks_pad = np.arange(n_pad, dtype=np.int32) + np.int32(RANK_PAD_BASE)
        ranks_pad[:n] = ranks_np

        use_subset = wander_scope == "subset" or (
            wander_scope == "auto"
            and ddtype == jnp.float32
            and n_pad >= _SUBSET_AUTO_MIN
        )
        self._use_subset = use_subset
        self._subset_q = min(_SUBSET_Q, n_pad)
        # Speculative attempt lanes ride the subset machinery (their
        # conflict regions are built from the gathered ball blocks), so
        # they activate exactly where subset wander does.
        if attempt_batch not in ("auto", "on", "off"):
            raise ValueError(
                f"attempt_batch must be auto/on/off, not {attempt_batch}"
            )
        if attempt_batch == "on" and not use_subset:
            raise ValueError(
                "attempt_batch='on' requires the subset wander path "
                "(wander_scope 'subset', or 'auto' above the size floor "
                "on a single f32 device)"
            )
        self._attempt_batch = attempt_batch

        if mesh is None:
            put_cols = jnp.asarray
            put_rows = jnp.asarray
            put_repl = jnp.asarray
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            put_cols = lambda a: jax.device_put(  # noqa: E731
                a, NamedSharding(mesh, P(None, axis))
            )
            put_rows = lambda a: jax.device_put(  # noqa: E731
                a, NamedSharding(mesh, P(axis))
            )
            put_repl = lambda a: jax.device_put(a, NamedSharding(mesh, P()))  # noqa: E731

        self.n_points = n
        self.maxsteps = maxsteps
        self.minsuccesses = minsuccesses
        self.peak_valley_ratio = 0.1  # mirrors device state, for reporting
        self.matrixT = put_cols(padded_t.astype(ddtype))
        self.ranks = put_rows(ranks_pad)
        self.lengths = put_rows(
            np.pad(lengths.astype(np.float32)[order], (0, n_pad - n))
        )
        kept = np.zeros(n_pad, bool)
        kept[:n] = True
        self._order = order  # engine row -> original index
        self._state = _State(
            kept=put_rows(kept),
            labels=put_rows(np.full(n_pad, -1, np.int32)),
            order_pos=jnp.int32(0),
            pvr=jnp.float32(0.1),
            attempts=put_repl(np.zeros(windowsize, bool)),
            attempts_len=jnp.int32(0),
            attempts_head=jnp.int32(0),
            successes=jnp.int32(0),
            n_remaining=jnp.int32(n),
            next_cid=jnp.int32(0),
            # old-style uint32 key: must be a plain array so it can ride
            # through jnp.where-based state merges inside the device program
            key=jax.random.PRNGKey(rng_seed),
            n_dists=jnp.float32(0),
            n_dists_eff=jnp.float32(0),
            spec_seeds=put_repl(np.full(_SPEC_SEEDS, -1, np.int32)),
            spec_d=put_cols(np.zeros((_SPEC_SEEDS, n_pad), np.float32)),
            spec_next=jnp.int32(0),
        )
        replicate_outputs = None
        repl_constraint = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl_constraint = NamedSharding(mesh, P())
            if len({d.process_index for d in mesh.devices.flat}) > 1:
                replicate_outputs = NamedSharding(mesh, P())
        # per-size program builder: below the subset floor the ball gather
        # covers most of the matrix, so the compaction ladder's smaller
        # programs switch back to full sweeps (Q-sized top_k/gather per
        # attempt was pure overhead once n_pad ~ Q — the 262k quality-A/B
        # ran 2.4x slower compacted than not before this). Forced scopes
        # apply at every size. Scope switching only happens below the
        # compaction floor, already outside the emission-parity net.
        self._wander_scope = wander_scope
        self._emit_cache: dict = {}

        def emit_fn_for(live_pad: int):
            subset_here = wander_scope == "subset" or (
                use_subset and live_pad >= _SUBSET_AUTO_MIN
            )
            q = min(self._subset_q, live_pad) if subset_here else 0
            lanes_here = subset_here and attempt_batch != "off"
            fn = self._emit_cache.get((subset_here, q, lanes_here))
            if fn is None:
                fn = _make_emit_batch(
                    windowsize, minsuccesses, min(maxsteps, n_pad),
                    batch_clusters,
                    distance_dtype=ddtype, use_pallas=use_pallas,
                    replicate_outputs=replicate_outputs,
                    use_subset=subset_here,
                    subset_q=q,
                    use_lanes=lanes_here,
                    repl_constraint=repl_constraint,
                )
                self._emit_cache[(subset_here, q, lanes_here)] = fn
            return fn

        self._emit_fn_for = emit_fn_for
        self._emit_batch = emit_fn_for(n_pad)
        self._pending: list[Cluster] = []
        self._emitted_total = 0
        self.n_emitted_clusters = 0
        self.n_remaining_points = n
        self._batch_clusters = batch_clusters
        # In-flight dispatch for host/device pipelining: while the host
        # decodes batch i, the device is already computing batch i+1.
        self._inflight = None
        self._assigned_total = 0  # points assigned across *decoded* batches
        self._n_dists = 0.0
        self._n_dists_eff = 0.0
        # --- compaction bookkeeping ---
        self._mesh = mesh
        self._col_tile = col_tile
        self._f_pad = f_pad
        self._ddtype = ddtype
        self._windowsize = windowsize
        self._put = (put_cols, put_rows, put_repl)
        self._compact_enabled = compact
        self._compact_min_pad = compact_min_pad
        self._compact_async = compact_async and mesh is None
        self._n_live_pad = n_pad
        self._row_assigned = np.zeros(n, bool)  # current engine-row space
        self._ready_exec: dict = {}  # padded size -> AOT executable (or None)
        self._compiling: set = set()
        # Process-level executable sharing: constructing a second generator
        # with the same geometry must not re-trace the (large) emit program
        # — tracing alone costs >1 s of the single host core, and XLA's
        # persistent cache only covers the compile step, not tracing. The
        # key carries every static program input. Mesh runs keep inline jit
        # (AOT lowering would need explicit in_shardings).
        self._exec_cache_key = (
            None
            if mesh is not None
            else (
                f_pad, windowsize, minsuccesses, min(maxsteps, n_pad),
                batch_clusters, str(ddtype), use_pallas, wander_scope,
                use_subset, self._subset_q, _SUBSET_BLOCK, attempt_batch,
            )
        )
        if self._exec_cache_key is not None:
            # compile the starting size up front (cache-hit fast on repeat
            # geometries) so the first dispatch never traces
            self._ready_exec[n_pad] = self._lower_for(n_pad)
        self._spawn_precompile()

    def __repr__(self) -> str:
        return (
            f"ClusterGenerator({self.n_points} points, "
            f"{self.n_emitted_clusters} clusters)"
        )

    @property
    def n_dists(self) -> float:
        """Total raw medoid-to-point distance evaluations backing the
        clusters decoded so far (in-flight speculative work is excluded;
        reading this never synchronizes with the device)."""
        return self._n_dists

    @property
    def n_dists_effective(self) -> float:
        """Reference-equivalent distance evaluations so far: only the
        candidates the reference's sequential sampler would have visited
        (see _State.n_dists_eff)."""
        return self._n_dists_eff

    @property
    def emitted_total(self) -> int:
        """Clusters DECODED so far — may lead the popped count by up to one
        dispatch batch, since decode runs ahead of the consumer. This is the
        right denominator for throughput over a timed window (the wall clock
        covers the decoded work, not the popped subset)."""
        return self._emitted_total

    def drain(self) -> None:
        """Materialize and drop any speculative in-flight device batch, so
        no queued work bleeds into whatever the caller runs next (timed
        benchmark windows, a second generator on the same device)."""
        if self._inflight is not None:
            for arr in self._inflight:
                np.asarray(arr)
            self._inflight = None

    def __iter__(self):
        return self

    def __next__(self) -> Cluster:
        if not self._pending:
            if self.n_remaining_points == 0:
                raise StopIteration
            self._dispatch()
        cluster = self._pending.pop(0)
        self.n_emitted_clusters += 1
        self.n_remaining_points -= len(cluster.members)
        return cluster

    # ---------------------------------------------------------- compaction

    def _next_target(self) -> Optional[int]:
        "Next (halved) padded size on the compaction ladder, or None."
        t = self._n_live_pad // 2
        t -= t % self._col_tile
        if t >= max(self._compact_min_pad, self._col_tile):
            return t
        return None

    def _spawn_precompile(self) -> None:
        """Pre-compile the next ladder size's program on a background thread.

        Spawned lazily — only once survivors are within 1.5x of the next
        ladder size (a quarter of the way to the halving trigger) — so runs
        that never shrink that far don't pay for compiles they won't use,
        and abandoned generators don't block interpreter exit. Threads are
        non-daemon: a daemon thread inside an XLA compile at interpreter
        exit aborts the process."""
        if not (self._compact_enabled and self._compact_async):
            return
        target = self._next_target()
        if target is None or target in self._ready_exec or target in self._compiling:
            return
        if (self.n_points - self._assigned_total) * 2 > 3 * target:
            return
        self._compiling.add(target)

        def work():
            try:
                self._ready_exec[target] = self._lower_for(target)
            except Exception:
                self._ready_exec[target] = None  # fall back to inline jit

        import threading

        threading.Thread(target=work, daemon=False).start()

    def _lower_for(self, n_pad: int):
        "AOT-compile the emit program for a live size (process-level cache)."
        key = None
        if self._exec_cache_key is not None:
            key = (*self._exec_cache_key, n_pad)
            hit = _EXEC_CACHE.get(key)
            if hit is not None:
                return hit
        sds = jax.ShapeDtypeStruct
        state = _State(
            kept=sds((n_pad,), jnp.bool_),
            labels=sds((n_pad,), jnp.int32),
            order_pos=sds((), jnp.int32),
            pvr=sds((), jnp.float32),
            attempts=sds((self._windowsize,), jnp.bool_),
            attempts_len=sds((), jnp.int32),
            attempts_head=sds((), jnp.int32),
            successes=sds((), jnp.int32),
            n_remaining=sds((), jnp.int32),
            next_cid=sds((), jnp.int32),
            key=sds((2,), jnp.uint32),
            n_dists=sds((), jnp.float32),
            n_dists_eff=sds((), jnp.float32),
            spec_seeds=sds((_SPEC_SEEDS,), jnp.int32),
            spec_d=sds((_SPEC_SEEDS, n_pad), jnp.float32),
            spec_next=sds((), jnp.int32),
        )
        compiled = self._emit_fn_for(n_pad).lower(
            sds((self._f_pad, n_pad), self._ddtype),
            sds((n_pad,), jnp.int32),
            sds((n_pad,), jnp.float32),
            state,
        ).compile()
        if key is not None:
            _exec_cache_put(key, compiled)
        return compiled

    def _compaction_target_ready(self) -> Optional[int]:
        """Ladder size to compact to now, or None. Uses the survivor count
        through *decoded* batches (stale by at most the in-flight batch —
        survivors only shrink, so the trigger is merely one batch late)."""
        if not self._compact_enabled:
            return None
        target = self._next_target()
        if target is None:
            return None
        survivors = self.n_points - self._assigned_total
        if survivors <= 0 or _pad_to(survivors, self._col_tile) > target:
            return None
        if self._compact_async and target not in self._ready_exec:
            return None  # still compiling; re-check next dispatch
        return target

    def _do_compact(self, target: int) -> None:
        "Gather survivors into a `target`-column buffer and switch to it."
        put_cols, put_rows, put_repl = self._put
        survivor_rows = np.flatnonzero(~self._row_assigned)
        n2 = len(survivor_rows)
        assert n2 <= target
        idx2old = np.zeros(target, np.int32)
        idx2old[:n2] = survivor_rows
        valid = np.zeros(target, bool)
        valid[:n2] = True
        self.matrixT, self.ranks, self.lengths, self._state = _compact_arrays(
            self.matrixT,
            self.ranks,
            self.lengths,
            self._state,
            put_rows(idx2old),
            put_rows(valid),
        )
        if self._mesh is not None:
            self.matrixT = put_cols(self.matrixT)
            self.ranks = put_rows(self.ranks)
            self.lengths = put_rows(self.lengths)
            self._state = self._state._replace(
                kept=put_rows(self._state.kept),
                labels=put_rows(self._state.labels),
                spec_d=put_cols(self._state.spec_d),
            )
        self._order = self._order[survivor_rows]
        self._row_assigned = np.zeros(n2, bool)
        self._n_live_pad = target
        self._spawn_precompile()

    # ------------------------------------------------------------ dispatch

    def _launch(self) -> None:
        "Enqueue one device batch and start its result copies to host."
        fn = self._ready_exec.get(self._n_live_pad) or self._emit_fn_for(
            self._n_live_pad
        )
        self._state, ints, flts, delta = fn(
            self.matrixT, self.ranks, self.lengths, self._state
        )
        for arr in (ints, flts, delta):
            try:
                arr.copy_to_host_async()
            except Exception:
                pass  # backend without async copies: np.asarray blocks later
        self._inflight = (ints, flts, delta)

    def _dispatch(self) -> None:
        """Decode one batch into Cluster objects, keeping the device busy.

        The next batch is launched *before* the current one's results are
        pulled, so the (tunnel-latency-dominated) host decode overlaps the
        next device program. The final speculative launch computes an empty
        batch (its while-loop condition fails immediately) that is never
        decoded — a one-off cost far below the per-dispatch stall it removes.
        """
        if self._inflight is None:
            self._launch()
        ints_d, flts_d, delta_d = self._inflight
        self._inflight = None
        self._spawn_precompile()
        compact_to = self._compaction_target_ready()
        if compact_to is None and self._assigned_total < self.n_points:
            self._launch()
        ints = np.asarray(ints_d)
        flts = np.asarray(flts_d)
        delta = np.asarray(delta_d)
        K = self._batch_clusters
        n_emitted = int(ints[5 * K])
        assert n_emitted > 0
        medoids, seeds, kinds, succs, atts = (
            ints[:K], ints[K : 2 * K], ints[2 * K : 3 * K],
            ints[3 * K : 4 * K], ints[4 * K : 5 * K],
        )
        radii, opvrs, pvrs = flts[:K], flts[K : 2 * K], flts[2 * K : 3 * K]
        self._n_dists = float(flts[3 * K])
        self._n_dists_eff = float(flts[3 * K + 1])
        # group member indices of this batch's cluster ids in one sweep
        assigned = np.flatnonzero(delta)
        ids = delta[assigned].astype(np.int64) - 1  # batch-local cluster id
        sort = np.argsort(ids, kind="stable")
        sorted_ids = ids[sort]
        sorted_idx = assigned[sort]
        bounds = np.searchsorted(sorted_ids, np.arange(n_emitted + 1))
        self._assigned_total += len(assigned)
        self._row_assigned[assigned] = True
        for i in range(n_emitted):
            members = self._order[
                sorted_idx[bounds[i] : bounds[i + 1]]
            ].astype(np.int64)
            kind = int(kinds[i])
            self._pending.append(
                Cluster(
                    int(self._order[medoids[i]]),
                    int(self._order[seeds[i]]),
                    members,
                    float(pvrs[i]),
                    float(opvrs[i]) if kind == _KIND_NORMAL else None,
                    None if kind == _KIND_LONER else float(radii[i]),
                    int(succs[i]),
                    int(atts[i]),
                )
            )
        self._emitted_total += n_emitted
        self.peak_valley_ratio = float(flts[3 * K + 2])
        if compact_to is not None:
            self._do_compact(compact_to)
            if self._assigned_total < self.n_points:
                self._launch()

"""Sequential parity oracle for the clustering engine.

This is a slow, host-side transcription of the reference's per-cluster
control flow (/root/reference/vamb/cluster.py:122-676) used ONLY by the
parity test suite. It exists to prove that the fused device program in
`vamb_tpu/cluster.py` implements the same decision rules:

* seed cycling in descending-length order with skip-used semantics and
  reset-on-pvr-bump (ref cluster.py:342-384, 411-413),
* medoid wandering as a first-improvement hill climb on length-weighted
  local density with tried-marking (ref :415-450),
* the sequential histogram smoothing + peak/valley scan state machine
  (ref :452-543),
* the success deque / peak-valley-ratio feedback (ref :386-413),
* loner / normal / fallback emission with the exact member selection and
  record fields (ref :545-604).

Control flow here is transcribed from the reference, written sequentially
in plain Python. Numeric kernels are a *shared contract* with the engine,
replayed eagerly with the exact same jax expressions so both sides see
bit-identical numbers:

* candidate sampling replays the engine's RNG stream (split -> uniform ->
  Gumbel -> top_k). The reference samples with Python's Mersenne
  `rng.sample` — the same distribution (uniform without replacement), a
  different stream. Consuming the engine's stream lets every decision be
  compared one-for-one.
* distances come from the same einsum calls (HIGHEST precision), including
  the engine's batched (C,F)x(F,N) wander matmul, whose rows are reused as
  the next medoid's distance vector.
* the histogram uses the same clip(int(d/dx)) binning and the smoothing
  the same 31-tap convolution.

The oracle works in "engine coordinates": rows sorted by stable descending
length and zero-padded, mapped back to original indices on emission.
"""

from collections import deque
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vamb_tpu.cluster import (
    _DEFAULT_RADIUS,
    _DELTA_X,
    _LANES,
    _MEDOID_RADIUS,
    _NBINS,
    _NORMALPDF,
    _SUBLANES,
    _USE_APPROX_TOPK,
    _X_GRID,
    _XMAX,
    _pad_to,
    normalize,
)


@dataclass
class OracleRecord:
    "One emitted cluster, in original row indices."

    medoid: int
    seed: int
    members: np.ndarray  # sorted original indices
    kind: str  # "normal" | "loner" | "fallback"
    radius: Optional[float]
    observed_pvr: Optional[float]
    pvr: float
    successes: int
    attempts: int


# --------------------------------------------------- shared numeric kernels
# These jitted helpers mirror the engine's device expressions verbatim; the
# oracle calls them step by step from its sequential control flow.

_PREC = jax.lax.Precision.HIGHEST
_SPEC = 8  # engine _SPEC_SEEDS: seeds per speculative distance batch


@jax.jit
def _k_spec_batch(mT, seeds):
    "Engine spec_batch: S seed distance rows in one matmul, self-dists 0."
    rows = mT[:, seeds]
    D = 0.5 - jnp.einsum(
        "fc,fn->cn", rows, mT, precision=_PREC,
        preferred_element_type=jnp.float32,
    )
    iota = jnp.arange(mT.shape[1])
    return jnp.where(iota[None, :] == seeds[:, None], 0.0, D)


@jax.jit
def _k_density(d, lengths, kept):
    return jnp.sum(
        jnp.where((d <= _MEDOID_RADIUS) & kept, lengths * (_MEDOID_RADIUS - d), 0.0)
    )


@partial(jax.jit, static_argnames=("C",))
def _k_candidates(key, d, kept, tried, medoid, C):
    "Engine wander-body sampling: Gumbel top-k over eligible points."
    N = d.shape[0]
    iota = jnp.arange(N)
    key, k1 = jax.random.split(key)
    elig = (d <= _MEDOID_RADIUS) & kept & ~tried & (iota != medoid)
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(k1, (N,)) + 1e-20) + 1e-20)
    score = jnp.where(elig, gumbel, -jnp.inf)
    if _USE_APPROX_TOPK:
        _, cand = jax.lax.approx_max_k(score, C)
    else:
        _, cand = jax.lax.top_k(score, C)
    return key, cand, elig[cand]


@jax.jit
def _k_batched_wander(mT, lengths, kept, cand):
    "Engine wander-body distance+density matmul for all C candidates."
    iota = jnp.arange(mT.shape[1])
    rows = mT[:, cand]
    D = 0.5 - jnp.einsum(
        "fc,fn->cn", rows, mT, precision=_PREC, preferred_element_type=jnp.float32
    )
    D = jnp.where(iota[None, :] == cand[:, None], 0.0, D)
    within = (D <= _MEDOID_RADIUS) & kept[None, :]
    dens = jnp.sum(
        jnp.where(within, lengths[None, :] * (_MEDOID_RADIUS - D), 0.0), axis=1
    )
    return D, dens


@partial(jax.jit, static_argnames=("Q",))
def _k_subset_build(mT, lengths, kept, d0, seed, Q):
    "Engine phase-1 subset construction (block-granular gather)."
    from vamb_tpu.cluster import _SUBSET_BLOCK, _SUBSET_RADIUS

    N = mT.shape[1]
    B = _SUBSET_BLOCK
    KB = Q // B
    NB = N // B
    ball = kept & (d0 <= _SUBSET_RADIUS)
    block_any = jnp.any(ball.reshape(NB, B), axis=1)
    nb = jnp.sum(block_any)
    ok = nb <= KB
    _, bids = jax.lax.top_k(
        jnp.where(block_any, -jnp.arange(NB, dtype=jnp.int32), -NB), KB
    )
    valid_b = jnp.arange(KB) < jnp.minimum(nb, KB)
    bids = jnp.where(valid_b, bids, 0).astype(jnp.int32)
    idx = (bids[:, None] * B + jnp.arange(B)[None, :]).reshape(-1)
    valid = jnp.repeat(valid_b, B)
    F = mT.shape[0]
    xsT = jnp.take(mT.reshape(F, NB, B), bids, axis=1).reshape(F, Q)
    w_sub = jnp.where(
        valid, jnp.take(lengths.reshape(NB, B), bids, axis=0).reshape(-1), 0.0
    )
    kept_sub = valid & jnp.take(kept.reshape(NB, B), bids, axis=0).reshape(-1)
    d0_sub = jnp.where(
        valid, jnp.take(d0.reshape(NB, B), bids, axis=0).reshape(-1), jnp.inf
    )
    seed_slot = jnp.argmax(bids == seed // B).astype(jnp.int32) * B + seed % B
    density0 = jnp.sum(
        jnp.where(
            (d0_sub <= _MEDOID_RADIUS) & kept_sub,
            w_sub * (_MEDOID_RADIUS - d0_sub),
            0.0,
        )
    )
    return ok, idx, xsT, w_sub, kept_sub, d0_sub, seed_slot, density0


@partial(jax.jit, static_argnames=("C",))
def _k_subset_candidates(key, d_s, kept_sub, tried_s, slot, C):
    "Engine subset-body sampling: Gumbel top-k over eligible subset slots."
    Q = d_s.shape[0]
    iq = jnp.arange(Q)
    key, k1 = jax.random.split(key)
    elig = (d_s <= _MEDOID_RADIUS) & kept_sub & ~tried_s & (iq != slot)
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(k1, (Q,)) + 1e-20) + 1e-20)
    score = jnp.where(elig, gumbel, -jnp.inf)
    if _USE_APPROX_TOPK:
        _, cand = jax.lax.approx_max_k(score, C)
    else:
        _, cand = jax.lax.top_k(score, C)
    return key, cand, elig[cand]


@jax.jit
def _k_subset_wander(xsT, w_sub, kept_sub, cand):
    "Engine subset-body distance+density matmul over the gathered blocks."
    iq = jnp.arange(xsT.shape[1])
    rows = xsT[:, cand]
    D = 0.5 - jnp.einsum(
        "fc,fq->cq", rows, xsT, precision=_PREC,
        preferred_element_type=jnp.float32,
    )
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
    return D, dens


@jax.jit
def _k_full_row(mT, medoid):
    "Engine full_row: one full distance sweep, self-distance zeroed."
    d = 0.5 - jnp.einsum(
        "fn,f->n", mT, mT[:, medoid], precision=_PREC,
        preferred_element_type=jnp.float32,
    )
    return d.at[medoid].set(0.0)


@jax.jit
def _k_histogram(d, lengths, kept):
    bins = jnp.clip((d / _DELTA_X).astype(jnp.int32), 0, _NBINS - 1)
    w = jnp.where((d >= 0.0) & (d <= _XMAX) & kept, lengths, 0.0)
    return jnp.sum(
        jnp.where(bins[:, None] == jnp.arange(_NBINS)[None, :], w[:, None], 0.0),
        axis=0,
    )


@jax.jit
def _k_smooth(hist):
    # the engine's banded-matmul smoothing (see cluster._SMOOTH_MATRIX:
    # dot accumulation order is stable across fusion contexts, convolve
    # rounding is not)
    from vamb_tpu.cluster import smooth_histogram

    return smooth_histogram(hist)


# ------------------------------------------------------- sequential oracle


def find_threshold_sequential(densities: np.ndarray, pvr: float):
    """The reference's valley-scan state machine, transcribed step by step
    (ref cluster.py:483-543). Input is the smoothed 60-bin density vector.

    Returns (threshold, observed_pvr) or None.
    """
    peak_density = 0.0
    peak_over = False
    minimum_x = 0.0
    threshold = None
    density_at_minimum = 0.0
    x = 0.0
    delta_x = _XMAX / _NBINS
    for density in densities:
        density = float(density)
        if not peak_over and density > peak_density:
            if x > 0.1:
                return None
            peak_density = density
        if not peak_over and density < 0.6 * peak_density:
            peak_over = True
            density_at_minimum = density
        if peak_over and density > 1.5 * density_at_minimum:
            break
        if peak_over and density < density_at_minimum:
            minimum_x, density_at_minimum = x, density
            if density < pvr * peak_density:
                threshold = minimum_x
        x += delta_x
    if threshold is None or threshold > 0.2 + pvr:
        return None
    return (threshold, density_at_minimum / peak_density)


class SequentialOracle:
    """Reference-transcribed clustering loop driven by the engine's RNG."""

    def __init__(
        self,
        matrix: np.ndarray,
        lengths: np.ndarray,
        maxsteps: int = 25,
        windowsize: int = 300,
        minsuccesses: int = 15,
        rng_seed: int = 0,
        pad_multiple: int = _LANES,
        wander_scope: str = "full",
        attempt_batch: str = "auto",
    ):
        # attempt_batch is accepted (and ignored) so parity tests can pass
        # the same kwargs to engine and oracle: the engine's speculative
        # attempt lanes admit only sequential-equivalent prefixes, so THIS
        # sequential oracle is the ground truth for every setting.
        del attempt_batch
        # pad_multiple must match the engine's column tile (128 * mesh size)
        # because the Gumbel draws span the padded width
        from vamb_tpu.cluster import engine_order

        matrix = normalize(matrix.copy())
        n, f = matrix.shape
        n_pad = _pad_to(n, pad_multiple)
        f_pad = _pad_to(f, _SUBLANES)
        # geometry-local column order + sparse seed ranks, identical to the
        # engine's (shared construction)
        order, ranks = engine_order(matrix, lengths, rng_seed)
        padded_t = np.zeros((f_pad, n_pad), np.float32)
        padded_t[:f, :n] = matrix.T[:, order]
        from vamb_tpu.cluster import RANK_PAD_BASE

        self.ranks = np.arange(n_pad, dtype=np.int64) + RANK_PAD_BASE
        self.ranks[:n] = ranks

        self.n = n
        self.n_pad = n_pad
        self.C = min(maxsteps, n_pad)
        self.windowsize = windowsize
        self.minsuccesses = minsuccesses
        self.order = order
        self.mT = jnp.asarray(padded_t)
        self.lengths = jnp.asarray(
            np.pad(lengths.astype(np.float32)[order], (0, n_pad - n))
        )
        kept = np.zeros(n_pad, bool)
        kept[:n] = True
        self.kept = kept
        # pvr accumulates in f32 exactly like the engine's device scalar
        self.pvr = np.float32(0.1)
        self.attempts: deque = deque(maxlen=windowsize)
        self.successes = 0
        self.order_pos = 0
        self.key = jax.random.PRNGKey(rng_seed)
        self.n_remaining = n
        # mirror of the engine's speculative seed cache: rows are reused
        # only on exact seed-id match, refilled with the same batched
        # matmul at the same points, so d0 is numerically identical
        self.spec_seeds = np.full(_SPEC, -1, np.int64)
        self.spec_d = np.zeros((_SPEC, n_pad), np.float32)
        # subset-wander mirror (engine wander_scope="subset")
        from vamb_tpu.cluster import _SUBSET_Q

        self.wander_scope = wander_scope
        self.Q = min(_SUBSET_Q, n_pad)

    # -- reference control flow, one rule per method ----------------------

    def peek_seed(self, pos: int) -> tuple[int, int]:
        """Surviving column with the smallest seed rank cyclically from
        rank `pos` (ref :342-384). Returns (column, rank)."""
        from vamb_tpu.cluster import RANK_NONE

        kept_ranks = np.where(self.kept, self.ranks, RANK_NONE)
        ahead = np.where(kept_ranks >= pos, kept_ranks, RANK_NONE)
        r = int(ahead.min())
        if r >= RANK_NONE:
            r = int(kept_ranks.min())
        return int(np.argmax(kept_ranks == r)), r

    def seed_distances(self) -> tuple[int, np.ndarray]:
        "Resolve the next seed and its distance row via the spec cache."
        seed, seed_rank = self.peek_seed(self.order_pos)
        if seed not in self.spec_seeds:
            pos = self.order_pos
            seeds = np.empty(_SPEC, np.int64)
            for k in range(_SPEC):
                seeds[k], r = self.peek_seed(pos)
                pos = r + 1
            self.spec_seeds = seeds
            self.spec_d = np.asarray(
                _k_spec_batch(self.mT, jnp.asarray(seeds.astype(np.int32)))
            )
        slot = int(np.argmax(self.spec_seeds == seed))
        self.order_pos = seed_rank + 1
        return seed, self.spec_d[slot]

    def update_successes(self, success: bool) -> None:
        "The success deque + pvr bump (ref :386-413)."
        if len(self.attempts) == self.attempts.maxlen:
            self.successes -= self.attempts.popleft()
        self.successes += success
        self.attempts.append(success)
        if (
            len(self.attempts) == self.attempts.maxlen
            and self.successes < self.minsuccesses
        ):
            self.pvr = np.float32(self.pvr + np.float32(0.1))
            self.attempts.clear()
            self.successes = 0
            self.order_pos = 0

    def wander(self, seed: int, d0: np.ndarray, sub_key):
        """First-improvement hill climb (ref :415-450), consuming the
        engine's per-step Gumbel candidate stream."""
        kept_j = jnp.asarray(self.kept)
        d = jnp.asarray(d0)
        density = float(_k_density(d, self.lengths, kept_j))
        tried = np.zeros(self.n_pad, bool)
        tried[seed] = True
        medoid = seed
        key = sub_key

        d_np = np.asarray(d)
        # initial eligibility check consumes no RNG (engine init cond;
        # ref: empty candidates -> while loop never entered)
        if not np.any(self.kept & (d_np <= _MEDOID_RADIUS) & ~tried):
            return medoid, d_np

        while True:
            # one Gumbel draw per loop iteration, ALWAYS — after a jump the
            # engine's while-loop body re-runs and draws even when no
            # eligible candidate remains (cand_valid all false), so the
            # oracle must consume the same split
            key, cand, cand_valid = _k_candidates(
                key, d, kept_j, jnp.asarray(tried), medoid, self.C
            )
            cand = np.asarray(cand)
            cand_valid = np.asarray(cand_valid)
            D, dens = _k_batched_wander(self.mT, self.lengths, kept_j, cand)
            dens = np.asarray(dens)

            # walk candidates in sampled order; jump at first improvement
            jumped = False
            for j in range(self.C):
                if not cand_valid[j]:
                    continue
                tried[cand[j]] = True
                if dens[j] > density:
                    medoid = int(cand[j])
                    d = D[j]
                    d_np = np.asarray(d)
                    density = float(dens[j])
                    jumped = True
                    break
            if not jumped:
                return medoid, d_np

    def _full_climb(self, medoid, d, density, tried, key):
        "The classic full-sweep climb from an arbitrary starting state."
        kept_j = jnp.asarray(self.kept)
        d = jnp.asarray(d)
        while True:
            key, cand, cand_valid = _k_candidates(
                key, d, kept_j, jnp.asarray(tried), medoid, self.C
            )
            cand = np.asarray(cand)
            cand_valid = np.asarray(cand_valid)
            D, dens = _k_batched_wander(self.mT, self.lengths, kept_j, cand)
            dens = np.asarray(dens)
            jumped = False
            for j in range(self.C):
                if not cand_valid[j]:
                    continue
                tried[cand[j]] = True
                if dens[j] > density:
                    medoid = int(cand[j])
                    d = D[j]
                    density = float(dens[j])
                    jumped = True
                    break
            if not jumped:
                return medoid

    def wander_subset(self, seed: int, d0: np.ndarray, sub_key):
        """Mirror of the engine's two-phase subset wander: climb inside the
        seed's gathered block-ball with the same jitted kernels, fall back
        to the full-sweep climb on overflow/drift, and recompute the final
        full distance row unconditionally (the engine does — see
        cluster.py wander, subset branch)."""
        from vamb_tpu.cluster import _SUBSET_ABORT

        d0_j = jnp.asarray(d0)
        kept_j = jnp.asarray(self.kept)
        tried0 = np.zeros(self.n_pad, bool)
        tried0[seed] = True
        no_cand = not np.any(self.kept & (d0 <= _MEDOID_RADIUS) & ~tried0)
        key = sub_key

        ok_j, idx, xsT, w_sub, kept_sub, d0_sub, seed_slot, density0 = (
            _k_subset_build(self.mT, self.lengths, kept_j, d0_j, seed, self.Q)
        )
        ok = bool(ok_j)
        idx = np.asarray(idx)
        d0_sub = np.asarray(d0_sub)
        kept_sub_np = np.asarray(kept_sub)

        medoid = seed
        abort = False
        density = float(density0) if ok else None
        tried_s = np.zeros(self.Q, bool)
        slot = int(seed_slot)
        tried_s[slot] = True
        d_s = jnp.asarray(d0_sub)

        if ok and not no_cand:
            while True:
                key, cand, cand_valid = _k_subset_candidates(
                    key, d_s, jnp.asarray(kept_sub_np), jnp.asarray(tried_s),
                    slot, self.C,
                )
                cand = np.asarray(cand)
                cand_valid = np.asarray(cand_valid)
                D, dens = _k_subset_wander(
                    xsT, jnp.asarray(w_sub), jnp.asarray(kept_sub_np),
                    jnp.asarray(cand),
                )
                dens = np.asarray(dens)
                jumped = False
                for j in range(self.C):
                    if not cand_valid[j]:
                        continue
                    tried_s[cand[j]] = True
                    if dens[j] > density:
                        slot = int(cand[j])
                        d_row = np.array(D[j])
                        d_row[slot] = 0.0
                        d_s = jnp.asarray(d_row)
                        density = float(dens[j])
                        jumped = True
                        break
                if not jumped:
                    break
                if d0_sub[slot] > np.float32(_SUBSET_ABORT):
                    abort = True
                    break
            medoid = int(idx[slot])

        need_full = (abort or not ok) and not no_cand
        if need_full:
            if ok:
                tried = np.zeros(self.n_pad, bool)
                tried[idx[tried_s]] = True
            else:
                tried = tried0
                density = float(_k_density(d0_j, self.lengths, kept_j))
            if medoid != seed:
                d_init = np.asarray(_k_full_row(self.mT, medoid))
            else:
                d_init = d0
            medoid = self._full_climb(medoid, d_init, density, tried, key)

        # final row via the engine's SHARED batched kernel (spec_batch with
        # the medoid broadcast over the 8 rows): a batched dot rounds
        # differently from the single matvec in the last ulp, and the
        # engine reads classic attempts' and speculative lanes' final rows
        # from this one expression — row values are composition-independent
        # (pinned by test_cluster.py::test_batched_row_composition_
        # independent), so broadcasting reproduces any lane's row exactly.
        d = np.asarray(
            _k_spec_batch(self.mT, jnp.full((_SPEC,), medoid, jnp.int32))
        )[0]
        return medoid, d

    def __iter__(self):
        return self

    def __next__(self) -> OracleRecord:
        if self.n_remaining == 0:
            raise StopIteration
        while True:
            seed, d0 = self.seed_distances()
            self.key, sub = jax.random.split(self.key)
            if self.wander_scope == "subset":
                medoid, d = self.wander_subset(seed, d0, sub)
            else:
                medoid, d = self.wander(seed, d0, sub)

            kept_j = jnp.asarray(self.kept)
            n_close = int(np.sum((d < _MEDOID_RADIUS) & self.kept))
            hist = _k_histogram(jnp.asarray(d), self.lengths, kept_j)
            densities = np.asarray(_k_smooth(hist))
            result = find_threshold_sequential(densities, float(self.pvr))

            if n_close == 1:  # loner (ref :457, :550-562)
                members_rows = np.array([medoid])
                rec = self._emit(medoid, seed, members_rows, "loner", None, None)
                return rec
            if result is None:
                if self.pvr > 0.55:  # fallback (ref :566-580)
                    members_rows = np.flatnonzero(
                        (d <= np.float32(_DEFAULT_RADIUS)) & self.kept
                    )
                    return self._emit(
                        medoid, seed, members_rows, "fallback",
                        float(_DEFAULT_RADIUS), None,
                    )
                self.update_successes(False)  # reject (ref :582)
                continue
            threshold, observed_pvr = result
            thr32 = np.float32(threshold)
            members_rows = np.flatnonzero((d <= thr32) & self.kept)
            rec = self._emit(
                medoid, seed, members_rows, "normal", float(thr32), observed_pvr
            )
            if self.pvr < 0.55:  # ref :599-600
                self.update_successes(True)
            return rec

    def _emit(self, medoid, seed, members_rows, kind, radius, observed_pvr):
        "Record with pre-update successes/attempts (ref :551-598)."
        rec = OracleRecord(
            medoid=int(self.order[medoid]),
            seed=int(self.order[seed]),
            members=np.sort(self.order[members_rows]),
            kind=kind,
            radius=radius,
            observed_pvr=observed_pvr,
            pvr=float(self.pvr),
            successes=self.successes,
            attempts=len(self.attempts),
        )
        self.kept[members_rows] = False
        self.n_remaining -= len(members_rows)
        return rec

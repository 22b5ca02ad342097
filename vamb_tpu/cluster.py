"""Iterative medoid clustering of L2-normalized latents, TPU-first.

Behavioral spec: reference vamb/cluster.py (the GPU `kept_mask` variant,
cluster.py:174-177, which the reference itself documents as the
masking-not-deletion formulation — exactly the XLA-friendly one). Constants
and decision rules are kept identical:

* normalization: zero rows -> uniform 1/D, then divide by row norm * sqrt(2)
  so cosine distance = 0.5 - x.y lies in [0, 1] (cluster.py:653-669).
* seeds tried in descending contig-length order, cyclically (cluster.py:275,
  342-384).
* medoid wandering: hill-climb on length-weighted local density within radius
  0.05, sampling <=25 untried candidates per step (cluster.py:415-450).
* threshold: length-weighted histogram of distances <=0.3 in 60 bins,
  smoothed with a 31-tap N(0, 0.01) kernel, first-peak/valley scan with the
  adaptive peak-valley-ratio acceptance rules (cluster.py:452-543).
* pvr feedback: starts 0.1, +0.1 whenever <15 of the last 300 candidate
  clusters were accepted; fallback radius-0.06 clusters once pvr > 0.55
  (cluster.py:282-283, 403-413, 566-580).

TPU-first architecture (NOT a port of the reference's row-deletion loop):

* the latent matrix lives in device HBM once, feature-padded to the 128-lane
  boundary and row-padded to a tile multiple; clustered-away points are
  masked, never deleted, so every shape is static and every step is a
  compiled program.
* one iteration = a handful of jitted calls moving only scalars and a 60-bin
  histogram to the host:
    - `next_seed`: masked argmin over the seed order (device),
    - `eval_medoid`: one (N,F)x(F,) matvec -> distances, density, histogram,
      loner count, plus a Gumbel-top-k sample of untried in-radius candidates
      (device RNG, no member-list transfer),
    - `batch_densities`: all <=25 wander candidates evaluated in ONE
      (N,F)x(F,C) matmul — the reference does one matvec per candidate with
      an LRU cache (cluster.py:606-637); batching replaces the cache.
    - `emit`: mask out members, count them.
* member indices are extracted per cluster with a size-bucketed jitted
  nonzero (powers of two -> <=21 compiled variants), so total host transfer
  is O(sum of cluster sizes), not O(N * n_clusters).
* the 60-value smoothing convolution + valley scan runs on host (trivial),
  keeping the sequential adaptive control flow in Python exactly like the
  reference — but every O(N) inner computation is a single device program.

Distance matmuls run with `precision=HIGHEST`: bins are 0.005 wide, so
bf16-level error (~1e-3 on dot products) would misbin points.
"""

from collections import deque
from functools import partial
from math import ceil
from typing import Optional, Union

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

_LANES = 128
_ROW_TILE = 8


class Loner:
    __slots__ = []


class NoThreshold:
    __slots__ = []


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


# --------------------------------------------------------------- device fns


@partial(jax.jit, donate_argnums=())
def _next_seed(order: jax.Array, kept: jax.Array, start: jax.Array) -> jax.Array:
    """First position i (cyclically from `start`) whose seed order[i] is kept.

    Returns the position in `order` (not the seed index); -1 if none kept.
    """
    n = order.shape[0]
    eligible = kept[order]
    iota = jnp.arange(n)
    ahead = jnp.where(eligible & (iota >= start), iota, n)
    wrapped = jnp.where(eligible, iota, n)
    pos = jnp.minimum(jnp.min(ahead), jnp.min(wrapped))
    return jnp.where(pos == n, -1, pos)


def _make_eval_medoid(maxsteps: int):
    @jax.jit
    def eval_medoid(matrix, lengths, kept, tried, idx, key):
        """One medoid evaluation: distances + density + histogram + candidates.

        Returns (distances, density, hist, n_close, cand, cand_valid).
        """
        row = matrix[idx]
        d = 0.5 - jnp.dot(matrix, row, precision=jax.lax.Precision.HIGHEST)
        d = d.at[idx].set(0.0)

        within = (d <= _MEDOID_RADIUS) & kept
        density = jnp.sum(jnp.where(within, lengths * (_MEDOID_RADIUS - d), 0.0))

        # loner test: exactly one kept point strictly within 0.05
        n_close = jnp.sum((d < _MEDOID_RADIUS) & kept)

        # length-weighted histogram of kept distances in [0, 0.3], 60 bins
        in_range = (d >= 0.0) & (d <= _XMAX) & kept
        bins = jnp.clip((d / _DELTA_X).astype(jnp.int32), 0, _NBINS - 1)
        w = jnp.where(in_range, lengths, 0.0)
        hist = jnp.zeros(_NBINS, jnp.float32).at[bins].add(w)

        # sample <= maxsteps untried in-radius candidates: Gumbel top-k
        iota = jnp.arange(matrix.shape[0])
        elig = within & ~tried & (iota != idx)
        gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, d.shape) + 1e-20) + 1e-20)
        score = jnp.where(elig, gumbel, -jnp.inf)
        _, cand = jax.lax.top_k(score, maxsteps)
        cand_valid = elig[cand]
        return d, density, hist, n_close, cand, cand_valid

    return eval_medoid


@jax.jit
def _batch_densities(matrix, lengths, kept, cand):
    "Densities of all candidate medoids in one (N,F)x(F,C) matmul."
    rows = matrix[cand]  # (C, F)
    d = 0.5 - jnp.dot(matrix, rows.T, precision=jax.lax.Precision.HIGHEST)  # (N, C)
    iota = jnp.arange(matrix.shape[0])
    d = jnp.where(iota[:, None] == cand[None, :], 0.0, d)
    within = (d <= _MEDOID_RADIUS) & kept[:, None]
    return jnp.sum(
        jnp.where(within, lengths[:, None] * (_MEDOID_RADIUS - d), 0.0), axis=0
    )


@jax.jit
def _emit(kept, d, threshold):
    "Mask out members (kept & d <= threshold); returns (new_kept, sel, count)."
    sel = (d <= threshold) & kept
    return kept & ~sel, sel, jnp.sum(sel)


@jax.jit
def _emit_loner(kept, idx):
    sel = jnp.zeros_like(kept).at[idx].set(True) & kept
    return kept & ~sel, sel, jnp.sum(sel)


@partial(jax.jit, static_argnames="size")
def _nonzero_sized(sel, size):
    return jnp.nonzero(sel, size=size, fill_value=-1)[0]


@jax.jit
def _mark_tried(tried, cand, upto):
    "Mark cand[0:upto] as tried (static shape; OOB indices drop the write)."
    valid = jnp.arange(cand.shape[0]) < upto
    idx = jnp.where(valid, cand, tried.shape[0])
    return tried.at[idx].set(True, mode="drop")


# ------------------------------------------------------------- host control


class ClusterGenerator:
    """Iterative medoid cluster generator. Iterate to get `Cluster`s.

    Inputs mirror the reference (cluster.py:122-133):
        matrix: (obs x features) float32 latent matrix
        lengths: contig lengths (used as density/histogram weights)
        maxsteps: futile medoid-wander attempts before giving up [25]
        windowsize: window length for success counting [300]
        minsuccesses: minimum successes per window before pvr bump [15]
        destroy: normalize `matrix` in place to save memory
        normalized: matrix is already normalized
        rng_seed: seed for the candidate-sampling RNG
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

        n, f = matrix.shape
        n_pad = _pad_to(n, _ROW_TILE)
        f_pad = _pad_to(f, _LANES)
        padded = np.zeros((n_pad, f_pad), np.float32)
        padded[:n, :f] = matrix

        self.n_points = n
        self.maxsteps = maxsteps
        self.minsuccesses = minsuccesses
        self.matrix = jnp.asarray(padded)
        self.lengths = jnp.asarray(
            np.pad(lengths.astype(np.float32), (0, n_pad - n))
        )
        kept = np.zeros(n_pad, bool)
        kept[:n] = True
        self.kept = jnp.asarray(kept)
        # seed order: positions sorted by descending length (reference :275)
        self.order = jnp.asarray(
            np.argsort(lengths.astype(np.float32), kind="stable")[::-1].copy()
        )
        self.order_pos = 0
        self.n_emitted_clusters = 0
        self.n_remaining_points = n
        self.peak_valley_ratio = 0.1
        self.attempts: deque[bool] = deque(maxlen=windowsize)
        self.successes = 0
        self.key = jax.random.key(rng_seed)
        self._eval_medoid = _make_eval_medoid(min(maxsteps, n_pad))
        self._key_counter = 0

    def __repr__(self) -> str:
        return (
            f"ClusterGenerator({self.n_points} points, "
            f"{self.n_emitted_clusters} clusters)"
        )

    def _next_key(self) -> jax.Array:
        self._key_counter += 1
        return jax.random.fold_in(self.key, self._key_counter)

    def __iter__(self):
        return self

    def __next__(self) -> Cluster:
        if self.n_remaining_points == 0:
            raise StopIteration
        assert self.n_remaining_points > 0
        cluster, sel, count = self._find_cluster()
        self.n_emitted_clusters += 1
        self.n_remaining_points -= count
        members = self._members(sel, count)
        cluster.members = members
        return cluster

    def _members(self, sel: jax.Array, count: int) -> np.ndarray:
        size = 1 << max(0, (count - 1).bit_length())
        idx = np.asarray(_nonzero_sized(sel, min(size, sel.shape[0])))
        return idx[:count].astype(np.int64)

    def _get_next_seed(self) -> int:
        pos = int(_next_seed(self.order, self.kept, jnp.int32(self.order_pos)))
        assert pos >= 0, "no kept seed although points remain"
        self.order_pos = pos + 1
        if self.order_pos >= self.n_points:
            self.order_pos = 0
        return int(self.order[pos])

    def _update_successes(self, success: bool) -> None:
        "pvr feedback loop (reference cluster.py:386-413)."
        if len(self.attempts) == self.attempts.maxlen:
            self.successes -= self.attempts.popleft()
        self.successes += success
        self.attempts.append(success)
        if (
            len(self.attempts) == self.attempts.maxlen
            and self.successes < self.minsuccesses
        ):
            self.peak_valley_ratio += 0.1
            self.attempts.clear()
            self.successes = 0
            self.order_pos = 0

    def _wander_medoid(self, seed: int):
        """Hill-climb on local density; all candidates of a step evaluated in
        one batched matmul (replaces the reference's per-candidate matvec +
        64-entry cache, cluster.py:606-637)."""
        tried = jnp.zeros(self.matrix.shape[0], bool).at[seed].set(True)
        medoid = seed
        d, density, hist, n_close, cand, cand_valid = self._eval_medoid(
            self.matrix, self.lengths, self.kept, tried, jnp.int32(seed),
            self._next_key(),
        )
        while True:
            valid = np.asarray(cand_valid)
            if not valid.any():
                break
            densities = np.asarray(
                _batch_densities(self.matrix, self.lengths, self.kept, cand)
            )
            better = valid & (densities > float(density))
            if not better.any():
                break  # tried all candidates without improvement
            j = int(np.argmax(better))  # first improving candidate in order
            tried = _mark_tried(tried, cand, jnp.int32(j + 1))
            medoid = int(cand[j])
            d, density, hist, n_close, cand, cand_valid = self._eval_medoid(
                self.matrix, self.lengths, self.kept, tried, jnp.int32(medoid),
                self._next_key(),
            )
        return medoid, d, hist, int(n_close)

    def _find_threshold(
        self, hist: np.ndarray
    ) -> Union[Loner, NoThreshold, tuple[float, float]]:
        """Smooth the histogram and scan for the first density valley
        (reference cluster.py:483-543). Runs on host: 60 values."""
        densities = np.convolve(hist, _NORMALPDF, mode="full")[15:-15]

        peak_density = 0.0
        peak_over = False
        minimum_x = 0.0
        threshold = None
        density_at_minimum = 0.0
        x = 0.0
        for density in densities:
            if not peak_over and density > peak_density:
                if x > 0.1:
                    return NoThreshold()
                peak_density = density
            if not peak_over and density < 0.6 * peak_density:
                peak_over = True
                density_at_minimum = density
            if peak_over and density > 1.5 * density_at_minimum:
                break
            if peak_over and density < density_at_minimum:
                minimum_x, density_at_minimum = x, density
                if density < self.peak_valley_ratio * peak_density:
                    threshold = minimum_x
            x += _XMAX / _NBINS

        if threshold is None:
            return NoThreshold()
        if threshold > 0.2 + self.peak_valley_ratio:
            return NoThreshold()
        return (threshold, density_at_minimum / peak_density)

    def _find_cluster(self) -> tuple[Cluster, jax.Array, int]:
        while True:
            seed = self._get_next_seed()
            medoid, d, hist, n_close = self._wander_medoid(seed)

            if n_close == 1:
                # loner (reference cluster.py:457-458, 550-562)
                self.kept, sel, count = _emit_loner(self.kept, jnp.int32(medoid))
                cluster = Cluster(
                    medoid, seed, None, self.peak_valley_ratio, None, None,
                    self.successes, len(self.attempts),
                )
                return cluster, sel, int(count)

            threshold = self._find_threshold(np.asarray(hist))
            if isinstance(threshold, NoThreshold):
                if self.peak_valley_ratio > 0.55:
                    self.kept, sel, count = _emit(self.kept, d, _DEFAULT_RADIUS)
                    cluster = Cluster(
                        medoid, seed, None, self.peak_valley_ratio, None,
                        _DEFAULT_RADIUS, self.successes, len(self.attempts),
                    )
                    return cluster, sel, int(count)
                self._update_successes(False)
                continue

            thr, observed_pvr = threshold
            self.kept, sel, count = _emit(self.kept, d, thr)
            cluster = Cluster(
                medoid, seed, None, self.peak_valley_ratio, observed_pvr, thr,
                self.successes, len(self.attempts),
            )
            if self.peak_valley_ratio < 0.55:
                self._update_successes(True)
            return cluster, sel, int(count)

"""Quality-level A/B across the clustering engine's production code paths.

The compacted path deliberately re-seats the sampling RNG when the device
matrix shrinks (cluster.py: compaction docs), so its emissions are valid
for the dataset but not bitwise-identical to a compaction-free run — the
oracles therefore run below the compaction floor, leaving the production
path outside the emission-level parity net. This suite closes that gap at
the level that matters for users: same data, compaction forced on (floor
lowered so it actually triggers) vs off, and the forced-XLA wander path,
must produce the same *bin quality* (blob recovery at NC-like thresholds)
and the same full-partition invariants. The TPU-side pallas variant of the
same A/B runs in bench.py (Pallas kernels don't lower on the CPU CI
backend).

Reference context: vamb/cluster.py:566-580 (fallback/loner tail) and the
reference's own pack-vs-mask mode split (cluster.py:174-177,313-335),
which likewise changes emission order but not quality.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

from vamb_tpu.cluster import ClusterGenerator, normalize

# share the blob/noise dataset generator with the driver bench so the CPU
# test and the TPU-side A/B measure the same regime
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from bench import _blob_latents  # noqa: E402

N, D, N_BLOBS = 6144, 16, 40
NOISE_FRAC = 0.2


@pytest.fixture(scope="module")
def dataset():
    matrix, lengths, truth = _blob_latents(N, D, N_BLOBS, NOISE_FRAC, seed=17)
    return normalize(matrix, inplace=True), lengths, truth


def _nc_like_blobs(bins, truth, lengths):
    "Blobs recovered at recall>=0.90 of bases in a bin with precision>=0.95."
    blob_bases = np.zeros(N_BLOBS, np.int64)
    real = truth >= 0
    np.add.at(blob_bases, truth[real], lengths[real])
    best = np.zeros(N_BLOBS)
    for members in bins:
        idx = np.asarray(members, np.int64)
        total = int(lengths[idx].sum())
        per_b: dict[int, int] = {}
        for b, ln in zip(truth[idx], lengths[idx]):
            if b >= 0:
                per_b[int(b)] = per_b.get(int(b), 0) + int(ln)
        for b, bases in per_b.items():
            if bases / total >= 0.95:
                best[b] = max(best[b], bases / blob_bases[b])
    return int(np.sum(best >= 0.90))


def _run(matrix, lengths, **kwargs):
    gen = ClusterGenerator(matrix.copy(), lengths, normalized=True, **kwargs)
    return [cl.members for cl in gen]


def test_subset_wander_matches_full_on_wide_clusters():
    """Subset-vs-full quality on WIDE clusters — the regime where the
    subset wander's locality bias actually bites. d = (1 - cos)/2 is half
    squared chord distance, so a cluster with intra-cluster distances up
    to ~0.2 has eligible candidates and density contributors beyond the
    0.15 gather ball (see cluster.py at _SUBSET_RADIUS); the approximation
    may then settle on different medoids than the exact full sweep. This
    asserts the difference stays invisible at the bin-quality level."""
    rng = np.random.default_rng(23)
    n_blobs, per_blob, d = 24, 180, 16
    centers = rng.standard_normal((n_blobs, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, truth_l = [], []
    for b, c in enumerate(centers):
        # cone of half-angle up to ~33 deg: intra-cluster d up to ~0.2
        u = rng.standard_normal((per_blob, d)).astype(np.float32)
        u -= (u @ c)[:, None] * c
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        phi = rng.uniform(0, 0.58, per_blob)[:, None]
        rows.append(np.cos(phi) * c + np.sin(phi) * u)
        truth_l += [b] * per_blob
    matrix = np.concatenate(rows).astype(np.float32)
    truth = np.asarray(truth_l)
    lengths = rng.integers(2000, 50_000, len(matrix))
    matrix = normalize(matrix, inplace=True)

    counts = {}
    for scope in ("full", "subset"):
        gen = ClusterGenerator(
            matrix.copy(), lengths, normalized=True, wander_scope=scope
        )
        bins = [cl.members for cl in gen]
        emitted = np.concatenate([np.asarray(m) for m in bins])
        assert len(np.unique(emitted)) == len(matrix) == len(emitted), scope
        counts[scope] = _wide_nc(bins, truth, lengths, n_blobs)
    assert abs(counts["subset"] - counts["full"]) <= 1, counts
    assert counts["full"] >= n_blobs * 0.5, counts  # dataset has signal


def _wide_nc(bins, truth, lengths, n_blobs):
    blob_bases = np.zeros(n_blobs, np.int64)
    np.add.at(blob_bases, truth, lengths)
    best = np.zeros(n_blobs)
    for members in bins:
        idx = np.asarray(members, np.int64)
        total = int(lengths[idx].sum())
        per_b: dict[int, int] = {}
        for b, ln in zip(truth[idx], lengths[idx]):
            per_b[int(b)] = per_b.get(int(b), 0) + int(ln)
        for b, bases in per_b.items():
            if bases / total >= 0.95:
                best[b] = max(best[b], bases / blob_bases[b])
    return int(np.sum(best >= 0.90))


def test_compaction_and_wander_paths_match_quality(dataset):
    matrix, lengths, truth = dataset
    # floor low enough that the 6144-point run crosses the ladder twice
    bins_compact = _run(
        matrix, lengths, compact=True, compact_min_pad=1024, compact_async=False
    )
    bins_nocompact = _run(matrix, lengths, compact=False)
    bins_xla = _run(
        matrix, lengths, compact=True, compact_min_pad=1024,
        compact_async=False, wander_kernel="xla",
    )

    all_counts = {}
    for name, bins in (
        ("compact", bins_compact),
        ("nocompact", bins_nocompact),
        ("xla", bins_xla),
    ):
        # full-partition invariant: every point emitted exactly once
        emitted = np.concatenate([np.asarray(m) for m in bins])
        assert len(emitted) == N, f"{name}: emitted {len(emitted)} of {N}"
        assert len(np.unique(emitted)) == N, f"{name}: duplicate emissions"
        all_counts[name] = _nc_like_blobs(bins, truth, lengths)

    # quality equivalence: the paths may emit different partitions of the
    # noise tail, but blob recovery must match (tight blobs leave no room
    # for a legitimate path to lose one)
    assert all_counts["compact"] == all_counts["nocompact"], all_counts
    assert all_counts["compact"] == all_counts["xla"], all_counts
    # and the dataset must actually have signal for this test to mean much
    assert all_counts["compact"] >= N_BLOBS - 2, all_counts

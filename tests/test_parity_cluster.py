"""Decision-rule parity: fused engine vs the sequential reference oracle.

Every test runs the device engine (`vamb_tpu.cluster.ClusterGenerator`) and
the host-side transcription of the reference control flow
(`tests/oracle_cluster.SequentialOracle`) on the same data with the same
RNG seed, and asserts the full emission sequence is identical: medoid,
seed, member sets, kind, radius, observed pvr, the pvr trajectory and the
success-window counters. Any drift in seed cycling, wander tried-marking,
valley-scan state, pvr feedback, or loner/fallback selection fails here.
"""

import numpy as np
import pytest

from vamb_tpu.cluster import ClusterGenerator

from .oracle_cluster import SequentialOracle


def assert_same_emission(matrix, lengths, rng_seed=0, **kwargs):
    engine = list(
        ClusterGenerator(matrix.copy(), lengths, rng_seed=rng_seed, **kwargs)
    )
    oracle = list(
        SequentialOracle(matrix.copy(), lengths, rng_seed=rng_seed, **kwargs)
    )
    assert len(engine) == len(oracle), (
        f"cluster count: engine {len(engine)} vs oracle {len(oracle)}"
    )
    for i, (e, o) in enumerate(zip(engine, oracle)):
        ctx = f"cluster {i}/{len(engine)}"
        assert e.kind_str == o.kind, (ctx, e.kind_str, o.kind)
        assert int(e.medoid) == o.medoid, (ctx, e.medoid, o.medoid)
        assert int(e.seed) == o.seed, (ctx, e.seed, o.seed)
        np.testing.assert_array_equal(
            np.sort(e.members), o.members, err_msg=ctx
        )
        if o.radius is None:
            assert e.radius is None, ctx
        else:
            np.testing.assert_allclose(e.radius, o.radius, atol=1e-7, err_msg=ctx)
        if o.observed_pvr is None:
            assert e.observed_pvr is None, ctx
        else:
            np.testing.assert_allclose(
                e.observed_pvr, o.observed_pvr, rtol=1e-5, err_msg=ctx
            )
        np.testing.assert_allclose(e.maximal_pvr, o.pvr, atol=1e-6, err_msg=ctx)
        assert e.successes == o.successes, (ctx, e.successes, o.successes)
        assert e.attempts == o.attempts, (ctx, e.attempts, o.attempts)
    # full partition on both sides
    all_members = np.concatenate([np.asarray(c.members) for c in engine])
    np.testing.assert_array_equal(np.sort(all_members), np.arange(len(matrix)))


def clumpy_latents(n_clusters, per_cluster, dim, noise_frac=0.0, seed=0):
    "Gaussian clumps + optional uniform noise, with realistic length spread."
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in centers:
        rows.append(c + rng.normal(scale=0.04, size=(per_cluster, dim)))
    n_noise = int(noise_frac * n_clusters * per_cluster)
    if n_noise:
        rows.append(rng.normal(size=(n_noise, dim)))
    matrix = np.concatenate(rows).astype(np.float32)
    lengths = rng.integers(2000, 50_000, len(matrix)).astype(np.float32)
    return matrix, lengths


class TestClusterParity:
    def test_clumpy_normal_regime(self):
        "Well-separated clumps: mostly normal clusters at pvr 0.1."
        matrix, lengths = clumpy_latents(40, 30, 32, seed=1)
        assert_same_emission(matrix, lengths, rng_seed=3)

    def test_mixed_regime_with_noise(self):
        "Clumps + 20% uniform noise: normal, loner, reject and pvr bumps."
        matrix, lengths = clumpy_latents(25, 25, 32, noise_frac=0.2, seed=2)
        assert_same_emission(matrix, lengths, rng_seed=7, windowsize=60)

    def test_uniform_fallback_regime(self):
        """Unclusterable uniform latents: pvr climbs 0.1 -> >0.55, then the
        radius-0.06 fallback path empties the matrix. Small window keeps
        the bump cadence fast."""
        rng = np.random.default_rng(3)
        matrix = rng.normal(size=(600, 32)).astype(np.float32)
        lengths = rng.integers(2000, 10_000, 600).astype(np.float32)
        assert_same_emission(
            matrix, lengths, rng_seed=11, windowsize=40, minsuccesses=5
        )

    @pytest.mark.slow
    def test_large_10k(self):
        "VERDICT-mandated >=10k-point parity run across pvr regimes."
        matrix, lengths = clumpy_latents(120, 70, 32, noise_frac=0.2, seed=4)
        assert len(matrix) >= 10_000
        assert_same_emission(matrix, lengths, rng_seed=13, windowsize=120)

    def test_tiny_edge_cases(self):
        for n in (1, 2, 5):
            rng = np.random.default_rng(n)
            matrix = rng.normal(size=(n, 8)).astype(np.float32)
            lengths = np.full(n, 2500.0, np.float32)
            assert_same_emission(
                matrix, lengths, rng_seed=n, windowsize=10, minsuccesses=2
            )

    def test_duplicate_points_single_cluster(self):
        "Identical rows collapse into one cluster on both sides."
        row = np.random.default_rng(9).normal(size=32).astype(np.float32)
        matrix = np.tile(row, (50, 1))
        lengths = np.linspace(2000, 9000, 50).astype(np.float32)
        assert_same_emission(matrix, lengths, rng_seed=1)

    def test_power_of_two_lengths_exact_histogram(self):
        "Power-of-two lengths make f32 histogram sums exactly associative."
        matrix, _ = clumpy_latents(20, 40, 32, seed=6)
        rng = np.random.default_rng(6)
        lengths = (2.0 ** rng.integers(11, 16, len(matrix))).astype(np.float32)
        assert_same_emission(matrix, lengths, rng_seed=2)


class TestSubsetWanderParity:
    """Emission parity for wander_scope='subset' — the large-N fast path
    (block-gathered neighborhood climb with full-sweep fallback). Forced on
    at small N so the sequential oracle (which mirrors the subset kernels,
    the drift/overflow fallback rule and the unconditional final row
    recompute) stays tractable.

    Scope of the claim: subset mode is a documented APPROXIMATE
    medoid-selection heuristic (see cluster.py at _SUBSET_RADIUS), so the
    oracle here mirrors the engine's own kernels — these tests pin the
    implementation (sequential-vs-fused transcription, burst/fallback/RNG
    bookkeeping), NOT exactness against the full-sweep algorithm. Quality
    equivalence against the exact path is asserted separately
    (tests/test_cluster_quality_ab.py and the bench A/B)."""

    def test_clumpy_subset(self):
        matrix, lengths = clumpy_latents(25, 25, 32, noise_frac=0.2, seed=2)
        assert_same_emission(
            matrix, lengths, rng_seed=7, windowsize=60, wander_scope="subset"
        )

    def test_subset_large_10k_crosses_fallbacks(self):
        "10k points: subset overflow/drift fallbacks must mirror exactly."
        matrix, lengths = clumpy_latents(120, 70, 32, noise_frac=0.2, seed=4)
        assert len(matrix) >= 10_000
        assert_same_emission(
            matrix, lengths, rng_seed=13, windowsize=120, wander_scope="subset"
        )

    def test_subset_lanes_off_classic_path(self):
        "attempt_batch='off' keeps the classic one-attempt path covered."
        matrix, lengths = clumpy_latents(25, 25, 32, noise_frac=0.2, seed=2)
        assert_same_emission(
            matrix, lengths, rng_seed=7, windowsize=60,
            wander_scope="subset", attempt_batch="off",
        )

    def test_subset_lanes_rejection_heavy_regime(self):
        """Uniform latents under subset+lanes: most lanes REJECT (no
        removals, window updates only), pvr bumps must cut mid-batch, and
        the radius-0.06 fallback lanes drain the tail — the regime where
        the acceptance scan's window/pvr replay is actually load-bearing."""
        rng = np.random.default_rng(31)
        matrix = rng.normal(size=(900, 32)).astype(np.float32)
        lengths = rng.integers(2000, 10_000, 900).astype(np.float32)
        assert_same_emission(
            matrix, lengths, rng_seed=11, windowsize=40, minsuccesses=5,
            wander_scope="subset",
        )

    def test_subset_dense_overflow_regime(self):
        """A single dense clump larger than the block budget forces the
        overflow fallback on most attempts."""
        rng = np.random.default_rng(8)
        matrix = (
            rng.normal(size=(1, 16))
            + 0.02 * rng.normal(size=(3000, 16))
        ).astype(np.float32)
        lengths = rng.integers(2000, 50_000, len(matrix)).astype(np.float32)
        import vamb_tpu.cluster as vc

        old_q = vc._SUBSET_Q
        vc._SUBSET_Q = 1 << 9  # block budget of 4 blocks: overflow-heavy
        try:
            assert_same_emission(
                matrix, lengths, rng_seed=3, wander_scope="subset"
            )
        finally:
            vc._SUBSET_Q = old_q

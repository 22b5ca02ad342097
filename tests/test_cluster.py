"""Clustering engine tests, modeled on reference test/test_cluster.py:
full-partition invariant on random data, plus separated-blob recovery,
determinism, loner handling, and normalization semantics."""

import numpy as np
import pytest

from vamb_tpu.cluster import Cluster, ClusterGenerator, normalize


def random_data(n=1024, d=40, seed=0):
    rng = np.random.default_rng(seed)
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    lengths = rng.integers(2000, 10_000, n)
    return matrix, lengths


class TestNormalize:
    def test_distance_range(self):
        matrix, _ = random_data(100, 16)
        nm = normalize(matrix)
        dots = nm @ nm.T
        dist = 0.5 - dots
        assert dist.min() > -1e-5 and dist.max() < 1.0 + 1e-5
        np.testing.assert_allclose(np.diag(dist), 0.0, atol=1e-6)

    def test_zero_rows_uniform(self):
        matrix = np.zeros((3, 8), np.float32)
        matrix[0] = 1.0
        nm = normalize(matrix)
        # zero rows -> uniform direction, same for both zero rows
        np.testing.assert_allclose(nm[1], nm[2])
        assert np.all(nm[1] > 0)

    def test_inplace(self):
        matrix, _ = random_data(10, 8)
        out = normalize(matrix, inplace=True)
        assert out is matrix


class TestClusterGenerator:
    def test_bad_params(self):
        matrix, lengths = random_data(50, 8)
        with pytest.raises(ValueError):
            ClusterGenerator(matrix.astype(np.float64), lengths)
        with pytest.raises(ValueError):
            ClusterGenerator(matrix, lengths, maxsteps=0)
        with pytest.raises(ValueError):
            ClusterGenerator(matrix, lengths, windowsize=0)
        with pytest.raises(ValueError):
            ClusterGenerator(matrix, lengths, minsuccesses=0)
        with pytest.raises(ValueError):
            ClusterGenerator(matrix, lengths[:-1])
        with pytest.raises(ValueError):
            ClusterGenerator(matrix, lengths, wander_kernel="nope")
        # forcing the Pallas kernels off-TPU (tests run on CPU) must be a
        # constructor error, not an opaque lowering failure
        with pytest.raises(ValueError):
            ClusterGenerator(matrix, lengths, wander_kernel="pallas")

    def test_full_partition(self):
        "Every input index appears in exactly one emitted cluster."
        matrix, lengths = random_data(512, 24)
        clusters = list(ClusterGenerator(matrix, lengths))
        seen = np.concatenate([c.members for c in clusters])
        assert len(seen) == 512
        assert np.array_equal(np.sort(seen), np.arange(512))
        for c in clusters:
            assert isinstance(c, Cluster)
            assert c.medoid in c.members
            assert c.kind_str in ("normal", "loner", "fallback")

    def test_deterministic(self):
        matrix, lengths = random_data(256, 16, seed=3)
        a = [tuple(c.members.tolist()) for c in ClusterGenerator(matrix.copy(), lengths)]
        b = [tuple(c.members.tolist()) for c in ClusterGenerator(matrix.copy(), lengths)]
        assert a == b

    def test_separated_blobs_recovered(self):
        "Tight well-separated blobs should come out as single clusters."
        rng = np.random.default_rng(7)
        centers = rng.standard_normal((4, 24)).astype(np.float32) * 10
        rows, truth = [], []
        for k, c in enumerate(centers):
            rows.append(c + 0.01 * rng.standard_normal((50, 24)).astype(np.float32))
            truth.extend([k] * 50)
        matrix = np.concatenate(rows)
        lengths = np.full(len(matrix), 5000)
        clusters = list(ClusterGenerator(matrix, lengths))
        # every emitted cluster must be pure wrt ground truth
        truth_arr = np.array(truth)
        big = [c for c in clusters if len(c.members) > 5]
        assert len(big) == 4
        for c in big:
            assert len(set(truth_arr[c.members])) == 1

    def test_single_point(self):
        matrix = np.ones((1, 8), np.float32)
        lengths = np.array([3000])
        clusters = list(ClusterGenerator(matrix, lengths))
        assert len(clusters) == 1
        assert clusters[0].members.tolist() == [0]

    def test_input_matrix_not_mutated_without_destroy(self):
        matrix, lengths = random_data(64, 8)
        before = matrix.copy()
        list(ClusterGenerator(matrix, lengths))
        np.testing.assert_array_equal(matrix, before)

    def test_destroy_normalizes_in_place(self):
        matrix, lengths = random_data(64, 8)
        before = matrix.copy()
        list(ClusterGenerator(matrix, lengths, destroy=True))
        assert not np.array_equal(matrix, before)

    def test_seeds_in_length_order(self):
        "First cluster's seed should be the longest contig."
        matrix, lengths = random_data(128, 16, seed=5)
        gen = ClusterGenerator(matrix, lengths)
        first = next(iter(gen))
        assert first.seed == int(np.argmax(lengths))


class TestFindThresholdVectorized:
    """Property test: the closed-form valley scan in the device engine must
    match the reference's sequential state machine (cluster.py:483-543)."""

    @staticmethod
    def sequential(densities, pvr):
        "Direct transcription of the sequential scan semantics."
        peak_density = 0.0
        peak_over = False
        threshold = None
        density_at_minimum = 0.0
        x = 0.0
        delta_x = 0.3 / 60
        for density in densities:
            if not peak_over and density > peak_density:
                if x > 0.1:
                    return (None, None, False)
                peak_density = density
            if not peak_over and density < 0.6 * peak_density:
                peak_over = True
                density_at_minimum = density
            if peak_over and density > 1.5 * density_at_minimum:
                break
            if peak_over and density < density_at_minimum:
                density_at_minimum = density
                if density < pvr * peak_density:
                    threshold = x
            x += delta_x
        if threshold is None or threshold > 0.2 + pvr:
            return (None, None, False)
        return (threshold, density_at_minimum / peak_density, True)

    def test_matches_sequential_on_random_histograms(self):
        import jax
        import jax.numpy as jnp

        from vamb_tpu.cluster import _NORMALPDF as PDF
        from vamb_tpu.cluster import _find_threshold_device

        scan = jax.jit(_find_threshold_device)

        def _device_find_threshold(hist, pvr):
            thr, opvr, found = scan(jnp.asarray(hist), jnp.float32(pvr))
            return float(thr), float(opvr), bool(found)

        rng = np.random.default_rng(0)

        for trial in range(500):
            kind = trial % 5
            if kind == 0:
                hist = rng.uniform(0, 100, 60)
            elif kind == 1:
                # clean peak then valley then peak
                hist = np.concatenate(
                    [rng.uniform(50, 100, 10), rng.uniform(0, 5, 20),
                     rng.uniform(30, 80, 30)]
                )
            elif kind == 2:
                hist = np.zeros(60)
                hist[rng.integers(0, 60, 5)] = rng.uniform(10, 100, 5)
            elif kind == 3:
                hist = np.linspace(100, 0, 60) + rng.uniform(0, 10, 60)
            else:
                hist = np.linspace(0, 100, 60) + rng.uniform(0, 10, 60)
            hist = hist.astype(np.float32)
            pvr = float(rng.choice([0.1, 0.2, 0.3, 0.5, 0.6]))
            densities = np.convolve(hist, PDF, mode="same")

            seq_thr, seq_opvr, seq_found = self.sequential(densities, pvr)
            vec_thr, vec_opvr, vec_found = _device_find_threshold(hist, pvr)
            assert bool(vec_found) == seq_found, (trial, seq_thr, vec_thr)
            if seq_found:
                np.testing.assert_allclose(vec_thr, seq_thr, atol=1e-6)
                np.testing.assert_allclose(vec_opvr, seq_opvr, rtol=1e-5)


class TestBf16DistancePath:
    """The opt-in bfloat16 distance mode halves HBM traffic at ~1e-3
    distance error (bins are 5e-3 wide). It must still emit a full
    partition and agree with f32 on the overwhelming majority of
    memberships on well-separated data."""

    def test_compaction_partition_quality_determinism(self):
        """With the size floor forced low, the engine compacts mid-run:
        the result must still be a full partition, deterministic, and pure
        on well-separated blobs (compaction reindexes the sampling RNG, so
        equality with a compaction-free run is NOT expected — see the
        ClusterGenerator docstring)."""
        rng = np.random.default_rng(11)
        centers = rng.standard_normal((24, 16)).astype(np.float32) * 8
        matrix = np.concatenate(
            [c + 0.01 * rng.standard_normal((80, 16)) for c in centers]
        ).astype(np.float32)
        n = len(matrix)
        lengths = rng.integers(2000, 9000, n)

        def run():
            gen = ClusterGenerator(
                matrix.copy(),
                lengths,
                rng_seed=5,
                batch_clusters=4,
                compact_min_pad=128,
                compact_async=False,
            )
            clusters = list(gen)
            return gen, clusters

        gen, clusters = run()
        assert gen._n_live_pad < 1920, gen._n_live_pad  # compaction happened
        seen = np.sort(np.concatenate([c.members for c in clusters]))
        np.testing.assert_array_equal(seen, np.arange(n))
        truth = np.repeat(np.arange(24), 80)
        for c in clusters:
            if len(c.members) > 5:
                assert len(set(truth[c.members])) == 1
        _, clusters2 = run()
        assert len(clusters2) == len(clusters)
        for a, b in zip(clusters, clusters2):
            np.testing.assert_array_equal(a.members, b.members)
            assert a.medoid == b.medoid

    def test_bf16_partition_and_agreement(self):
        rng = np.random.default_rng(8)
        centers = rng.normal(size=(20, 24)).astype(np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        matrix = np.concatenate(
            [c + rng.normal(scale=0.03, size=(30, 24)) for c in centers]
        ).astype(np.float32)
        lengths = rng.integers(2000, 9000, len(matrix)).astype(np.float32)

        f32 = list(ClusterGenerator(matrix.copy(), lengths, rng_seed=2))
        bf16 = list(
            ClusterGenerator(
                matrix.copy(), lengths, rng_seed=2, distance_dtype="bfloat16"
            )
        )
        members_bf = np.sort(np.concatenate([c.members for c in bf16]))
        np.testing.assert_array_equal(members_bf, np.arange(len(matrix)))

        def labelize(clusters):
            lab = np.empty(len(matrix), np.int32)
            for i, c in enumerate(clusters):
                lab[np.asarray(c.members)] = i
            return lab

        la, lb = labelize(f32), labelize(bf16)
        # pairwise co-membership agreement on a sample of pairs
        idx = rng.integers(0, len(matrix), (4000, 2))
        same_a = la[idx[:, 0]] == la[idx[:, 1]]
        same_b = lb[idx[:, 0]] == lb[idx[:, 1]]
        agreement = float(np.mean(same_a == same_b))
        assert agreement > 0.95, agreement


class TestEngineOrder:
    "Geometry-local column order + seed ranks (cluster.engine_order)."

    def _data(self, n=1000, seed=0):
        from vamb_tpu.cluster import normalize

        rng = np.random.default_rng(seed)
        m = normalize(rng.standard_normal((n, 16)).astype(np.float32))
        lengths = rng.integers(2000, 50_000, n).astype(np.float32)
        return m, lengths

    def test_order_is_permutation_and_deterministic(self):
        from vamb_tpu.cluster import engine_order

        m, lengths = self._data()
        order1, ranks1 = engine_order(m, lengths, rng_seed=3)
        order2, ranks2 = engine_order(m, lengths, rng_seed=3)
        np.testing.assert_array_equal(order1, order2)
        np.testing.assert_array_equal(ranks1, ranks2)
        np.testing.assert_array_equal(np.sort(order1), np.arange(len(m)))
        np.testing.assert_array_equal(np.sort(ranks1), np.arange(len(m)))

    def test_ranks_encode_descending_length_order(self):
        "rank r's column must hold the r-th longest contig (stable ties)."
        from vamb_tpu.cluster import engine_order

        m, lengths = self._data(seed=1)
        order, ranks = engine_order(m, lengths, rng_seed=5)
        by_len = np.argsort(lengths, kind="stable")[::-1]
        col_of_rank = np.empty(len(m), np.int64)
        col_of_rank[ranks] = np.arange(len(m))
        # original index of the rank-r column == r-th entry of the stable
        # descending-length sort
        np.testing.assert_array_equal(order[col_of_rank], by_len)

    def test_clustered_points_land_in_few_blocks(self):
        "The point of the order: a tight cluster spans few 128-blocks."
        from vamb_tpu.cluster import engine_order, normalize

        rng = np.random.default_rng(7)
        n, per = 40_960, 512
        centers = rng.standard_normal((n // per, 16)).astype(np.float32) * 4
        m = np.repeat(centers, per, axis=0) + 0.01 * rng.standard_normal(
            (n, 16)
        ).astype(np.float32)
        m = normalize(m)
        lengths = rng.integers(2000, 50_000, n).astype(np.float32)
        order, _ = engine_order(m, lengths, rng_seed=0)
        pos_of_original = np.empty(n, np.int64)
        pos_of_original[order] = np.arange(n)
        cluster0 = pos_of_original[:per]  # engine columns of cluster 0
        n_blocks = len(np.unique(cluster0 // 128))
        # random order would put ~512 members in ~500 distinct blocks
        assert n_blocks <= 32, n_blocks


class TestBatchedRowContract:
    """The subset path's final-row contract: every attempt's full distance
    row — classic or speculative lane — is a row of ONE batched
    (S,F)x(F,N) expression (cluster.py spec_batch), and a row's values
    depend only on its own id, never on which other ids share the batch.
    The parity oracle reproduces any lane's row by broadcasting a single
    medoid over the batch, which is only sound under this independence —
    if an XLA change ever makes batched-dot rows composition-dependent,
    this must fail loudly here rather than as a parity flake."""

    def test_batched_row_composition_independent(self):
        import jax
        import jax.numpy as jnp

        prec = jax.lax.Precision.HIGHEST

        @jax.jit
        def rows_batch(mT, ids):
            rows = mT[:, ids]
            D = 0.5 - jnp.einsum(
                "fc,fn->cn", rows, mT, precision=prec,
                preferred_element_type=jnp.float32,
            )
            iota = jnp.arange(mT.shape[1])
            return jnp.where(iota[None, :] == ids[:, None], 0.0, D)

        rng = np.random.default_rng(5)
        n, f = 1024, 32
        matrix = normalize(rng.standard_normal((n, f)).astype(np.float32))
        mT = jnp.asarray(matrix.T)
        for trial in range(8):
            ids = rng.integers(0, n, 8).astype(np.int32)
            batch = np.asarray(rows_batch(mT, jnp.asarray(ids)))
            for j in range(8):
                solo = np.asarray(
                    rows_batch(mT, jnp.full(8, ids[j], jnp.int32))
                )[0]
                np.testing.assert_array_equal(
                    batch[j], solo,
                    err_msg=f"trial {trial} lane {j}: batched row depends "
                    "on batch composition",
                )

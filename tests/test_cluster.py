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

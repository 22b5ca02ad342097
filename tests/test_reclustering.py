"""Markers + reclustering tests (the reference's test_reclustering.py is an
empty skeleton — these go further)."""

import io

import numpy as np
import pytest

from vamb_tpu.markers import Markers, get_name_to_id
from vamb_tpu.ops.kmeans import kmeans
from vamb_tpu.reclustering import (
    DBScanAlgorithm,
    KmeansAlgorithm,
    count_good_genomes,
    count_markers,
    dbscan_genus,
    get_kmeans_seeds,
    group_indices_by_genus,
    recluster_bins,
)
from vamb_tpu.composition import CompositionMetaData
from vamb_tpu.taxonomy import ContigTaxonomy, Taxonomy
from vamb_tpu.utils import RefHasher


def make_markers(marker_lists, n_markers=10):
    names = [[f"M{i}"] for i in range(n_markers)]
    arrays = [
        None if m is None else np.array(m, dtype=np.uint8) for m in marker_lists
    ]
    refhash = RefHasher.hash_refnames(f"c{i}" for i in range(len(marker_lists)))
    return Markers(arrays, names, refhash)


class TestMarkers:
    def test_score_bin(self):
        markers = make_markers([[0, 1], [1, 2], None, [3]], n_markers=4)
        comp, cont = markers.score_bin([0, 1, 3])
        # unique markers 0,1,2,3 = 4/4; one duplicate (1) -> 1/4
        assert comp == 1.0
        assert cont == 0.25

    def test_save_load_roundtrip(self):
        markers = make_markers([[0, 1], None, [2]], n_markers=4)
        buf = io.StringIO()
        markers.save(buf)
        buf.seek(0)
        loaded = Markers.load(io.BytesIO(buf.getvalue().encode()), markers.refhash)
        assert loaded.n_markers == 4
        assert loaded.markers[1] is None
        np.testing.assert_array_equal(loaded.markers[0], [0, 1])

    def test_refhash_mismatch_raises(self):
        markers = make_markers([[0]], n_markers=2)
        buf = io.StringIO()
        markers.save(buf)
        with pytest.raises(BaseException):
            Markers.load(
                io.BytesIO(buf.getvalue().encode()), b"x" * 16
            )

    def test_name_normalization(self):
        name_to_id, marker_names = get_name_to_id(
            ["TIGR00389", "TIGR00388", "PF0001"]
        )
        assert name_to_id["TIGR00388"] == name_to_id["TIGR00389"]
        assert len(marker_names) == 2

    def test_duplicate_names_raise(self):
        with pytest.raises(ValueError, match="unique"):
            Markers([None], [["A"], ["A"]], b"")


class TestKmeans:
    def test_separates_blobs(self):
        rng = np.random.default_rng(0)
        a = rng.normal(0, 0.1, (30, 4))
        b = rng.normal(5, 0.1, (25, 4))
        x = np.concatenate([a, b]).astype(np.float32)
        init = np.stack([x[0], x[40]])
        labels = kmeans(x, 2, init, np.ones(55))
        assert len(set(labels[:30])) == 1
        assert len(set(labels[30:])) == 1
        assert labels[0] != labels[40]

    def test_weights_pull_centroid(self):
        x = np.array([[0.0], [1.0], [10.0]], np.float32)
        init = np.array([[0.0], [10.0]], np.float32)
        labels = kmeans(x, 2, init, np.array([1.0, 1.0, 1.0]))
        assert labels[0] == labels[1] != labels[2]


class TestRecluster:
    def make_problem(self):
        "Two true genomes merged into one bin; SCGs duplicated."
        rng = np.random.default_rng(1)
        # centers away from the origin so cosine distance is meaningful
        c0 = rng.normal(0, 1, 8) * 3
        c1 = rng.normal(0, 1, 8) * 3
        latent = np.concatenate(
            [c0 + rng.normal(0, 0.05, (20, 8)), c1 + rng.normal(0, 0.05, (20, 8))]
        ).astype(np.float32)
        lengths = np.full(40, 5000)
        # each genome carries markers 0..4 once, spread over its contigs
        marker_lists = []
        for g in range(2):
            for i in range(20):
                marker_lists.append([i % 5] if i < 5 else None)
        markers = make_markers(marker_lists, n_markers=5)
        return latent, lengths, markers

    def test_kmeans_splits_merged_bin(self):
        latent, lengths, markers = self.make_problem()
        merged = [set(range(40))]
        out = recluster_bins(
            markers, latent, KmeansAlgorithm(merged, 0, lengths)
        )
        # median SCG count is 2 -> split into 2; each should be pure
        assert len(out) == 2
        for bin_ in out:
            arr = np.array(sorted(bin_))
            assert (arr < 20).all() or (arr >= 20).all()

    def test_kmeans_leaves_pure_bins(self):
        latent, lengths, markers = self.make_problem()
        pure = [set(range(20)), set(range(20, 40))]
        out = recluster_bins(markers, latent, KmeansAlgorithm(pure, 0, lengths))
        assert sorted(map(sorted, out)) == sorted(map(sorted, pure))

    def test_dbscan_by_genus(self):
        latent, lengths, markers = self.make_problem()
        names = np.array([f"c{i}" for i in range(40)], dtype=object)
        meta = CompositionMetaData(names, lengths, np.ones(40, bool), 2000)
        taxes = [
            ContigTaxonomy(["d", "p", "c", "o", "f", f"genus{i // 20}"], True)
            for i in range(40)
        ]
        taxonomy = Taxonomy(taxes, meta.refhash, True)
        out = recluster_bins(
            markers, latent, DBScanAlgorithm(meta, taxonomy, 1)
        )
        # each genus is one tight blob -> one bin per genus
        big = [b for b in out if len(b) > 1]
        assert len(big) == 2
        for bin_ in big:
            arr = np.array(sorted(bin_))
            assert (arr < 20).all() or (arr >= 20).all()

    def test_count_markers_and_good_genomes(self):
        latent, lengths, markers = self.make_problem()
        counts = count_markers(range(20), markers)
        np.testing.assert_array_equal(counts, [1, 1, 1, 1, 1])
        assert count_good_genomes([set(range(20))], markers) == 1
        # contaminated bin: both genomes
        assert count_good_genomes([set(range(40))], markers) == 0

    def test_group_by_genus_requires_canonical(self):
        taxes = [ContigTaxonomy(["a"], False)]
        tax = Taxonomy(taxes, b"", False)
        with pytest.raises(ValueError, match="canonical"):
            group_indices_by_genus(tax)

    def test_get_kmeans_seeds(self):
        markers = make_markers(
            [[0], [0], [1], None], n_markers=2
        )
        lengths = np.array([9000, 8000, 100, 50])
        counts = count_markers(range(4), markers)
        seeds = get_kmeans_seeds(range(4), markers, lengths, counts, 2)
        assert seeds == [0, 1]  # marker 0's smallest carrier (8000) is longest

    def test_dbscan_genus_eps_behavior(self):
        rng = np.random.default_rng(2)
        pts = np.concatenate(
            [[1, 0, 0, 0] + rng.normal(0, 0.01, (10, 4)),
             [0, 1, 0, 0] + rng.normal(0, 0.01, (10, 4))]
        )
        idx = np.arange(20)
        lengths = np.full(20, 3000)
        bins_tight = dbscan_genus(pts, idx, lengths, eps=0.01)
        assert len([b for b in bins_tight if len(b) > 1]) == 2


class TestDBSCANSklearnEquivalence:
    """Property test for the documented simplification in reclustering.py:
    with contig-length sample weights (every weight >= min contig length >>
    min_samples=5) weighted DBSCAN reduces to connected components of the
    eps-graph. Verified here directly against sklearn.cluster.DBSCAN with
    sample_weight — the exact call the reference makes
    (/root/reference/vamb/reclustering.py:294-301)."""

    @staticmethod
    def _partition(bins):
        return {frozenset(b) for b in bins}

    @staticmethod
    def _sklearn_bins(latent, indices, lengths, eps):
        from sklearn.cluster import DBSCAN
        from sklearn.metrics import pairwise_distances
        from collections import defaultdict

        dm = pairwise_distances(latent, latent, metric="cosine")
        db = DBSCAN(eps=eps, min_samples=5, metric="precomputed")
        db.fit(dm, sample_weight=lengths)
        bins = defaultdict(set)
        for orig, lab in zip(indices, db.labels_):
            bins[int(lab)].add(int(orig))
        return list(bins.values())

    def _check_dataset(self, latent, lengths):
        idx = np.arange(len(latent))
        for eps in np.arange(0.01, 0.35, 0.02):
            ours = self._partition(dbscan_genus(latent, idx, lengths, float(eps)))
            ref = self._partition(
                self._sklearn_bins(latent, idx, lengths, float(eps))
            )
            assert ours == ref, (
                f"partition mismatch at eps={eps}: ours={sorted(map(sorted, ours))} "
                f"sklearn={sorted(map(sorted, ref))}"
            )

    def test_random_blobs_full_eps_grid(self):
        rng = np.random.default_rng(0)
        for trial in range(5):
            n_blobs = rng.integers(2, 6)
            centers = rng.normal(0, 1, (n_blobs, 8))
            sizes = rng.integers(3, 30, n_blobs)
            latent = np.concatenate(
                [
                    c + rng.normal(0, 0.05 * (trial + 1), (s, 8))
                    for c, s in zip(centers, sizes)
                ]
            ).astype(np.float32)
            lengths = rng.integers(2000, 50_000, len(latent))
            self._check_dataset(latent, lengths)

    def test_uniform_noise_cloud(self):
        # dense cloud: components merge/split right at the eps thresholds
        rng = np.random.default_rng(1)
        latent = rng.normal(0, 1, (120, 6)).astype(np.float32)
        lengths = rng.integers(2000, 10_000, 120)
        self._check_dataset(latent, lengths)

    def test_duplicates_and_zero_vectors(self):
        rng = np.random.default_rng(2)
        latent = rng.normal(0, 1, (40, 5)).astype(np.float32)
        latent[10] = latent[3]          # exact duplicates
        latent[20] = latent[3]
        latent[30] = 0.0                # zero vector (cosine dist 1 to all)
        lengths = rng.integers(2000, 9_000, 40)
        self._check_dataset(latent, lengths)

    def test_minimum_realistic_weight(self):
        # the reduction's contract is weight >= min_samples; the reference's
        # smallest allowed contig length (-m 250, and the 2000 default) is
        # far above min_samples=5 — pin the boundary itself
        rng = np.random.default_rng(3)
        latent = rng.normal(0, 1, (60, 4)).astype(np.float32)
        lengths = np.full(60, 5)  # == min_samples exactly
        self._check_dataset(latent, lengths)

"""Tests for Composition (TNF feature extraction) and the projection kernel."""

import io
import random
import unittest

import numpy as np

from vamb_tpu.composition import Composition, CompositionMetaData
from vamb_tpu.ops.kernel import create_dual_kernel, load_tnf_kernel
from vamb_tpu.ops.tnf import project_fourmers, project_fourmers_numpy
from vamb_tpu.utils import Reader

from tests import testtools


class TestKernel(unittest.TestCase):
    def test_loaded_kernel_shape(self):
        k = load_tnf_kernel()
        self.assertEqual(k.shape, (256, 103))
        self.assertEqual(k.dtype, np.float32)

    def test_regenerated_kernel_spans_same_space(self):
        # Regenerated basis must span the same null space as the vendored
        # asset: projecting the loaded kernel onto the regenerated basis and
        # back must be the identity (both are orthonormal bases of it).
        mine = create_dual_kernel()
        ref = load_tnf_kernel()
        # Solve ref ~= mine @ Q: residual tiny iff column spaces agree
        q, *_ = np.linalg.lstsq(mine.astype(np.float64), ref.astype(np.float64), rcond=None)
        resid = np.abs(mine.astype(np.float64) @ q - ref).max()
        self.assertLess(resid, 1e-5)

    def test_kernel_kills_invariants(self):
        # A constant-shifted frequency vector must project identically:
        # the all-ones direction is in the constraint space.
        k = load_tnf_kernel().astype(np.float64)
        ones = np.ones((1, 256))
        self.assertLess(np.abs(ones @ k).max(), 1e-4)


class TestProjection(unittest.TestCase):
    def test_device_matches_numpy(self):
        rng = np.random.default_rng(0)
        counts = rng.integers(0, 50, size=(64, 256)).astype(np.float32)
        a = project_fourmers(counts.copy())
        b = project_fourmers_numpy(counts.copy())
        np.testing.assert_allclose(a, b, atol=2e-6)

    def test_zero_rows(self):
        counts = np.zeros((4, 256), dtype=np.float32)
        out = project_fourmers(counts)
        # zero-count rows: freq = 0 - 1/256 everywhere -> fixed projection
        self.assertTrue(np.all(np.isfinite(out)))
        np.testing.assert_allclose(out[0], out[1], atol=0)


class TestCompositionFromFile(unittest.TestCase):
    def _comp_of(self, data: bytes, minlength=2000, use_device=True):
        return Composition.from_file(
            io.BytesIO(data), None, minlength=minlength, use_device=use_device
        )

    def test_minlength_filter(self):
        rng = random.Random(0)
        data, names, lengths = testtools.make_fasta_bytes(rng, 10, 1000, 4000)
        comp = self._comp_of(data)
        kept = [n for n, l in zip(names, lengths) if l >= 2000]
        self.assertEqual(list(comp.metadata.identifiers), kept)
        self.assertEqual(comp.matrix.shape, (len(kept), 103))
        self.assertEqual(len(comp.metadata.mask), 10)
        self.assertEqual(int(comp.metadata.mask.sum()), len(kept))

    def test_duplicate_names_raise(self):
        data = b">a\n" + b"A" * 2500 + b"\n>a\n" + b"C" * 2500 + b"\n"
        with self.assertRaises(ValueError):
            self._comp_of(data)

    def test_low_minlength_raises(self):
        with self.assertRaises(ValueError):
            self._comp_of(b">a\nACGT\n", minlength=3)

    def test_mantissa_masked(self):
        rng = random.Random(1)
        data, *_ = testtools.make_fasta_bytes(rng, 5, 2500, 3000)
        comp = self._comp_of(data)
        self.assertTrue(np.all(comp.matrix.view(np.uint32) & np.uint32(0xFFF) == 0))

    def test_device_and_host_paths_agree_after_masking(self):
        # Device (XLA) and host (BLAS) matmuls differ in reduction order, so
        # bit-identity across BACKENDS is not guaranteed even after mantissa
        # masking; within one backend results are deterministic. Require the
        # paths to agree to float32 roundoff and be mostly bit-identical.
        rng = random.Random(2)
        data, *_ = testtools.make_fasta_bytes(rng, 8, 2500, 6000)
        a = self._comp_of(data, use_device=True)
        b = self._comp_of(data, use_device=False)
        np.testing.assert_allclose(a.matrix, b.matrix, atol=1e-6)
        bit_equal = (a.matrix.view(np.uint32) == b.matrix.view(np.uint32)).mean()
        self.assertGreater(bit_equal, 0.99)

    def test_save_load_roundtrip(self):
        rng = random.Random(3)
        data, *_ = testtools.make_fasta_bytes(rng, 5, 2500, 3000)
        comp = self._comp_of(data)
        buf = io.BytesIO()
        comp.save(buf)
        buf.seek(0)
        comp2 = Composition.load(buf)
        np.testing.assert_array_equal(comp.matrix, comp2.matrix)
        self.assertEqual(
            list(comp.metadata.identifiers), list(comp2.metadata.identifiers)
        )
        self.assertEqual(comp.metadata.refhash, comp2.metadata.refhash)

    def test_filter_min_length(self):
        rng = random.Random(4)
        data, names, lengths = testtools.make_fasta_bytes(rng, 20, 2000, 9000)
        comp = self._comp_of(data)
        comp.filter_min_length(5000)
        kept = [n for n, l in zip(names, lengths) if l >= 5000]
        self.assertEqual(list(comp.metadata.identifiers), kept)
        self.assertEqual(comp.matrix.shape[0], len(kept))

    def test_synthetic_end_to_end_data(self):
        from tests import datagen

        comp = Composition.from_file(
            io.BytesIO(datagen.synthetic_fasta_bytes()), None, minlength=2000
        )
        self.assertEqual(comp.matrix.shape[1], 103)
        self.assertEqual(comp.nseqs, len(datagen.aemb_names()))
        # TNF values are bounded (frequencies minus mean, projected)
        self.assertLess(np.abs(comp.matrix).max(), 1.0)


class TestCompositionMetaData(unittest.TestCase):
    def test_bad_inputs(self):
        ids = np.array(["a", "b"], dtype=object)
        lengths = np.array([2500, 2500], dtype=np.int32)
        mask = np.array([True, True])
        CompositionMetaData(ids, lengths, mask, 2000)  # ok
        with self.assertRaises(ValueError):
            CompositionMetaData(
                np.array(["a", "a"], dtype=object), lengths, mask, 2000
            )


if __name__ == "__main__":
    unittest.main()

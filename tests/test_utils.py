"""Unit tests for vamb_tpu.utils (parity model: reference test_vambtools.py)."""

import io
import itertools
import random
import unittest

import numpy as np

from vamb_tpu.utils import (
    BinSplitter,
    FastaEntry,
    PushArray,
    RefHasher,
    byte_iterfasta,
    mask_lower_bits,
    read_clusters,
    write_clusters,
    zscore,
)
from vamb_tpu.utils.arrays import numpy_inplace_maskarray
from vamb_tpu.utils.kmers import _kmercounts_numpy, kmercounts

from tests import testtools


class TestPushArray(unittest.TestCase):
    def test_append_extend_roundtrip(self):
        arr = PushArray(np.float64, start_capacity=4)
        arr.append(5.0)
        arr.extend(np.linspace(4, 3, 3))
        np.testing.assert_array_equal(arr.take(), np.array([5.0, 4.0, 3.5, 3.0]))

    def test_growth(self):
        arr = PushArray(np.int32, start_capacity=2)
        for i in range(1000):
            arr.append(i)
        self.assertEqual(len(arr), 1000)
        np.testing.assert_array_equal(arr.take(), np.arange(1000, dtype=np.int32))

    def test_clear(self):
        arr = PushArray(np.float32)
        arr.extend(np.ones(10, dtype=np.float32))
        arr.clear()
        self.assertEqual(len(arr), 0)
        self.assertEqual(len(arr.take()), 0)


class TestZscore(unittest.TestCase):
    def test_whole_array(self):
        x = np.random.default_rng(0).random((7, 9)).astype(np.float32)
        z = zscore(x)
        self.assertAlmostEqual(float(z.mean()), 0.0, places=5)
        self.assertAlmostEqual(float(z.std()), 1.0, places=5)

    def test_axis_and_inplace(self):
        x = np.random.default_rng(1).random((50, 4)).astype(np.float32)
        z = zscore(x, axis=0)
        np.testing.assert_allclose(z.mean(axis=0), 0.0, atol=1e-5)
        np.testing.assert_allclose(z.std(axis=0), 1.0, atol=1e-5)
        y = x.copy()
        zscore(y, axis=0, inplace=True)
        np.testing.assert_array_equal(y, z)

    def test_zero_std(self):
        x = np.ones((5, 3), dtype=np.float32)
        z = zscore(x, axis=0)
        np.testing.assert_array_equal(z, np.zeros((5, 3), dtype=np.float32))

    def test_int_inplace_raises(self):
        with self.assertRaises(TypeError):
            zscore(np.arange(5), inplace=True)


class TestMaskLowerBits(unittest.TestCase):
    def test_mask(self):
        x = np.array([1.2345678, 3.3219, -7.99991], dtype=np.float32)
        orig = x.copy()
        mask_lower_bits(x, 12)
        # Masked values close to originals, low 12 bits zero
        np.testing.assert_allclose(x, orig, rtol=1e-3)
        self.assertTrue(np.all(x.view(np.uint32) & np.uint32(0xFFF) == 0))

    def test_bad_bits(self):
        with self.assertRaises(ValueError):
            mask_lower_bits(np.zeros(2, dtype=np.float32), 24)


class TestInplaceMask(unittest.TestCase):
    def test_matches_fancy_indexing(self):
        rng = np.random.default_rng(2)
        x = rng.random((100, 7)).astype(np.float32)
        mask = rng.random(100) < 0.5
        expected = x[mask]
        out = numpy_inplace_maskarray(x, mask)
        np.testing.assert_array_equal(out, expected)


class TestKmercounts(unittest.TestCase):
    def test_against_naive(self):
        indexof = {
            "".join(ncs): idx
            for (idx, ncs) in enumerate(itertools.product("ACGT", repeat=4))
        }
        seq = testtools.make_randseq(random.Random(15), 900, 1100)
        sequence = seq.sequence.decode()
        manual_counts = np.zeros(256, dtype=int)
        for i in range(len(sequence) - 3):
            ind = indexof.get(sequence[i : i + 4].upper())
            if ind is not None:
                manual_counts[ind] += 1
        automatic = seq.kmercounts()
        self.assertTrue(np.all(manual_counts == automatic))

    def test_short_and_empty(self):
        self.assertEqual(int(kmercounts(b"").sum()), 0)
        self.assertEqual(int(kmercounts(b"ACG").sum()), 0)
        self.assertEqual(int(kmercounts(b"ACGT").sum()), 1)

    def test_ambiguous_resets(self):
        # N invalidates the 4 windows containing it
        counts = _kmercounts_numpy(b"AAAANAAAA")
        self.assertEqual(int(counts.sum()), 2)
        self.assertEqual(int(counts[0]), 2)  # AAAA twice

    def test_native_matches_numpy_if_present(self):
        rng = random.Random(7)
        for _ in range(5):
            seq = testtools.make_randseq(rng, 100, 2000).sequence
            np.testing.assert_array_equal(
                kmercounts(bytes(seq)), _kmercounts_numpy(bytes(seq))
            )


class TestFastaEntry(unittest.TestCase):
    def test_roundtrip(self):
        entry = FastaEntry(b"foo desc here", bytearray(b"ACGTacgtNn"))
        self.assertEqual(entry.identifier, "foo")
        self.assertEqual(entry.description, " desc here")
        self.assertEqual(entry.header, "foo desc here")
        self.assertEqual(len(entry), 10)

    def test_bad_header(self):
        for bad in [b"", b"=123", b"#foo", b"\xff"]:
            with self.assertRaises(ValueError):
                FastaEntry(bad, bytearray(b"ACGT"))

    def test_bad_sequence(self):
        with self.assertRaises(ValueError):
            FastaEntry(b"ok", bytearray(b"ACGTX"))

    def test_rename(self):
        seq = FastaEntry(b"foo", bytearray(b"TaGkmYnAC"))
        seq.rename(b"identifier\t desc")
        self.assertEqual(seq.identifier, "identifier")
        self.assertEqual(seq.description, "\t desc")
        with self.assertRaises(ValueError):
            seq.rename(b"=123")

    def test_format(self):
        entry = FastaEntry(b"x", bytearray(b"A" * 70))
        formatted = entry.format()
        self.assertEqual(formatted, ">x\n" + "A" * 60 + "\n" + "A" * 10)


class TestByteIterfasta(unittest.TestCase):
    def test_parse(self):
        data = b">one\nACGT\nACGT\n>two rest\nTTTT\n"
        entries = list(byte_iterfasta(data.splitlines(keepends=True), None))
        self.assertEqual(len(entries), 2)
        self.assertEqual(entries[0].identifier, "one")
        self.assertEqual(bytes(entries[0].sequence), b"ACGTACGT")
        self.assertEqual(entries[1].identifier, "two")
        self.assertEqual(entries[1].description, " rest")

    def test_windows_newlines(self):
        data = b">one\r\nACGT\r\n>two\r\nGGGG\r\n"
        entries = list(byte_iterfasta(data.splitlines(keepends=True), None))
        self.assertEqual(entries[0].identifier, "one")
        self.assertEqual(bytes(entries[0].sequence), b"ACGT")

    def test_empty_file_ok(self):
        self.assertEqual(list(byte_iterfasta([], None)), [])

    def test_errors(self):
        with self.assertRaises(ValueError):
            list(byte_iterfasta(b"#foo\n>bar\nACGT".splitlines(True), None))
        with self.assertRaises(TypeError):
            list(byte_iterfasta(">abc\nTAG".splitlines(True), None))


class TestRefHasher(unittest.TestCase):
    def test_equal_and_diff(self):
        h1 = RefHasher.hash_refnames(["a", "b", "c"])
        h2 = RefHasher.hash_refnames(iter(["a", "b", "c"]))
        h3 = RefHasher.hash_refnames(["a", "b"])
        self.assertEqual(h1, h2)
        self.assertNotEqual(h1, h3)

    def test_verify_diagnostics(self):
        h1 = RefHasher.hash_refnames(["a", "b"])
        h2 = RefHasher.hash_refnames(["a", "c"])
        with self.assertRaises(ValueError) as ctx:
            RefHasher.verify_refhash(h1, h2, "x", "y", (["a", "b"], ["a", "c"]))
        self.assertIn("Identifier number 2", str(ctx.exception))
        RefHasher.verify_refhash(h1, h1, "x", "y", None)  # no raise


class TestClustersIO(unittest.TestCase):
    def test_roundtrip(self):
        clusters = [("c1", {"a", "b"}), ("c2", {"c"})]
        buf = io.StringIO()
        n_clusters, n_contigs = write_clusters(buf, clusters)
        self.assertEqual((n_clusters, n_contigs), (2, 3))
        buf.seek(0)
        back = read_clusters(buf)
        self.assertEqual(back, {"c1": {"a", "b"}, "c2": {"c"}})

    def test_min_size(self):
        buf = io.StringIO()
        write_clusters(buf, [("c1", {"a", "b"}), ("c2", {"c"})])
        buf.seek(0)
        self.assertEqual(read_clusters(buf, min_size=2), {"c1": {"a", "b"}})

    def test_bad_header(self):
        with self.assertRaises(ValueError):
            read_clusters(io.StringIO("bad\theader\nc\ta\n"))


class TestBinSplitter(unittest.TestCase):
    def test_split(self):
        splitter = BinSplitter("-")
        splitter.initialize(["s1-c1", "s2-c1"])
        out = dict(splitter.binsplit([("bin1", ["s1-c1", "s1-c5", "s2-c1"])]))
        # deterministic: sample groups and members in first-seen order
        self.assertEqual(
            out, {"s1-bin1": ["s1-c1", "s1-c5"], "s2-bin1": ["s2-c1"]}
        )

    def test_default_disables_on_bad_ids(self):
        splitter = BinSplitter(None)
        splitter.initialize(["nosep", "alsono"])  # no 'C' inside
        self.assertTrue(splitter.is_disabled())

    def test_explicit_errors_on_bad_ids(self):
        splitter = BinSplitter("X")
        with self.assertRaises(ValueError):
            splitter.initialize(["noxhere"])

    def test_inert(self):
        splitter = BinSplitter.inert_splitter()
        self.assertTrue(splitter.is_disabled())
        out = dict(splitter.binsplit([("bin1", ["a", "b"])]))
        self.assertEqual(out, {"bin1": ["a", "b"]})


if __name__ == "__main__":
    unittest.main()

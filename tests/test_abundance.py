"""Tests for Abundance TSV parsing (parity model: reference test_parsebam.py)."""

import io
import unittest
from pathlib import Path

import numpy as np

from vamb_tpu.abundance import Abundance
from vamb_tpu.composition import Composition, CompositionMetaData
from vamb_tpu.utils import Reader

from tests import testtools


def _metadata(names, lengths, mask=None):
    if mask is None:
        mask = np.ones(len(names), dtype=bool)
    kept_names = np.array([n for n, m in zip(names, mask) if m], dtype=object)
    kept_lengths = np.array(
        [l for l, m in zip(lengths, mask) if m], dtype=np.int32
    )
    return CompositionMetaData(kept_names, kept_lengths, np.asarray(mask), 2000)


def _tsv(names, matrix, samples):
    lines = ["contigname\t" + "\t".join(samples)]
    for name, row in zip(names, matrix):
        lines.append(name + "\t" + "\t".join(f"{x:.6f}" for x in row))
    return "\n".join(lines) + "\n"


class TestFromTsv(unittest.TestCase):
    def setUp(self):
        self.names = [f"S1C{i}" for i in range(6)]
        self.lengths = [2500] * 6
        rng = np.random.default_rng(0)
        self.matrix = rng.random((6, 3)).astype(np.float32)
        self.samples = ["s1", "s2", "s3"]

    def _write(self, tmpdir, content) -> Path:
        p = Path(tmpdir) / "ab.tsv"
        p.write_text(content)
        return p

    def test_roundtrip(self):
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            path = self._write(d, _tsv(self.names, self.matrix, self.samples))
            meta = _metadata(self.names, self.lengths)
            ab = Abundance.from_tsv(path, meta)
            np.testing.assert_allclose(ab.matrix, self.matrix, atol=1e-6)
            self.assertEqual(list(ab.samplenames), self.samples)
            self.assertEqual(ab.refhash, meta.refhash)

    def test_mask_skips_rows(self):
        import tempfile

        mask = np.array([True, False, True, True, False, True])
        with tempfile.TemporaryDirectory() as d:
            path = self._write(d, _tsv(self.names, self.matrix, self.samples))
            meta = _metadata(self.names, self.lengths, mask)
            ab = Abundance.from_tsv(path, meta)
            np.testing.assert_allclose(ab.matrix, self.matrix[mask], atol=1e-6)

    def test_errors(self):
        import tempfile

        meta = _metadata(self.names, self.lengths)
        with tempfile.TemporaryDirectory() as d:
            # bad header
            p = self._write(d, "wrong\ts1\nS1C0\t1.0\n")
            with self.assertRaises(ValueError):
                Abundance.from_tsv(p, meta)
            # too few rows
            p = self._write(d, _tsv(self.names[:3], self.matrix[:3], self.samples))
            with self.assertRaises(ValueError):
                Abundance.from_tsv(p, meta)
            # wrong column count on a row
            content = _tsv(self.names, self.matrix, self.samples)
            content = content.replace("\t", "", 1)  # damage header? no - first row
            # damage a data row instead
            lines = _tsv(self.names, self.matrix, self.samples).splitlines()
            lines[1] = lines[1].rsplit("\t", 1)[0]
            p = self._write(d, "\n".join(lines) + "\n")
            with self.assertRaises(ValueError):
                Abundance.from_tsv(p, meta)
            # wrong identifier order -> refhash mismatch
            shuffled = list(self.names)
            shuffled[0], shuffled[1] = shuffled[1], shuffled[0]
            p = self._write(d, _tsv(shuffled, self.matrix, self.samples))
            with self.assertRaises(ValueError):
                Abundance.from_tsv(p, meta)

    def test_save_load(self):
        meta = _metadata(self.names, self.lengths)
        ab = Abundance(self.matrix, self.samples, 0.0, meta.refhash)
        buf = io.BytesIO()
        ab.save(buf)
        buf.seek(0)
        ab2 = Abundance.load(buf, meta.refhash)
        np.testing.assert_array_equal(ab.matrix, ab2.matrix)
        buf.seek(0)
        with self.assertRaises(ValueError):
            Abundance.load(buf, b"wrong hash here!")


class TestReferenceAemb(unittest.TestCase):
    def test_merged_aemb_against_composition(self):
        """Merge the reference's bundled single-sample aemb TSVs (the
        strobealign --aemb output format: no header, name\\tdepth) into the
        multi-sample TSV format, and parse against a synthetic composition
        with matching identifiers."""
        import io as _io
        import tempfile

        from tests import datagen

        comp = Composition.from_file(
            _io.BytesIO(datagen.synthetic_fasta_bytes()), None, minlength=2000
        )

        with tempfile.TemporaryDirectory() as d:
            p = Path(d) / "merged.tsv"
            p.write_text(datagen.merged_abundance_tsv())
            ab = Abundance.from_tsv(p, comp.metadata)

        self.assertEqual(ab.nseqs, comp.nseqs)
        self.assertEqual(ab.nsamples, 3)
        self.assertTrue(np.all(np.isfinite(ab.matrix)))


if __name__ == "__main__":
    unittest.main()

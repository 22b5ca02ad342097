"""Taxonomy parsing/validation tests (reference behavior: vamb/taxonomy.py)."""

import io

import numpy as np
import pytest

from vamb_tpu.composition import CompositionMetaData
from vamb_tpu.taxonomy import (
    ContigTaxonomy,
    PredictedContigTaxonomy,
    PredictedTaxonomy,
    Taxonomy,
)


def metadata(names):
    return CompositionMetaData(
        np.array(names, dtype=object),
        np.full(len(names), 2500),
        np.ones(len(names), bool),
        2000,
    )


class TestContigTaxonomy:
    def test_from_semicolon_sep(self):
        t = ContigTaxonomy.from_semicolon_sep("Bacteria;Firmicutes;Bacilli")
        assert t.ranks == ["Bacteria", "Firmicutes", "Bacilli"]
        assert ContigTaxonomy.from_semicolon_sep("").ranks == []

    def test_canonical_limit(self):
        with pytest.raises(ValueError):
            ContigTaxonomy([str(i) for i in range(8)], is_canonical=True)

    def test_genus(self):
        t = ContigTaxonomy(["d", "p", "c", "o", "f", "g", "s"])
        assert t.genus == "g"
        assert ContigTaxonomy(["d", "p"]).genus is None


class TestTaxonomy:
    def test_from_file(self, tmp_path):
        p = tmp_path / "tax.tsv"
        p.write_text(
            "contigs\tpredictions\n"
            "c1\tBacteria;Firmicutes\n"
            "c2\tBacteria;Proteobacteria\n"
            "c3\t\n"
        )
        tax = Taxonomy.from_file(p, metadata(["c1", "c2", "c3"]), False)
        assert tax.nseqs == 3
        assert tax.contig_taxonomies[0].ranks == ["Bacteria", "Firmicutes"]
        assert tax.contig_taxonomies[2].ranks == []

    def test_missing_contig_raises(self, tmp_path):
        p = tmp_path / "tax.tsv"
        p.write_text("contigs\tpredictions\nc1\tBacteria\n")
        with pytest.raises(ValueError, match="expected 2 contigs"):
            Taxonomy.from_file(p, metadata(["c1", "c2"]), False)

    def test_bad_header(self, tmp_path):
        p = tmp_path / "tax.tsv"
        p.write_text("wrong\theader\nc1\tBacteria\n")
        with pytest.raises(ValueError, match="expected header"):
            Taxonomy.from_file(p, metadata(["c1"]), False)

    def test_duplicate_contig_raises(self, tmp_path):
        p = tmp_path / "tax.tsv"
        p.write_text("contigs\tpredictions\nc1\tBacteria\nc1\tBacteria\n")
        with pytest.raises(ValueError, match="Duplicate"):
            Taxonomy.from_file(p, metadata(["c1"]), False)

    def test_ambiguous_rank_raises(self, tmp_path):
        p = tmp_path / "tax.tsv"
        p.write_text("contigs\tpredictions\nc1\tX;Y\nc2\tY\n")
        with pytest.raises(ValueError, match="multiple ranks"):
            Taxonomy.from_file(p, metadata(["c1", "c2"]), False)

    def test_ambiguous_parent_raises(self, tmp_path):
        p = tmp_path / "tax.tsv"
        p.write_text("contigs\tpredictions\nc1\tA;X\nc2\tB;X\n")
        with pytest.raises(ValueError, match="multiple parents"):
            Taxonomy.from_file(p, metadata(["c1", "c2"]), False)

    def test_extra_filtered_contigs_ok(self, tmp_path):
        "Rows for contigs filtered by minlength are silently skipped."
        p = tmp_path / "tax.tsv"
        p.write_text(
            "contigs\tpredictions\nc1\tBacteria\nc_short\tArchaea\nc2\tBacteria\n"
        )
        tax = Taxonomy.from_file(p, metadata(["c1", "c2"]), False)
        assert tax.nseqs == 2


class TestPredictedTaxonomy:
    def test_roundtrip(self, tmp_path):
        meta = metadata(["c1", "c2"])
        preds = [
            PredictedContigTaxonomy(
                ContigTaxonomy(["Bacteria", "Firmicutes"]), np.array([0.9, 0.7])
            ),
            PredictedContigTaxonomy(ContigTaxonomy(["Bacteria"]), np.array([0.8])),
        ]
        pt = PredictedTaxonomy(preds, meta, False)
        buf = io.StringIO()
        pt.write_as_tsv(buf, meta)
        text = buf.getvalue()
        assert text.startswith("contigs\tpredictions\tscores\n")
        assert "c1\tBacteria;Firmicutes\t0.9;0.7" in text

        p = tmp_path / "refined.tsv"
        p.write_text(text)
        parsed = PredictedTaxonomy.parse_tax_file(p, False)
        assert parsed[0][0] == "c1"
        assert parsed[0][1].contig_taxonomy.ranks == ["Bacteria", "Firmicutes"]
        np.testing.assert_allclose(parsed[0][1].probs, [0.9, 0.7])

        tax = Taxonomy.from_refined_file(p, meta, False)
        assert tax.contig_taxonomies[1].ranks == ["Bacteria"]

    def test_probs_length_mismatch(self):
        with pytest.raises(ValueError):
            PredictedContigTaxonomy(ContigTaxonomy(["a", "b"]), np.array([0.5]))

    def test_probs_clipped(self):
        p = PredictedContigTaxonomy(
            ContigTaxonomy(["a"]), np.array([1.2])
        )
        assert p.probs[0] == 1.0

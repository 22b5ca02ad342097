"""Tests for the Avamb ensemble post-processing (dereplication + ripping).

Covers the decision stages of the reference's workflow_avamb Snakemake
scripts (manual_drep_JN.py, rip_bins.py) with synthetic CheckM2 reports:
quality gates, score-based duplicate removal, weakest-edge overlap ripping
(shared contigs leave the larger bin), and the CLI subcommand end-to-end.
"""

import io
import random

import numpy as np
import pytest

from vamb_tpu.avamb_ensemble import (
    BinQuality,
    dereplicate,
    ensemble_merge,
    filter_by_quality,
    read_checkm2_quality,
    rip_overlaps,
    score_bins_with_markers,
    write_nc_outputs,
)

LENGTHS = {f"C{i}": 100_000 for i in range(40)}


def contigs(*idx):
    return {f"C{i}" for i in idx}


class TestQualityReport:
    REPORT = (
        "Name\tCompleteness\tContamination\tCompleteness_Model_Used\n"
        "vae_1\t95.5\t2.0\tNeural Network\n"
        "z_2\t45.0\t0.0\tNeural Network\n"
        "y_3\t88.0\t12.5\tNeural Network\n"
    )

    def test_parse(self):
        q = read_checkm2_quality(io.StringIO(self.REPORT))
        assert q["vae_1"] == BinQuality(0.955, 0.02)
        assert q["z_2"].completeness == 0.45
        assert q["y_3"].contamination == 0.125

    def test_score_rule(self):
        "score = completeness - 5 * contamination (manual_drep_JN.py:223)."
        assert BinQuality(0.9, 0.02).score == pytest.approx(0.8)

    def test_bad_header(self):
        with pytest.raises(ValueError, match="Name"):
            read_checkm2_quality(io.StringIO("foo\tbar\n1\t2\n"))


class TestFilterAndDereplicate:
    def test_quality_and_size_gates(self):
        bins = {"a": contigs(0, 1, 2), "b": contigs(3), "c": contigs(4, 5)}
        q = {
            "a": BinQuality(0.95, 0.01),
            "b": BinQuality(0.95, 0.01),  # too small (1 contig < 250kb)
            "c": BinQuality(0.50, 0.01),  # too incomplete
        }
        kept = filter_by_quality(bins, q, LENGTHS, 0.9, 0.05, 250_000)
        assert set(kept) == {"a"}

    def test_unscored_bin_raises(self):
        with pytest.raises(ValueError, match="no entry"):
            filter_by_quality(
                {"a": contigs(0)}, {}, LENGTHS, 0.0, 1.0, 0
            )

    def test_duplicates_drop_lower_score(self):
        bins = {
            "good": contigs(0, 1, 2, 3),
            "dup": contigs(0, 1, 2),  # 100% of dup inside good
            "other": contigs(10, 11),
        }
        q = {
            "good": BinQuality(0.95, 0.01),
            "dup": BinQuality(0.80, 0.05),
            "other": BinQuality(0.9, 0.0),
        }
        out = dereplicate(bins, q, LENGTHS, min_cov=0.75)
        assert set(out) == {"good", "other"}

    def test_low_overlap_keeps_both(self):
        bins = {"a": contigs(0, 1, 2, 3), "b": contigs(3, 4, 5, 6)}
        q = {"a": BinQuality(0.9, 0.0), "b": BinQuality(0.8, 0.0)}
        out = dereplicate(bins, q, LENGTHS, min_cov=0.75)
        assert set(out) == {"a", "b"}


class TestRipOverlaps:
    def test_shared_contigs_leave_larger_bin(self):
        bins = {"big": contigs(0, 1, 2, 3, 4), "small": contigs(4, 5)}
        out = rip_overlaps(bins, LENGTHS)
        assert out["small"] == contigs(4, 5)
        assert out["big"] == contigs(0, 1, 2, 3)

    def test_output_is_disjoint_partition(self):
        rng = random.Random(0)
        bins = {
            f"b{k}": {f"C{rng.randrange(40)}" for _ in range(8)}
            for k in range(6)
        }
        out = rip_overlaps(bins, LENGTHS)
        seen = set()
        for members in out.values():
            assert not (members & seen)
            seen |= members
        # every contig that was in some input bin is still binned somewhere
        assert seen == set().union(*bins.values())

    def test_empty_bins_dropped(self):
        bins = {"a": contigs(0, 1), "b": contigs(0, 1)}
        out = rip_overlaps(bins, LENGTHS)
        assert len(out) == 1 and set().union(*out.values()) == contigs(0, 1)

    def test_zero_length_shared_contig_still_resolved(self):
        # disjointness must hold even when the only shared contigs carry
        # length 0 (weight-0 overlap edges must not be skipped)
        lengths = dict(LENGTHS)
        lengths["Z"] = 0
        bins = {"a": contigs(0, 1) | {"Z"}, "b": contigs(2, 3) | {"Z"}}
        out = rip_overlaps(bins, lengths)
        seen: set = set()
        for members in out.values():
            assert not (members & seen)
            seen |= members
        assert "Z" in seen

    def test_many_overlaps_resolve_weakest_first(self):
        # chain of bins where each consecutive pair shares one contig;
        # exercises the incremental edge-update path over several rips
        bins = {
            f"b{k}": {f"C{k}", f"C{k + 1}", f"X{k}"} for k in range(6)
        }
        lengths = {f"C{k}": 1000 + k for k in range(7)}
        lengths.update({f"X{k}": 5000 for k in range(6)})
        out = rip_overlaps(bins, lengths)
        seen: set = set()
        for members in out.values():
            assert not (members & seen)
            seen |= members
        assert seen == set().union(*bins.values())


class TestEnsembleMerge:
    def test_end_to_end(self):
        vae = {"vae_1": contigs(0, 1, 2, 3), "vae_2": contigs(10, 11, 12)}
        aae_z = {"z_1": contigs(0, 1, 2), "z_2": contigs(20, 21, 22)}
        aae_y = {"y_1": contigs(20, 21, 22, 12)}
        q = {
            "vae_1": BinQuality(0.96, 0.01),
            "vae_2": BinQuality(0.92, 0.02),
            "z_1": BinQuality(0.70, 0.01),  # duplicate of vae_1, worse
            "z_2": BinQuality(0.91, 0.00),
            "y_1": BinQuality(0.85, 0.10),  # fails contamination gate
        }
        out = ensemble_merge(
            [vae, aae_z, aae_y], q, LENGTHS,
            min_completeness=0.9, max_contamination=0.05,
            min_cov=0.75, min_bin_size=200_000,
        )
        assert set(out) == {"vae_1", "vae_2", "z_2"}
        # disjoint
        seen = set()
        for members in out.values():
            assert not (members & seen)
            seen |= members

    def test_duplicate_names_across_binnings_raise(self):
        with pytest.raises(ValueError, match="Duplicate bin name"):
            ensemble_merge(
                [{"x": contigs(0)}, {"x": contigs(1)}],
                {"x": BinQuality(1, 0)}, LENGTHS, min_bin_size=0,
            )


class TestNativeScoring:
    def make_markers(self, identifiers):
        "3-marker set over 6 contigs: m0 twice, m1 once, m2 absent."
        from vamb_tpu.markers import Markers
        from vamb_tpu.utils import RefHasher

        markers = [
            np.array([0], dtype=np.uint8),  # contig 0: m0
            np.array([0, 1], dtype=np.uint8),  # contig 1: m0, m1
            None,
            None,
            np.array([2], dtype=np.uint8),  # contig 4: m2
            None,
        ]
        return Markers(
            markers,
            [["m0a", "m0b"], ["m1"], ["m2"]],
            RefHasher.hash_refnames(identifiers),
        )

    def test_score_bins_with_markers(self):
        identifiers = [f"C{i}" for i in range(6)]
        m = self.make_markers(identifiers)
        qualities = score_bins_with_markers(
            m, {"a": {"C0", "C1"}, "b": {"C2", "C3"}, "c": {"C4"}}, identifiers
        )
        # bin a: markers {m0 x2, m1} -> 2/3 unique present, 1 surplus copy
        assert qualities["a"].completeness == pytest.approx(2 / 3)
        assert qualities["a"].contamination == pytest.approx(1 / 3)
        # bin b: no markers at all
        assert qualities["b"] == BinQuality(0.0, 0.0)
        # bin c: just m2
        assert qualities["c"].completeness == pytest.approx(1 / 3)
        assert qualities["c"].contamination == 0.0

    def test_unknown_contig_raises(self):
        identifiers = [f"C{i}" for i in range(6)]
        m = self.make_markers(identifiers)
        with pytest.raises(KeyError, match="not present"):
            score_bins_with_markers(m, {"a": {"nope"}}, identifiers)


class TestNcOutputs:
    def test_quality_report_and_per_sample_bins(self, tmp_path):
        import gzip as _gzip
        from pathlib import Path

        fasta = tmp_path / "contigs.fna"
        seqs = {
            "S1Cx": "ACGTACGTAA",
            "S1Cy": "TTTTACGTCC",
            "S2Cz": "GGGGACGTAC",
        }
        with open(fasta, "w") as f:
            for name, seq in seqs.items():
                f.write(f">{name}\n{seq}\n")
        merged = {"bin1": {"S1Cx", "S1Cy"}, "bin2": {"S2Cz"}}
        qualities = {
            "bin1": BinQuality(0.955, 0.012),
            "bin2": BinQuality(1.0, 0.0),
        }
        out = tmp_path / "nc"
        write_nc_outputs(
            out, merged, qualities, separator="C", fasta_path=Path(fasta)
        )
        report = (out / "quality_report.tsv").read_text().splitlines()
        assert report[0] == "Name\tCompleteness\tContamination"
        assert report[1] == "bin1\t95.50\t1.20"
        assert report[2] == "bin2\t100.00\t0.00"
        # per-sample folders named by the prefix before the separator
        bin1 = (out / "bins" / "S1" / "bin1.fna").read_text()
        assert set(bin1.splitlines()) >= {">S1Cx", ">S1Cy"}
        assert "ACGTACGTAA" in bin1 and "TTTTACGTCC" in bin1
        bin2 = (out / "bins" / "S2" / "bin2.fna").read_text()
        assert bin2 == ">S2Cz\nGGGGACGTAC\n"

    def test_no_separator_flat_layout_and_compress(self, tmp_path):
        import gzip as _gzip
        from pathlib import Path

        fasta = tmp_path / "contigs.fna"
        with open(fasta, "w") as f:
            f.write(">A\nACGT\n>B\nTTGG\n")
        out = tmp_path / "nc"
        write_nc_outputs(
            out,
            {"b": {"A", "B"}},
            {"b": BinQuality(1.0, 0.0)},
            separator=None,
            fasta_path=Path(fasta),
            compress=True,
        )
        with _gzip.open(out / "bins" / "b.fna.gz", "rt") as f:
            text = f.read()
        assert set(text.splitlines()) == {">A", "ACGT", ">B", "TTGG"}

    def test_missing_contig_raises(self, tmp_path):
        from pathlib import Path

        fasta = tmp_path / "contigs.fna"
        fasta.write_text(">A\nACGT\n")
        with pytest.raises(KeyError, match="missing from input FASTA"):
            write_nc_outputs(
                tmp_path / "nc",
                {"b": {"A", "Z"}},
                {"b": BinQuality(1.0, 0.0)},
                fasta_path=Path(fasta),
            )


def test_cli_subcommand(tmp_path):
    "avamb_ensemble end-to-end through the CLI."
    import random as _random

    from vamb_tpu.__main__ import main

    rng = _random.Random(3)
    names = [f"S1C{i}" for i in range(120)]
    fasta = tmp_path / "contigs.fna"
    with open(fasta, "w") as f:
        for name in names:
            f.write(f">{name}\n{''.join(rng.choices('ACGT', k=2500))}\n")

    def write_clusters_tsv(path, bins):
        with open(path, "w") as f:
            f.write("clustername\tcontigname\n")
            for bname, members in bins.items():
                for m in members:
                    f.write(f"{bname}\t{m}\n")

    vae_bins = {"vae_1": names[0:50], "vae_2": names[50:100]}
    z_bins = {"z_1": names[0:45], "z_2": names[95:120]}
    write_clusters_tsv(tmp_path / "vae.tsv", vae_bins)
    write_clusters_tsv(tmp_path / "z.tsv", z_bins)
    with open(tmp_path / "quality_report.tsv", "w") as f:
        f.write("Name\tCompleteness\tContamination\n")
        f.write("vae_1\t95.0\t1.0\n")
        f.write("vae_2\t92.0\t1.0\n")
        f.write("z_1\t80.0\t2.0\n")  # duplicate of vae_1, worse
        f.write("z_2\t93.0\t0.5\n")
    out = tmp_path / "out"
    main(
        [
            "avamb_ensemble",
            "--outdir", str(out),
            "--fasta", str(fasta),
            "-m", "2000",
            "--clusters", str(tmp_path / "vae.tsv"), str(tmp_path / "z.tsv"),
            "--quality_report", str(tmp_path / "quality_report.tsv"),
            "--min_bin_size", "50000",
        ]
    )
    from vamb_tpu.utils import read_clusters

    with open(out / "ensemble_clusters.tsv") as f:
        merged = read_clusters(f)
    assert set(merged) == {"vae_1", "vae_2", "z_2"}
    seen = set()
    for members in merged.values():
        assert not (members & seen)
        seen |= set(members)


def test_cli_native_scoring_and_write_bins(tmp_path):
    "avamb_ensemble with marker-based scoring and NC-bin FASTA output."
    import random as _random

    from vamb_tpu.__main__ import main
    from vamb_tpu.markers import Markers
    from vamb_tpu.utils import RefHasher, read_clusters

    rng = _random.Random(7)
    names = [f"S1C{i}" for i in range(120)]
    fasta = tmp_path / "contigs.fna"
    with open(fasta, "w") as f:
        for name in names:
            f.write(f">{name}\n{''.join(rng.choices('ACGT', k=2500))}\n")

    # bin "vae_1" (contigs 0..59) carries every marker exactly once;
    # "vae_2" (60..119) carries none -> fails the completeness gate.
    n_markers = 10
    marker_rows = [None] * len(names)
    for m in range(n_markers):
        marker_rows[2 * m] = np.array([m], dtype=np.uint8)
    markers = Markers(
        marker_rows,
        [[f"M{m}"] for m in range(n_markers)],
        RefHasher.hash_refnames(names),
    )
    markers_path = tmp_path / "markers.npz"
    markers.save(markers_path)

    with open(tmp_path / "clusters.tsv", "w") as f:
        f.write("clustername\tcontigname\n")
        for m in names[:60]:
            f.write(f"vae_1\t{m}\n")
        for m in names[60:]:
            f.write(f"vae_2\t{m}\n")

    out = tmp_path / "out"
    main(
        [
            "avamb_ensemble",
            "--outdir", str(out),
            "--fasta", str(fasta),
            "-m", "2000",
            "--clusters", str(tmp_path / "clusters.tsv"),
            "--markers", str(markers_path),
            "--min_bin_size", "10000",
            "--write_bins",
        ]
    )
    with open(out / "ensemble_clusters.tsv") as f:
        merged = read_clusters(f)
    assert set(merged) == {"vae_1"}
    report = (out / "quality_report.tsv").read_text().splitlines()
    assert report == [
        "Name\tCompleteness\tContamination",
        "vae_1\t100.00\t0.00",
    ]
    # default separator "C" puts the bin under its sample folder
    bin_fasta = (out / "bins" / "S1" / "vae_1.fna").read_text()
    got = {l[1:] for l in bin_fasta.splitlines() if l.startswith(">")}
    assert got == set(names[:60])

"""Tests for the offline src/ tools (concatenate, merge_aemb, create_fasta)."""

import gzip
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

SRC = Path(__file__).resolve().parent.parent / "src"


def run_tool(name, *args):
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = str(SRC.parent) + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_PLATFORMS", "cpu")
    return subprocess.run(
        [sys.executable, str(SRC / name), *map(str, args)],
        capture_output=True,
        text=True,
        cwd=SRC.parent,
        env=env,
    )


@pytest.fixture
def sample_fastas(tmp_path):
    paths = []
    for s in range(2):
        p = tmp_path / f"sample{s}.fna"
        with open(p, "w") as f:
            for i in range(3):
                f.write(f">contig{i}\n{'ACGT' * 600}\n")
        paths.append(p)
    return paths


def test_concatenate(sample_fastas, tmp_path):
    out = tmp_path / "cat.fna.gz"
    r = run_tool("concatenate.py", out, *sample_fastas)
    assert r.returncode == 0, r.stderr
    with gzip.open(out, "rt") as f:
        headers = [l.strip() for l in f if l.startswith(">")]
    assert headers == [
        ">S1Ccontig0", ">S1Ccontig1", ">S1Ccontig2",
        ">S2Ccontig0", ">S2Ccontig1", ">S2Ccontig2",
    ]


def test_concatenate_keepnames_rejects_duplicates(sample_fastas, tmp_path):
    out = tmp_path / "cat2.fna"
    r = run_tool("concatenate.py", out, "--keepnames", "--nozip", *sample_fastas)
    assert r.returncode != 0  # duplicate identifiers across samples


def test_merge_aemb(tmp_path):
    d = tmp_path / "aemb"
    d.mkdir()
    (d / "s1.tsv").write_text("c1\t1.5\nc2\t0.0\n")
    (d / "s2.tsv").write_text("c2\t2.5\nc1\t3.0\n")  # different order ok
    out = tmp_path / "merged.tsv"
    r = run_tool("merge_aemb.py", d, out)
    assert r.returncode == 0, r.stderr
    lines = out.read_text().splitlines()
    assert lines[0] == "contigname\ts1.tsv\ts2.tsv"
    assert lines[1].split("\t") == ["c1", "1.5", "3.0"]
    assert lines[2].split("\t") == ["c2", "0.0", "2.5"]


def test_merge_aemb_mismatched_ids_fails(tmp_path):
    d = tmp_path / "aemb"
    d.mkdir()
    (d / "s1.tsv").write_text("c1\t1.5\n")
    (d / "s2.tsv").write_text("cX\t2.5\n")
    r = run_tool("merge_aemb.py", d, tmp_path / "out.tsv")
    assert r.returncode != 0
    assert "which the first file does not" in r.stderr


def test_merge_aemb_negative_depth_fails(tmp_path):
    d = tmp_path / "aemb"
    d.mkdir()
    (d / "s1.tsv").write_text("c1\t-1.0\n")
    r = run_tool("merge_aemb.py", d, tmp_path / "out.tsv")
    assert r.returncode != 0


def test_create_fasta(tmp_path):
    fasta = tmp_path / "contigs.fna"
    with open(fasta, "w") as f:
        for i in range(4):
            f.write(f">c{i}\n{'ACGT' * (500 + 100 * i)}\n")
    clusters = tmp_path / "clusters.tsv"
    clusters.write_text(
        "clustername\tcontigname\nb1\tc0\nb1\tc1\nb2\tc2\nb2\tc3\n"
    )
    outdir = tmp_path / "bins"
    r = run_tool("create_fasta.py", fasta, clusters, 0, outdir)
    assert r.returncode == 0, r.stderr
    assert sorted(p.name for p in outdir.iterdir()) == ["b1.fna", "b2.fna"]
    text = (outdir / "b1.fna").read_text()
    assert ">c0" in text and ">c1" in text

"""End-to-end CLI test: `vamb_tpu bin default` on synthetic data.

Mirrors the reference's CLI integration workflow (.github/workflows/
cli_vamb.yml runs `vamb bin default` with reduced epochs): generates a
150-contig, 4-sample dataset, runs the full pipeline, and validates every
output artifact."""

import gzip
import io
import random

import numpy as np
import pytest

from vamb_tpu.__main__ import main
from vamb_tpu.utils import read_clusters

N_CONTIGS = 150
N_SAMPLES = 4


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    "Synthetic FASTA + abundance TSV with S{s}C{i} names for binsplitting."
    rng = random.Random(7)
    nprng = np.random.default_rng(7)
    d = tmp_path_factory.mktemp("data")
    names = [f"S{1 + i % 3}C{i}" for i in range(N_CONTIGS)]
    with open(d / "contigs.fna", "w") as f:
        for i, name in enumerate(names):
            seq = "".join(rng.choices("ACGT", k=2000 + 37 * i))
            f.write(f">{name}\n{seq}\n")
    depths = nprng.uniform(0.0, 10.0, (N_CONTIGS, N_SAMPLES)).astype(np.float32)
    with open(d / "abundance.tsv", "w") as f:
        f.write("contigname\t" + "\t".join(f"sample{j}" for j in range(N_SAMPLES)) + "\n")
        for name, row in zip(names, depths):
            f.write(name + "\t" + "\t".join(f"{v:.4f}" for v in row) + "\n")
    return d


@pytest.fixture(scope="module")
def outdir(dataset_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("out") / "run"
    main(
        [
            "bin",
            "default",
            "--outdir", str(out),
            "--fasta", str(dataset_dir / "contigs.fna"),
            "--abundance_tsv", str(dataset_dir / "abundance.tsv"),
            "-e", "4",
            "-q", "2",
            "--seed", "5",
            "--minfasta", "2000",
        ]
    )
    return out


def test_artifacts_exist(outdir):
    for name in (
        "composition.npz",
        "abundance.npz",
        "latent.npz",
        "model.npz",
        "log.txt",
        "vae_clusters_unsplit.tsv",
        "vae_clusters_split.tsv",
        "vae_clusters_metadata.tsv",
    ):
        assert (outdir / name).is_file(), f"missing {name}"


def test_unsplit_clusters_partition_contigs(outdir):
    with open(outdir / "vae_clusters_unsplit.tsv") as f:
        clusters = read_clusters(f)
    members = [c for members in clusters.values() for c in members]
    assert len(members) == N_CONTIGS
    assert len(set(members)) == N_CONTIGS


def test_split_clusters_single_sample(outdir):
    with open(outdir / "vae_clusters_split.tsv") as f:
        clusters = read_clusters(f)
    for name, members in clusters.items():
        samples = {m.split("C")[0] for m in members}
        assert len(samples) == 1
        # split names are prefixed with the sample
        assert name.startswith(next(iter(samples)) + "C")


def test_metadata_columns(outdir):
    lines = (outdir / "vae_clusters_metadata.tsv").read_text().splitlines()
    assert lines[0] == "name\tradius\tpeak valley ratio\tkind\tbp\tncontigs\tmedoid"
    total_contigs = 0
    for line in lines[1:]:
        fields = line.split("\t")
        assert len(fields) == 7
        assert fields[3] in ("normal", "loner", "fallback")
        total_contigs += int(fields[5])
    assert total_contigs == N_CONTIGS


def test_latent_shape(outdir):
    from vamb_tpu.utils import read_npz

    latent = read_npz(outdir / "latent.npz")
    assert latent.shape == (N_CONTIGS, 32)
    assert latent.dtype == np.float32


def test_fasta_bins_written(outdir, dataset_dir):
    bins = list((outdir / "bins").glob("*.fna"))
    assert len(bins) > 0
    # each bin fasta contains its cluster's contigs verbatim
    text = bins[0].read_text()
    assert text.startswith(">")


def test_composition_reuse(outdir, dataset_dir, tmp_path):
    "Re-running from cached composition.npz + abundance.npz works."
    out2 = tmp_path / "rerun"
    main(
        [
            "bin",
            "default",
            "--outdir", str(out2),
            "--composition", str(outdir / "composition.npz"),
            "--abundance", str(outdir / "abundance.npz"),
            "-e", "2",
            "-q",
            "--seed", "5",
        ]
    )
    assert (out2 / "vae_clusters_unsplit.tsv").is_file()


@pytest.fixture(scope="module")
def taxonomy_file(dataset_dir):
    "Assign each synthetic contig a lineage from 3 clades."
    lineages = [
        "Bacteria;Firmicutes;Bacillus",
        "Bacteria;Proteobacteria;Escherichia",
        "Archaea;Euryarchaeota",
    ]
    names = [f"S{1 + i % 3}C{i}" for i in range(N_CONTIGS)]
    p = dataset_dir / "taxonomy.tsv"
    with open(p, "w") as f:
        f.write("contigs\tpredictions\n")
        for i, name in enumerate(names):
            f.write(f"{name}\t{lineages[i % 3]}\n")
    return p


def test_taxometer_cli(dataset_dir, taxonomy_file, tmp_path):
    out = tmp_path / "taxometer"
    main(
        [
            "taxometer",
            "--outdir", str(out),
            "--fasta", str(dataset_dir / "contigs.fna"),
            "--abundance_tsv", str(dataset_dir / "abundance.tsv"),
            "--taxonomy", str(taxonomy_file),
            "-pe", "3",
            "--seed", "3",
        ]
    )
    assert (out / "results_taxometer.tsv").is_file()
    assert (out / "predictor_model.npz").is_file()
    lines = (out / "results_taxometer.tsv").read_text().splitlines()
    assert lines[0] == "contigs\tpredictions\tscores"
    assert len(lines) == N_CONTIGS + 1


def test_taxvamb_cli(dataset_dir, taxonomy_file, tmp_path):
    out = tmp_path / "taxvamb"
    main(
        [
            "bin", "taxvamb",
            "--outdir", str(out),
            "--fasta", str(dataset_dir / "contigs.fna"),
            "--abundance_tsv", str(dataset_dir / "abundance.tsv"),
            "--taxonomy", str(taxonomy_file),
            "--no_predictor",
            "-e", "3",
            "-q",
            "--seed", "4",
        ]
    )
    assert (out / "vaevae_clusters_unsplit.tsv").is_file()
    assert (out / "vaevae_model.npz").is_file()
    assert (out / "vaevae_latent.npz").is_file()
    with open(out / "vaevae_clusters_unsplit.tsv") as f:
        clusters = read_clusters(f)
    members = [c for m in clusters.values() for c in m]
    assert len(members) == N_CONTIGS


def test_taxvamb_cli_with_predictor(dataset_dir, taxonomy_file, tmp_path):
    out = tmp_path / "taxvamb_pred"
    main(
        [
            "bin", "taxvamb",
            "--outdir", str(out),
            "--fasta", str(dataset_dir / "contigs.fna"),
            "--abundance_tsv", str(dataset_dir / "abundance.tsv"),
            "--taxonomy", str(taxonomy_file),
            "-e", "2",
            "-q",
            "-pe", "2",
            "--seed", "5",
        ]
    )
    assert (out / "results_taxometer.tsv").is_file()
    assert (out / "vaevae_clusters_unsplit.tsv").is_file()


def test_avamb_cli(dataset_dir, tmp_path):
    out = tmp_path / "avamb"
    main(
        [
            "bin", "avamb",
            "--outdir", str(out),
            "--fasta", str(dataset_dir / "contigs.fna"),
            "--abundance_tsv", str(dataset_dir / "abundance.tsv"),
            "--e_aae", "3",
            "--q_aae",
            "--n_aae", "48",
            "--z_aae", "8",
            "--y_aae", "10",
            "--seed", "6",
        ]
    )
    assert (out / "aae_model.npz").is_file()
    assert (out / "aae_z_latent.npz").is_file()
    assert (out / "aae_z_clusters_unsplit.tsv").is_file()
    assert (out / "aae_y_clusters_unsplit.tsv").is_file()
    with open(out / "aae_z_clusters_unsplit.tsv") as f:
        z_clusters = read_clusters(f)
    members = [c for m in z_clusters.values() for c in m]
    assert len(members) == N_CONTIGS
    assert all(name.startswith("z_") for name in z_clusters)
    with open(out / "aae_y_clusters_unsplit.tsv") as f:
        y_clusters = read_clusters(f)
    y_members = [c for m in y_clusters.values() for c in m]
    assert len(y_members) == N_CONTIGS
    assert all(name.startswith("y_") for name in y_clusters)


def test_recluster_kmeans_cli(outdir, dataset_dir, tmp_path):
    "Recluster the bin-default output with precomputed synthetic markers."
    import json

    from vamb_tpu.composition import Composition

    comp = Composition.load(outdir / "composition.npz")
    names = list(comp.metadata.identifiers)
    # synthetic markers: 5 SCGs spread over contigs
    markers_payload = {
        "markers": [[i % 5] if i % 4 == 0 else None for i in range(len(names))],
        "marker_names": [[f"M{i}"] for i in range(5)],
        "refhash": comp.metadata.refhash.hex(),
    }
    markers_path = tmp_path / "markers.npz"
    markers_path.write_text(json.dumps(markers_payload))

    out = tmp_path / "recluster"
    main(
        [
            "recluster",
            "--outdir", str(out),
            "--composition", str(outdir / "composition.npz"),
            "--markers", str(markers_path),
            "--latent_path", str(outdir / "latent.npz"),
            "--clusters_path", str(outdir / "vae_clusters_unsplit.tsv"),
            "--algorithm", "kmeans",
            "--seed", "7",
        ]
    )
    assert (out / "clusters_reclustered_unsplit.tsv").is_file()
    with open(out / "clusters_reclustered_unsplit.tsv") as f:
        clusters = read_clusters(f)
    members = [c for m in clusters.values() for c in m]
    assert len(members) == N_CONTIGS


def test_recluster_dbscan_cli(outdir, dataset_dir, tmp_path):
    import json

    from vamb_tpu.composition import Composition

    comp = Composition.load(outdir / "composition.npz")
    names = list(comp.metadata.identifiers)
    markers_payload = {
        "markers": [[i % 5] if i % 4 == 0 else None for i in range(len(names))],
        "marker_names": [[f"M{i}"] for i in range(5)],
        "refhash": comp.metadata.refhash.hex(),
    }
    markers_path = tmp_path / "markers.npz"
    markers_path.write_text(json.dumps(markers_payload))
    # canonical taxonomy with genus rank (6 ranks)
    tax_path = tmp_path / "taxonomy.tsv"
    with open(tax_path, "w") as f:
        f.write("contigs\tpredictions\n")
        for i, name in enumerate(names):
            f.write(f"{name}\td;p;c;o;f;genus{i % 2}\n")

    out = tmp_path / "recluster_dbscan"
    main(
        [
            "recluster",
            "--outdir", str(out),
            "--composition", str(outdir / "composition.npz"),
            "--markers", str(markers_path),
            "--latent_path", str(outdir / "latent.npz"),
            "--algorithm", "dbscan",
            "--taxonomy", str(tax_path),
            "--no_predictor",
            "--seed", "8",
        ]
    )
    assert (out / "clusters_reclustered_unsplit.tsv").is_file()


def test_taxonomy_benchmark_cli(dataset_dir, taxonomy_file, tmp_path):
    out = tmp_path / "taxbench"
    main(
        [
            "taxonomy_benchmark",
            "--outdir", str(out),
            "--fasta", str(dataset_dir / "contigs.fna"),
            "--abundance_tsv", str(dataset_dir / "abundance.tsv"),
            "--taxonomy", str(taxonomy_file),
            "-pe", "2",
            "--seed", "9",
        ]
    )
    assert (out / "results_taxonomy_predicted_kfold.tsv").is_file()
    assert (out / "accuracy_report.tsv").is_file()
    report = (out / "accuracy_report.tsv").read_text().splitlines()
    assert report[0] == "Level\tCorrect\tHave_truth\tN_contigs\tAccuracy"
    assert len(report) >= 2
    # kfold predictions aligned with composition identifiers
    lines = (out / "results_taxonomy_predicted_kfold.tsv").read_text().splitlines()
    assert len(lines) == N_CONTIGS + 1


def test_avamb_minfasta_z_and_y_bins_share_dir_without_collision(
    dataset_dir, tmp_path
):
    """--minfasta writes both z- and y-bin FASTAs into the same bins/
    directory; the z_/y_ prefixes must keep the (binsplit) names disjoint
    so neither set overwrites the other (round-1 weak item #8)."""
    out = tmp_path / "avamb_fasta"
    main(
        [
            "bin", "avamb",
            "--outdir", str(out),
            "--fasta", str(dataset_dir / "contigs.fna"),
            "--abundance_tsv", str(dataset_dir / "abundance.tsv"),
            "--e_aae", "3",
            "--q_aae",
            "--n_aae", "48",
            "--z_aae", "8",
            "--y_aae", "10",
            "--seed", "6",
            "--minfasta", "2000",
        ]
    )
    bins = out / "bins"
    assert bins.is_dir()
    names = sorted(p.name for p in bins.iterdir())
    assert len(names) == len(set(names))
    z_bins = [n for n in names if "z_" in n]
    y_bins = [n for n in names if "y_" in n]
    assert z_bins and y_bins, names
    assert len(z_bins) + len(y_bins) == len(names), names
    # every bin FASTA is parseable and non-empty
    from vamb_tpu.utils import byte_iterfasta

    for name in names[:5]:
        with open(bins / name, "rb") as f:
            entries = list(byte_iterfasta(f, None))
        assert entries

"""Golden-file generator for the end-to-end parity suite.

Regenerate the committed goldens with:

    python -m tests.make_golden

The goldens are produced under the same environment the test suite runs in
(8 virtual CPU devices, see tests/conftest.py — this module replicates that
setup before importing jax), so byte-identical reproduction is expected on
any machine with the pinned jax version. Two artifacts:

* ``golden/merged_aemb.tsv`` — `src/merge_aemb.py` output on the reference's
  real aemb fixtures (/root/reference/test/data/aemb), pure parsing.
* ``golden/vae_clusters_unsplit.tsv`` (+ metadata/latent copies) — full
  `bin default` CLI run (composition -> abundance -> VAE -> clustering) on
  the deterministic synthetic dataset below with a fixed seed and reduced
  epochs, mirroring the reference's CI e2e recipe
  (.github/workflows/cli_vamb.yml uses reduced `-e`/`-q` the same way; the
  reference's own ci_data.zip fixture archive is not redistributable, hence
  the generated dataset).
"""

import os
import random
import sys
from pathlib import Path

for var in ("MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS", "OMP_NUM_THREADS"):
    os.environ.setdefault(var, "4")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the TPU tunnel on dev machines pins jax_platforms via sitecustomize; the
# goldens are defined on the virtual-CPU mesh exactly like the test suite
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

GOLDEN_DIR = Path(__file__).resolve().parent / "golden"
REFERENCE_AEMB = Path("/root/reference/test/data/aemb")

N_CONTIGS = 400
N_SAMPLES = 4
SEED = 41
EPOCHS = 5
MIN_SUCCESSES = 2


def write_synthetic_dataset(d: Path) -> None:
    """Deterministic FASTA + abundance TSV: 400 contigs, 25 planted genome
    groups with correlated 4-sample abundance, S{1..3}C names for
    binsplitting."""
    rng = random.Random(1234)
    nprng = np.random.default_rng(1234)
    names = [f"S{1 + i % 3}C{i}" for i in range(N_CONTIGS)]

    # planted structure: contigs in the same group share base composition
    # and abundance profile, so the pipeline has real bins to find
    n_groups = 25
    group_of = [i % n_groups for i in range(N_CONTIGS)]
    group_profiles = nprng.uniform(0.5, 20.0, (n_groups, N_SAMPLES))
    base_seqs = [
        "".join(rng.choices("ACGT", k=3000)) for _ in range(n_groups)
    ]

    with open(d / "contigs.fna", "w") as f:
        for i, name in enumerate(names):
            g = group_of[i]
            seq = list(base_seqs[g][: 2000 + 23 * (i % 40)])
            # sprinkle point mutations so contigs are distinct
            for _ in range(len(seq) // 50):
                seq[rng.randrange(len(seq))] = rng.choice("ACGT")
            f.write(f">{name}\n{''.join(seq)}\n")

    depths = group_profiles[group_of] * nprng.uniform(
        0.7, 1.3, (N_CONTIGS, N_SAMPLES)
    )
    with open(d / "abundance.tsv", "w") as f:
        f.write(
            "contigname\t"
            + "\t".join(f"sample{j}" for j in range(N_SAMPLES))
            + "\n"
        )
        for name, row in zip(names, depths):
            f.write(name + "\t" + "\t".join(f"{v:.4f}" for v in row) + "\n")


def run_bin_default(outdir: Path, datadir: Path) -> None:
    from vamb_tpu.__main__ import main

    main(
        [
            "bin",
            "default",
            "--outdir", str(outdir),
            "--fasta", str(datadir / "contigs.fna"),
            "--abundance_tsv", str(datadir / "abundance.tsv"),
            "-e", str(EPOCHS),
            "-q", "2",
            "--seed", str(SEED),
            "-u", str(MIN_SUCCESSES),
        ]
    )


def write_synthetic_taxonomy(d: Path) -> None:
    """Deterministic genus-level taxonomy over the synthetic dataset: one
    genus per planted group, uppers nested by integer division (a valid
    tree). Extends the goldens to the semisupervised paths."""
    n_groups = 25
    with open(d / "taxonomy.tsv", "w") as f:
        f.write("contigs\tpredictions\n")
        for i in range(N_CONTIGS):
            g = i % n_groups
            f.write(
                f"S{1 + i % 3}C{i}\tBacteria;P{g // 8};C{g // 4};O{g // 2};"
                f"F{g};genus{g};species{g}\n"
            )


def run_bin_taxvamb(outdir: Path, datadir: Path) -> None:
    from vamb_tpu.__main__ import main

    main(
        [
            "bin",
            "taxvamb",
            "--outdir", str(outdir),
            "--fasta", str(datadir / "contigs.fna"),
            "--abundance_tsv", str(datadir / "abundance.tsv"),
            "--taxonomy", str(datadir / "taxonomy.tsv"),
            "--no_predictor",
            "-e", str(EPOCHS),
            "-q", "2",
            "--seed", str(SEED),
            "-u", str(MIN_SUCCESSES),
        ]
    )


def run_taxometer(outdir: Path, datadir: Path) -> None:
    from vamb_tpu.__main__ import main

    main(
        [
            "taxometer",
            "--outdir", str(outdir),
            "--fasta", str(datadir / "contigs.fna"),
            "--abundance_tsv", str(datadir / "abundance.tsv"),
            "--taxonomy", str(datadir / "taxonomy.tsv"),
            "-pe", str(EPOCHS),
            "--seed", str(SEED),
        ]
    )


def merge_reference_aemb(output: Path) -> None:
    src_dir = Path(__file__).resolve().parent.parent / "src"
    sys.path.insert(0, str(src_dir.parent))
    from src.merge_aemb import merge

    files = sorted(REFERENCE_AEMB.glob("*.tsv"))
    assert len(files) == 3, files
    merge(files, output)


def main() -> None:
    import shutil
    import tempfile

    GOLDEN_DIR.mkdir(exist_ok=True)
    merge_reference_aemb(GOLDEN_DIR / "merged_aemb.tsv")

    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        data = tmp / "data"
        data.mkdir()
        write_synthetic_dataset(data)
        write_synthetic_taxonomy(data)
        out = tmp / "run"
        run_bin_default(out, data)
        for name in (
            "vae_clusters_unsplit.tsv",
            "vae_clusters_split.tsv",
            "vae_clusters_metadata.tsv",
        ):
            shutil.copy(out / name, GOLDEN_DIR / name)
        out_tv = tmp / "run_taxvamb"
        run_bin_taxvamb(out_tv, data)
        shutil.copy(
            out_tv / "vaevae_clusters_unsplit.tsv",
            GOLDEN_DIR / "vaevae_clusters_unsplit.tsv",
        )
        out_tm = tmp / "run_taxometer"
        run_taxometer(out_tm, data)
        shutil.copy(
            out_tm / "results_taxometer.tsv",
            GOLDEN_DIR / "results_taxometer.tsv",
        )
    print(f"goldens written to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()

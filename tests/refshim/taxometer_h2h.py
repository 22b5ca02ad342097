"""Taxometer head-to-head: the actual reference vs vamb_tpu on repair.

Generates the bench's synthetic metagenome plus a genus-level per-contig
taxonomy, corrupts ~half the rows (truncation at phylum, or genus
reassignment), runs BOTH pipelines' `taxometer` CLI on the corrupted file
with identical args, and scores each side's refined predictions for
full-lineage accuracy against the uncorrupted truth. Prints one JSON line.

This measures the thing Taxometer exists for (reference taxometer docs /
vamb/__main__.py taxometer subcommand): recovering taxonomy signal from
noisy upstream classifier output using composition+abundance.

Usage:
  python tests/refshim/taxometer_h2h.py [--contigs 20000] [--samples 5]
      [--genomes 150] [--epochs 50] [--seed 7] [--workdir DIR] [--keep]
      [--skip {ref,tpu}]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _REPO)


def _write_taxonomies(
    workdir: str, fasta: str, which: np.ndarray, seed: int
) -> tuple[str, str]:
    """True taxonomy (Bacteria;Phylum{g%17};Genus{g}) + a corrupted copy:
    ~20% of rows truncated at phylum, ~30% genus reassigned."""
    names = []
    with open(fasta, "rb") as f:
        for line in f:
            if line.startswith(b">"):
                names.append(line[1:].split()[0].decode())
    rng = np.random.default_rng(seed + 101)
    mode = rng.choice(3, len(names), p=[0.5, 0.2, 0.3])  # 0 keep 1 trunc 2 wrong
    truth_path = os.path.join(workdir, "taxonomy.tsv")
    corrupt_path = os.path.join(workdir, "taxonomy_corrupt.tsv")
    n_genomes = int(which.max()) + 1
    with open(truth_path, "w") as ft, open(corrupt_path, "w") as fc:
        ft.write("contigs\tpredictions\n")
        fc.write("contigs\tpredictions\n")
        for i, name in enumerate(names):
            g = int(which[i])
            full = f"Bacteria;Phylum{g % 17};Genus{g}"
            ft.write(f"{name}\t{full}\n")
            if mode[i] == 1:
                fc.write(f"{name}\tBacteria;Phylum{g % 17}\n")
            elif mode[i] == 2:
                wrong = (g + 1 + int(rng.integers(n_genomes - 1))) % n_genomes
                fc.write(f"{name}\tBacteria;Phylum{wrong % 17};Genus{wrong}\n")
            else:
                fc.write(f"{name}\t{full}\n")
    return truth_path, corrupt_path


def _load_preds(path: str) -> dict:
    out = {}
    with open(path) as f:
        next(f)
        for line in f:
            parts = line.rstrip("\n").split("\t")
            out[parts[0]] = parts[1]
    return out


def _score(results_tsv: str, truth_path: str, corrupt_path: str) -> dict:
    truth = _load_preds(truth_path)
    corrupt = _load_preds(corrupt_path)
    pred = _load_preds(results_tsv)
    bad = [k for k in truth if corrupt[k] != truth[k]]
    trunc = [k for k in bad if truth[k].startswith(corrupt[k])]
    wrong = [k for k in bad if not truth[k].startswith(corrupt[k])]

    def acc(keys):
        return round(sum(pred[k] == truth[k] for k in keys) / max(1, len(keys)), 4)

    return {
        "all_rows_acc": acc(list(truth)),
        "corrupted_repaired": acc(bad),
        "truncated_repaired": acc(trunc),
        "wrong_repaired": acc(wrong),
        "n_corrupted": len(bad),
    }


def run_side(name: str, cmd: list) -> float:
    t0 = time.time()
    proc = subprocess.run(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True
    )
    if proc.returncode != 0:
        print(proc.stdout[-4000:], file=sys.stderr)
        raise RuntimeError(f"{name} taxometer run failed (rc={proc.returncode})")
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--contigs", type=int, default=20_000)
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--genomes", type=int, default=150)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--skip", choices=["ref", "tpu"], default=None)
    args = ap.parse_args()

    from bench import _write_synthetic_metagenome

    workdir = args.workdir or tempfile.mkdtemp(prefix="vamb_taxh2h_")
    os.makedirs(workdir, exist_ok=True)
    try:
        fasta, tsv, which, _lengths = _write_synthetic_metagenome(
            workdir, args.contigs, args.samples, args.genomes,
            hard=True, seed=args.seed,
        )
        truth_path, corrupt_path = _write_taxonomies(
            workdir, fasta, which, args.seed
        )
        results = {
            "dataset": {
                "contigs": args.contigs,
                "samples": args.samples,
                "genomes": args.genomes,
                "seed": args.seed,
                "epochs": args.epochs,
            }
        }
        common = [
            "--fasta", fasta, "--abundance_tsv", tsv,
            "--taxonomy", corrupt_path,
            "-pe", str(args.epochs), "--seed", "1",
        ]
        if args.skip != "ref":
            refout = os.path.join(workdir, "ref_taxometer")
            wall = run_side(
                "reference",
                [
                    sys.executable,
                    os.path.join(_REPO, "tests/refshim/run_reference.py"),
                    "taxometer", "--outdir", refout, *common,
                ],
            )
            results["reference"] = {
                "wall_s": round(wall, 1),
                **_score(
                    os.path.join(refout, "results_taxometer.tsv"),
                    truth_path, corrupt_path,
                ),
            }
        if args.skip != "tpu":
            tpuout = os.path.join(workdir, "tpu_taxometer")
            wall = run_side(
                "vamb_tpu",
                [
                    sys.executable, "-m", "vamb_tpu",
                    "taxometer", "--outdir", tpuout, *common,
                ],
            )
            results["vamb_tpu"] = {
                "wall_s": round(wall, 1),
                **_score(
                    os.path.join(tpuout, "results_taxometer.tsv"),
                    truth_path, corrupt_path,
                ),
            }
        print(json.dumps(results))
    finally:
        if not args.keep and args.workdir is None:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()

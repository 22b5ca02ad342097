"""Head-to-head: the actual reference vamb vs vamb_tpu on identical data.

Generates the same synthetic metagenome bench.py uses for its quality
readout (bench._write_synthetic_metagenome), runs BOTH pipelines'
`bin default` CLI on it — the reference under tests/refshim dep shims, this
repo natively — and scores both emitted binnings against the known
per-contig ground truth with the same NC/MQ-like containment metric
(bench._score_bins_vs_truth). Prints one JSON line with both sides'
numbers.

Usage:
  python tests/refshim/head_to_head.py [--contigs 20000] [--samples 5]
      [--genomes 150] [--easy] [--epochs N] [--seed 7] [--workdir DIR]
      [--keep] [--skip {ref,tpu}]

The reference runs with its own defaults (300 epochs) unless --epochs is
given (passed to both sides as -e, with batchsteps scaled to fit).
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _REPO)


def _read_bins(path: str) -> dict:
    bins: dict = {}
    with open(path) as f:
        next(f)
        for line in f:
            b, c = line.rstrip("\n").split("\t")
            bins.setdefault(b, []).append(int(c.split("C", 1)[1]))
    return bins


def _epoch_args(epochs) -> list:
    if epochs is None:
        return []
    # batchsteps must all be < nepochs (reference __main__.py:265)
    steps = [s for s in (25, 75, 150, 225) if s < epochs]
    return ["-e", str(epochs), "-q", *[str(s) for s in steps]]


def run_side(
    name: str, cmd: list, outdir: str, which, lengths, n_genomes: int,
    base: str = "vae_clusters",
) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True
    )
    wall = time.time() - t0
    if proc.returncode != 0:
        print(proc.stdout[-4000:], file=sys.stderr)
        raise RuntimeError(f"{name} run failed (rc={proc.returncode})")
    from bench import _score_bins_vs_truth

    split = _read_bins(os.path.join(outdir, f"{base}_split.tsv"))
    unsplit = _read_bins(os.path.join(outdir, f"{base}_unsplit.tsv"))
    nc, mq = _score_bins_vs_truth(split, which, lengths, n_genomes)
    return {
        "wall_s": round(wall, 1),
        "nc_like": nc,
        "mq_like": mq,
        "split_bins": len(split),
        "unsplit_clusters": len(unsplit),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--contigs", type=int, default=20_000)
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--genomes", type=int, default=150)
    ap.add_argument("--easy", action="store_true")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--skip", choices=["ref", "tpu"], default=None)
    ap.add_argument(
        "--mode", choices=["default", "avamb"], default="default",
        help="bin subcommand to compare; avamb trains the AAE and scores "
        "the aae_z clustering (the reference's `bin avamb` emits only "
        "aae_z — its Y-cluster export is dead code, __main__.py:1506-1539)",
    )
    args = ap.parse_args()

    from bench import _write_synthetic_metagenome

    workdir = args.workdir or tempfile.mkdtemp(prefix="vamb_h2h_")
    os.makedirs(workdir, exist_ok=True)
    try:
        fasta, tsv, which, lengths = _write_synthetic_metagenome(
            workdir,
            args.contigs,
            args.samples,
            args.genomes,
            hard=not args.easy,
            seed=args.seed,
        )
        if args.mode == "avamb":
            base = "aae_z_clusters"
            epoch_args = []
            if args.epochs is not None:
                steps = [s for s in (25, 50) if s < args.epochs]
                epoch_args = [
                    "--e_aae", str(args.epochs), "--q_aae",
                    *[str(s) for s in steps],
                ]
            default_epochs = 70
        else:
            base = "vae_clusters"
            epoch_args = _epoch_args(args.epochs)
            default_epochs = 300
        results = {
            "dataset": {
                "contigs": args.contigs,
                "samples": args.samples,
                "genomes": args.genomes,
                "hard": not args.easy,
                "seed": args.seed,
                "mode": args.mode,
                "epochs": args.epochs or default_epochs,
            }
        }
        common = ["--fasta", fasta, "--abundance_tsv", tsv, "--seed", "1"]
        if args.skip != "ref":
            refout = os.path.join(workdir, "refout")
            results["reference"] = run_side(
                "reference",
                [
                    sys.executable,
                    os.path.join(_REPO, "tests/refshim/run_reference.py"),
                    "bin", args.mode, "--outdir", refout,
                    *common, *epoch_args,
                ],
                refout, which, lengths, args.genomes, base,
            )
        if args.skip != "tpu":
            tpuout = os.path.join(workdir, "tpuout")
            results["vamb_tpu"] = run_side(
                "vamb_tpu",
                [
                    sys.executable, "-m", "vamb_tpu",
                    "bin", args.mode, "--outdir", tpuout,
                    *common, *epoch_args,
                ],
                tpuout, which, lengths, args.genomes, base,
            )
        print(json.dumps(results))
    finally:
        if not args.keep and args.workdir is None:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()

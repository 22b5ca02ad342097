"""Execute the Avamb workflow's stage graph without Snakemake.

Role parity: workflow_avamb/avamb.smk (itself the native re-design of the
reference's avamb.snake.conda.smk). Snakemake and the external mapping
tools (minimap2/samtools) are orchestration conveniences; this runner
executes the same stages in dependency order with plain subprocesses, so
the workflow is runnable — and testable end-to-end — on a machine with
neither. The mapping stage accepts a precomputed BAM directory
(`--bamdir`, what minimap2+samtools would have produced) or synthesizes
coverage-realistic BAMs from the concatenated catalogue (`--mock-mapping`,
for tests/CI; real runs should map reads properly).

Stages (mirroring avamb.smk rule order):
  1. concatenate  — src/concatenate.py -> contigs.flt.fna.gz
  2. mapping      — external BAMs, or mocked
  3. binning      — python -m vamb_tpu bin avamb (z + y ensembles)
  4. ensemble     — python -m vamb_tpu avamb_ensemble (drep/rip/NC bins +
                    quality_report.tsv; native marker scoring via
                    --hmm_path, or --quality_report from CheckM2)

Usage:
  python workflow_avamb/run_local.py --config workflow_avamb/config.json \
      [--outdir DIR] [--epochs N] [--mock-mapping] [--bamdir DIR]
"""

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def sh(name, argv):
    print(f"[workflow] {name}: {' '.join(map(str, argv))}", file=sys.stderr)
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(list(map(str, argv)), env=env)
    if proc.returncode != 0:
        raise SystemExit(f"stage '{name}' failed rc={proc.returncode}")


def mock_mapping(concat_fna: str, n_samples: int, outdir: str, seed: int = 0):
    "Synthesize per-sample BAMs with realistic tiled coverage."
    import gzip

    import numpy as np

    from tests.bamgen import alignment, cigar_op, write_bam

    names, lengths = [], []
    opener = gzip.open if concat_fna.endswith(".gz") else open
    with opener(concat_fna, "rb") as f:
        ln = 0
        for line in f:
            line = line.rstrip()
            if line.startswith(b">"):
                if names:
                    lengths.append(ln)
                names.append(line[1:].split()[0].decode())
                ln = 0
            else:
                ln += len(line)
        lengths.append(ln)
    rng = np.random.default_rng(seed)
    refs = list(zip(names, lengths))
    read_len = 250
    os.makedirs(outdir, exist_ok=True)
    depth_scale = rng.exponential(2.0, (len(names), n_samples)) + 0.3
    for s in range(n_samples):
        alns = []
        for i, (name, ln) in enumerate(refs):
            if ln < read_len + 10:
                continue
            n_reads = max(1, int(depth_scale[i, s] * ln / read_len))
            for r, pos in enumerate(
                np.sort(rng.integers(0, ln - read_len, n_reads))
            ):
                alns.append(alignment(
                    i, int(pos), [cigar_op(read_len, "M")], nm=0,
                    read_name=f"s{s}c{i}r{r}".encode(), seq_len=read_len))
        write_bam(os.path.join(outdir, f"sample{s}.bam"), refs, alns)
    print(f"[workflow] mock mapping: {n_samples} BAMs over {len(refs)} "
          f"contigs", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--epochs", type=int, default=None,
                    help="override AAE epochs (appends -e/--q_aae)")
    ap.add_argument("--mock-mapping", action="store_true")
    ap.add_argument("--bamdir", default=None,
                    help="use existing BAMs instead of mapping")
    args = ap.parse_args()

    with open(args.config) as f:
        cfg = json.load(f)
    outdir = args.outdir or cfg.get("outdir", "avamb_outdir")
    os.makedirs(outdir, exist_ok=True)
    min_contig = int(cfg.get("min_contig_size", 2000))
    min_bin = int(cfg.get("min_bin_size", 200_000))
    min_id = float(cfg.get("min_identity", 0.95))
    scoring = cfg.get("scoring", "native")
    py = sys.executable

    # 1. concatenate
    with open(cfg["contigs"]) as f:
        sample_fastas = [ln.strip() for ln in f if ln.strip()]
    concat = os.path.join(outdir, "contigs.flt.fna.gz")
    if not os.path.exists(concat):
        sh("concatenate", [py, os.path.join(_REPO, "src/concatenate.py"),
                           concat, *sample_fastas, "-m", min_contig])

    # 2. mapping
    mapped = args.bamdir or os.path.join(outdir, "mapped")
    if args.bamdir is None:
        if not args.mock_mapping:
            raise SystemExit(
                "No --bamdir given: map reads with minimap2+samtools into "
                f"{mapped}/ (see avamb.smk), or pass --mock-mapping")
        if not os.path.isdir(mapped) or not os.listdir(mapped):
            mock_mapping(concat, len(sample_fastas), mapped)

    # 3. binning (AAE z + y ensembles)
    avamb_out = os.path.join(outdir, "avamb")
    z_clusters = os.path.join(avamb_out, "aae_z_clusters_unsplit.tsv")
    y_clusters = os.path.join(avamb_out, "aae_y_clusters_unsplit.tsv")
    if not os.path.exists(z_clusters):
        binning = [py, "-m", "vamb_tpu", "bin", "avamb",
                   "--outdir", avamb_out, "--fasta", concat,
                   "--bamdir", mapped, "-m", min_contig, "-z", min_id,
                   *str(cfg.get("avamb_params", "-o C --seed 0")).split()]
        if args.epochs:
            steps = [s for s in (25, 50) if s < args.epochs]
            binning += ["--e_aae", str(args.epochs),
                        "--q_aae", *map(str, steps)]
        sh("binning", binning)

    # 4. ensemble decision + final outputs
    final = os.path.join(outdir, "Final_bins")
    quality = (["--quality_report", os.path.join(outdir, "checkm2_all.tsv")]
               if scoring == "checkm2"
               else ["--hmm_path", cfg["hmm_path"]])
    sh("ensemble", ["rm", "-rf", final])
    sh("ensemble", [py, "-m", "vamb_tpu", "avamb_ensemble",
                    "--outdir", final, "--fasta", concat,
                    "--clusters", z_clusters, y_clusters, *quality,
                    "--min_completeness", cfg.get("min_comp", 0.9),
                    "--max_contamination", cfg.get("max_cont", 0.05),
                    "--min_bin_size", min_bin, "--write_bins"])
    report = os.path.join(final, "quality_report.tsv")
    assert os.path.exists(report), report
    print(f"[workflow] complete: {report}", file=sys.stderr)


if __name__ == "__main__":
    main()

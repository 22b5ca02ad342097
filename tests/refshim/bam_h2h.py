"""BAM-path head-to-head: `bin default --bamdir` through both pipelines.

The TSV head-to-heads prove model/cluster parity; this one exercises the
BAM input path end-to-end. tests/bamgen.py crafts per-sample
coordinate-sorted BAMs whose tiling reads realize a target depth matrix
(including some reads pushed below the min-identity filter via NM tags),
then BOTH CLIs run `bin default --bamdir` on identical files:

* the reference under tests/refshim, whose pycoverm shim is backed by this
  repo's native BGZF/BAM reader (caveat: both sides share that reader; its
  values are independently pinned against a pileup oracle and crafted-BAM
  policy tests, tests/test_bam.py);
* this repo natively.

Asserts the two sides' parsed abundance.npz matrices are BIT-IDENTICAL
(the reference's chunked pycoverm orchestration vs our threaded reader +
both sides' mask/refhash plumbing), and scores both binnings NC/MQ-like
against the generator's ground truth.

Usage: python tests/refshim/bam_h2h.py [--contigs 2000] [--workdir DIR]
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

import numpy as np

READ_LEN = 250


def build_bams(workdir, n_contigs, n_samples, which, lengths, seed):
    """One BAM per sample; depth profile per (genome, sample) as the TSV
    generator draws it, realized as uniformly tiled READ_LEN reads. ~10%
    of reads carry NM values putting identity below the 0.95 default, so
    the min-identity filter is live on both sides."""
    from tests.bamgen import alignment, cigar_op, write_bam

    rng = np.random.default_rng(seed + 17)
    n_genomes = int(which.max()) + 1
    profiles = rng.exponential(2.0, (n_genomes, n_samples)) + 0.5
    refs = [(f"S{which[i] % n_samples}C{i}", int(lengths[i]))
            for i in range(n_contigs)]
    bamdir = os.path.join(workdir, "bam")
    os.makedirs(bamdir, exist_ok=True)
    for s in range(n_samples):
        alns = []
        for i in range(n_contigs):
            depth = profiles[which[i], s] * float(
                rng.lognormal(0.0, 0.2))
            ln = int(lengths[i])
            n_reads = max(1, int(round(depth * ln / READ_LEN)))
            positions = np.sort(rng.integers(0, ln - READ_LEN, n_reads))
            for r, pos in enumerate(positions):
                # ~10% low-identity reads (NM high -> filtered at minid .95)
                nm = int(READ_LEN * 0.2) if rng.random() < 0.1 else 0
                alns.append(alignment(
                    i, int(pos), [cigar_op(READ_LEN, "M")], nm=nm,
                    read_name=f"s{s}c{i}r{r}".encode(), seq_len=READ_LEN))
        write_bam(os.path.join(bamdir, f"sample{s}.bam"), refs, alns)
    return bamdir


def run_side(name, cmd, env=None):
    t0 = time.time()
    e = dict(os.environ)
    if env:
        e.update(env)
    proc = subprocess.run(cmd, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True, env=e)
    wall = time.time() - t0
    if proc.returncode != 0:
        print(proc.stdout[-6000:], file=sys.stderr)
        raise RuntimeError(f"{name} failed rc={proc.returncode}")
    return wall


def read_bins(path):
    bins: dict = {}
    with open(path) as f:
        next(f)
        for line in f:
            b, c = line.rstrip("\n").split("\t")
            bins.setdefault(b, []).append(int(c.split("C", 1)[1]))
    return bins


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--contigs", type=int, default=2000)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--genomes", type=int, default=40)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="bam_h2h_")
    os.makedirs(workdir, exist_ok=True)
    try:
        from bench import _score_bins_vs_truth, _write_synthetic_metagenome

        fasta, _tsv, which, lengths = _write_synthetic_metagenome(
            workdir, args.contigs, args.samples, args.genomes,
            hard=False, seed=args.seed)
        bamdir = build_bams(workdir, args.contigs, args.samples,
                            which, lengths, args.seed)
        steps = [s for s in (25, 75) if s < args.epochs]
        common = ["--fasta", fasta, "--bamdir", bamdir, "--seed", "1",
                  "-e", str(args.epochs), "-q", *[str(s) for s in steps]]
        results = {"dataset": {"contigs": args.contigs,
                               "samples": args.samples,
                               "genomes": args.genomes,
                               "epochs": args.epochs}}
        for side in ("reference", "vamb_tpu"):
            outdir = os.path.join(workdir, side)
            if side == "reference":
                cmd = [sys.executable,
                       os.path.join(_REPO, "tests/refshim/run_reference.py"),
                       "bin", "default", "--outdir", outdir, *common]
            else:
                cmd = [sys.executable, "-m", "vamb_tpu", "bin", "default",
                       "--outdir", outdir, *common]
            wall = run_side(side, cmd)
            bins = read_bins(os.path.join(outdir, "vae_clusters_split.tsv"))
            nc, mq = _score_bins_vs_truth(bins, which, lengths, args.genomes)
            results[side] = {"wall_s": round(wall, 1), "nc_like": nc,
                             "mq_like": mq, "bins": len(bins)}
            print(f"[bam-h2h] {side}: NC {nc} MQ {mq} wall {wall:.1f}s",
                  file=sys.stderr)

        ref_ab = np.load(os.path.join(workdir, "reference/abundance.npz"),
                         allow_pickle=True)
        tpu_ab = np.load(os.path.join(workdir, "vamb_tpu/abundance.npz"),
                         allow_pickle=True)
        # align sample columns by name first: the reference takes BAMs in
        # raw `dir.iterdir()` filesystem order (__main__.py:131 — not
        # reproducible across systems), while this repo sorts the paths
        rnames = [str(x) for x in ref_ab["samplenames"]]
        tnames = [str(x) for x in tpu_ab["samplenames"]]
        bit_identical = False
        if sorted(rnames) == sorted(tnames):
            perm = [rnames.index(n) for n in tnames]
            bit_identical = bool(
                np.array_equal(ref_ab["matrix"][:, perm], tpu_ab["matrix"]))
        results["abundance_bit_identical_aligned"] = bit_identical
        results["samplename_order_matches"] = rnames == tnames
        print(f"[bam-h2h] abundance matrices bit-identical after column "
              f"alignment: {bit_identical} (raw order equal: {rnames == tnames})",
              file=sys.stderr)
        print(json.dumps(results))
    finally:
        if not args.keep and args.workdir is None:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()

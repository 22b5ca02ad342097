"""Recluster head-to-head: reference `vamb recluster` vs ours, both modes.

Builds a 20k-contig synthetic metagenome with PLANTED single-copy marker
genes (one fresh variant of each of M markers per genome, each spliced into
exactly one contig of that genome, half reverse-strand — the
tests/test_marker_fidelity.py construction at h2h scale), runs OUR `bin
default` once to produce the latent/clusters inputs, then runs `vamb
recluster` on IDENTICAL inputs through BOTH pipelines:

* kmeans mode — split bins whose median SCG count >= 2 (reference
  reclustering.py:94-153);
* dbscan mode — per-genus eps sweep (reference reclustering.py:239-272),
  fed a ground-truth genus taxonomy (several genomes per genus) with
  --no_predictor.

The reference side runs under tests/refshim with the now-FUNCTIONAL
pyrodigal/pyhmmer shims (backed by ops/orf.py + ops/hmm.py; run with
-p 1 so exactly one forked marker worker owns the single-client TPU), so
both sides share this repo's marker stack — the h2h therefore compares
the RECLUSTERING algorithms on identical markers/latents, same caveat as
the pycoverm shim. The first run predicts markers through the full shim
path; the other three reuse its markers.npz (also checking cross-pipeline
artifact interop). Scores refined binnings NC/MQ-like vs planted truth.

Usage: python tests/refshim/recluster_h2h.py [--contigs 20000]
       [--genomes 150] [--workdir DIR] [--keep]
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

N_MARKERS = 16
PROT_LEN = 40
GENOMES_PER_GENUS = 3


def build_dataset(workdir: str, n_contigs: int, n_samples: int,
                  n_genomes: int, seed: int):
    "Synthetic metagenome + planted markers + marker HMMs + taxonomy."
    from bench import _write_synthetic_metagenome
    from tests.test_hmm import _revcomp
    from tests.test_marker_fidelity import (
        AA,
        _encode_gene,
        _profile_from_consensus,
        _sample_variant,
    )
    from vamb_tpu.ops import hmm as H

    fasta, tsv, which, lengths = _write_synthetic_metagenome(
        workdir, n_contigs, n_samples, n_genomes, hard=True, seed=seed)

    rng = np.random.default_rng(seed + 1)
    consensi = [
        "M" + "".join(AA[i] for i in rng.integers(0, 20, PROT_LEN - 1))
        for _ in range(N_MARKERS)
    ]
    # the reference's get_name_to_id unconditionally aliases these four
    # names (parsemarkers.py:193-198,300) and KeyErrors if they're absent,
    # so the synthetic DB must include them
    names = ["TIGR00389", "TIGR00472", "TIGR00409", "TIGR02387"] + [
        f"TIGR8{i:04d}" for i in range(N_MARKERS - 4)
    ]
    profiles = [_profile_from_consensus(c, n) for c, n in zip(consensi, names)]
    for prof, cons in zip(profiles, consensi):
        local = H.configure_local(prof)
        true_scores = H.forward_scores(
            local, [_sample_variant(rng, cons) for _ in range(16)])
        bg = H.forward_scores(
            local,
            ["M" + "".join(AA[i] for i in rng.integers(0, 20, PROT_LEN - 1))
             for _ in range(16)])
        prof.trusted_cutoff = float(true_scores.min()) - 0.5
        assert prof.trusted_cutoff > float(bg.max()) + 2.0, "calibration overlap"
    hmm_path = os.path.join(workdir, "markers.hmm")
    with open(hmm_path, "w") as f:
        f.write("".join(H.format_hmm(p) for p in profiles))

    # splice one variant of each marker into one contig per genome
    with open(fasta, "rb") as f:
        entries = []
        name = None
        seq: list = []
        for line in f:
            line = line.rstrip()
            if line.startswith(b">"):
                if name is not None:
                    entries.append([name, bytearray(b"".join(seq))])
                name = line[1:].decode()
                seq = []
            else:
                seq.append(line)
        entries.append([name, bytearray(b"".join(seq))])
    index_of = {nm: i for i, (nm, _) in enumerate(entries)}
    by_genome: dict[int, list[int]] = {}
    for i in range(n_contigs):
        by_genome.setdefault(int(which[i]), []).append(i)
    n_planted = 0
    for g, members in by_genome.items():
        for m in range(N_MARKERS):
            gene = _encode_gene(_sample_variant(rng, consensi[m]))
            if rng.random() < 0.5:
                gene = _revcomp(gene.encode()).decode()
            gene_b = ("TAA" + gene + "TAA").encode()
            ci = int(rng.choice(members))
            seq = entries[index_of[f"S{g % n_samples}C{ci}"]][1]
            if len(seq) < len(gene_b) + 100:
                continue
            pos = int(rng.integers(50, len(seq) - len(gene_b) - 50))
            seq[pos:pos + len(gene_b)] = gene_b
            n_planted += 1
    with open(fasta, "wb") as f:
        for nm, seq in entries:
            f.write(b">" + nm.encode() + b"\n" + bytes(seq) + b"\n")
    print(f"[h2h] planted {n_planted} marker genes "
          f"({n_genomes} genomes x {N_MARKERS} markers)", file=sys.stderr)

    # ground-truth genus taxonomy: GENOMES_PER_GENUS genomes share a genus;
    # higher ranks nest by integer division so every name has exactly one
    # parent (the reference validates tree-ness, taxonomy.py:264-294)
    tax_path = os.path.join(workdir, "taxonomy.tsv")
    with open(tax_path, "w") as f:
        f.write("contigs\tpredictions\n")
        for i in range(n_contigs):
            g = int(which[i])
            genus = g // GENOMES_PER_GENUS
            f.write(
                f"S{g % n_samples}C{i}\t"
                f"Bacteria;P{genus // 16};C{genus // 8};O{genus // 4};"
                f"F{genus // 2};genus{genus};species{g}\n")
    return fasta, tsv, hmm_path, tax_path, which, lengths


def run_cmd(name, cmd, env=None):
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


def read_bins(path, tab_rows_only=False):
    """Read a cluster TSV into {bin: [contig ints]}.

    `tab_rows_only` handles a REFERENCE BUG its recluster path exposes:
    export_clusters prints the binsplit rows to the UNSPLIT file handle
    (reference __main__.py:1216-1228, `file=unsplit_clusters_file`), so its
    `_split.tsv` is always header-only and its `_unsplit.tsv` interleaves
    space-separated unsplit rows with tab-separated split rows. Passing
    tab_rows_only=True extracts just the split rows from that mixed file."""
    bins: dict = {}
    with open(path) as f:
        next(f)
        for line in f:
            line = line.rstrip("\n")
            if "\t" not in line:
                if tab_rows_only:
                    continue
                b, c = line.split(" ", 1)
            else:
                b, c = line.split("\t")
            bins.setdefault(b, []).append(int(c.split("C", 1)[1]))
    return bins


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--contigs", type=int, default=20_000)
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--genomes", type=int, default=150)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--skip-build", action="store_true",
                    help="reuse an existing --workdir's dataset + bin run")
    args = ap.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="recluster_h2h_")
    os.makedirs(workdir, exist_ok=True)
    try:
        from bench import _score_bins_vs_truth

        meta = os.path.join(workdir, "meta.npz")
        binout = os.path.join(workdir, "binout")
        if args.skip_build and os.path.exists(meta):
            m = np.load(meta)
            which, lengths = m["which"], m["lengths"]
            fasta = os.path.join(workdir, "contigs.fna")
            tsv = os.path.join(workdir, "abundance.tsv")
            hmm_path = os.path.join(workdir, "markers.hmm")
            tax_path = os.path.join(workdir, "taxonomy.tsv")
        else:
            fasta, tsv, hmm_path, tax_path, which, lengths = build_dataset(
                workdir, args.contigs, args.samples, args.genomes, args.seed)
            np.savez(meta, which=which, lengths=lengths)
            # one bin run (ours) provides latent + clusters to BOTH sides
            steps = [s for s in (25, 75) if s < args.epochs]
            run_cmd("bin default", [
                sys.executable, "-m", "vamb_tpu", "bin", "default",
                "--outdir", binout, "--fasta", fasta, "--abundance_tsv", tsv,
                "--seed", "1", "-e", str(args.epochs),
                "-q", *[str(s) for s in steps],
            ])

        latent = os.path.join(binout, "latent.npz")
        clusters = os.path.join(binout, "vae_clusters_unsplit.tsv")
        split_bins = read_bins(os.path.join(binout, "vae_clusters_split.tsv"))
        nc0, mq0 = _score_bins_vs_truth(
            split_bins, which, lengths, args.genomes)
        results = {
            "dataset": {"contigs": args.contigs, "genomes": args.genomes,
                        "markers": N_MARKERS, "epochs": args.epochs},
            "input_binning": {"nc_like": nc0, "mq_like": mq0,
                              "bins": len(split_bins)},
        }

        # The first run predicts markers through the full shim path and
        # caches markers.npz; later runs reuse that artifact (--markers),
        # which both pins identical marker inputs across all four runs and
        # checks cross-pipeline markers.npz interop.
        cached_markers = os.path.join(workdir, "markers_cached.npz")
        markers_npz = cached_markers if os.path.exists(cached_markers) else None
        for mode in ("kmeans", "dbscan"):
            for side in ("reference", "vamb_tpu"):
                outdir = os.path.join(workdir, f"{side}_{mode}")
                shutil.rmtree(outdir, ignore_errors=True)  # CLIs mkdir fresh
                if mode == "kmeans":
                    alg_args = ["--clusters_path", clusters]
                else:
                    alg_args = ["--taxonomy", tax_path, "--no_predictor"]
                marker_args = (
                    ["--markers", markers_npz] if markers_npz
                    else ["--hmm_path", hmm_path]
                )
                if side == "reference":
                    # -p 1: exactly one forked marker worker, so only one
                    # process initializes the (single-client) TPU; the
                    # torch parent never touches JAX before the fork
                    cmd = [sys.executable,
                           os.path.join(_REPO, "tests/refshim/run_reference.py"),
                           "recluster", "--outdir", outdir, "--fasta", fasta,
                           "--latent_path", latent, *marker_args,
                           "--algorithm", mode, "--seed", "1", "-p", "1",
                           *alg_args]
                    env = None
                else:
                    cmd = [sys.executable, "-m", "vamb_tpu",
                           "recluster", "--outdir", outdir, "--fasta", fasta,
                           "--latent_path", latent, *marker_args,
                           "--algorithm", mode, "--seed", "1", "-p", "4",
                           *alg_args]
                    env = None
                wall = run_cmd(f"{side} {mode}", cmd, env)
                if side == "reference":
                    bins = read_bins(
                        os.path.join(outdir, "clusters_reclustered_unsplit.tsv"),
                        tab_rows_only=True)
                else:
                    bins = read_bins(
                        os.path.join(outdir, "clusters_reclustered_split.tsv"))
                nc, mq = _score_bins_vs_truth(bins, which, lengths, args.genomes)
                results[f"{side}_{mode}"] = {
                    "wall_s": round(wall, 1), "nc_like": nc, "mq_like": mq,
                    "bins": len(bins),
                }
                print(f"[h2h] {side} {mode}: NC {nc} MQ {mq} "
                      f"bins {len(bins)} wall {wall:.1f}s", file=sys.stderr)
                produced = os.path.join(outdir, "markers.npz")
                if markers_npz is None and os.path.exists(produced):
                    shutil.copy(produced, cached_markers)
                    markers_npz = cached_markers
        print(json.dumps(results))
    finally:
        if not args.keep and args.workdir is None:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()

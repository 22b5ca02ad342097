"""Quantified fidelity of the native marker backend (VERDICT r2 item 6).

The reference predicts single-copy marker genes with pyrodigal (Prodigal's
GC-frame-scored gene caller) + pyhmmer (reference vamb/parsemarkers.py:
231-264); the always-available NativeBackend substitutes a six-frame
maximal-ORF caller (ops/orf.py, documented over-prediction) + the JAX
profile-HMM Forward scorer (ops/hmm.py). Round 2 asserted that trusted
cutoffs filter the over-prediction; this module MEASURES it:

* genes are sampled FROM profile match distributions (~30% mismatch to
  consensus), planted on both strands in random-DNA contigs, and trusted
  cutoffs are calibrated HMMER-style (the lowest true-member score) on a
  holdout set, so the experiment covers ORF recovery, scoring
  generalization and cutoff filtering together;
* per-(contig, marker) precision/recall are computed against the planted
  ground truth, with floors asserted (measured on this seed: precision
  1.000, recall 0.969 — 62/64 planted genes recovered, zero false
  positives, i.e. the cutoffs fully filter the six-frame over-prediction
  and the cost is a small recall tax on gene calling);
* the same markers drive an end recluster_kmeans run on deliberately
  merged bins, asserting marker-guided splitting recovers pure genome
  bins — the downstream quality the backend exists for (reference
  reclustering.py:94-153).
"""

import numpy as np
import pytest

from vamb_tpu.markers import Markers, NativeBackend
from vamb_tpu.ops import hmm as H
from vamb_tpu.reclustering import KmeansAlgorithm, recluster_bins

from .test_hmm import _CODON_OF, _revcomp

N_MARKERS = 8
N_GENOMES = 8
PROT_LEN = 40
AA = "ACDEFGHIKLMNPQRSTVWY"


def _profile_from_consensus(cons: str, name: str) -> H.ProfileHMM:
    "A profile whose match states put 0.7 on the consensus residue."
    m = len(cons)
    match = np.full((m, 20), 0.3 / 19)
    for k, c in enumerate(cons):
        match[k, H._AA_INDEX[c]] = 0.7
    trans = np.zeros((m + 1, 7))
    trans[:, 0] = 0.97  # m->m
    trans[:, 1] = trans[:, 2] = 0.015
    trans[:, 3] = 0.9
    trans[:, 4] = 0.1
    trans[:, 5] = 0.9
    trans[:, 6] = 0.1
    trans[m] = [1.0, 0.0, 0.0, 1.0, 0.0, 1.0, 0.0]
    trans[0] = [0.985, 0.015, 0.0, 0.9, 0.1, 0.9, 0.1]
    return H.ProfileHMM(
        name=name,
        match=match,
        insert=np.tile(H.BACKGROUND, (m, 1)),
        trans=trans,
        trusted_cutoff=0.0,  # calibrated below
    )


def _sample_variant(rng, cons: str) -> str:
    "Draw each residue from the profile's match distribution; keep M start."
    out = ["M"]
    for c in cons[1:]:
        if rng.random() < 0.7:
            out.append(c)
        else:
            out.append(AA[rng.integers(0, 20)])
    return "".join(out)


def _encode_gene(prot: str) -> str:
    return "".join(_CODON_OF[c] for c in prot) + "TAA"


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    rng = np.random.default_rng(42)
    workdir = tmp_path_factory.mktemp("fidelity")

    consensi = [
        "M" + "".join(AA[i] for i in rng.integers(0, 20, PROT_LEN - 1))
        for _ in range(N_MARKERS)
    ]
    names = [f"TIGR9{i:04d}" for i in range(N_MARKERS)]
    profiles = [
        _profile_from_consensus(c, n) for c, n in zip(consensi, names)
    ]

    # HMMER-style trusted cutoffs: the lowest score among 16 held-out true
    # variants, checked to clear 16 random background proteins
    for prof, cons in zip(profiles, consensi):
        local = H.configure_local(prof)
        true_scores = H.forward_scores(
            local, [_sample_variant(rng, cons) for _ in range(16)]
        )
        bg_scores = H.forward_scores(
            local,
            [
                "M" + "".join(AA[i] for i in rng.integers(0, 20, PROT_LEN - 1))
                for _ in range(16)
            ],
        )
        prof.trusted_cutoff = float(true_scores.min()) - 0.5
        assert prof.trusted_cutoff > bg_scores.max(), (
            "degenerate calibration: background overlaps true members"
        )
    hmm_path = workdir / "markers.hmm"
    hmm_path.write_text("".join(H.format_hmm(p) for p in profiles))

    # each genome carries one fresh variant of every marker, each on its
    # own contig (half reverse-strand), plus markerless noise contigs
    contig_names: list[str] = []
    truth: dict[str, set[int]] = {}
    fasta_lines: list[str] = []

    def flank(n):
        return "".join("ACGT"[i] for i in rng.integers(0, 4, n))

    for g in range(N_GENOMES):
        for m in range(N_MARKERS):
            gene = _encode_gene(_sample_variant(rng, consensi[m]))
            if (g + m) % 2:
                gene = _revcomp(gene.encode()).decode()
            name = f"G{g}M{m}"
            seq = flank(120) + "TAA" + gene + flank(120)
            contig_names.append(name)
            truth[name] = {m}
            fasta_lines.append(f">{name}\n{seq}\n")
    for i in range(16):
        name = f"noise{i}"
        contig_names.append(name)
        truth[name] = set()
        fasta_lines.append(f">{name}\n{flank(400)}\n")

    fasta = workdir / "contigs.fna"
    fasta.write_text("".join(fasta_lines))

    markers = Markers.from_files(
        fasta,
        hmm_path,
        contig_names,
        workdir / "tmp",
        2,
        None,
        backend=NativeBackend(),
    )
    return markers, contig_names, truth


def test_marker_precision_recall(experiment):
    markers, contig_names, truth = experiment
    marker_id_of_name = {
        ns[0]: i for i, ns in enumerate(markers.marker_names)
    }
    # map experiment marker index -> Markers id (names are normalized and
    # possibly reordered)
    exp_to_id = {
        m: marker_id_of_name[f"TIGR9{m:04d}"] for m in range(N_MARKERS)
    }
    tp = fp = fn = 0
    for row, name in enumerate(contig_names):
        got = (
            set(int(x) for x in markers.markers[row])
            if markers.markers[row] is not None
            else set()
        )
        want = {exp_to_id[m] for m in truth[name]}
        tp += len(got & want)
        fp += len(got - want)
        fn += len(want - got)
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    print(
        f"\n[native-backend fidelity] planted {N_GENOMES * N_MARKERS} "
        f"marker genes: precision={precision:.3f} recall={recall:.3f} "
        f"(tp={tp} fp={fp} fn={fn})"
    )
    # the round-2 claim, now a number: trusted cutoffs filter the six-frame
    # caller's over-prediction
    assert precision >= 0.95, (precision, fp)
    assert recall >= 0.90, (recall, fn)


def test_recluster_splits_merged_bins(experiment):
    markers, contig_names, _truth = experiment
    n = len(contig_names)
    rng = np.random.default_rng(7)

    # latents: one tight blob per genome; noise contigs scattered
    centers = rng.standard_normal((N_GENOMES, 8)).astype(np.float32) * 3
    latent = np.empty((n, 8), np.float32)
    genome_of = np.full(n, -1)
    for row, name in enumerate(contig_names):
        if name.startswith("G"):
            g = int(name[1 : name.index("M")])
            genome_of[row] = g
            latent[row] = centers[g] + 0.05 * rng.standard_normal(8)
        else:
            latent[row] = rng.standard_normal(8) * 3
    lengths = rng.integers(2000, 10_000, n)

    # deliberately merged bins: two genomes per bin (duplicated SCGs)
    merged = [
        {int(r) for r in np.flatnonzero((genome_of == 2 * k) | (genome_of == 2 * k + 1))}
        for k in range(N_GENOMES // 2)
    ]
    merged.append({int(r) for r in np.flatnonzero(genome_of == -1)})

    def pure_genome_bins(bins):
        count = 0
        for b in bins:
            gs = {int(genome_of[r]) for r in b}
            if len(gs) == 1 and gs != {-1} and len(b) >= N_MARKERS * 0.9:
                count += 1
        return count

    before = pure_genome_bins(merged)
    out = recluster_bins(
        markers, latent, KmeansAlgorithm(merged, 1, lengths)
    )
    after = pure_genome_bins(out)
    print(f"\n[recluster] pure single-genome bins: {before} -> {after} of {N_GENOMES}")
    assert before == 0
    assert after >= N_GENOMES - 1

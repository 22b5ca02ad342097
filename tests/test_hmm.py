"""Native ORF caller + profile-HMM scorer tests.

The Forward DP (vamb_tpu/ops/hmm.py) is verified against an independent
successor-style recursive oracle over the same multihit-local state
machine, plus a closed-form combinatorial oracle for M=1 profiles —
three formulations of the model that would not share an indexing bug.
The ORF caller is checked on constructed contigs with planted genes, and
the NativeBackend end-to-end through Markers.from_files.
"""

import functools
import io
import math
from pathlib import Path

import numpy as np
import pytest

from vamb_tpu.markers import Markers, NativeBackend
from vamb_tpu.ops import hmm as H
from vamb_tpu.ops import orf

# ------------------------------------------------------------------- ORF


def _revcomp(s: bytes) -> bytes:
    return s[::-1].translate(bytes.maketrans(b"ACGT", b"TGCA"))


PROT = "MKLVINSTRAGQEDWFYHPCKLVINSTRAGQEDWFYHPC"  # 39 aa >= 90nt minimum
# one codon per residue, table 11
_CODON_OF = {}
for _i0, _b0 in enumerate("ACGT"):
    for _i1, _b1 in enumerate("ACGT"):
        for _i2, _b2 in enumerate("ACGT"):
            _aa = chr(orf._CODON_TABLE[_i0 * 16 + _i1 * 4 + _i2])
            _CODON_OF.setdefault(_aa, _b0 + _b1 + _b2)
_CODON_OF["M"] = "ATG"


def encode_gene(prot: str) -> bytes:
    return ("".join(_CODON_OF[c] for c in prot) + "TAA").encode()


def test_orf_finds_planted_gene_forward():
    gene = encode_gene(PROT)
    contig = b"CC" + b"TAA" + gene + b"TAGGCA"  # stop before, junk after
    genes = orf.find_genes(contig)
    assert PROT in genes


def test_orf_finds_planted_gene_reverse():
    gene = encode_gene(PROT)
    contig = b"G" + b"TAA" + _revcomp(gene) + b"CCTAG"
    assert PROT in orf.find_genes(contig)


def test_orf_min_length():
    short = "M" + "K" * 10  # 36 nt, under the 90 nt minimum
    contig = b"TAA" + encode_gene(short) + b"TAA"
    assert short not in orf.find_genes(contig)


def test_orf_min_length_below_default_is_honored():
    # min_length_nt below the module default must LOWER the floor, not be
    # silently clamped by the per-frame run filter
    short = "M" + "K" * 10  # gene = 33 nt incl. start, run = 11 codons
    contig = b"TAA" + encode_gene(short) + b"TAA"
    assert short in orf.find_genes(contig, min_length_nt=30)


def test_orf_truncated_at_edge():
    # no start codon, no upstream stop: 5'-truncated gene candidate
    prot_no_start = "K" + PROT[1:]
    seq = encode_gene(prot_no_start)
    genes = orf.find_genes(seq)
    assert prot_no_start in genes


def test_orf_interior_requires_start():
    prot_no_start = "KLVINSTRAGQEDWFYHPCKLVINSTRAGQEDWFYHPCK".replace("M", "K")
    body = "".join(_CODON_OF[c] for c in prot_no_start)
    codons = {body[i : i + 3] for i in range(0, len(body), 3)}
    assert codons.isdisjoint({"ATG", "GTG", "TTG"})
    contig = (b"TAA" + body.encode() + b"TAA") * 1
    found = orf.find_genes(contig)
    assert prot_no_start not in found


# ------------------------------------------------------ profile construction


def random_profile(rng: np.random.Generator, m: int, name="p") -> H.ProfileHMM:
    def dirichlet(n, k):
        x = rng.gamma(1.0, size=(n, k))
        return x / x.sum(axis=1, keepdims=True)

    match = dirichlet(m, 20)
    insert = np.tile(H.BACKGROUND, (m, 1))
    trans = np.zeros((m + 1, 7))
    mmd = dirichlet(m + 1, 3)  # m->m, m->i, m->d
    ii = dirichlet(m + 1, 2)  # i->m, i->i
    dd = dirichlet(m + 1, 2)  # d->m, d->d
    trans[:, 0:3] = mmd
    trans[:, 3:5] = ii
    trans[:, 5:7] = dd
    # node M: M->E certain, no D exit ambiguity
    trans[m] = [1.0, 0.0, 0.0, 1.0, 0.0, 1.0, 0.0]
    # node 0 = begin: no B->D wing in our local config; mass on M1/I0
    trans[0, 2] = 0.0
    trans[0, 0:2] /= trans[0, 0:2].sum()
    return H.ProfileHMM(
        name=name, match=match, insert=insert, trans=trans, trusted_cutoff=10.0
    )


# ------------------------------------------------- oracle 1: recursion


def oracle_bits(lp: H.LocalProfile, seq: str) -> float:
    """Successor-style memoized recursion over the local search profile.

    States explored forward from (N, 0); completely independent of the
    row-vectorized predecessor-form DP in ops/hmm.py.
    """
    m = lp.lom.shape[0]
    x = [H._AA_INDEX[c] for c in seq]
    L = len(x)
    loop = math.log(L / (L + 3.0))
    move = math.log(3.0 / (L + 3.0))
    tej = tec = math.log(0.5)
    t = lp.t

    def lse(*vals):
        vals = [v for v in vals if v > -1e29]
        if not vals:
            return -1e30
        mx = max(vals)
        return mx + math.log(sum(math.exp(v - mx) for v in vals))

    @functools.lru_cache(maxsize=None)
    def rec(state: str, k: int, i: int) -> float:
        "log-prob of finishing the sequence from this state."
        if state == "N":
            succ = [rec("B", 0, i) + move]
            if i < L:
                succ.append(rec("N", 0, i + 1) + loop)
            return lse(*succ)
        if state == "B":
            if i == L:
                return -1e30
            return lse(
                *[
                    rec("M", kk, i + 1) + lp.tbm[kk - 1] + lp.lom[kk - 1][x[i]]
                    for kk in range(1, m + 1)
                ]
            )
        if state == "M":
            succ = [rec("E", 0, i)]  # local exit, probability 1
            if k < m:
                if i < L:
                    succ.append(
                        rec("M", k + 1, i + 1) + t[k][0] + lp.lom[k][x[i]]
                    )
                succ.append(rec("D", k + 1, i) + t[k][2])
            if i < L:
                succ.append(rec("I", k, i + 1) + t[k][1])
            return lse(*succ)
        if state == "I":
            succ = []
            if k < m:
                if i < L:
                    succ.append(
                        rec("M", k + 1, i + 1) + t[k][3] + lp.lom[k][x[i]]
                    )
                succ.append(rec("I", k, i + 1) + t[k][4] if i < L else -1e30)
            return lse(*succ) if succ else -1e30
        if state == "D":
            succ = []
            if k < m:
                if i < L:
                    succ.append(
                        rec("M", k + 1, i + 1) + t[k][5] + lp.lom[k][x[i]]
                    )
                succ.append(rec("D", k + 1, i) + t[k][6])
            return lse(*succ) if succ else -1e30
        if state == "E":
            return lse(rec("J", 0, i) + tej, rec("C", 0, i) + tec)
        if state == "J":
            succ = [rec("B", 0, i) + move]
            if i < L:
                succ.append(rec("J", 0, i + 1) + loop)
            return lse(*succ)
        if state == "C":
            if i == L:
                return move
            return rec("C", 0, i + 1) + loop
        raise AssertionError(state)

    null1 = L * math.log(L / (L + 1.0)) - math.log(L + 1.0)
    return (rec("N", 0, 0) - null1) / math.log(2.0)


# --------------------------------------------- oracle 2: closed form, M=1


def oracle_bits_m1(lp: H.LocalProfile, seq: str) -> float:
    """For a single-match-state profile, enumerate match-position subsets.

    Each hit is exactly one M1 emission (no inserts reachable); residues
    before/between/after hits are consumed by N/J/C loops.
    """
    x = [H._AA_INDEX[c] for c in seq]
    L = len(x)
    loop = math.log(L / (L + 3.0))
    move = math.log(3.0 / (L + 3.0))
    total = -np.inf
    from itertools import combinations

    for nhits in range(1, L + 1):
        for pos in combinations(range(L), nhits):
            s = move  # N->B
            prev_end = 0
            for idx, p in enumerate(pos):
                gap = p - prev_end
                s += gap * loop  # N or J loop emissions
                if idx > 0:
                    s += math.log(0.5) + move  # E->J ... J->B
                s += lp.tbm[0] + lp.lom[0][x[p]]
                prev_end = p + 1
            s += math.log(0.5)  # E->C
            s += (L - prev_end) * loop
            s += move  # C->T
            total = np.logaddexp(total, s)
    null1 = L * math.log(L / (L + 1.0)) - math.log(L + 1.0)
    return (total - null1) / math.log(2.0)


AAS = "ACDEFGHIKLMNPQRSTVWY"


def test_forward_matches_recursive_oracle():
    rng = np.random.default_rng(0)
    for m in (2, 3, 5):
        prof = random_profile(rng, m)
        lp = H.configure_local(prof)
        for L in (1, 2, 4, 6):
            seq = "".join(rng.choice(list(AAS), size=L))
            got = float(H.forward_scores(lp, [seq])[0])
            want = oracle_bits(lp, seq)
            assert got == pytest.approx(want, abs=2e-3), (m, L, seq)


def test_forward_matches_m1_closed_form():
    rng = np.random.default_rng(1)
    prof = random_profile(rng, 1)
    lp = H.configure_local(prof)
    for L in (1, 2, 3, 5):
        seq = "".join(rng.choice(list(AAS), size=L))
        got = float(H.forward_scores(lp, [seq])[0])
        want = oracle_bits_m1(lp, seq)
        assert got == pytest.approx(want, abs=2e-3), (L, seq)


def test_forward_batching_matches_single():
    "Padded batch scoring == one-by-one scoring (padding is inert)."
    rng = np.random.default_rng(2)
    prof = random_profile(rng, 4)
    lp = H.configure_local(prof)
    seqs = ["".join(rng.choice(list(AAS), size=ln)) for ln in (3, 17, 40, 9)]
    batched = H.forward_scores(lp, seqs)
    singles = np.array([H.forward_scores(lp, [s])[0] for s in seqs])
    np.testing.assert_allclose(batched, singles, atol=1e-3)


# ------------------------------------------------------------ file format


def test_hmm_format_roundtrip():
    rng = np.random.default_rng(3)
    profs = [random_profile(rng, 3, "alpha"), random_profile(rng, 6, "beta")]
    text = "".join(H.format_hmm(p) for p in profs)
    back = H.read_hmms(io.StringIO(text))
    assert [p.name for p in back] == ["alpha", "beta"]
    for a, b in zip(profs, back):
        np.testing.assert_allclose(a.match, b.match, atol=1e-5)
        np.testing.assert_allclose(a.trans, b.trans, atol=1e-5)
        assert b.trusted_cutoff == pytest.approx(a.trusted_cutoff)


# ----------------------------------------------------------- end to end


def peptide_profile(prot: str, name: str, cutoff: float) -> H.ProfileHMM:
    "A profile strongly matching one peptide (0.9 on the residue)."
    m = len(prot)
    match = np.full((m, 20), 0.1 / 19)
    for k, c in enumerate(prot):
        match[k, H._AA_INDEX[c]] = 0.9
    trans = np.zeros((m + 1, 7))
    trans[:, 0] = 0.98  # m->m
    trans[:, 1] = trans[:, 2] = 0.01
    trans[:, 3] = 0.9
    trans[:, 4] = 0.1
    trans[:, 5] = 0.9
    trans[:, 6] = 0.1
    trans[m] = [1.0, 0.0, 0.0, 1.0, 0.0, 1.0, 0.0]
    trans[0] = [0.99, 0.01, 0.0, 0.9, 0.1, 0.9, 0.1]
    return H.ProfileHMM(
        name=name,
        match=match,
        insert=np.tile(H.BACKGROUND, (m, 1)),
        trans=trans,
        trusted_cutoff=cutoff,
    )


def test_native_backend_end_to_end(tmp_path: Path):
    rng = np.random.default_rng(4)
    prof = peptide_profile(PROT, "TIGR99999", 20.0)
    hmm_path = tmp_path / "markers.hmm"
    hmm_path.write_text(H.format_hmm(prof))

    gene = encode_gene(PROT)
    noise = "".join(rng.choice(list("ACGT"), size=400))
    fasta = tmp_path / "contigs.fna"
    fasta.write_text(
        f">has_marker\n{('TAA' + gene.decode())}\n>no_marker\n{noise}\n"
    )

    markers = Markers.from_files(
        fasta,
        hmm_path,
        ["has_marker", "no_marker"],
        tmp_path / "tmp",
        2,
        None,
        backend=NativeBackend(),
    )
    assert markers.marker_names == [["TIGR99999"]]
    assert markers.markers[0] is not None and list(markers.markers[0]) == [0]
    assert markers.markers[1] is None
    comp, cont = markers.score_bin([0, 1])
    assert comp == 1.0 and cont == 0.0

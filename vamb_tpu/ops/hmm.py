"""Profile-HMM search (the pyhmmer/hmmsearch role), TPU-batched.

The reference scores predicted genes against single-copy-marker profile
HMMs with ``pyhmmer.hmmsearch`` and keeps hits above each profile's
trusted cutoff (reference vamb/parsemarkers.py:251-260).  This module is
a from-scratch equivalent:

* ``read_hmms`` parses the HMMER3 ASCII flat format (NAME/LENG/TC
  header, COMPO, per-node match/insert emission and transition lines,
  ``*`` = zero probability) into :class:`ProfileHMM` records.
* ``configure_local`` builds HMMER3's multihit-local search profile:
  occupancy-weighted local entry ``B->Mk``, unit local exit ``Mk->E``,
  ``E->{J,C}`` = 1/2, and the target-length model (loop ``L/(L+3)``,
  move ``3/(L+3)``); match emissions become log-odds against the
  standard amino-acid background, insert/N/C/J emissions score zero.
* ``forward_scores`` runs the full Forward algorithm as a ``lax.scan``
  over sequence positions, vectorized over the node axis (the in-row
  delete chain is a prefix log-sum-exp via ``lax.associative_scan``)
  and ``vmap``-batched over sequences — one device dispatch scores
  every gene against a profile instead of forking worker processes.

Scores are HMMER bit scores (log2-odds vs the null-1 length model).
Deviation from hmmsearch, documented: the ad-hoc null-2 biased
-composition correction is not applied, so scores for low-complexity
sequences run a few bits higher than HMMER's.  The DP itself is
verified against brute-force path enumeration in tests/test_hmm.py.
"""

from dataclasses import dataclass
from pathlib import Path
from typing import IO, Iterable, Sequence, Union

import numpy as np

AMINO = "ACDEFGHIKLMNPQRSTVWY"
_AA_INDEX = {c: i for i, c in enumerate(AMINO)}

# Standard Easel/HMMER amino-acid background frequencies
# (order ACDEFGHIKLMNPQRSTVWY).
BACKGROUND = np.array(
    [
        0.0787945, 0.0151600, 0.0535222, 0.0668298, 0.0397062,
        0.0695071, 0.0229198, 0.0590092, 0.0594422, 0.0963728,
        0.0237718, 0.0414386, 0.0482904, 0.0395639, 0.0540978,
        0.0683364, 0.0540687, 0.0673417, 0.0114135, 0.0304133,
    ],
    dtype=np.float64,
)

# transition column order in the HMMER3 flat file
_TRANS = ("mm", "mi", "md", "im", "ii", "dm", "dd")


@dataclass
class ProfileHMM:
    """One profile as stored in a HMMER3 flat file (probability space).

    ``match`` / ``insert`` are (M, 20) emission probabilities for nodes
    1..M; ``trans`` is (M+1, 7) probabilities in file column order with
    row 0 holding the begin-node transitions.  ``trusted_cutoff`` is the
    first TC field (full-sequence bits), None if absent.
    """

    name: str
    match: np.ndarray
    insert: np.ndarray
    trans: np.ndarray
    trusted_cutoff: Union[float, None]

    @property
    def m(self) -> int:
        return self.match.shape[0]


def _vals(fields: Sequence[str]) -> np.ndarray:
    return np.array(
        [np.inf if f == "*" else float(f) for f in fields], dtype=np.float64
    )


def read_hmms(src: Union[Path, str, IO[str]]) -> list[ProfileHMM]:
    "Parse every profile in a HMMER3 ASCII flat file."
    if isinstance(src, (Path, str)):
        import gzip

        opener = gzip.open if str(src).endswith(".gz") else open
        with opener(src, "rt") as file:
            return read_hmms(file)
    profiles = []
    line = src.readline()
    while line:
        if not line.startswith("HMMER3"):
            raise ValueError(f"Expected HMMER3 format header, got: {line!r}")
        name, length, cutoff = "", -1, None
        while True:
            line = src.readline()
            if not line:
                raise ValueError("Truncated HMM file")
            if line.startswith("NAME "):
                name = line.split(maxsplit=1)[1].strip()
            elif line.startswith("LENG "):
                length = int(line.split()[1])
            elif line.startswith("TC "):
                cutoff = float(line.split()[1].rstrip(";"))
            elif line.startswith("ALPH ") and line.split()[1].lower() != "amino":
                raise ValueError("Only amino-alphabet HMMs are supported")
            elif line.startswith("HMM "):
                break
        src.readline()  # transition-name header line
        # optional COMPO line (background composition; the standard
        # background is used instead) — branch on the tokens rather than
        # tell/seek so non-seekable streams (pipes) parse too
        first = src.readline().split()
        if first and first[0] == "COMPO":
            first = src.readline().split()
        insert0 = _vals(first[:20])
        trans0 = _vals(src.readline().split()[:7])
        match = np.empty((length, 20))
        insert = np.empty((length, 20))
        trans = np.empty((length + 1, 7))
        trans[0] = trans0
        del insert0  # node-0 inserts are irrelevant under the local config
        for k in range(1, length + 1):
            fields = src.readline().split()
            if not fields or int(fields[0]) != k:
                raise ValueError(f"Malformed node {k} in profile {name!r}")
            match[k - 1] = _vals(fields[1:21])
            insert[k - 1] = _vals(src.readline().split()[:20])
            trans[k] = _vals(src.readline().split()[:7])
        closer = src.readline()
        if not closer.startswith("//"):
            raise ValueError(f"Profile {name!r} not terminated by //")
        profiles.append(
            ProfileHMM(
                name=name,
                match=np.exp(-match),
                insert=np.exp(-insert),
                trans=np.exp(-trans),
                trusted_cutoff=cutoff,
            )
        )
        line = src.readline()
        while line and not line.strip():
            line = src.readline()
    return profiles


def format_hmm(p: ProfileHMM) -> str:
    "Render a profile back into HMMER3/f ASCII (for tests and tooling)."

    def row(v: np.ndarray) -> str:
        return "  ".join("*" if not x > 0 else f"{-np.log(x):.5f}" for x in v)

    lines = [
        "HMMER3/f [vamb_tpu]",
        f"NAME  {p.name}",
        f"LENG  {p.m}",
        "ALPH  amino",
    ]
    if p.trusted_cutoff is not None:
        lines.append(f"TC    {p.trusted_cutoff:.2f} {p.trusted_cutoff:.2f};")
    lines.append("HMM   " + "  ".join(AMINO))
    lines.append("      " + "  ".join(_TRANS))
    lines.append("      " + row(BACKGROUND))  # insert-0 emissions
    lines.append("      " + row(p.trans[0]))
    for k in range(p.m):
        lines.append(f"{k + 1:>7} " + row(p.match[k]))
        lines.append("        " + row(p.insert[k]))
        lines.append("        " + row(p.trans[k + 1]))
    lines.append("//")
    return "\n".join(lines) + "\n"


@dataclass
class LocalProfile:
    """HMMER3 multihit-local search profile in log space (natural log).

    Emission scores are log-odds vs BACKGROUND; transition scores are
    log-probabilities.  ``t`` columns follow ``_TRANS`` order for the
    core nodes; ``tbm[k]`` is the occupancy-weighted local entry into
    match state k+1.  The length model (xn/xc/xj loop & move, and the
    null-1 correction) depends on the target length and is supplied at
    scoring time by :func:`forward_scores`.
    """

    name: str
    lom: np.ndarray  # (M, 20) match log-odds
    t: np.ndarray  # (M+1, 7) core log transitions
    tbm: np.ndarray  # (M,) local entry log-probs
    trusted_cutoff: Union[float, None]


def configure_local(p: ProfileHMM) -> LocalProfile:
    "Build the multihit-local search profile (HMMER3 modelconfig semantics)."
    with np.errstate(divide="ignore"):
        lom = np.log(p.match) - np.log(BACKGROUND)[None, :]
        t = np.log(p.trans)
    # Match-state occupancy, p7_hmm_CalculateOccupancy: how likely node k
    # is visited, given begin-state and core transitions.
    occ = np.zeros(p.m + 1)
    occ[1] = p.trans[0][0] + p.trans[0][1]  # B->M1 + B->I0
    for k in range(2, p.m + 1):
        tr = p.trans[k - 1]
        occ[k] = occ[k - 1] * (tr[0] + tr[1]) + (1.0 - occ[k - 1]) * tr[5]
    occ = occ[1:]
    z = float((occ * np.arange(p.m, 0, -1)).sum())
    with np.errstate(divide="ignore"):
        tbm = np.log(occ) - np.log(z)
    return LocalProfile(
        name=p.name, lom=lom, t=t, tbm=tbm, trusted_cutoff=p.trusted_cutoff
    )


def encode_proteins(seqs: Iterable[str], pad_to: int) -> np.ndarray:
    """Encode proteins as int8 codes padded with 20 (the null residue).

    Residues outside the 20-letter alphabet (X, B, Z, ...) also map to
    the pad code: the DP skips them, matching HMMER's treatment of
    degenerate residues as (approximately) score-neutral.
    """
    seqs = list(seqs)
    out = np.full((len(seqs), pad_to), 20, dtype=np.int8)
    for i, s in enumerate(seqs):
        codes = [_AA_INDEX.get(c, 20) for c in s[:pad_to]]
        out[i, : len(codes)] = codes
    return out


def _forward_batch(lom, t, tbm, seqs, lengths):
    """Forward bit scores for a batch of encoded sequences vs one profile.

    Pure JAX; jitted by the caller.  seqs: (B, Lpad) int; lengths: (B,).
    """
    import jax
    import jax.numpy as jnp

    m = lom.shape[0]
    neg = jnp.float32(-1e30)
    lom_pad = jnp.concatenate([lom, jnp.zeros((m, 1), lom.dtype)], axis=1)
    tmm, tmi, tmd = t[1:-1, 0], t[1:, 1], t[1:-1, 2]
    tim, tii = t[1:, 3], t[1:, 4]
    tdm, tdd = t[1:-1, 5], t[1:-1, 6]
    # length model, multihit: nj=1 expected J usages
    L = lengths.astype(jnp.float32)
    loop = jnp.log(L / (L + 3.0))
    move = jnp.log(3.0 / (L + 3.0))
    tej = tec = jnp.log(0.5)
    null1 = L * jnp.log(L / (L + 1.0)) - jnp.log(L + 1.0)

    def one(seq, loop, move, null1):
        def step(carry, x):
            mrow, irow, drow, n, b, j, c = carry
            emit = lom_pad[:, x]
            prev_m = jnp.concatenate([jnp.array([neg]), mrow[:-1] + tmm])
            prev_i = jnp.concatenate([jnp.array([neg]), irow[:-1] + tim[:-1]])
            prev_d = jnp.concatenate([jnp.array([neg]), drow[:-1] + tdm])
            m_new = emit + jnp.logaddexp(
                jnp.logaddexp(prev_m, prev_i), jnp.logaddexp(prev_d, b + tbm)
            )
            i_new = jnp.logaddexp(mrow + tmi, irow + tii)
            # in-row delete chain: prefix logsumexp of M contributions
            a = jnp.concatenate([jnp.array([neg]), m_new[:-1] + tmd])
            s = jnp.concatenate([jnp.zeros(1), jnp.cumsum(tdd)])
            d_new = (
                jax.lax.associative_scan(jnp.logaddexp, a - s) + s
            )
            e = jax.scipy.special.logsumexp(m_new)
            n_new = n + loop
            j_new = jnp.logaddexp(j + loop, e + tej)
            c_new = jnp.logaddexp(c + loop, e + tec)
            b_new = jnp.logaddexp(n_new + move, j_new + move)
            is_pad = x >= 20
            keep = lambda new, old: jnp.where(is_pad, old, new)
            return (
                keep(m_new, mrow), keep(i_new, irow), keep(d_new, drow),
                keep(n_new, n), keep(b_new, b), keep(j_new, j), keep(c_new, c),
            ), None

        init = (
            jnp.full(m, neg), jnp.full(m, neg), jnp.full(m, neg),
            jnp.float32(0.0), move, neg, neg,
        )
        (mrow, irow, drow, n, b, j, c), _ = jax.lax.scan(
            step, init, seq.astype(jnp.int32)
        )
        return (c + move - null1) / jnp.log(2.0)

    return jax.vmap(one)(seqs, loop, move, null1)


_FORWARD_JIT = None


class EncodedProteins:
    """Length-sorted, padded, device-resident protein batches.

    Scoring the same gene set against many profiles (the marker pipeline
    scores ~100 single-copy profiles) re-pays the per-residue encode, the
    length sort and the host->device upload on every call if the batches
    are rebuilt per profile — prepare once and pass this to
    :func:`forward_scores` instead.
    """

    def __init__(self, proteins: Sequence[str], batch: int = 512):
        import jax.numpy as jnp

        self.n = len(proteins)
        self.batches: list[tuple[np.ndarray, object, object]] = []
        order = np.argsort([len(s) for s in proteins])
        for lo in range(0, self.n, batch):
            idx = order[lo : lo + batch]
            chunk = [proteins[i] for i in idx]
            pad = max(
                16, 1 << int(np.ceil(np.log2(max(len(s) for s in chunk) + 1)))
            )
            seqs = jnp.asarray(encode_proteins(chunk, pad))
            lengths = jnp.asarray(
                [min(len(s), pad) for s in chunk], dtype=jnp.float32
            )
            self.batches.append((idx, seqs, lengths))


def forward_scores(
    profile: LocalProfile,
    proteins: Union[Sequence[str], EncodedProteins],
    batch: int = 512,
) -> np.ndarray:
    "HMMER bit scores of every protein against one local profile."
    global _FORWARD_JIT
    import jax.numpy as jnp
    from jax import jit

    if not isinstance(proteins, EncodedProteins):
        proteins = EncodedProteins(proteins, batch=batch)
    if proteins.n == 0:
        return np.empty(0, dtype=np.float32)
    if _FORWARD_JIT is None:
        _FORWARD_JIT = jit(_forward_batch)
    fn = _FORWARD_JIT
    lom = jnp.asarray(profile.lom, dtype=jnp.float32)
    t = jnp.asarray(np.maximum(profile.t, -1e30), dtype=jnp.float32)
    tbm = jnp.asarray(np.maximum(profile.tbm, -1e30), dtype=jnp.float32)
    out = np.empty(proteins.n, dtype=np.float32)
    for idx, seqs, lengths in proteins.batches:
        out[idx] = np.asarray(fn(lom, t, tbm, seqs, lengths))
    return out

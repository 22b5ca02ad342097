"""Functional pyhmmer shim backed by this repo's JAX profile-HMM scorer.

Covers exactly the surface the reference's marker prediction touches
(vamb/parsemarkers.py:231-264):

* ``plan7.HMMFile(fileobj)`` — iterable of HMM handles (``.name`` bytes,
  ``.cutoffs.trusted1``), parsed by `vamb_tpu.ops.hmm.read_hmms`;
* ``easel.Alphabet.amino()`` / ``TextSequence(...).digitize(a)`` — carry
  (name, sequence) through unchanged;
* ``hmmsearch(hmms, seqs)`` — per profile, the multihit-local Forward
  bit score of every sequence (`ops.hmm.forward_scores`, DP-verified in
  tests/test_hmm.py), yielding one TopHits per HMM. Hits below the
  profile's trusted cutoff (or below 0 bits when a profile carries no
  cutoff) are omitted — the reference re-filters by ``score >=
  cutoffs.trusted1`` anyway, so the emitted set is decision-equivalent.

With this and the pyrodigal shim, the reference's `recluster` subcommand
runs end-to-end here; head-to-heads share this repo's marker stack on both
sides (same caveat as the pycoverm shim).
"""

import io
import sys

sys.path.insert(0, "/root/repo")


class _Cutoffs:
    __slots__ = ["trusted1"]

    def __init__(self, trusted1):
        self.trusted1 = trusted1


class _HMM:
    __slots__ = ["_profile", "name", "cutoffs"]

    def __init__(self, profile):
        self._profile = profile
        self.name = profile.name.encode()
        self.cutoffs = _Cutoffs(profile.trusted_cutoff)


class plan7:
    HMM = _HMM

    class HMMFile:
        def __init__(self, source):
            from vamb_tpu.ops.hmm import read_hmms

            if isinstance(source, (str,)) or hasattr(source, "__fspath__"):
                profiles = read_hmms(source)
            else:
                data = source.read()
                if isinstance(data, bytes):
                    data = data.decode()
                profiles = read_hmms(io.StringIO(data))
            self._hmms = [_HMM(p) for p in profiles]

        def __iter__(self):
            return iter(self._hmms)


class _AminoAlphabet:
    pass


class _DigitalSequence:
    __slots__ = ["name", "sequence"]

    def __init__(self, name: bytes, sequence: str):
        self.name = name
        self.sequence = sequence


class easel:
    Alphabet = type("Alphabet", (), {"amino": staticmethod(_AminoAlphabet)})
    DigitalSequence = _DigitalSequence

    class TextSequence:
        def __init__(self, name: bytes = b"", sequence: str = ""):
            self.name = name
            self.sequence = sequence

        def digitize(self, _alphabet) -> _DigitalSequence:
            return _DigitalSequence(self.name, self.sequence)


class _Hit:
    __slots__ = ["name", "score"]

    def __init__(self, name: bytes, score: float):
        self.name = name
        self.score = score


def hmmsearch(hmms, sequences, **_kw):
    from vamb_tpu.ops import hmm as hmm_mod

    seqs = list(sequences)
    # large batches: the tunneled TPU costs ~10ms per dispatch, so scoring
    # tens of thousands of genes at the default 512-batch is latency-bound
    encoded = hmm_mod.EncodedProteins([s.sequence for s in seqs], batch=8192)
    for h in hmms:
        local = hmm_mod.configure_local(h._profile)
        scores = hmm_mod.forward_scores(local, encoded)
        floor = h.cutoffs.trusted1 if h.cutoffs.trusted1 is not None else 0.0
        yield [
            _Hit(seqs[i].name, float(scores[i]))
            for i in range(len(seqs))
            if scores[i] >= floor
        ]

"""Functional pyrodigal shim backed by this repo's native ORF caller.

The reference constructs `GeneFinder(meta=True)` and calls
`find_genes(sequence_bytes)`, then `gene.translate()` on each result
(vamb/parsemarkers.py:231-264). Here the prodigal role is filled by
`vamb_tpu.ops.orf.find_genes` — six-frame maximal-ORF enumeration with
table-11 translation (documented over-prediction; the reference's
trusted-cutoff filter downstream prunes it, measured precision 1.000 in
tests/test_marker_fidelity.py). This makes the reference's `recluster`
subcommand runnable for head-to-heads, with the caveat (as for the
pycoverm shim) that both sides then share this repo's gene caller.
"""

import sys

sys.path.insert(0, "/root/repo")


class _Gene:
    __slots__ = ["_protein"]

    def __init__(self, protein: str):
        self._protein = protein

    def translate(self) -> str:
        return self._protein


class GeneFinder:
    def __init__(self, meta: bool = False, **_kw):
        self.meta = meta

    def find_genes(self, sequence):
        from vamb_tpu.ops.orf import find_genes as _find

        if isinstance(sequence, str):
            sequence = sequence.encode()
        return [_Gene(p) for p in _find(bytes(sequence))]

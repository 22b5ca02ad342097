"""Import-only pyhmmer stub.

The reference imports pyhmmer at module scope (vamb/parsemarkers.py:11) and
evaluates `pyhmmer.plan7.HMM` / easel types in function signatures, but the
`bin default` TSV path never calls them. Marker prediction under the shim
raises; this repo's own marker backends (vamb_tpu/markers.py) cover that
functionality natively.
"""


class _Unavailable(RuntimeError):
    pass


class plan7:
    class HMM:
        pass

    class HMMFile:
        def __init__(self, *a, **k):
            raise _Unavailable("pyhmmer shim: HMM search not available")


class easel:
    class Alphabet:
        @staticmethod
        def amino():
            raise _Unavailable("pyhmmer shim: easel not available")

    class TextSequence:
        def __init__(self, *a, **k):
            raise _Unavailable("pyhmmer shim: easel not available")

    class DigitalSequence:
        pass


def hmmsearch(*a, **k):
    raise _Unavailable("pyhmmer shim: hmmsearch not available")

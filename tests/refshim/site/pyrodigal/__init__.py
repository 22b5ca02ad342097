"""Import-only pyrodigal stub (see pyhmmer shim docstring; the reference
imports it at vamb/parsemarkers.py:10 but the `bin default` TSV path never
calls it)."""


class GeneFinder:
    def __init__(self, *a, **k):
        raise RuntimeError("pyrodigal shim: gene finding not available")

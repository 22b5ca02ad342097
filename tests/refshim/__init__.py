"""Dependency shims that make the actual reference (/root/reference/vamb)
importable and runnable in this environment, for head-to-head comparisons.

The reference needs six packages absent here: loguru, dadaptation, vambcore,
pycoverm, pyhmmer, pyrodigal (plus `importlib.metadata.version("vamb")`).
All are shimmed under `tests/refshim/site/`:

* loguru        — minimal logger (add/remove/info/warning/error/opt/catch).
* dadaptation   — torch DAdaptAdam implementing the decoupled D-Adaptation
                  rule; transcribed from this repo's validated numpy oracle
                  (tests/test_optim.py::NumpyDAdaptAdamOracle), which is
                  lockstep-verified against vamb_tpu/optim/dadapt.py.
* vambcore      — kmercounts backed by this repo's cross-validated counter
                  (vamb_tpu/utils/kmers.py); overwrite_matrix in numpy.
* pycoverm      — get_coverages_from_bam backed by this repo's native BAM
                  coverage reader (vamb_tpu/bam.py + native/bamcov.cpp).
* pyhmmer/pyrodigal — import-only stubs (the TSV `bin default` path never
                  calls them; attributes used in type annotations exist).

`install()` prepends the shim site dir and /root/reference to sys.path.
The shims are NOT on sys.path for the normal test suite — only tests that
explicitly call install() (in a subprocess, to avoid polluting the parent
interpreter's module table) see them.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
SITE = os.path.join(_HERE, "site")
REFERENCE = "/root/reference"


def install() -> None:
    "Make `import vamb` resolve to the reference with shimmed deps."
    repo_root = os.path.dirname(os.path.dirname(_HERE))
    for p in (REFERENCE, SITE, repo_root):
        if p not in sys.path:
            sys.path.insert(0, p)


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "vamb"))

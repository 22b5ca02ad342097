"""Run the actual reference CLI (/root/reference/vamb) under the dep shims.

Usage: python tests/refshim/run_reference.py <vamb CLI args...>
e.g.:  python tests/refshim/run_reference.py bin default --outdir out \
           --fasta contigs.fna --abundance_tsv abundance.tsv

Runs in-process (invoke as a subprocess from tests/bench to keep the parent
interpreter's module table clean).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tests import refshim


def main() -> None:
    refshim.install()
    sys.argv = ["vamb"] + sys.argv[1:]
    from vamb.__main__ import main as ref_main

    ref_main()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Create the input FASTA file for vamb_tpu from per-sample assemblies.

Input: one or more FASTA files, each from a sample-specific assembly.
Unless --keepnames is given, sequences are renamed 'S{n}C{original}', which
is what makes default binsplitting on 'C' work.
(Equivalent of the reference's src/concatenate.py.)
"""

import argparse
import gzip
import os

from vamb_tpu.utils import concatenate_fasta


def main() -> None:
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("outpath", help="Path to output FASTA file")
    parser.add_argument("inpaths", help="Paths to input FASTA file(s)", nargs="+")
    parser.add_argument(
        "-m", dest="minlength", metavar="", type=int, default=2000,
        help="Discard sequences below this length [2000]",
    )
    parser.add_argument(
        "--keepnames", action="store_true", help="Do not rename sequences [False]"
    )
    parser.add_argument(
        "--nozip", action="store_true", help="Do not gzip output [False]"
    )
    args = parser.parse_args()

    for path in args.inpaths:
        if not os.path.isfile(path):
            raise FileNotFoundError(path)
    if os.path.exists(args.outpath):
        raise FileExistsError(args.outpath)
    parent = os.path.dirname(os.path.normpath(args.outpath))
    if parent != "" and not os.path.isdir(parent):
        raise NotADirectoryError(
            f'Output file cannot be created: Parent directory "{parent}" is not '
            "an existing directory"
        )

    filehandle = (
        open(args.outpath, "w")
        if args.nozip
        else gzip.open(args.outpath, "wt", compresslevel=1)
    )
    with filehandle:
        concatenate_fasta(
            filehandle,
            args.inpaths,
            minlength=args.minlength,
            rename=(not args.keepnames),
        )


if __name__ == "__main__":
    main()

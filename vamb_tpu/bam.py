"""Python bindings for the native BAM coverage reader (native/bamcov.cpp).

Role parity: the reference's pycoverm usage (reference vamb/parsebam.py:
195-237): multi-threaded BAM -> per-contig trimmed-mean depth matrix with a
min-identity read filter. Files are processed in a thread pool (ctypes
releases the GIL during the native call), mirroring pycoverm's <=16-way
file parallelism.
"""

import ctypes
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Sequence

import numpy as np

_LIB = None
CONTIG_END_EXCLUSION = 75  # CoverM default, used by pycoverm


def _load_native():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "native", "libbamcov.so"
    )
    if not os.path.exists(path):
        from vamb_tpu.native.autobuild import ensure_built

        ensure_built()
    if not os.path.exists(path):
        raise ImportError(
            f"Native BAM coverage library not found at {path}. "
            "Build it with vamb_tpu/native/build.sh, or provide abundances "
            "via --abundance_tsv instead."
        )
    lib = ctypes.CDLL(path)
    lib.bamcov_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_size_t]
    lib.bamcov_open.restype = ctypes.c_void_p
    lib.bamcov_n_refs.argtypes = [ctypes.c_void_p]
    lib.bamcov_n_refs.restype = ctypes.c_uint64
    lib.bamcov_ref_name.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.bamcov_ref_name.restype = ctypes.c_char_p
    lib.bamcov_ref_len.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.bamcov_ref_len.restype = ctypes.c_uint32
    lib.bamcov_coverage.argtypes = [
        ctypes.c_void_p,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_char_p,
        ctypes.c_size_t,
    ]
    lib.bamcov_coverage.restype = ctypes.c_int
    lib.bamcov_close.argtypes = [ctypes.c_void_p]
    lib.bamcov_close.restype = None
    _LIB = lib
    return lib


def _coverage_one(
    path: str, minid: float, trim_lower: float, trim_upper: float
) -> tuple[list[str], np.ndarray]:
    lib = _load_native()
    errbuf = ctypes.create_string_buffer(512)
    handle = lib.bamcov_open(path.encode(), errbuf, len(errbuf))
    if not handle:
        raise ValueError(f"Error opening BAM file {path}: {errbuf.value.decode()}")
    try:
        n = lib.bamcov_n_refs(handle)
        names = [lib.bamcov_ref_name(handle, i).decode() for i in range(n)]
        out = np.zeros(n, dtype=np.float32)
        rc = lib.bamcov_coverage(
            handle,
            minid,
            trim_lower,
            trim_upper,
            CONTIG_END_EXCLUSION,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            errbuf,
            len(errbuf),
        )
        if rc != 0:
            raise ValueError(
                f"Error reading BAM file {path}: {errbuf.value.decode()}"
            )
        return names, out
    finally:
        lib.bamcov_close(handle)


def bam_ref_names(path: str) -> list[str]:
    "Reference names from a BAM header."
    lib = _load_native()
    errbuf = ctypes.create_string_buffer(512)
    handle = lib.bamcov_open(path.encode(), errbuf, len(errbuf))
    if not handle:
        raise ValueError(f"Error opening BAM file {path}: {errbuf.value.decode()}")
    try:
        n = lib.bamcov_n_refs(handle)
        return [lib.bamcov_ref_name(handle, i).decode() for i in range(n)]
    finally:
        lib.bamcov_close(handle)


def coverage_from_bams(
    paths: Sequence[str],
    minid: float = 0.0,
    nthreads: int = 1,
    trim_lower: float = 0.1,
    trim_upper: float = 0.1,
) -> tuple[list[str], np.ndarray]:
    """Compute the (n_refs, n_files) trimmed-mean coverage matrix.

    All BAMs must share an identical reference header (same names, same
    order), as they do when mapped against one catalogue.
    """
    if len(paths) == 0:
        raise ValueError("No BAM files given")
    with ThreadPoolExecutor(max_workers=max(1, min(nthreads, 16))) as pool:
        results = list(
            pool.map(
                lambda p: _coverage_one(p, minid, trim_lower, trim_upper), paths
            )
        )
    headers = results[0][0]
    for path, (names, _) in zip(paths, results):
        if names != headers:
            raise ValueError(
                f"BAM file {path} has different reference sequences than "
                f"{paths[0]}; all BAMs must be mapped to the same contig "
                "catalogue"
            )
    matrix = np.stack([cov for (_, cov) in results], axis=1)
    return headers, matrix

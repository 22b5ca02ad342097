"""vambcore shim backed by this repo's cross-validated implementations.

The reference uses exactly two symbols (vamb/vambtools.py:8):
* `kmercounts(counts, sequence)` — add 4-mer counts of a DNA byte string
  into a 256-slot uint32 buffer in place (FastaEntry.kmercounts,
  vambtools.py:444-447). Backed by vamb_tpu/utils/kmers.py, whose semantics
  are pinned against a pure-python counter in tests/test_utils.py.
* `overwrite_matrix(matrix, mask)` — compact masked rows to the front of a
  2-D array in place, returning the surviving row count
  (numpy_inplace_maskarray, vambtools.py:291-304).
"""

import numpy as np

from vamb_tpu.utils.kmers import kmercounts as _kmercounts


def kmercounts(counts: np.ndarray, sequence: bytes) -> None:
    counts += _kmercounts(bytes(sequence))


def overwrite_matrix(matrix: np.ndarray, mask: np.ndarray) -> int:
    if matrix.ndim != 2 or len(mask) != len(matrix):
        raise ValueError("matrix must be 2-D with len(mask) == len(matrix)")
    kept = int(np.count_nonzero(mask))
    matrix[:kept] = matrix[np.asarray(mask, bool)]
    return kept

"""Array helpers: growable buffers, normalization, reproducibility masking.

Behavioral parity: reference vamb/vambtools.py:191-330 (PushArray, zscore,
mask_lower_bits, validate_input_array). Implementations are original; the
contracts (growth policy, zero-std guard, 12-bit mantissa truncation) match
so that serialized artifacts hash identically across platforms.
"""

from typing import Optional

import numpy as np


class PushArray:
    """Growable 1-D numpy buffer with amortized-O(1) append/extend.

    Grows by a power of two that is at least 1/8 of current capacity, so it
    neither reallocates too often nor over-allocates (reference
    vambtools.py:218-223 uses the same policy; `take()` shrinks to fit).
    """

    __slots__ = ["data", "capacity", "length"]

    def __init__(self, dtype, start_capacity: int = 1 << 16):
        self.capacity: int = start_capacity
        self.data: np.ndarray = np.empty(self.capacity, dtype=dtype)
        self.length = 0

    def __len__(self) -> int:
        return self.length

    def _setcapacity(self, n: int) -> None:
        self.data.resize(n, refcheck=False)
        self.capacity = n

    def _grow(self, mingrowth: int) -> None:
        growth = max(int(self.capacity * 0.125), mingrowth)
        nextpow2 = 1 << (growth - 1).bit_length()
        self._setcapacity(self.capacity + nextpow2)

    def append(self, value) -> None:
        if self.length == self.capacity:
            self._grow(64)
        self.data[self.length] = value
        self.length += 1

    def extend(self, values) -> None:
        lenv = len(values)
        if self.length + lenv > self.capacity:
            self._grow(lenv)
        self.data[self.length : self.length + lenv] = values
        self.length += lenv

    def take(self) -> np.ndarray:
        "Shrink to fit and return the underlying array."
        self._setcapacity(self.length)
        return self.data

    def clear(self) -> None:
        "Reset length to zero without freeing memory."
        self.length = 0


def zscore(
    array: np.ndarray, axis: Optional[int] = None, inplace: bool = False
) -> np.ndarray:
    """Z-score normalize `array`, optionally along `axis`, optionally in place.

    Zero-std slices are left centered but not scaled (std treated as 1), as in
    reference vambtools.py:250-288.
    """
    if axis is not None and (axis >= array.ndim or axis < 0):
        raise np.exceptions.AxisError(str(axis))

    if inplace and not np.issubdtype(array.dtype, np.floating):
        raise TypeError("Cannot convert a non-float array to zscores")

    mean = array.mean(axis=axis)
    std = array.std(axis=axis)

    if axis is None:
        if std == 0:
            std = 1
    else:
        std[std == 0.0] = 1
        shape = tuple(dim if ax != axis else 1 for ax, dim in enumerate(array.shape))
        mean.shape, std.shape = shape, shape

    if inplace:
        array -= mean
        array /= std
        return array
    else:
        return (array - mean) / std


def mask_lower_bits(floats: np.ndarray, bits: int) -> None:
    """Zero the lowest `bits` mantissa bits of a float32 array, in place.

    Used at every serialization boundary (TNF, abundance, latent) so outputs
    are bit-stable across platforms and backends (reference
    vambtools.py:324-330; see also test_results.py's hash-based tests).
    """
    if bits < 0 or bits > 23:
        raise ValueError("Must mask between 0 and 23 bits")
    if floats.dtype != np.float32:
        raise ValueError("Can only mask bits of a float32 array")
    mask = ~np.uint32(2**bits - 1)
    u = floats.view(np.uint32)
    u &= mask


def validate_input_array(array: np.ndarray) -> np.ndarray:
    "Return an array equal to input but C-contiguous and owning its data."
    if not array.flags["C_CONTIGUOUS"]:
        array = np.ascontiguousarray(array)
    if not array.flags["OWNDATA"]:
        array = array.copy()
    assert array.flags["C_CONTIGUOUS"] and array.flags["OWNDATA"]
    return array


def numpy_inplace_maskarray(array: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Compact rows of `array` where `mask` is True, in place; return view.

    The reference offloads this to a native `overwrite_matrix`
    (vambtools.py:291-304); under XLA row-compaction is irrelevant (we mask
    instead), so a vectorized numpy implementation suffices host-side.
    """
    if len(mask) != len(array):
        raise ValueError("Lengths of array and mask must match")
    if array.ndim != 2:
        raise ValueError("Can only take a 2 dimensional-array.")
    kept = int(mask.sum())
    array[:kept] = array[mask]
    array.resize((kept, array.shape[1]), refcheck=False)
    return array

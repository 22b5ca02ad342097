"""Native C++ ops: parity with the pure-numpy fallback."""

import random

import numpy as np
import pytest

from vamb_tpu.utils.kmers import (
    _kmercounts_numpy,
    _load_native,
    kmercounts,
    kmercounts_batch,
)

pytestmark = pytest.mark.skipif(
    not _load_native(), reason="native libvambops.so not built"
)


def test_native_matches_numpy_random():
    rng = random.Random(3)
    for _ in range(30):
        seq = "".join(
            rng.choices("ACGTNacgtnRYSWKMBDHVU \t", k=rng.randint(0, 3000))
        ).encode()
        seq = seq.replace(b" ", b"A").replace(b"\t", b"C")  # bytes only
        np.testing.assert_array_equal(kmercounts(seq), _kmercounts_numpy(seq))


def test_batch_matches_single():
    rng = random.Random(7)
    seqs = [
        "".join(rng.choices("ACGTNacgtn", k=rng.randint(0, 500))).encode()
        for _ in range(40)
    ]
    batch = kmercounts_batch(seqs)
    assert batch.shape == (40, 256)
    for i, s in enumerate(seqs):
        np.testing.assert_array_equal(batch[i], kmercounts(s))
    assert kmercounts_batch([]).shape == (0, 256)


def test_known_counts():
    counts = kmercounts(b"AAAA")
    assert counts[0] == 1 and counts.sum() == 1
    counts = kmercounts(b"AAAAA")
    assert counts[0] == 2 and counts.sum() == 2
    # N resets the window
    counts = kmercounts(b"AAAANAAAA")
    assert counts[0] == 2 and counts.sum() == 2
    # TTTT is index 255
    assert kmercounts(b"TTTT")[255] == 1
    # ACGT = 0*64+1*16+2*4+3 = 27
    assert kmercounts(b"ACGT")[27] == 1


def test_empty_and_short():
    assert kmercounts(b"").sum() == 0
    assert kmercounts(b"ACG").sum() == 0

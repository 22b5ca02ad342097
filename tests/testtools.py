"""Shared test helpers: tiny random sequence / FASTA generators."""

import io
import random
import string

import numpy as np

from vamb_tpu.utils import FastaEntry

# Bundled test data of the reference repo (read-only), used for end-to-end
# parity tests on real (tiny) inputs.
REFERENCE_DATA_DIR = "/root/reference/test/data"


def make_randseq(rng: random.Random, minlen: int, maxlen: int) -> FastaEntry:
    "Random FastaEntry with IUPAC-ish bases, mostly ACGT."
    length = rng.randrange(minlen, maxlen)
    seq = "".join(
        rng.choices(
            "acgtACGT" + "nswkmyrbdhvNSWKMYRBDHV" * 0 + "nN",
            weights=[20] * 8 + [1] * 2,
            k=length,
        )
    )
    name = "".join(rng.choices(string.ascii_letters, k=10))
    return FastaEntry(name.encode(), bytearray(seq.encode()))


def make_fasta_bytes(
    rng: random.Random, n: int, minlen: int, maxlen: int, prefix: str = "S1C"
) -> tuple[bytes, list[str], list[int]]:
    "Generate a small FASTA file as bytes; returns (data, names, lengths)."
    out = io.BytesIO()
    names = []
    lengths = []
    for i in range(n):
        length = rng.randrange(minlen, maxlen)
        seq = "".join(rng.choices("ACGT", k=length))
        name = f"{prefix}{i}"
        out.write(f">{name}\n{seq}\n".encode())
        names.append(name)
        lengths.append(length)
    return out.getvalue(), names, lengths


def random_depths_tnf(
    rng: np.random.Generator, n: int, nsamples: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    "Random float32 (depths, tnf, lengths) suitable for the dataloader."
    depths = rng.random((n, nsamples), dtype=np.float32)
    tnf = rng.standard_normal((n, 103), dtype=np.float32)
    lengths = rng.integers(2000, 10000, size=n).astype(np.int64)
    return depths, tnf, lengths

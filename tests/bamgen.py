"""Minimal BAM writer for testing the native coverage reader.

Writes a single gzip member (a valid BGZF-style stream for any multi-member
gzip reader). Only the fields the coverage reader uses are meaningful.
"""

import gzip
import struct


def cigar_op(length: int, op: str) -> int:
    return (length << 4) | "MIDNSHP=X".index(op)


def alignment(
    ref_id: int,
    pos: int,
    cigar: list[int],
    flag: int = 0,
    nm: int | None = None,
    read_name: bytes = b"r",
    seq_len: int = 0,
) -> bytes:
    name = read_name + b"\0"
    body = struct.pack(
        "<iiBBHHHiiii",
        ref_id,
        pos,
        len(name),
        60,  # mapq
        0,  # bin
        len(cigar),
        flag,
        seq_len,
        -1,  # next_refID
        -1,  # next_pos
        0,  # tlen
    )
    body += name
    for c in cigar:
        body += struct.pack("<I", c)
    body += b"\0" * ((seq_len + 1) // 2)  # seq
    body += b"\xff" * seq_len  # qual
    if nm is not None:
        body += b"NM" + b"i" + struct.pack("<i", nm)
    return struct.pack("<I", len(body)) + body


def write_bam(path, refs: list[tuple[str, int]], alignments: list[bytes]) -> None:
    "refs: list of (name, length)."
    parts = [b"BAM\1"]
    text = b"@HD\tVN:1.6\n"
    parts.append(struct.pack("<i", len(text)) + text)
    parts.append(struct.pack("<i", len(refs)))
    for name, length in refs:
        bname = name.encode() + b"\0"
        parts.append(struct.pack("<i", len(bname)) + bname + struct.pack("<i", length))
    # join once: += on a large bytes payload is quadratic and dominated
    # wall time for the h2h-scale BAMs (tens of thousands of alignments)
    parts.extend(alignments)
    with open(path, "wb") as f:
        f.write(gzip.compress(b"".join(parts)))

"""Independent pure-Python BAM coverage oracle for value-level validation
of the native reader (vamb_tpu/native/bamcov.cpp).

Everything here is implemented from the BAM specification and CoverM's
documented "trimmed_mean" semantics (the reference consumes it through
pycoverm at vamb/parsebam.py:195-237), sharing no code or structure with
the C++ reader:

* BGZF decompression via the stdlib gzip module (multi-member streams),
* record parsing with struct,
* per-cigar-op pileup: M/=/X/D add coverage, N advances without covering,
  S/H/I/P do not touch the reference,
* read filter: skip unmapped/secondary/QC-fail/duplicate/supplementary;
  min-identity 1 - NM/aligned_len with aligned_len over M/I/D/=/X,
* trimmed mean per CoverM: exclude `end_exclusion` bases at both contig
  ends, order the remaining per-position depths, average the index range
  [floor(trim_lower*n), ceil((1-trim_upper)*n)) — note
  ceil((1-t)*n) == n - floor(t*n) for all real t, n, which is the
  arithmetic the native reader uses.
"""

import gzip
import struct
from math import floor

import numpy as np

FLAG_SKIP = 0x4 | 0x100 | 0x200 | 0x400 | 0x800


def parse_bam(path):
    "Return (names, lengths, records); records = (ref_id, pos, cigar, flag, nm, aligned_len)."
    with gzip.open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"BAM\x01":
        raise ValueError(f"{path}: not a BAM file")
    off = 4
    (l_text,) = struct.unpack_from("<i", data, off)
    off += 4 + l_text
    (n_ref,) = struct.unpack_from("<i", data, off)
    off += 4
    names, lengths = [], []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", data, off)
        off += 4
        names.append(data[off : off + l_name - 1].decode())
        off += l_name
        (l_ref,) = struct.unpack_from("<i", data, off)
        off += 4
        lengths.append(l_ref)

    records = []
    while off < len(data):
        (block_size,) = struct.unpack_from("<i", data, off)
        off += 4
        rec = data[off : off + block_size]
        off += block_size
        ref_id, pos = struct.unpack_from("<ii", rec, 0)
        l_read_name = rec[8]
        n_cigar_op = struct.unpack_from("<H", rec, 12)[0]
        flag = struct.unpack_from("<H", rec, 14)[0]
        (l_seq,) = struct.unpack_from("<i", rec, 16)
        cigar_off = 32 + l_read_name
        cigar = [
            struct.unpack_from("<I", rec, cigar_off + 4 * c)[0]
            for c in range(n_cigar_op)
        ]
        aligned_len = sum(
            oplen
            for oplen, op in ((c >> 4, c & 0xF) for c in cigar)
            if op in (0, 1, 2, 7, 8)  # M I D = X
        )
        aux_off = cigar_off + 4 * n_cigar_op + (l_seq + 1) // 2 + l_seq
        nm = _find_nm(rec, aux_off)
        records.append((ref_id, pos, cigar, flag, nm, aligned_len))
    return names, lengths, records


def _find_nm(rec, off):
    "Walk the aux fields for the integer NM tag; None if absent."
    sizes = {
        ord("c"): 1, ord("C"): 1, ord("s"): 2, ord("S"): 2,
        ord("i"): 4, ord("I"): 4, ord("f"): 4, ord("A"): 1,
    }
    fmt = {
        ord("c"): "<b", ord("C"): "<B", ord("s"): "<h", ord("S"): "<H",
        ord("i"): "<i", ord("I"): "<I",
    }
    n = len(rec)
    while off + 3 <= n:
        tag = rec[off : off + 2]
        typ = rec[off + 2]
        off += 3
        if typ in sizes:
            if tag == b"NM" and typ in fmt:
                return struct.unpack_from(fmt[typ], rec, off)[0]
            off += sizes[typ]
        elif typ in (ord("Z"), ord("H")):
            end = rec.index(b"\x00", off)
            off = end + 1
        elif typ == ord("B"):
            sub = rec[off]
            (count,) = struct.unpack_from("<i", rec, off + 1)
            off += 5 + sizes[sub] * count
        else:
            break  # unknown type: stop scanning this record
    return None


def pileup(names, lengths, records, min_identity=0.0):
    "Per-position depth arrays, one per reference, after read filtering."
    depths = [np.zeros(length, np.int64) for length in lengths]
    for ref_id, pos, cigar, flag, nm, aligned_len in records:
        if flag & FLAG_SKIP or ref_id < 0 or not cigar:
            continue
        if (
            min_identity > 0.0
            and nm is not None
            and aligned_len > 0
            and 1.0 - nm / aligned_len < min_identity
        ):
            continue
        at = pos
        d = depths[ref_id]
        for c in cigar:
            oplen, op = c >> 4, c & 0xF
            if op in (0, 2, 7, 8):  # M D = X cover the reference
                d[at : at + oplen] += 1
                at += oplen
            elif op == 3:  # N advances without covering
                at += oplen
            # I S H P: no reference advance
    return depths


def trimmed_mean(depth, trim_lower=0.1, trim_upper=0.1, end_exclusion=75):
    "CoverM trimmed_mean over the end-exclusion-clipped position depths."
    if len(depth) <= 2 * end_exclusion:
        return 0.0
    inner = np.sort(depth[end_exclusion : len(depth) - end_exclusion])
    n = len(inner)
    lo = floor(trim_lower * n)
    hi = n - floor(trim_upper * n)
    if lo >= hi:
        return 0.0
    return float(inner[lo:hi].mean())


def coverage_oracle(path, min_identity=0.0):
    "Full oracle: (names, trimmed-mean coverage vector) for one BAM."
    names, lengths, records = parse_bam(path)
    depths = pileup(names, lengths, records, min_identity)
    return names, np.array([trimmed_mean(d) for d in depths], np.float32)

"""Deterministic synthetic end-to-end test data.

Builds a small FASTA whose identifiers match the reference repo's bundled
aemb abundance TSVs (25 contigs, names like 'S27C95602'), so the real aemb
files can be merged into a multi-sample abundance against it. Sequences are
random ACGT with fixed seed; lengths ramp from 2000 so all pass minlength.
"""

import functools
import io
import random
from pathlib import Path

AEMB_DIR = Path("/root/reference/test/data/aemb")


@functools.lru_cache(maxsize=1)
def aemb_names() -> tuple[str, ...]:
    names = []
    path = sorted(AEMB_DIR.glob("*.tsv"))[0]
    for line in path.read_text().splitlines():
        names.append(line.split("\t")[0])
    return tuple(names)


@functools.lru_cache(maxsize=1)
def synthetic_fasta_bytes() -> bytes:
    rng = random.Random(42)
    out = io.StringIO()
    for i, name in enumerate(aemb_names()):
        length = 2000 + 173 * i
        seq = "".join(rng.choices("ACGT", k=length))
        out.write(f">{name}\n{seq}\n")
    return out.getvalue().encode()


def merged_abundance_tsv() -> str:
    "Merge the reference aemb single-sample TSVs into the multi-sample format."
    samples = sorted(AEMB_DIR.glob("*.tsv"))
    per_sample = []
    for s in samples:
        d = {}
        for line in s.read_text().splitlines():
            name, val = line.split("\t")
            d[name] = val
        per_sample.append(d)
    lines = ["contigname\t" + "\t".join(s.stem for s in samples)]
    for name in aemb_names():
        lines.append(name + "\t" + "\t".join(ps[name] for ps in per_sample))
    return "\n".join(lines) + "\n"

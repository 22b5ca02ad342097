"""Head-to-head against the ACTUAL reference package (/root/reference/vamb),
run in a subprocess under the tests/refshim dependency shims.

The deterministic stages are compared value-for-value: the reference's own
`Composition.from_file` (TNF extraction) and `Abundance.from_tsv` are run
on the same inputs as this repo's, and the matrices must agree bit-exactly
(both sides mask 12 mantissa bits at the serialization boundary —
reference parsecontigs.py:211, parsebam.py:133). This turns TNF/abundance
parity from a transcription argument into a measurement against the
reference itself. The stochastic stages (training, clustering) are
compared at bin-quality level by tests/refshim/head_to_head.py
(see HEADTOHEAD.md).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests import refshim

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not refshim.reference_available(), reason="reference tree not mounted"
)

_EXTRACT = r"""
import json, sys
import numpy as np
from tests import refshim
refshim.install()
from pathlib import Path
import vamb

fasta, tsv, outdir = sys.argv[1], sys.argv[2], sys.argv[3]
with vamb.vambtools.Reader(fasta) as f:
    comp = vamb.parsecontigs.Composition.from_file(f, Path(fasta), minlength=2000)
np.savez(
    outdir + "/ref_comp.npz",
    tnf=comp.matrix,
    lengths=comp.metadata.lengths,
    mask=comp.metadata.mask,
    identifiers=np.asarray(comp.metadata.identifiers, dtype=object),
)
ab = vamb.parsebam.Abundance.from_tsv(Path(tsv), comp.metadata)
np.savez(outdir + "/ref_ab.npz", matrix=ab.matrix,
         samplenames=np.asarray(ab.samplenames, dtype=object))
print(json.dumps({"refhash": comp.metadata.refhash.hex(),
                  "ab_refhash": ab.refhash.hex()}))
"""


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    sys.path.insert(0, REPO)
    from bench import _write_synthetic_metagenome

    workdir = str(tmp_path_factory.mktemp("refparity"))
    fasta, tsv, _, _ = _write_synthetic_metagenome(
        workdir, 1200, 3, 25, hard=True, seed=11
    )
    return workdir, fasta, tsv


def test_composition_and_abundance_bit_parity(dataset):
    workdir, fasta, tsv = dataset
    proc = subprocess.run(
        [sys.executable, "-c", _EXTRACT, fasta, tsv, workdir],
        cwd=REPO, capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    ref_meta = json.loads(proc.stdout.strip().splitlines()[-1])
    ref_comp = np.load(workdir + "/ref_comp.npz", allow_pickle=True)
    ref_ab = np.load(workdir + "/ref_ab.npz", allow_pickle=True)

    from pathlib import Path

    from vamb_tpu.abundance import Abundance
    from vamb_tpu.composition import Composition
    from vamb_tpu.utils.io import Reader

    with Reader(fasta) as f:
        comp = Composition.from_file(f, Path(fasta), minlength=2000)
    # TNF: bit-exact equality of the full matrix (both sides masked to 12
    # mantissa bits; the projection arithmetic must agree exactly)
    assert comp.matrix.dtype == ref_comp["tnf"].dtype
    np.testing.assert_array_equal(
        comp.matrix.view(np.uint32), ref_comp["tnf"].view(np.uint32)
    )
    np.testing.assert_array_equal(comp.metadata.lengths, ref_comp["lengths"])
    np.testing.assert_array_equal(comp.metadata.mask, ref_comp["mask"])
    assert list(comp.metadata.identifiers) == list(ref_comp["identifiers"])
    assert comp.metadata.refhash.hex() == ref_meta["refhash"]

    ab = Abundance.from_tsv(Path(tsv), comp.metadata)
    np.testing.assert_array_equal(
        ab.matrix.view(np.uint32), ref_ab["matrix"].view(np.uint32)
    )
    assert list(ab.samplenames) == list(ref_ab["samplenames"])
    assert ab.refhash.hex() == ref_meta["ab_refhash"]


def test_reference_cli_runs_under_shims(dataset, tmp_path):
    """The reference's full `bin default` CLI executes end-to-end under the
    shims (reduced epochs) and emits a complete partition of the contigs.
    The quality-level comparison at production settings is HEADTOHEAD.md."""
    workdir, fasta, tsv = dataset
    outdir = str(tmp_path / "refout")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tests/refshim/run_reference.py"),
            "bin", "default", "--outdir", outdir, "--fasta", fasta,
            "--abundance_tsv", tsv, "-e", "8", "-q", "3", "--seed", "1",
        ],
        cwd=REPO, capture_output=True, text=True,
    )
    assert proc.returncode == 0, (proc.stdout + proc.stderr)[-3000:]
    members: list[str] = []
    with open(outdir + "/vae_clusters_unsplit.tsv") as f:
        next(f)
        for line in f:
            members.append(line.rstrip("\n").split("\t")[1])
    # every kept contig appears exactly once
    assert len(members) == len(set(members)) == 1200

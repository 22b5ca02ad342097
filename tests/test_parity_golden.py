"""End-to-end golden-file parity for the flagship `bin default` path.

Three layers of evidence, per the BASELINE acceptance criterion ("identical
cluster-membership TSV with a fixed seed"):

1. `src/merge_aemb.py` output on the *real* reference aemb fixtures
   (/root/reference/test/data/aemb) is byte-identical to the committed
   golden. (The reference's fasta.fna fixture is a 6-sequence parser
   test < 150 bp and its CI e2e data lives in a non-redistributable
   ci_data.zip, so the full-pipeline golden below uses the deterministic
   synthetic dataset from tests/make_golden.py instead.)
2. The full CLI run (FASTA -> TNF -> abundance -> VAE -> clustering ->
   binsplit) reproduces the committed cluster TSVs byte-for-byte.
3. The latents the pipeline produced are re-clustered by the sequential
   reference-semantics oracle (tests/oracle_cluster.py) and the emitted
   membership must equal the engine's TSV exactly.

Regenerate goldens with `python -m tests.make_golden` after an intentional
behavior change.
"""

import filecmp
from pathlib import Path

import numpy as np
import pytest

from . import make_golden
from .oracle_cluster import SequentialOracle

GOLDEN = make_golden.GOLDEN_DIR


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    data = tmp_path_factory.mktemp("golden_data")
    make_golden.write_synthetic_dataset(data)
    out = tmp_path_factory.mktemp("golden_out") / "run"
    make_golden.run_bin_default(out, data)
    return out


class TestMergeAembGolden:
    def test_reference_aemb_merge_matches_golden(self, tmp_path):
        out = tmp_path / "merged.tsv"
        make_golden.merge_reference_aemb(out)
        assert filecmp.cmp(out, GOLDEN / "merged_aemb.tsv", shallow=False), (
            "merge_aemb output drifted from golden"
        )


class TestPipelineGolden:
    @pytest.mark.parametrize(
        "name",
        [
            "vae_clusters_unsplit.tsv",
            "vae_clusters_split.tsv",
            "vae_clusters_metadata.tsv",
        ],
    )
    def test_tsv_matches_golden(self, pipeline_run, name):
        produced = (pipeline_run / name).read_text()
        golden = (GOLDEN / name).read_text()
        assert produced == golden, f"{name} drifted from committed golden"


class TestSemisupervisedGoldens:
    """Taxvamb + Taxometer CLI runs reproduce their committed goldens
    byte-for-byte — locks the semisupervised paths' full RNG streams
    (incl. the round-5 per-epoch dropout byte banks)."""

    @pytest.fixture(scope="class")
    def data(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("golden_semisup_data")
        make_golden.write_synthetic_dataset(d)
        make_golden.write_synthetic_taxonomy(d)
        return d

    def test_taxvamb_matches_golden(self, data, tmp_path_factory):
        out = tmp_path_factory.mktemp("golden_taxvamb") / "run"
        make_golden.run_bin_taxvamb(out, data)
        produced = (out / "vaevae_clusters_unsplit.tsv").read_text()
        golden = (GOLDEN / "vaevae_clusters_unsplit.tsv").read_text()
        assert produced == golden, "taxvamb clusters drifted from golden"

    def test_taxometer_matches_golden(self, data, tmp_path_factory):
        out = tmp_path_factory.mktemp("golden_taxometer") / "run"
        make_golden.run_taxometer(out, data)
        produced = (out / "results_taxometer.tsv").read_text()
        golden = (GOLDEN / "results_taxometer.tsv").read_text()
        assert produced == golden, "taxometer predictions drifted from golden"


class TestOracleOnPipelineLatents:
    def test_oracle_reproduces_engine_clusters(self, pipeline_run):
        """Re-cluster the pipeline's latents with the sequential oracle and
        demand identical unsplit membership (names per cluster)."""
        import jax

        from vamb_tpu.composition import Composition
        from vamb_tpu.utils import read_clusters, read_npz

        latent = read_npz(pipeline_run / "latent.npz")
        comp = Composition.load(pipeline_run / "composition.npz")
        names = [str(n) for n in comp.metadata.identifiers]
        lengths = comp.metadata.lengths.astype(np.float32)

        # the pipeline clusters on an auto mesh over all local devices; the
        # oracle must pad the Gumbel draws to the same column tile
        pad = 128 * jax.device_count()
        oracle = SequentialOracle(
            latent.copy(),
            lengths,
            minsuccesses=make_golden.MIN_SUCCESSES,
            rng_seed=make_golden.SEED,
            pad_multiple=pad,
        )
        oracle_clusters = [
            frozenset(names[i] for i in rec.members) for rec in oracle
        ]

        with open(pipeline_run / "vae_clusters_unsplit.tsv") as f:
            engine_clusters = [
                frozenset(members) for members in read_clusters(f).values()
            ]
        assert oracle_clusters == engine_clusters

"""Multi-device (virtual CPU mesh) tests: DP training and sharded clustering."""

import numpy as np

import jax

from vamb_tpu.cluster import ClusterGenerator
from vamb_tpu.models import VAE, make_dataset
from vamb_tpu.parallel import make_mesh, replicate, shard_rows


def make_raw(n=256, s=3, seed=0):
    rng = np.random.default_rng(seed)
    abundance = rng.uniform(0, 5, (n, s)).astype(np.float32)
    tnf = rng.standard_normal((n, 103)).astype(np.float32)
    lengths = rng.integers(2000, 50_000, n).astype(np.int64)
    return abundance, tnf, lengths


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(4)
    assert mesh.devices.size == 4


def test_shard_and_replicate():
    mesh = make_mesh(4)
    x = np.arange(64, dtype=np.float32).reshape(16, 4)
    sharded = shard_rows(x, mesh)
    np.testing.assert_array_equal(np.asarray(sharded), x)
    tree = {"a": np.ones(3), "b": [np.zeros((2, 2))]}
    rep = replicate(tree, mesh)
    np.testing.assert_array_equal(np.asarray(rep["a"]), tree["a"])


def test_dp_training_loss_falls():
    abundance, tnf, lengths = make_raw()
    ds = make_dataset(abundance, tnf, lengths)
    mesh = make_mesh(4)
    vae = VAE(nsamples=3, nhiddens=[32, 32], nlatent=8, seed=0)
    lines = []
    vae.trainmodel(
        ds, nepochs=4, batchsize=64, batchsteps=None,
        logger=lines.append, mesh=mesh,
    )
    loss_lines = [l for l in lines if "Loss:" in l]
    first = float(loss_lines[0].split("Loss: ")[1].split()[0])
    last = float(loss_lines[-1].split("Loss: ")[1].split()[0])
    assert last < first
    latent = vae.encode(ds)
    assert latent.shape == (256, 8)
    assert np.all(np.isfinite(latent))


def test_sharded_clustering_matches_unsharded():
    rng = np.random.default_rng(11)
    matrix = rng.standard_normal((300, 24)).astype(np.float32)
    lengths = rng.integers(2000, 9000, 300)
    mesh = make_mesh(8)
    plain = [tuple(c.members.tolist()) for c in ClusterGenerator(matrix.copy(), lengths)]
    sharded = [
        tuple(c.members.tolist())
        for c in ClusterGenerator(matrix.copy(), lengths, mesh=mesh)
    ]
    assert plain == sharded


def test_sharded_training_equivalence():
    """Same seed, sharded vs unsharded: parameter trajectories must agree.

    The sharded epoch re-shards every gathered batch across the mesh (each
    device computes its slice's gradients; GSPMD inserts the all-reduce),
    so this asserts the DP decomposition is exact, not just convergent."""
    abundance, tnf, lengths = make_raw(n=512, s=3, seed=4)
    ds = make_dataset(abundance, tnf, lengths)

    def train(mesh):
        vae = VAE(nsamples=3, nhiddens=[32, 32], nlatent=8, seed=2)
        vae.trainmodel(
            ds, nepochs=3, batchsize=64, batchsteps=None, mesh=mesh
        )
        return vae

    plain = train(None)
    sharded = train(make_mesh(8))
    flat_p, _ = jax.tree_util.tree_flatten(plain.params)
    flat_s, _ = jax.tree_util.tree_flatten(sharded.params)
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_dp_epoch_hlo_has_no_dataset_sized_collectives():
    """Compile the sharded epoch program and inventory its collectives:
    nothing dataset-sized may cross devices — per-step communication is
    bounded by batch rows + parameters (VERDICT round-1 item 4)."""
    import re

    from vamb_tpu.models.dataset import num_batches
    from vamb_tpu.optim import dadapt_adam
    from vamb_tpu.parallel.mesh import shard_rows_padded

    n, s, batch = 2048, 4, 256
    abundance, tnf, lengths = make_raw(n=n, s=s, seed=5)
    ds = make_dataset(abundance, tnf, lengths)
    mesh = make_mesh(8)
    vae = VAE(nsamples=s, nhiddens=[32, 32], nlatent=8, seed=0)
    opt = dadapt_adam()
    epoch_fn = vae._make_epoch_fn(opt, mesh=mesh)
    data = tuple(shard_rows_padded(np.asarray(a), mesh) for a in ds)
    params = replicate(vae.params, mesh)
    bn = replicate(vae.bn_state, mesh)
    opt_state = replicate(opt.init(vae.params), mesh)
    txt = (
        epoch_fn.lower(
            params, bn, opt_state, data, jax.random.key(0),
            batchsize=batch, nbatches=num_batches(n, batch), n_obs=n,
        )
        .compile()
        .as_text()
    )
    # dataset rows per shard: any collective whose result has a dimension
    # >= the full dataset row count moves the dataset — forbidden
    pattern = re.compile(
        r"= (\S+) (all-gather|all-reduce|all-to-all|collective-permute|"
        r"reduce-scatter)\("
    )
    seen = []
    for line in txt.splitlines():
        m = pattern.search(line)
        if not m:
            continue
        shape = m.group(1)
        seen.append((m.group(2), shape))
        dims = [int(x) for x in re.findall(r"(\d+)", shape.split("{")[0])]
        assert not dims or max(dims) < n, (
            f"dataset-sized collective in DP epoch: {line.strip()[:160]}"
        )
    # and the input data must stay row-sharded (never silently replicated)
    # [checked via compile-time sharding of the 4 data args]
    comp = epoch_fn.lower(
        params, bn, opt_state, data, jax.random.key(0),
        batchsize=batch, nbatches=num_batches(n, batch), n_obs=n,
    ).compile()
    data_shardings = comp.input_shardings[0][3]
    for sh in data_shardings:
        assert "dp" in str(sh.spec), sh


class TestMeshSubsetWander:
    """Round-4: the subset-wander fast path (and its speculative attempt
    lanes) under a sharded mesh. Emission must be identical to the
    sequential oracle (which has no mesh concept — the mesh engine must
    therefore be emission-identical to the single-device engine too), and
    per-attempt ICI traffic must stay Q-sized, never N-sized."""

    def _clumpy(self, n_clusters, per, dim, noise, seed):
        from .test_parity_cluster import clumpy_latents

        return clumpy_latents(n_clusters, per, dim, noise_frac=noise, seed=seed)

    def _assert_mesh_matches_oracle(self, matrix, lengths, **kwargs):
        from vamb_tpu.cluster import normalize
        from .oracle_cluster import SequentialOracle

        matrix = normalize(matrix)
        mesh = make_mesh(8)
        eng = list(
            ClusterGenerator(
                matrix.copy(), lengths, mesh=mesh, **kwargs
            )
        )
        orc = list(SequentialOracle(matrix.copy(), lengths, **kwargs))
        assert len(eng) == len(orc), (len(eng), len(orc))
        for i, (e, o) in enumerate(zip(eng, orc)):
            assert int(e.medoid) == o.medoid, (i, e.medoid, o.medoid)
            assert e.kind_str == o.kind, (i, e.kind_str, o.kind)
            np.testing.assert_array_equal(np.sort(e.members), o.members)
        all_members = np.concatenate([np.asarray(c.members) for c in eng])
        np.testing.assert_array_equal(
            np.sort(all_members), np.arange(len(matrix))
        )

    def test_mesh_subset_lanes_emission(self):
        matrix, lengths = self._clumpy(40, 100, 16, 0.1, 3)
        self._assert_mesh_matches_oracle(
            matrix, lengths, rng_seed=7, windowsize=60, wander_scope="subset"
        )

    def test_mesh_subset_rejection_heavy(self):
        "Uniform latents: lanes mostly reject; pvr feedback crosses shards."
        rng = np.random.default_rng(5)
        matrix = rng.standard_normal((2048, 16)).astype(np.float32)
        lengths = rng.integers(2000, 50_000, 2048)
        self._assert_mesh_matches_oracle(
            matrix, lengths, rng_seed=2, windowsize=40, wander_scope="subset"
        )

    def test_mesh_subset_lanes_off_classic(self):
        matrix, lengths = self._clumpy(20, 80, 16, 0.15, 9)
        self._assert_mesh_matches_oracle(
            matrix, lengths, rng_seed=1, windowsize=60,
            wander_scope="subset", attempt_batch="off",
        )

    def test_mesh_subset_no_dataset_sized_collectives(self):
        """Inventory the compiled mesh subset program's collectives: the
        ball replication is Q-sized; nothing N-sized may cross the mesh
        except the classic-fallback candidate top_k (documented — it runs
        only on ball-overflow/drift attempts)."""
        import re

        from vamb_tpu.cluster import normalize

        n = 65536
        rng = np.random.default_rng(0)
        matrix = normalize(rng.standard_normal((n, 16)).astype(np.float32))
        lengths = rng.integers(2000, 50_000, n)
        mesh = make_mesh(8)
        gen = ClusterGenerator(
            matrix, lengths, rng_seed=0, wander_scope="subset", mesh=mesh
        )
        txt = (
            gen._emit_batch.lower(
                gen.matrixT, gen.ranks, gen.lengths, gen._state
            )
            .compile()
            .as_text()
        )
        pat = re.compile(
            r"= (\S+) (all-gather|all-reduce|all-to-all|collective-permute|"
            r"reduce-scatter)\("
        )
        offenders = []
        for line in txt.splitlines():
            m = pat.search(line)
            if not m:
                continue
            dims = [
                int(x) for x in re.findall(r"(\d+)", m.group(1).split("{")[0])
            ]
            if dims and max(dims) >= n:
                if "approx_top_k" in line or "top_k" in line:
                    continue  # the documented fallback-path exception
                offenders.append(line.strip()[:160])
        assert not offenders, offenders

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

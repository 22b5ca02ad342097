"""VAEVAE (TaxVamb model) tests: loss falls for one-hot and hloss variants,
joint encoding works, save/load roundtrip."""

import io

import numpy as np
import pytest

from vamb_tpu.models import hier
from vamb_tpu.models.dataset import make_dataset
from vamb_tpu.models.vaevae import VAEVAE, kld_gauss
from vamb_tpu.taxonomy import ContigTaxonomy


def toy(n=200, s=3, seed=0):
    rng = np.random.default_rng(seed)
    taxes = [
        ContigTaxonomy(["Bacteria", "Firmicutes"]),
        ContigTaxonomy(["Bacteria", "Proteobacteria"]),
        ContigTaxonomy(["Archaea"]),
    ]
    nodes, ind_nodes, table_parent = hier.make_graph(taxes)
    classes = rng.integers(0, 3, n)
    leafs = [ind_nodes["Firmicutes"], ind_nodes["Proteobacteria"], ind_nodes["Archaea"]]
    targets = np.array([leafs[c] for c in classes])
    abundance = rng.uniform(0.5, 5, (n, s)).astype(np.float32)
    tnf = rng.standard_normal((n, 103)).astype(np.float32)
    lengths = rng.integers(2000, 50_000, n)
    ds = make_dataset(abundance, tnf, lengths)
    return ds, targets, nodes, table_parent


def test_kld_gauss_zero_for_identical():
    import jax.numpy as jnp

    mu = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)))
    z = jnp.zeros_like(mu)
    assert abs(float(kld_gauss(mu, z, mu, z))) < 1e-6
    # grows with distance
    assert float(kld_gauss(mu, z, mu + 1.0, z)) > 0.4


@pytest.mark.parametrize("hier_loss", [None, "flat_softmax"])
def test_train_loss_falls_and_encode(hier_loss):
    ds, targets, nodes, table_parent = toy()
    model = VAEVAE(
        nsamples=3,
        nlabels=len(nodes),
        nodes=nodes,
        table_parent=table_parent,
        nhiddens=[32, 32],
        nlatent=8,
        hier_loss=hier_loss,
        seed=0,
    )
    lines = []
    model.trainmodel(
        ds, targets, nepochs=6, batchsize=64, batchsteps=None,
        logger=lines.append,
    )
    losses = [
        float(l.split("loss: ")[1].split()[0]) for l in lines if "loss: " in l
    ]
    assert len(losses) == 6
    assert losses[-1] < losses[0], f"loss did not fall: {losses[0]} -> {losses[-1]}"

    latent = model.encode_joint(ds, targets)
    assert latent.shape == (ds.n_obs, 8)
    assert np.all(np.isfinite(latent))
    bits = latent.view(np.uint32)
    assert np.all(bits & 0xFFF == 0)


def test_save_load_roundtrip(tmp_path):
    ds, targets, nodes, table_parent = toy(n=150)
    model = VAEVAE(
        nsamples=3, nlabels=len(nodes), nodes=nodes, table_parent=table_parent,
        nhiddens=[16], nlatent=4, hier_loss="flat_softmax", seed=2,
    )
    model.trainmodel(ds, targets, nepochs=2, batchsize=64, batchsteps=None)
    buf = io.BytesIO()
    model.save(buf)
    buf.seek(0)
    model2 = VAEVAE.load(buf)
    np.testing.assert_array_equal(
        model.encode_joint(ds, targets), model2.encode_joint(ds, targets)
    )


def test_hier_loss_requires_tree():
    with pytest.raises(ValueError, match="nodes"):
        VAEVAE(nsamples=3, nlabels=10, hier_loss="flat_softmax")

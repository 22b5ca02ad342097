"""Taxometer (VAMB2Label) model tests: training reduces loss, predictions
recover separable labels, all three hierarchical loss heads run."""

import io

import numpy as np
import pytest

from vamb_tpu.models import hier
from vamb_tpu.models.dataset import make_dataset
from vamb_tpu.models.taxometer import Taxometer
from vamb_tpu.taxonomy import ContigTaxonomy


def toy_problem(n=240, s=3, seed=0):
    """Contigs from 3 'genera' with separable abundance/TNF signatures."""
    rng = np.random.default_rng(seed)
    taxes = [
        ContigTaxonomy(["Bacteria", "Firmicutes", "Bacillus"]),
        ContigTaxonomy(["Bacteria", "Proteobacteria", "Escherichia"]),
        ContigTaxonomy(["Archaea", "Euryarchaeota"]),
    ]
    nodes, ind_nodes, table_parent = hier.make_graph(taxes)
    labels = rng.integers(0, 3, n)
    # leaf node target per class
    class_leaf = [
        ind_nodes["Bacillus"], ind_nodes["Escherichia"], ind_nodes["Euryarchaeota"]
    ]
    targets = np.array([class_leaf[c] for c in labels])
    centers_ab = rng.uniform(1, 10, (3, s)).astype(np.float32)
    centers_tnf = rng.standard_normal((3, 103)).astype(np.float32) * 2
    abundance = (centers_ab[labels] + rng.uniform(0, 0.5, (n, s))).astype(np.float32)
    tnf = (centers_tnf[labels] + 0.1 * rng.standard_normal((n, 103))).astype(
        np.float32
    )
    lengths = rng.integers(2000, 50_000, n)
    ds = make_dataset(abundance, tnf, lengths)
    return ds, targets, nodes, table_parent, ind_nodes, labels, class_leaf


@pytest.mark.parametrize("loss", ["flat_softmax", "cond_softmax", "soft_margin"])
def test_train_and_predict(loss):
    ds, targets, nodes, table_parent, ind_nodes, labels, class_leaf = toy_problem()
    model = Taxometer(
        nsamples=3,
        nlabels=len(nodes),
        nodes=nodes,
        table_parent=table_parent,
        nhiddens=[64, 64],
        hier_loss=loss,
        seed=0,
    )
    lines = []
    model.trainmodel(
        ds, targets, nepochs=30, batchsize=64, batchsteps=None,
        logger=lines.append,
    )
    ce = [float(l.split("CE: ")[1].split()[0]) for l in lines if "CE: " in l]
    assert ce[-1] < ce[0], f"{loss}: loss did not fall {ce[0]} -> {ce[-1]}"

    probs, preds = zip(*model.predict(ds))
    prob = np.concatenate(probs)
    pred = np.concatenate(preds)
    assert prob.shape[0] == ds.n_obs
    # the separable toy problem should be mostly learnable
    correct = 0
    am = model.tree.ancestor_mask(strict=False)
    for p, c in zip(pred, labels):
        # count as correct if prediction is on the true lineage path
        if am[p, class_leaf[c]] or am[class_leaf[c], p]:
            correct += 1
    assert correct / len(pred) > 0.8, f"{loss}: only {correct}/{len(pred)} on-path"


def test_save_load_roundtrip(tmp_path):
    ds, targets, nodes, table_parent, *_ = toy_problem(n=120)
    model = Taxometer(
        nsamples=3, nlabels=len(nodes), nodes=nodes, table_parent=table_parent,
        nhiddens=[32], seed=1,
    )
    model.trainmodel(ds, targets, nepochs=2, batchsize=64, batchsteps=None)
    buf = io.BytesIO()
    model.save(buf)
    buf.seek(0)
    model2 = Taxometer.load(buf)
    p1 = np.concatenate([p for p, _ in model.predict(ds)])
    p2 = np.concatenate([p for p, _ in model2.predict(ds)])
    np.testing.assert_array_equal(p1, p2)

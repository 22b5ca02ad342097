"""Taxometer (VAMB2Label) parity: JAX model vs torch transcriptions of the
reference architecture and its three hierarchical loss heads.

The forward stack (Linear->LeakyReLU->Dropout->BatchNorm, then a Linear
logits head; reference vamb/taxvamb_encode.py:823-886) is checked with
copied weights and non-trivial BatchNorm statistics. The loss heads and
prediction functions (reference vamb/taxvamb_encode.py:242-274 wiring over
vamb/hloss_misc.py:667-719, 1026-1099, 1102-1133) are checked against
independent torch transcriptions that rebuild the tree algebra from the
parent table by chain-walking, sharing no code with vamb_tpu.models.hier.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from vamb_tpu.models import Taxometer
from vamb_tpu.models import hier

S = 4
NHIDDENS = [32, 16]

#          0
#        / | \
#       1  2  9(leaf)
#      /|  |\
#     3 4  5 6(leaf)
#          |
#        7, 8 (leaves of 5)... keep topological order: parent index < child
PARENTS = np.array([-1, 0, 0, 1, 1, 2, 2, 5, 5, 0])
N_NODES = len(PARENTS)


# ------------------------- independent tree algebra (chain-walk, no hier.py)


def ancestors_of(i):
    out = []
    while i != -1:
        out.append(i)
        i = PARENTS[i]
    return out


ANCESTOR = np.zeros((N_NODES, N_NODES), dtype=bool)  # [i, j]: i ancestor of j
for j in range(N_NODES):
    for a in ancestors_of(j):
        ANCESTOR[a, j] = True

CHILDREN = [list(np.flatnonzero(PARENTS == i)) for i in range(N_NODES)]
LEAF = np.array([len(c) == 0 for c in CHILDREN])
INTERNAL = np.flatnonzero(~LEAF)


def torch_cond_log_softmax(scores: torch.Tensor) -> torch.Tensor:
    "Reference hier_cond_log_softmax (hloss_misc.py:722-757), per sample."
    out = torch.zeros(scores.shape[0], N_NODES, dtype=scores.dtype)
    flat_pos = 0
    for i in INTERNAL:
        k = len(CHILDREN[i])
        block = scores[:, flat_pos : flat_pos + k]
        out[:, CHILDREN[i]] = F.log_softmax(block, dim=-1)
        flat_pos += k
    assert flat_pos == N_NODES - 1
    return out


def torch_flat_softmax_nll(scores, label_idx):
    "Reference FlatSoftmaxNLL (hloss_misc.py:1102-1133): scores over leaves."
    logp_leaf = F.log_softmax(scores, dim=-1)
    leaf_masks = torch.from_numpy(ANCESTOR[:, LEAF])
    masked = torch.where(
        leaf_masks[label_idx], logp_leaf, torch.tensor(-torch.inf)
    )
    return torch.mean(-torch.logsumexp(masked, dim=-1))


def torch_hier_softmax_ce(scores, label_idx):
    "Reference HierSoftmaxCrossEntropy (hloss_misc.py:667-719)."
    # sum-of-descendants of a one-hot label: q[b, n] = [n is ancestor-or-self
    # of label_b] = ANCESTOR[n, label_b]
    q = torch.from_numpy(ANCESTOR[:, label_idx.numpy()].T.astype(np.float32))
    log_cond_p = torch_cond_log_softmax(scores)
    return torch.mean(torch.sum(q * -log_cond_p, dim=-1))


def torch_soft_margin(scores, label_idx, tau=0.01):
    "Reference MarginLoss margin='incorrect', soft (hloss_misc.py:1026-1099)."
    is_correct = torch.from_numpy(ANCESTOR).T  # [label, node]
    margin = 1.0 - is_correct[label_idx].float()
    label_score = scores.gather(-1, label_idx.unsqueeze(-1)).squeeze(-1)
    loss = -label_score + torch.logsumexp(scores + tau * margin, dim=-1)
    return torch.mean(loss)


# --------------------------------------------------------------- fixtures


def make_model(loss_name, seed=5):
    return Taxometer(
        nsamples=S,
        nlabels=N_NODES,
        nodes=[f"n{i}" for i in range(N_NODES)],
        table_parent=list(PARENTS),
        nhiddens=NHIDDENS,
        hier_loss=loss_name,
        seed=seed,
    )


class TorchReferencePredictor(nn.Module):
    "Transcription of VAMB2Label's eval forward (taxvamb_encode.py:823-886)."

    def __init__(self, nlabels):
        super().__init__()
        dims = [S + 103 + 1] + NHIDDENS
        self.encoderlayers = nn.ModuleList(
            nn.Linear(i, o) for i, o in zip(dims, dims[1:])
        )
        self.encodernorms = nn.ModuleList(nn.BatchNorm1d(o) for o in NHIDDENS)
        self.outputlayer = nn.Linear(NHIDDENS[-1], nlabels)
        self.relu = nn.LeakyReLU()

    def forward(self, depths, tnf, ab):
        x = torch.cat((depths, tnf, ab), 1)
        for lin, norm in zip(self.encoderlayers, self.encodernorms):
            x = norm(self.relu(lin(x)))  # dropout is identity in eval
        return self.outputlayer(x)


def copy_weights(tax, ref):
    rng = np.random.default_rng(7)
    with torch.no_grad():
        for i, layer in enumerate(ref.encoderlayers):
            p = tax.params["enc"][i]["dense"]
            layer.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T.copy()))
            layer.bias.copy_(torch.from_numpy(np.asarray(p["b"]).copy()))
        ref.outputlayer.weight.copy_(
            torch.from_numpy(np.asarray(tax.params["out"]["w"]).T.copy())
        )
        ref.outputlayer.bias.copy_(
            torch.from_numpy(np.asarray(tax.params["out"]["b"]).copy())
        )
        for i, norm in enumerate(ref.encodernorms):
            n = norm.num_features
            scale = rng.uniform(0.5, 1.5, n).astype(np.float32)
            bias = rng.normal(0, 0.2, n).astype(np.float32)
            mean = rng.normal(0, 0.5, n).astype(np.float32)
            var = rng.uniform(0.5, 2.0, n).astype(np.float32)
            norm.weight.copy_(torch.from_numpy(scale))
            norm.bias.copy_(torch.from_numpy(bias))
            norm.running_mean.copy_(torch.from_numpy(mean))
            norm.running_var.copy_(torch.from_numpy(var))
            tax.params["enc"][i]["bn"]["scale"] = scale
            tax.params["enc"][i]["bn"]["bias"] = bias
            tax.bn_state["enc"][i]["mean"] = mean
            tax.bn_state["enc"][i]["var"] = var


def make_batch(b=48, seed=1):
    rng = np.random.default_rng(seed)
    depths = rng.dirichlet(np.ones(S), b).astype(np.float32)
    tnf = rng.normal(size=(b, 103)).astype(np.float32)
    ab = rng.normal(size=(b, 1)).astype(np.float32)
    return depths, tnf, ab


# ------------------------------------------------------------------- tests


@pytest.mark.parametrize("loss_name", ["flat_softmax", "cond_softmax", "soft_margin"])
def test_forward_parity(loss_name):
    tax = make_model(loss_name)
    ref = TorchReferencePredictor(tax.nlabels).eval()
    copy_weights(tax, ref)
    depths, tnf, ab = make_batch()
    logits, _ = tax.apply(tax.params, tax.bn_state, depths, tnf, ab, train=False)
    with torch.no_grad():
        expect = ref(
            torch.from_numpy(depths), torch.from_numpy(tnf), torch.from_numpy(ab)
        )
    np.testing.assert_allclose(np.asarray(logits), expect.numpy(), atol=3e-5)


def _loss_inputs(nlabels, b=48, seed=2):
    rng = np.random.default_rng(seed)
    scores = rng.normal(size=(b, nlabels)).astype(np.float32)
    labels = rng.integers(0, N_NODES, b)
    onehot = np.eye(N_NODES, dtype=np.float32)[labels]
    return scores, labels, onehot


def test_flat_softmax_loss_parity():
    tax = make_model("flat_softmax")
    scores, labels, onehot = _loss_inputs(tax.nlabels)
    got = float(tax.loss_fn(scores, onehot))
    expect = float(
        torch_flat_softmax_nll(torch.from_numpy(scores), torch.from_numpy(labels))
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_cond_softmax_loss_parity():
    tax = make_model("cond_softmax")
    assert tax.nlabels == N_NODES - 1
    scores, labels, onehot = _loss_inputs(tax.nlabels)
    got = float(tax.loss_fn(scores, onehot))
    expect = float(
        torch_hier_softmax_ce(torch.from_numpy(scores), torch.from_numpy(labels))
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_soft_margin_loss_parity():
    tax = make_model("soft_margin")
    assert tax.nlabels == N_NODES
    scores, labels, onehot = _loss_inputs(tax.nlabels)
    got = float(tax.loss_fn(scores, onehot))
    expect = float(
        torch_soft_margin(torch.from_numpy(scores), torch.from_numpy(labels))
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5)


@pytest.mark.parametrize("loss_name", ["flat_softmax", "cond_softmax", "soft_margin"])
def test_pred_fn_parity(loss_name):
    "pred_fn per reference taxvamb_encode.py:242-274, vs torch transcription."
    tax = make_model(loss_name)
    scores, _, _ = _loss_inputs(tax.nlabels, seed=3)
    got = np.asarray(tax._pred_fn(scores))
    t = torch.from_numpy(scores)
    if loss_name == "flat_softmax":
        p = F.softmax(t, dim=-1)
        expect = p @ torch.from_numpy(ANCESTOR[:, LEAF].T.astype(np.float32))
    elif loss_name == "cond_softmax":
        log_cond = torch_cond_log_softmax(t)
        # log p(node) = sum of conditional logps over ancestors-or-self
        expect = (log_cond @ torch.from_numpy(ANCESTOR.astype(np.float32))).exp()
    else:
        p = F.softmax(t, dim=-1)
        expect = p @ torch.from_numpy(ANCESTOR.T.astype(np.float32))
    np.testing.assert_allclose(got, expect.numpy(), atol=1e-5)
    # every probability vector should respect the tree: parent >= child
    for child in range(1, N_NODES):
        parent = PARENTS[child]
        assert np.all(got[:, parent] >= got[:, child] - 1e-5)


def test_argmax_with_confidence_matches_reference_semantics():
    """The picker (hloss_misc.py:590-600): among nodes with p > threshold
    and condition true, pick the most specific (min value), tie-break by
    probability."""
    tax = make_model("soft_margin")
    scores, _, _ = _loss_inputs(tax.nlabels, seed=4)
    prob = np.asarray(tax._pred_fn(scores))
    pred = hier.argmax_with_confidence(
        tax.specificity, prob, 0.5, tax.not_trivial
    )
    for b in range(prob.shape[0]):
        eligible = [
            i
            for i in range(N_NODES)
            if prob[b, i] > 0.5 and tax.not_trivial[i]
        ]
        assert eligible, "root always has p=1"
        best = max(eligible, key=lambda i: (tax.specificity[i], prob[b, i]))
        assert pred[b] == best

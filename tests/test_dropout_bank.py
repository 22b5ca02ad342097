"""Per-epoch dropout byte banks (Taxometer / VAEVAE fast path).

Pins the round-5 bank wiring: slot counts and widths match the stacks
they feed, the env escape hatch restores per-step draws, the bank path is
deterministic given the key, and the applied masks hit the documented
quantized drop rate. (The flagship VAE's identical construction is pinned
by its golden/parity suites; these models' quality equivalence is covered
by the taxvamb/taxometer head-to-heads.)
"""

import os

import jax
import numpy as np
import pytest

from vamb_tpu.models import hier
from vamb_tpu.models.taxometer import Taxometer
from vamb_tpu.models.vaevae import VAEVAE
from vamb_tpu.taxonomy import ContigTaxonomy


@pytest.fixture(scope="module")
def graph():
    taxes = [ContigTaxonomy(["Bacteria", f"p{i % 4}", f"g{i}"]) for i in range(8)]
    return hier.make_graph(taxes)


def test_taxometer_bank_shapes(graph):
    nodes, _, table_parent = graph
    tx = Taxometer(nsamples=3, nlabels=len(nodes), nodes=nodes,
                   table_parent=table_parent, nhiddens=[64, 32, 16], seed=0)
    bank = tx._draw_dropout_bank(jax.random.key(1), batchsize=20)
    assert [b.shape for b in bank] == [(20, 64), (20, 32), (20, 16)]
    assert all(b.dtype == np.uint8 for b in bank)
    # deterministic per key, distinct across keys
    again = tx._draw_dropout_bank(jax.random.key(1), batchsize=20)
    other = tx._draw_dropout_bank(jax.random.key(2), batchsize=20)
    for a, b, c in zip(bank, again, other):
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_taxometer_bank_disabled_paths(graph):
    nodes, _, table_parent = graph
    nodrop = Taxometer(nsamples=3, nlabels=len(nodes), nodes=nodes,
                       table_parent=table_parent, dropout=0.0, seed=0)
    assert nodrop._draw_dropout_bank(jax.random.key(0), 8) is None
    tx = Taxometer(nsamples=3, nlabels=len(nodes), nodes=nodes,
                   table_parent=table_parent, seed=0)
    os.environ["VAMB_TPU_DROPOUT_MODE"] = "step"
    try:
        assert tx._draw_dropout_bank(jax.random.key(0), 8) is None
    finally:
        os.environ.pop("VAMB_TPU_DROPOUT_MODE", None)


def test_vaevae_bank_slots_match_stacks(graph):
    nodes, _, table_parent = graph
    vv = VAEVAE(nsamples=3, nlabels=len(nodes), nodes=nodes,
                table_parent=table_parent, nhiddens=[48, 24],
                hier_loss="flat_softmax", seed=0)
    bank = vv._draw_dropout_bank(jax.random.key(3), batchsize=10)
    assert len(bank) == len(vv.nhiddens) * VAEVAE._N_STACK_CALLS
    # encode slots carry nhiddens order, decode slots the reverse
    widths = [b.shape[1] for b in bank]
    expect = []
    for kind in VAEVAE._STACK_KINDS:
        expect += vv.nhiddens if kind == "e" else vv.nhiddens[::-1]
    assert widths == expect
    assert all(b.shape[0] == 10 for b in bank)


def test_bank_mask_rate_matches_quantized_dropout():
    from vamb_tpu.models.layers import dropout_from_bits, dropout_threshold

    rng = np.random.default_rng(0)
    bits = rng.integers(0, 256, (4000, 64), dtype=np.uint8)
    x = np.ones((4000, 64), np.float32)
    out = np.asarray(dropout_from_bits(bits, x, 0.2))
    t, keep_scale = dropout_threshold(0.2)
    drop_rate = (out == 0).mean()
    assert abs(drop_rate - t / 256.0) < 0.01
    kept = out[out != 0]
    np.testing.assert_allclose(kept, keep_scale, rtol=1e-6)

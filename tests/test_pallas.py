"""Correctness tests for the Pallas clustering kernels (interpret mode).

The kernels run compiled only on TPU, where they are the engine's default
wander path (wander_kernel="auto"); here they execute through the Pallas
interpreter on the CPU mesh against the engine's XLA reference
expressions, which remain the CPU/sharded/bf16 path. On-chip validation +
trace-based timings live in the repo README and ops/pallas_cluster.py's
docstring (candidate sweep 0.185 ms vs 0.41 ms XLA at 1M x 32 on v5e).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vamb_tpu.ops.pallas_cluster import (
    _pick_tile,
    candidate_density_sweep,
    medoid_sweep,
    pallas_pad_multiple,
    row_sweep,
)

PREC = jax.lax.Precision.HIGHEST


def make_data(n, f=40, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, 32)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True) * np.sqrt(2)
    mT = np.zeros((f, n), np.float32)
    mT[:32] = m.T
    wts = np.where(
        rng.random(n) < 0.9, rng.integers(2000, 50_000, n), 0
    ).astype(np.float32)
    return jnp.asarray(mT), jnp.asarray(wts)


def xla_sweep(mT, idx, wts):
    d = 0.5 - jnp.einsum(
        "fn,f->n", mT, mT[:, idx], precision=PREC,
        preferred_element_type=jnp.float32,
    )
    d = d.at[idx].set(0.0)
    kept = wts > 0
    bins = jnp.clip((d / 0.005).astype(jnp.int32), 0, 59)
    w = jnp.where((d >= 0) & (d <= 0.3) & kept, wts, 0.0)
    hist = jnp.sum(
        jnp.where(bins[:, None] == jnp.arange(60)[None, :], w[:, None], 0.0),
        axis=0,
    )
    dens = jnp.sum(jnp.where((d <= 0.05) & kept, wts * (0.05 - d), 0.0))
    n_close = jnp.sum((d < 0.05) & kept)
    return d, hist, dens, n_close


class TestMedoidSweep:
    def test_matches_xla(self):
        n = pallas_pad_multiple()
        mT, wts = make_data(n)
        for idx in (0, 37, n - 1):
            d, hist, dens, n_close = medoid_sweep(mT, idx, wts, interpret=True)
            dr, hr, densr, ncr = xla_sweep(mT, idx, wts)
            np.testing.assert_allclose(d, dr, atol=2e-7)
            np.testing.assert_allclose(hist, hr, rtol=1e-6)
            np.testing.assert_allclose(float(dens), float(densr), rtol=1e-5)
            assert int(n_close) == int(ncr)

    def test_removed_rows_carry_no_weight(self):
        n = pallas_pad_multiple()
        mT, wts = make_data(n, seed=1)
        wts = wts.at[: n // 2].set(0.0)  # half the points removed
        _, hist, dens, n_close = medoid_sweep(mT, 5, wts, interpret=True)
        _, hr, densr, ncr = xla_sweep(mT, 5, wts)
        np.testing.assert_allclose(hist, hr, rtol=1e-6)
        np.testing.assert_allclose(float(dens), float(densr), rtol=1e-5)
        assert int(n_close) == int(ncr)


class TestRowSweep:
    @pytest.mark.parametrize("idx", [0, 123, 4095])
    def test_matches_xla(self, idx):
        n = pallas_pad_multiple()
        mT, _ = make_data(n, seed=3)
        d = row_sweep(mT, idx, interpret=True)
        dr = 0.5 - jnp.einsum(
            "fn,f->n", mT, mT[:, idx], precision=PREC,
            preferred_element_type=jnp.float32,
        )
        dr = dr.at[idx].set(0.0)
        np.testing.assert_allclose(d, dr, atol=2e-7)
        assert float(d[idx]) == 0.0


class TestPickTile:
    def test_divides_and_budget(self):
        for f_pad, n_pad in [(32, 1 << 20), (40, 4096), (288, 1 << 19),
                             (32, 128 * 3), (8, 1 << 16)]:
            t = _pick_tile(f_pad, n_pad)
            assert n_pad % t == 0
            assert t <= 32768
            assert t == 128 or f_pad * t * 4 <= (4 << 20)


class TestCandidateDensitySweep:
    @pytest.mark.parametrize("c", [1, 7, 25, 32])
    def test_matches_xla(self, c):
        n = pallas_pad_multiple()
        mT, wts = make_data(n, seed=2)
        rng = np.random.default_rng(c)
        cand = jnp.asarray(
            rng.choice(n, size=c, replace=False).astype(np.int32)
        )
        dens = candidate_density_sweep(mT, cand, wts, interpret=True)
        rows = mT[:, cand]
        D = 0.5 - jnp.einsum(
            "fc,fn->cn", rows, mT, precision=PREC,
            preferred_element_type=jnp.float32,
        )
        D = jnp.where(jnp.arange(n)[None, :] == cand[:, None], 0.0, D)
        kept = wts > 0
        expect = jnp.sum(
            jnp.where(
                (D <= 0.05) & kept[None, :], wts[None, :] * (0.05 - D), 0.0
            ),
            axis=1,
        )
        np.testing.assert_allclose(dens, expect, rtol=1e-5)


class TestGatherBlocks:
    """The subset wander's ball gather must be bit-identical to the XLA
    take it replaces (pure data movement — the engine uses the kernel on
    TPU while the CPU oracle keeps the take formulation)."""

    @pytest.mark.parametrize("kb", [4, 64])
    def test_matches_xla_take(self, kb):
        from vamb_tpu.ops.pallas_cluster import gather_blocks

        rng = np.random.default_rng(3)
        f_pad, nb, block = 32, 256, 128
        n = nb * block
        mT = jnp.asarray(rng.normal(size=(f_pad, n)).astype(np.float32))
        bids = jnp.asarray(
            np.sort(rng.choice(nb, kb, replace=False)).astype(np.int32)
        )
        got = gather_blocks(mT, bids, block=block, interpret=True)
        want = jnp.take(mT.reshape(f_pad, nb, block), bids, axis=1).reshape(
            f_pad, kb * block
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_repeated_block_ids(self):
        "Overflow clamping repeats block 0; the copy must still be exact."
        from vamb_tpu.ops.pallas_cluster import gather_blocks

        rng = np.random.default_rng(4)
        f_pad, nb, block = 32, 64, 128
        mT = jnp.asarray(rng.normal(size=(f_pad, nb * block)).astype(np.float32))
        bids = jnp.asarray(np.array([5, 0, 0, 63], np.int32))
        got = gather_blocks(mT, bids, block=block, interpret=True)
        want = jnp.take(mT.reshape(f_pad, nb, block), bids, axis=1).reshape(
            f_pad, -1
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

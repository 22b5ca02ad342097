"""Tests for the dataset normalization contract and VAE training/encoding.

Mirrors the reference's test strategy (reference test/test_encode.py):
normalization invariants, loss-falls smoke test, save/load encode equality.
"""

import io

import numpy as np
import pytest

from vamb_tpu.models import VAE, make_dataset
from vamb_tpu.models.dataset import batchsize_at_epoch, num_batches


def make_raw(n=111, s=4, seed=0):
    rng = np.random.default_rng(seed)
    abundance = rng.uniform(0, 5, (n, s)).astype(np.float32)
    tnf = rng.standard_normal((n, 103)).astype(np.float32)
    lengths = rng.integers(2000, 50_000, n).astype(np.int64)
    return abundance, tnf, lengths


class TestDataset:
    def test_normalization_invariants(self):
        abundance, tnf, lengths = make_raw()
        ds = make_dataset(abundance, tnf, lengths)
        # depths rows sum to 1
        np.testing.assert_allclose(ds.depths.sum(axis=1), 1.0, rtol=1e-4)
        # tnf columns zscored
        np.testing.assert_allclose(ds.tnf.mean(axis=0), 0.0, atol=1e-4)
        np.testing.assert_allclose(ds.tnf.std(axis=0), 1.0, rtol=1e-3)
        # total abundance zscored column
        assert ds.abundance.shape == (len(abundance), 1)
        np.testing.assert_allclose(ds.abundance.mean(), 0.0, atol=1e-4)
        # weights mean 1, min weight corresponds to >= 2.0 pre-scaling
        np.testing.assert_allclose(ds.weights.mean(), 1.0, rtol=1e-4)

    def test_weight_formula(self):
        abundance, tnf, _ = make_raw(n=3)
        lengths = np.array([2000, 150_000, 3_000_000])
        ds = make_dataset(abundance, tnf, lengths)
        raw = np.maximum(np.log(lengths.astype(np.float32)) - 5.0, 2.0)
        expected = raw * 3 / raw.sum()
        np.testing.assert_allclose(ds.weights[:, 0], expected, rtol=1e-5)

    def test_destroy_mutates_in_place(self):
        abundance, tnf, lengths = make_raw()
        a2, t2 = abundance.copy(), tnf.copy()
        ds = make_dataset(abundance, tnf, lengths, destroy=True)
        assert ds.depths is abundance
        assert ds.tnf is tnf
        assert not np.array_equal(abundance, a2)
        assert not np.array_equal(tnf, t2)

    def test_zero_sample_depth_raises(self):
        abundance, tnf, lengths = make_raw()
        abundance[:, 1] = 0.0
        with pytest.raises(ValueError, match="zero depth"):
            make_dataset(abundance, tnf, lengths)

    def test_zero_total_abundance_row_becomes_uniform(self):
        abundance, tnf, lengths = make_raw(s=4)
        abundance[7] = 0.0
        ds = make_dataset(abundance, tnf, lengths)
        np.testing.assert_allclose(ds.depths[7], 0.25, rtol=1e-5)

    def test_dtype_checks(self):
        abundance, tnf, lengths = make_raw()
        with pytest.raises(ValueError, match="float32"):
            make_dataset(abundance.astype(np.float64), tnf, lengths)
        with pytest.raises(ValueError, match="same"):
            make_dataset(abundance[:-1], tnf, lengths)

    def test_batch_schedule(self):
        assert num_batches(1000, 256) == 3  # drop_last
        assert num_batches(100, 256) == 1  # single small batch
        assert batchsize_at_epoch(256, [25, 75], 0) == 256
        assert batchsize_at_epoch(256, [25, 75], 25) == 512
        assert batchsize_at_epoch(256, [25, 75], 80) == 1024


class TestVAE:
    def test_bad_args(self):
        with pytest.raises(ValueError):
            VAE(nsamples=0)
        with pytest.raises(ValueError):
            VAE(nsamples=4, nlatent=0)
        with pytest.raises(ValueError):
            VAE(nsamples=4, alpha=1.5)
        with pytest.raises(ValueError):
            VAE(nsamples=4, beta=0.0)
        with pytest.raises(ValueError):
            VAE(nsamples=4, dropout=1.0)

    def test_single_sample_defaults(self):
        vae = VAE(nsamples=1)
        assert vae.alpha == 0.50
        assert vae.nhiddens == [256, 256]
        vae4 = VAE(nsamples=4)
        assert vae4.alpha == 0.15
        assert vae4.nhiddens == [512, 512]

    def test_loss_falls_and_save_load(self, tmp_path):
        abundance, tnf, lengths = make_raw(n=200, s=3, seed=1)
        ds = make_dataset(abundance, tnf, lengths)
        vae = VAE(nsamples=3, nhiddens=[64, 64], nlatent=8, seed=0)
        losses = []
        vae.trainmodel(
            ds, nepochs=5, batchsize=32, batchsteps=None,
            logger=lambda m: losses.append(m),
        )
        loss_lines = [l for l in losses if "Loss:" in l]
        assert len(loss_lines) == 5
        first = float(loss_lines[0].split("Loss: ")[1].split()[0])
        last = float(loss_lines[-1].split("Loss: ")[1].split()[0])
        assert last < first, f"loss did not fall: {first} -> {last}"

        latent = vae.encode(ds)
        assert latent.shape == (200, 8)
        assert np.all(np.isfinite(latent))

        buf = io.BytesIO()
        vae.save(buf)
        buf.seek(0)
        vae2 = VAE.load(buf)
        latent2 = vae2.encode(ds)
        np.testing.assert_array_equal(latent, latent2)

    def test_bf16_precision_trains_and_encodes_f32(self, tmp_path):
        """Opt-in bf16: loss falls, grads track f32 closely, and encode-time
        latents are the *exact* f32 forward (precision applies to training
        matmuls only — clustering reads these latents)."""
        abundance, tnf, lengths = make_raw(n=200, s=3, seed=1)
        ds = make_dataset(abundance, tnf, lengths)
        vae = VAE(nsamples=3, nhiddens=[64, 64], nlatent=8, seed=0, precision="bf16")
        losses = []
        vae.trainmodel(
            ds, nepochs=5, batchsize=32, batchsteps=None,
            logger=lambda m: losses.append(m),
        )
        loss_lines = [l for l in losses if "Loss:" in l]
        first = float(loss_lines[0].split("Loss: ")[1].split()[0])
        last = float(loss_lines[-1].split("Loss: ")[1].split()[0])
        assert last < first, f"bf16 loss did not fall: {first} -> {last}"

        latent = vae.encode(ds)
        assert np.all(np.isfinite(latent))

        # encode() ignores the training precision: same params in an f32
        # model must give bit-identical latents
        f32_twin = VAE(nsamples=3, nhiddens=[64, 64], nlatent=8, seed=0)
        f32_twin.params = vae.params
        f32_twin.bn_state = vae.bn_state
        np.testing.assert_array_equal(latent, f32_twin.encode(ds))

        # save/load round-trips the precision choice
        buf = io.BytesIO()
        vae.save(buf)
        buf.seek(0)
        assert VAE.load(buf).precision == "bf16"

    def test_bf16_rejects_unknown_precision(self):
        with pytest.raises(ValueError, match="precision"):
            VAE(nsamples=3, precision="fp8")

    def test_train_too_few_sequences_raises(self):
        abundance, tnf, lengths = make_raw(n=1)
        ds = make_dataset(abundance, tnf, lengths)
        vae = VAE(nsamples=4, nhiddens=[16], nlatent=4)
        with pytest.raises(ValueError, match="fewer than 2"):
            vae.trainmodel(ds, nepochs=2, batchsteps=None)

    def test_batchsteps_validation(self):
        abundance, tnf, lengths = make_raw()
        ds = make_dataset(abundance, tnf, lengths)
        vae = VAE(nsamples=4, nhiddens=[16], nlatent=4)
        with pytest.raises(ValueError, match="batchsteps"):
            vae.trainmodel(ds, nepochs=5, batchsteps=[5])
        with pytest.raises(ValueError, match="integers"):
            vae.trainmodel(ds, nepochs=5, batchsteps=[2.5])

    def test_encode_mantissa_masked(self):
        abundance, tnf, lengths = make_raw(n=64, s=2)
        ds = make_dataset(abundance, tnf, lengths)
        vae = VAE(nsamples=2, nhiddens=[16], nlatent=4)
        latent = vae.encode(ds)
        bits = latent.view(np.uint32)
        assert np.all(bits & 0xFFF == 0)

    def test_encode_batch_independent(self):
        "Chunked encode must equal whole-matrix encode (eval-mode BN)."
        abundance, tnf, lengths = make_raw(n=300, s=2)
        ds = make_dataset(abundance, tnf, lengths)
        vae = VAE(nsamples=2, nhiddens=[16], nlatent=4)
        import vamb_tpu.models.vae as vae_mod

        full = vae.encode(ds)
        old = vae_mod._ENCODE_CHUNK
        try:
            vae_mod._ENCODE_CHUNK = 256  # force 2 chunks with padding
            chunked = vae.encode(ds)
        finally:
            vae_mod._ENCODE_CHUNK = old
        np.testing.assert_array_equal(full, chunked)


def test_checkpoint_every(tmp_path):
    "Mid-training checkpoints are written and loadable."
    abundance, tnf, lengths = make_raw(n=100, s=2)
    ds = make_dataset(abundance, tnf, lengths)
    vae = VAE(nsamples=2, nhiddens=[16], nlatent=4, seed=0)
    path = tmp_path / "model.npz"
    seen = []

    orig_save = VAE.save

    def spy(self, io):
        seen.append(1)
        return orig_save(self, io)

    VAE.save = spy
    try:
        vae.trainmodel(
            ds, nepochs=5, batchsize=32, batchsteps=None,
            modelfile=path, checkpoint_every=2,
        )
    finally:
        VAE.save = orig_save
    # checkpoints after epochs 2 and 4, plus the final save
    assert len(seen) == 3
    loaded = VAE.load(path)
    np.testing.assert_array_equal(loaded.encode(ds), vae.encode(ds))


class TestMetricsDrain:
    """The async metric drain must emit every line, in order, with values."""

    def test_emits_all_in_order_with_lag(self):
        import jax.numpy as jnp

        from vamb_tpu.models.training import MetricsDrain

        seen = []
        drain = MetricsDrain(
            lambda ep, vals, bs, secs: seen.append((ep, float(vals[0]), bs)),
            lag=2,
        )
        for epoch in range(7):
            drain.push(epoch, jnp.asarray([float(epoch)]), 256 * (epoch + 1))
        # with lag=2 exactly the first 5 lines have drained
        assert [s[0] for s in seen] == [0, 1, 2, 3, 4]
        drain.flush()
        assert [s[0] for s in seen] == list(range(7))
        assert [s[1] for s in seen] == [float(e) for e in range(7)]
        assert [s[2] for s in seen] == [256 * (e + 1) for e in range(7)]

    def test_lag_zero_is_synchronous(self):
        import jax.numpy as jnp

        from vamb_tpu.models.training import MetricsDrain

        seen = []
        drain = MetricsDrain(lambda ep, vals, bs, secs: seen.append(ep), lag=0)
        drain.push(0, jnp.asarray([1.0]), 64)
        assert seen == [0]

    def test_trainmodel_logs_one_line_per_epoch(self):
        rng = np.random.default_rng(0)
        ds = make_dataset(
            rng.uniform(0.1, 1.0, (64, 3)).astype(np.float32),
            rng.standard_normal((64, 103)).astype(np.float32),
            rng.integers(2000, 5000, 64),
        )
        vae = VAE(nsamples=3, seed=0)
        lines = []
        vae.trainmodel(
            ds, nepochs=5, batchsize=16, batchsteps=None, logger=lines.append
        )
        epoch_lines = [ln for ln in lines if "Epoch:" in ln]
        assert len(epoch_lines) == 5
        # in order, each with a loss value
        for i, ln in enumerate(epoch_lines):
            assert f"Epoch: {i + 1:>3}" in ln and "Loss:" in ln

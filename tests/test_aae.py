"""AAE (Avamb) model tests, modeled on reference test/test_aamb_encode.py."""

import io

import numpy as np
import pytest

from vamb_tpu.models.aae import AAE
from vamb_tpu.models.dataset import make_dataset


def make_ds(n=180, s=3, seed=0):
    rng = np.random.default_rng(seed)
    abundance = rng.uniform(0.5, 5, (n, s)).astype(np.float32)
    tnf = rng.standard_normal((n, 103)).astype(np.float32)
    lengths = rng.integers(2000, 50_000, n)
    return make_dataset(abundance, tnf, lengths)


def test_bad_params():
    with pytest.raises(ValueError):
        AAE(nsamples=0)
    with pytest.raises(ValueError):
        AAE(nsamples=3, nlatent_z=0)
    with pytest.raises(ValueError):
        AAE(nsamples=3, sl=1.5)


def test_train_and_latents():
    ds = make_ds()
    aae = AAE(nsamples=3, nhiddens=48, nlatent_z=8, nlatent_y=10, seed=0)
    lines = []
    aae.trainmodel(
        ds, nepochs=5, batchsize=64, batchsteps=None, logger=lines.append
    )
    recs = [
        float(l.split("Rec. loss: ")[1].split()[0])
        for l in lines
        if "Rec. loss" in l
    ]
    assert len(recs) == 5
    assert recs[-1] < recs[0], f"reconstruction loss did not fall: {recs}"

    names = [f"c{i}" for i in range(ds.n_obs)]
    clusters_y, latent = aae.get_latents(names, ds)
    assert latent.shape == (ds.n_obs, 8)
    assert np.all(np.isfinite(latent))
    # y clusters form a partition of the contigs
    all_members = [m for s_ in clusters_y.values() for m in s_]
    assert len(all_members) == ds.n_obs
    assert len(set(all_members)) == ds.n_obs
    # cluster ids are 1-based y indices
    assert all(1 <= int(k) <= 10 for k in clusters_y)


def test_save_load_roundtrip():
    ds = make_ds(n=120)
    aae = AAE(nsamples=3, nhiddens=32, nlatent_z=4, nlatent_y=6, seed=1)
    aae.trainmodel(ds, nepochs=2, batchsize=64, batchsteps=None)
    buf = io.BytesIO()
    aae.save(buf)
    buf.seek(0)
    aae2 = AAE.load(buf)
    names = [str(i) for i in range(ds.n_obs)]
    _, l1 = aae.get_latents(names, ds)
    _, l2 = aae2.get_latents(names, ds)
    np.testing.assert_array_equal(l1, l2)


def test_single_sample_sse_loss():
    ds = make_ds(s=1)
    aae = AAE(nsamples=1, nhiddens=32, nlatent_z=4, nlatent_y=6, seed=0)
    lines = []
    aae.trainmodel(ds, nepochs=2, batchsize=64, batchsteps=None, logger=lines.append)
    assert aae.alpha == 0.50


def test_bce_saturated_discriminator_finite():
    """BCE must stay finite with ZERO (not NaN) gradient when the f32
    sigmoid saturates to exactly 1.0 or 0.0 — the regime a winning
    discriminator reaches within two epochs on real data. A naive
    clip(pred, eps, 1-1e-12) does not survive this (1-1e-12 rounds to
    1.0 in f32); torch.nn.BCELoss's clamped forward/backward gives a
    finite loss and a zero effective logit gradient, which _bce must
    reproduce (caught by the avamb head-to-head: all-NaN z latents)."""
    import jax
    import jax.numpy as jnp

    for pval, tval in [(1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (0.0, 0.0)]:
        # gradient w.r.t. the LOGIT, through the saturated sigmoid
        def loss_from_logit(x):
            return AAE._bce(jax.nn.sigmoid(x), jnp.full((4, 1), tval))

        logit = jnp.float32(30.0 if pval == 1.0 else -120.0)
        assert jax.nn.sigmoid(logit) == pval  # truly saturated in f32
        val, grad = jax.value_and_grad(loss_from_logit)(logit)
        assert np.isfinite(float(val)), (pval, tval, val)
        assert np.isfinite(float(grad)), (pval, tval, grad)
        if pval == tval:
            assert abs(float(val)) < 1e-6
        # unsaturated probabilities must still match the analytic BCE
    p = jnp.asarray([[0.3], [0.9]])
    t = jnp.asarray([[1.0], [0.0]])
    expect = float(jnp.mean(-(t * jnp.log(p) + (1 - t) * jnp.log1p(-p))))
    assert abs(float(AAE._bce(p, t)) - expect) < 1e-7


def test_trainmodel_no_nan_under_adversarial_saturation():
    """A short train on data hard enough for disc_z to win must keep all
    params/latents finite (regression for the epoch-2 NaN divergence the
    avamb head-to-head exposed)."""
    ds = make_ds(n=512, s=5, seed=3)
    aae = AAE(nsamples=5, seed=1)
    aae.trainmodel(ds, nepochs=4, batchsize=64, batchsteps=None)
    for leaf in __import__("jax").tree.leaves(aae.params):
        assert np.isfinite(np.asarray(leaf)).all()

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

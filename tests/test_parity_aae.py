"""Full-model AAE parity: JAX implementation vs a torch transcription of the
reference architecture and loss (reference vamb/aamb_encode.py:60-200).

Pins the AAE-specific composition, which differs from the VAE: the
encoder/decoder use Linear->BatchNorm->LeakyReLU (BN before activation, no
dropout), the decoder splits depths/tnf without a total-abundance channel,
and the discriminators are Linear(h)->LeakyReLU->Linear(h/2)->LeakyReLU->
Linear(1)->Sigmoid. Also checks the reconstruction loss in both its
multi-sample (CE) and single-sample (SSE) forms, and the BCE used for the
adversarial terms.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from vamb_tpu.models import AAE

S, NTNF = 4, 103
H, LD, YLEN = 32, 8, 12


class TorchReferenceAAE(nn.Module):
    "Transcription of reference aamb_encode.py:60-165 (eval-path pieces)."

    def __init__(self, nsamples=S):
        super().__init__()
        input_len = NTNF + nsamples
        self.encoder = nn.Sequential(
            nn.Linear(input_len, H), nn.BatchNorm1d(H), nn.LeakyReLU(),
            nn.Linear(H, H), nn.BatchNorm1d(H), nn.LeakyReLU(),
        )
        self.mu = nn.Linear(H, LD)
        self.logvar = nn.Linear(H, LD)
        self.y_vector = nn.Linear(H, YLEN)
        self.decoder = nn.Sequential(
            nn.Linear(LD + YLEN, H), nn.BatchNorm1d(H), nn.LeakyReLU(),
            nn.Linear(H, H), nn.BatchNorm1d(H), nn.LeakyReLU(),
            nn.Linear(H, input_len),
        )
        half = H // 2
        self.discriminator_z = nn.Sequential(
            nn.Linear(LD, H), nn.LeakyReLU(),
            nn.Linear(H, half), nn.LeakyReLU(),
            nn.Linear(half, 1), nn.Sigmoid(),
        )
        self.discriminator_y = nn.Sequential(
            nn.Linear(YLEN, H), nn.LeakyReLU(),
            nn.Linear(H, half), nn.LeakyReLU(),
            nn.Linear(half, 1), nn.Sigmoid(),
        )
        self.nsamples = nsamples

    def encode(self, depths, tnfs):
        x = self.encoder(torch.cat((depths, tnfs), 1))
        return self.mu(x), self.logvar(x), F.softmax(self.y_vector(x), dim=1)

    def decode(self, z, y):
        rec = self.decoder(torch.cat((z, y), 1))
        return F.softmax(rec[:, : self.nsamples], dim=1), rec[:, self.nsamples :]


def _copy_dense(torch_lin, p):
    with torch.no_grad():
        torch_lin.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T.copy()))
        torch_lin.bias.copy_(torch.from_numpy(np.asarray(p["b"]).copy()))


def _randomize_bn(torch_bn, bn_params, bn_state, rng):
    n = torch_bn.num_features
    scale = rng.uniform(0.5, 1.5, n).astype(np.float32)
    bias = rng.normal(0, 0.2, n).astype(np.float32)
    mean = rng.normal(0, 0.5, n).astype(np.float32)
    var = rng.uniform(0.5, 2.0, n).astype(np.float32)
    with torch.no_grad():
        torch_bn.weight.copy_(torch.from_numpy(scale))
        torch_bn.bias.copy_(torch.from_numpy(bias))
        torch_bn.running_mean.copy_(torch.from_numpy(mean))
        torch_bn.running_var.copy_(torch.from_numpy(var))
    bn_params["scale"] = scale
    bn_params["bias"] = bias
    bn_state["mean"] = mean
    bn_state["var"] = var


@pytest.fixture(scope="module")
def models():
    aae = AAE(nsamples=S, nhiddens=H, nlatent_z=LD, nlatent_y=YLEN, seed=9)
    ref = TorchReferenceAAE().eval()
    rng = np.random.default_rng(11)
    # encoder: Sequential indices 0/3 are Linear, 1/4 are BatchNorm
    for i, (lin_idx, bn_idx) in enumerate([(0, 1), (3, 4)]):
        _copy_dense(ref.encoder[lin_idx], aae.params["enc"][i]["dense"])
        _randomize_bn(
            ref.encoder[bn_idx], aae.params["enc"][i]["bn"],
            aae.bn_state["enc"][i], rng,
        )
    _copy_dense(ref.mu, aae.params["mu"])
    _copy_dense(ref.logvar, aae.params["logvar"])
    _copy_dense(ref.y_vector, aae.params["y"])
    for i, (lin_idx, bn_idx) in enumerate([(0, 1), (3, 4)]):
        _copy_dense(ref.decoder[lin_idx], aae.params["dec"][i]["dense"])
        _randomize_bn(
            ref.decoder[bn_idx], aae.params["dec"][i]["bn"],
            aae.bn_state["dec"][i], rng,
        )
    _copy_dense(ref.decoder[6], aae.params["dec_out"])
    for name in ("disc_z", "disc_y"):
        seq = getattr(ref, f"discriminator_{name[-1]}")
        for i, lin_idx in enumerate([0, 2, 4]):
            _copy_dense(seq[lin_idx], aae.params[name][i])
    return aae, ref


def make_batch(b=64, seed=1):
    rng = np.random.default_rng(seed)
    depths = rng.dirichlet(np.ones(S), b).astype(np.float32)
    tnf = rng.normal(size=(b, NTNF)).astype(np.float32)
    return depths, tnf


def test_encode_parity(models):
    aae, ref = models
    depths, tnf = make_batch()
    mu_j, lv_j, y_j, _ = aae.encode_apply(
        aae.params, aae.bn_state, depths, tnf, train=False
    )
    with torch.no_grad():
        mu_t, lv_t, y_t = ref.encode(torch.from_numpy(depths), torch.from_numpy(tnf))
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(), atol=2e-5)


def test_decode_parity(models):
    aae, ref = models
    rng = np.random.default_rng(2)
    z = rng.normal(size=(64, LD)).astype(np.float32)
    y = rng.dirichlet(np.ones(YLEN), 64).astype(np.float32)
    d_j, t_j, _ = aae.decode_apply(aae.params, aae.bn_state, z, y, train=False)
    with torch.no_grad():
        d_t, t_t = ref.decode(torch.from_numpy(z), torch.from_numpy(y))
    np.testing.assert_allclose(np.asarray(d_j), d_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(t_j), t_t.numpy(), atol=2e-4)


def test_discriminator_parity(models):
    aae, ref = models
    rng = np.random.default_rng(3)
    z = rng.normal(size=(64, LD)).astype(np.float32)
    y = rng.dirichlet(np.ones(YLEN), 64).astype(np.float32)
    dz_j = np.asarray(aae._disc(aae.params["disc_z"], z))
    dy_j = np.asarray(aae._disc(aae.params["disc_y"], y))
    with torch.no_grad():
        dz_t = ref.discriminator_z(torch.from_numpy(z)).numpy()
        dy_t = ref.discriminator_y(torch.from_numpy(y)).numpy()
    np.testing.assert_allclose(dz_j, dz_t, atol=1e-6)
    np.testing.assert_allclose(dy_j, dy_t, atol=1e-6)


def _reference_loss(depths_in, depths_out, tnf_in, tnf_out, nsamples, alpha):
    "Verbatim semantics of reference calc_loss (aamb_encode.py:176-188)."
    if nsamples > 1:
        ce = -((depths_out + 1e-9).log() * depths_in).sum(dim=1).mean()
        ce_weight = (1 - alpha) / np.log(nsamples)
    else:
        ce = (depths_out - depths_in).pow(2).sum(dim=1).mean()
        ce_weight = 1 - alpha
    sse = (tnf_out - tnf_in).pow(2).sum(dim=1).mean()
    sse_weight = alpha / (tnf_in.shape[1] * 2)
    return ce * ce_weight + sse * sse_weight, ce, sse


@pytest.mark.parametrize("nsamples", [1, S])
def test_loss_parity(nsamples):
    aae = AAE(nsamples=nsamples, nhiddens=H, nlatent_z=LD, nlatent_y=YLEN)
    rng = np.random.default_rng(4)
    d_in = rng.dirichlet(np.ones(max(nsamples, 2)), 64)[:, :nsamples].astype(
        np.float32
    )
    d_out = rng.dirichlet(np.ones(max(nsamples, 2)), 64)[:, :nsamples].astype(
        np.float32
    )
    t_in = rng.normal(size=(64, NTNF)).astype(np.float32)
    t_out = rng.normal(size=(64, NTNF)).astype(np.float32)
    got = [float(x) for x in aae.calc_loss(d_in, d_out, t_in, t_out)]
    expect = [
        float(x)
        for x in _reference_loss(
            *(torch.from_numpy(a) for a in (d_in, d_out, t_in, t_out)),
            nsamples, aae.alpha,
        )
    ]
    np.testing.assert_allclose(got, expect, rtol=2e-5)


def test_bce_matches_torch():
    rng = np.random.default_rng(5)
    pred = rng.uniform(1e-4, 1 - 1e-4, (64, 1)).astype(np.float32)
    for target in (np.zeros_like(pred), np.ones_like(pred)):
        got = float(AAE._bce(pred, target))
        expect = float(
            nn.BCELoss()(torch.from_numpy(pred), torch.from_numpy(target))
        )
        np.testing.assert_allclose(got, expect, rtol=1e-5)

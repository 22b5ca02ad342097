"""Full-model VAE parity: JAX implementation vs a torch transcription of
the reference architecture and loss (reference vamb/encode.py:149-357).

Layer primitives are cross-checked individually in test_layers.py; these
tests pin the COMPOSITION: the Linear->LeakyReLU->Dropout->BatchNorm stack
order, the softmax slice layout of the decoder output, and the exact loss
— including the reference's degenerate weighting, where the (B,) loss is
multiplied by the (B,1) weights column, broadcasting to (B, B), so the
mean equals mean(loss) * mean(weights) rather than a true weighted mean
(encode.py:349-351). The engine reproduces that semantics deliberately.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax

from vamb_tpu.models import VAE

S, NTNF, NLATENT = 4, 103, 8
NHIDDENS = [32, 16]


class TorchReferenceVAE(nn.Module):
    "Transcription of reference encode.py:149-314 (eval-path pieces)."

    def __init__(self):
        super().__init__()
        nfeat = S + NTNF + 1
        dims_e = [nfeat] + NHIDDENS
        self.encoderlayers = nn.ModuleList(
            nn.Linear(i, o) for i, o in zip(dims_e, dims_e[1:])
        )
        self.encodernorms = nn.ModuleList(nn.BatchNorm1d(o) for o in NHIDDENS)
        self.mu = nn.Linear(NHIDDENS[-1], NLATENT)
        dims_d = [NLATENT] + NHIDDENS[::-1]
        self.decoderlayers = nn.ModuleList(
            nn.Linear(i, o) for i, o in zip(dims_d, dims_d[1:])
        )
        self.decodernorms = nn.ModuleList(
            nn.BatchNorm1d(o) for o in NHIDDENS[::-1]
        )
        self.outputlayer = nn.Linear(NHIDDENS[0], nfeat)
        self.relu = nn.LeakyReLU()

    def forward(self, depths, tnf, abundance):
        x = torch.cat((depths, tnf, abundance), 1)
        for lin, norm in zip(self.encoderlayers, self.encodernorms):
            x = norm(self.relu(lin(x)))  # dropout is identity in eval
        mu = self.mu(x)
        x = mu
        for lin, norm in zip(self.decoderlayers, self.decodernorms):
            x = norm(self.relu(lin(x)))
        rec = self.outputlayer(x)
        depths_out = torch.softmax(rec.narrow(1, 0, S), dim=1)
        tnf_out = rec.narrow(1, S, NTNF)
        ab_out = rec.narrow(1, S + NTNF, 1)
        return depths_out, tnf_out, ab_out, mu


def reference_calc_loss(depths_in, depths_out, tnf_in, tnf_out, ab_in,
                        ab_out, mu, weights, alpha, beta):
    "Verbatim semantics of reference calc_loss (encode.py:316-357)."
    ab_sse = (ab_out - ab_in).pow(2).sum(dim=1)
    ce = -((depths_out + 1e-9).log() * depths_in).sum(dim=1)
    sse = (tnf_out - tnf_in).pow(2).sum(dim=1)
    kld = 0.5 * mu.pow(2).sum(dim=1)
    ce_weight = ((1 - alpha) * (S - 1)) / (S * np.log(S))
    ab_w = (1 - alpha) / S
    sse_w = alpha / NTNF
    kld_w = 1 / (NLATENT * beta)
    # weights is (B, 1): this broadcastingly forms a (B, B) matrix
    loss = (ce * ce_weight + ab_sse * ab_w + sse * sse_w + kld * kld_w) * weights
    assert loss.shape == (len(mu), len(mu))
    return (
        loss.mean(),
        (ab_sse * ab_w).mean(),
        (ce * ce_weight).mean(),
        (sse * sse_w).mean(),
        (kld * kld_w).mean(),
    )


@pytest.fixture(scope="module")
def models():
    vae = VAE(nsamples=S, nhiddens=NHIDDENS, nlatent=NLATENT, seed=3)
    ref = TorchReferenceVAE().eval()
    with torch.no_grad():
        for i, layer in enumerate(ref.encoderlayers):
            p = vae.params["enc"][i]["dense"]
            layer.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T.copy()))
            layer.bias.copy_(torch.from_numpy(np.asarray(p["b"]).copy()))
        for i, layer in enumerate(ref.decoderlayers):
            p = vae.params["dec"][i]["dense"]
            layer.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T.copy()))
            layer.bias.copy_(torch.from_numpy(np.asarray(p["b"]).copy()))
        ref.mu.weight.copy_(torch.from_numpy(np.asarray(vae.params["mu"]["w"]).T.copy()))
        ref.mu.bias.copy_(torch.from_numpy(np.asarray(vae.params["mu"]["b"]).copy()))
        ref.outputlayer.weight.copy_(
            torch.from_numpy(np.asarray(vae.params["out"]["w"]).T.copy())
        )
        ref.outputlayer.bias.copy_(
            torch.from_numpy(np.asarray(vae.params["out"]["b"]).copy())
        )
        # non-trivial BatchNorm parameters and running stats on both sides
        rng = np.random.default_rng(0)
        for stacks, norms in (("enc", ref.encodernorms), ("dec", ref.decodernorms)):
            for i, norm in enumerate(norms):
                n = norm.num_features
                scale = rng.uniform(0.5, 1.5, n).astype(np.float32)
                bias = rng.normal(0, 0.2, n).astype(np.float32)
                mean = rng.normal(0, 0.5, n).astype(np.float32)
                var = rng.uniform(0.5, 2.0, n).astype(np.float32)
                norm.weight.copy_(torch.from_numpy(scale))
                norm.bias.copy_(torch.from_numpy(bias))
                norm.running_mean.copy_(torch.from_numpy(mean))
                norm.running_var.copy_(torch.from_numpy(var))
                vae.params[stacks][i]["bn"]["scale"] = scale
                vae.params[stacks][i]["bn"]["bias"] = bias
                vae.bn_state[stacks][i]["mean"] = mean
                vae.bn_state[stacks][i]["var"] = var
    return vae, ref


def make_batch(b=64, seed=1):
    rng = np.random.default_rng(seed)
    depths = rng.dirichlet(np.ones(S), b).astype(np.float32)
    tnf = rng.normal(size=(b, NTNF)).astype(np.float32)
    ab = rng.normal(size=(b, 1)).astype(np.float32)
    weights = rng.uniform(0.5, 2.0, (b, 1)).astype(np.float32)
    return depths, tnf, ab, weights


def test_forward_parity(models):
    vae, ref = models
    depths, tnf, ab, _ = make_batch()
    (d_j, t_j, a_j, mu_j), _ = vae.apply(
        vae.params, vae.bn_state, depths, tnf, ab, train=False
    )
    with torch.no_grad():
        d_t, t_t, a_t, mu_t = ref(
            torch.from_numpy(depths), torch.from_numpy(tnf), torch.from_numpy(ab)
        )
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_j), d_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(t_j), t_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(a_j), a_t.numpy(), atol=2e-4)


def test_loss_parity_including_degenerate_weighting(models):
    vae, _ = models
    depths, tnf, ab, weights = make_batch(seed=2)
    rng = np.random.default_rng(3)
    d_out = rng.dirichlet(np.ones(S), 64).astype(np.float32)
    t_out = rng.normal(size=(64, NTNF)).astype(np.float32)
    a_out = rng.normal(size=(64, 1)).astype(np.float32)
    mu = rng.normal(size=(64, NLATENT)).astype(np.float32)

    got = [
        float(x)
        for x in vae.calc_loss(
            depths, d_out, tnf, t_out, ab, a_out, mu, weights
        )
    ]
    expect = [
        float(x)
        for x in reference_calc_loss(
            *(torch.from_numpy(a) for a in
              (depths, d_out, tnf, t_out, ab, a_out, mu, weights)),
            vae.alpha, vae.beta,
        )
    ]
    np.testing.assert_allclose(got, expect, rtol=2e-5)

"""VAEVAE (semi-supervised) parity: JAX composite vs torch transcriptions of
the reference losses and sub-VAE forward (reference
vamb/semisupervised_encode.py:79-86, 189-257, 700-827).

Covers kld_gauss, the labels-only sub-VAE loss (CrossEntropyLoss + mu-only
KLD), the joint loss with its symmetric kld_gauss pair and degenerate
(B,B)-broadcast weighting, the unsupervised feature loss, and a
weight-copied forward parity check of the labels sub-VAE stack.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from vamb_tpu.models.vaevae import VAEVAE, kld_gauss

S, NTNF, NLATENT = 4, 103, 8
NHIDDENS = [32, 16]
NLABELS = 110  # > 105 so n_input_labels == nlabels


def make_model(seed=13):
    return VAEVAE(
        nsamples=S,
        nlabels=NLABELS,
        nhiddens=NHIDDENS,
        nlatent=NLATENT,
        seed=seed,
    )


def torch_kld_gauss(p_mu, p_logstd, q_mu, q_logstd):
    "Verbatim semantics of reference kld_gauss (semisupervised_encode.py:79-86)."
    loss = (
        q_logstd
        - p_logstd
        + (p_logstd.exp().pow(2) + (p_mu - q_mu).pow(2)) / (2 * q_logstd.exp().pow(2))
        - 0.5
    )
    return loss.mean()


def test_kld_gauss_parity():
    rng = np.random.default_rng(0)
    args = [rng.normal(size=(32, NLATENT)).astype(np.float32) for _ in range(4)]
    args[1] *= 0.1  # logstds near zero
    args[3] *= 0.1
    got = float(kld_gauss(*args))
    expect = float(torch_kld_gauss(*(torch.from_numpy(a) for a in args)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def _label_batch(b=64, seed=1):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, NLABELS)).astype(np.float32)
    labels = rng.integers(0, NLABELS, b)
    onehot = np.eye(NLABELS, dtype=np.float32)[labels]
    mu = rng.normal(size=(b, NLATENT)).astype(np.float32)
    return logits, labels, onehot, mu


def test_labels_loss_parity():
    "Reference VAELabels.calc_loss (semisupervised_encode.py:248-257)."
    model = make_model()
    logits, labels, onehot, mu = _label_batch()
    got = [float(x) for x in model.calc_loss_labels(logits, onehot, mu)]

    t_logits = torch.from_numpy(logits)
    t_mu = torch.from_numpy(mu)
    logsigma = torch.zeros_like(t_mu)
    ce_labels = nn.CrossEntropyLoss()(t_logits, torch.from_numpy(labels))
    kld = -0.5 * (1 + logsigma - t_mu.pow(2) - logsigma.exp()).sum(dim=1).mean()
    loss = ce_labels + kld / (NLATENT * model.beta)
    np.testing.assert_allclose(
        got, [float(loss), float(ce_labels), float(kld)], rtol=1e-5
    )


def torch_calc_loss_joint(
    depths_in, depths_out, tnf_in, tnf_out, ab_in, ab_out,
    labels_in_onehot, labels_out, mu_sup, mu_vamb_unsup, mu_labels_unsup,
    weights, alpha, beta,
):
    "Verbatim semantics of reference calc_loss_joint (:762-827), logsigmas=0."
    ab_sse = (ab_out - ab_in).pow(2).sum(dim=1)
    ce = -((depths_out + 1e-9).log() * depths_in).sum(dim=1)
    sse = (tnf_out - tnf_in).pow(2).sum(dim=1)
    ce_weight = ((1 - alpha) * (S - 1)) / (S * np.log(S))
    ab_sse_weight = (1 - alpha) / S
    sse_weight = alpha / NTNF
    _, labels_in_indices = labels_in_onehot.max(dim=1)
    ce_labels = nn.CrossEntropyLoss()(labels_out, labels_in_indices)
    reconstruction_loss = (
        ce * ce_weight + ab_sse * ab_sse_weight + sse * sse_weight + ce_labels
    )
    zeros = torch.zeros_like(mu_sup)
    kld_vamb = torch_kld_gauss(mu_sup, zeros, mu_vamb_unsup, zeros)
    kld_labels = torch_kld_gauss(mu_sup, zeros, mu_labels_unsup, zeros)
    kld_loss = (kld_vamb + kld_labels) / (NLATENT * beta)
    loss = (reconstruction_loss + kld_loss) * weights
    assert loss.shape == (len(mu_sup), len(mu_sup))  # the (B,B) broadcast
    return (
        loss.mean(), ce.mean(), sse.mean(), ce_labels, kld_vamb, kld_labels,
    )


def test_joint_loss_parity():
    model = make_model()
    rng = np.random.default_rng(2)
    b = 64
    d_in = rng.dirichlet(np.ones(S), b).astype(np.float32)
    d_out = rng.dirichlet(np.ones(S), b).astype(np.float32)
    t_in = rng.normal(size=(b, NTNF)).astype(np.float32)
    t_out = rng.normal(size=(b, NTNF)).astype(np.float32)
    a_in = rng.normal(size=(b, 1)).astype(np.float32)
    a_out = rng.normal(size=(b, 1)).astype(np.float32)
    logits, labels, onehot, _ = _label_batch(b, seed=3)
    mu_sup = rng.normal(size=(b, NLATENT)).astype(np.float32)
    mu_vamb = rng.normal(size=(b, NLATENT)).astype(np.float32)
    mu_lab = rng.normal(size=(b, NLATENT)).astype(np.float32)
    weights = rng.uniform(0.5, 2.0, (b, 1)).astype(np.float32)

    got = [
        float(x)
        for x in model.calc_loss_joint(
            d_in, d_out, t_in, t_out, a_in, a_out, logits, onehot,
            mu_sup, mu_vamb, mu_lab, weights,
        )
    ]
    expect = [
        float(x)
        for x in torch_calc_loss_joint(
            *(torch.from_numpy(a) for a in
              (d_in, d_out, t_in, t_out, a_in, a_out, onehot, logits,
               mu_sup, mu_vamb, mu_lab, weights)),
            model.alpha, model.beta,
        )
    ]
    np.testing.assert_allclose(got, expect, rtol=3e-5)


def test_unsup_vamb_loss_matches_vae_semantics():
    """_vamb_loss must equal the plain VAE loss incl. the degenerate
    weighting (reference delegates to VAEVamb.calc_loss, encode.py:316-357)."""
    from tests.test_parity_vae import reference_calc_loss

    model = make_model()
    rng = np.random.default_rng(4)
    b = 64
    d_in = rng.dirichlet(np.ones(S), b).astype(np.float32)
    d_out = rng.dirichlet(np.ones(S), b).astype(np.float32)
    t_in = rng.normal(size=(b, NTNF)).astype(np.float32)
    t_out = rng.normal(size=(b, NTNF)).astype(np.float32)
    a_in = rng.normal(size=(b, 1)).astype(np.float32)
    a_out = rng.normal(size=(b, 1)).astype(np.float32)
    mu = rng.normal(size=(b, NLATENT)).astype(np.float32)
    weights = rng.uniform(0.5, 2.0, (b, 1)).astype(np.float32)

    loss, ce, sse, kld = model._vamb_loss(
        d_in, d_out, t_in, t_out, a_in, a_out, mu, weights
    )
    ref = reference_calc_loss(
        *(torch.from_numpy(a) for a in
          (d_in, d_out, t_in, t_out, a_in, a_out, mu, weights)),
        model.alpha, model.beta,
    )
    np.testing.assert_allclose(float(loss), float(ref[0]), rtol=2e-5)


def test_labels_subvae_forward_parity():
    """The labels sub-VAE stack with copied weights vs a torch transcription
    of VAELabels' forward (eval path; semisupervised_encode.py:226-245)."""
    model = make_model()
    sub = model.labels_vae
    params = model.params["labels"]
    bn = model.bn_state["labels"]

    enc_lins = [
        nn.Linear(i, o)
        for i, o in zip([NLABELS] + NHIDDENS, NHIDDENS)
    ]
    enc_norms = [nn.BatchNorm1d(o).eval() for o in NHIDDENS]
    mu_lin = nn.Linear(NHIDDENS[-1], NLATENT)
    dec_lins = [
        nn.Linear(i, o)
        for i, o in zip([NLATENT] + NHIDDENS[::-1], NHIDDENS[::-1])
    ]
    dec_norms = [nn.BatchNorm1d(o).eval() for o in NHIDDENS[::-1]]
    out_lin = nn.Linear(NHIDDENS[0], NLABELS)

    rng = np.random.default_rng(17)
    with torch.no_grad():
        for stack, lins, norms, states in (
            ("enc", enc_lins, enc_norms, bn["enc"]),
            ("dec", dec_lins, dec_norms, bn["dec"]),
        ):
            for i, (lin, norm) in enumerate(zip(lins, norms)):
                p = params[stack][i]["dense"]
                lin.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T.copy()))
                lin.bias.copy_(torch.from_numpy(np.asarray(p["b"]).copy()))
                n = norm.num_features
                scale = rng.uniform(0.5, 1.5, n).astype(np.float32)
                bias = rng.normal(0, 0.2, n).astype(np.float32)
                mean = rng.normal(0, 0.5, n).astype(np.float32)
                var = rng.uniform(0.5, 2.0, n).astype(np.float32)
                norm.weight.copy_(torch.from_numpy(scale))
                norm.bias.copy_(torch.from_numpy(bias))
                norm.running_mean.copy_(torch.from_numpy(mean))
                norm.running_var.copy_(torch.from_numpy(var))
                params[stack][i]["bn"]["scale"] = scale
                params[stack][i]["bn"]["bias"] = bias
                states[i]["mean"] = mean
                states[i]["var"] = var
        mu_lin.weight.copy_(torch.from_numpy(np.asarray(params["mu"]["w"]).T.copy()))
        mu_lin.bias.copy_(torch.from_numpy(np.asarray(params["mu"]["b"]).copy()))
        out_lin.weight.copy_(torch.from_numpy(np.asarray(params["out"]["w"]).T.copy()))
        out_lin.bias.copy_(torch.from_numpy(np.asarray(params["out"]["b"]).copy()))

    onehot = np.eye(NLABELS, dtype=np.float32)[
        np.random.default_rng(5).integers(0, NLABELS, 48)
    ]
    mu_j, _ = sub.encode(params, bn, onehot, train=False)
    latent = np.array(mu_j)
    logits_j, _ = sub.decode(params, bn, latent, train=False)

    with torch.no_grad():
        x = torch.from_numpy(onehot)
        for lin, norm in zip(enc_lins, enc_norms):
            x = norm(F.leaky_relu(lin(x)))
        mu_t = mu_lin(x)
        x = torch.from_numpy(latent)
        for lin, norm in zip(dec_lins, dec_norms):
            x = norm(F.leaky_relu(lin(x)))
        logits_t = out_lin(x)

    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(), atol=2e-4)

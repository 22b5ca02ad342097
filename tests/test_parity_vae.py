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

    def forward(self, depths, tnf, abundance, noise=None, enc_masks=None,
                dec_masks=None):
        """Eval forward by default; the lockstep training test passes
        `noise` (latent eps) and pre-scaled multiplicative dropout masks so
        the stochastic train-mode pass consumes an injected random stream
        identical to the JAX side's (reference train path:
        encode.py:259-314 with Dropout active and reparameterize at :276).
        """
        x = torch.cat((depths, tnf, abundance), 1)
        for i, (lin, norm) in enumerate(zip(self.encoderlayers, self.encodernorms)):
            x = self.relu(lin(x))
            if enc_masks is not None:
                x = x * enc_masks[i]
            x = norm(x)
        mu = self.mu(x)
        x = mu if noise is None else mu + noise
        for i, (lin, norm) in enumerate(zip(self.decoderlayers, self.decodernorms)):
            x = self.relu(lin(x))
            if dec_masks is not None:
                x = x * dec_masks[i]
            x = norm(x)
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


def _copy_dense_params(vae, ref):
    "Copy the JAX VAE's Linear weights/biases into the torch transcription."
    with torch.no_grad():
        for stack, torch_layers in (
            ("enc", ref.encoderlayers),
            ("dec", ref.decoderlayers),
        ):
            for i, layer in enumerate(torch_layers):
                p = vae.params[stack][i]["dense"]
                layer.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T.copy()))
                layer.bias.copy_(torch.from_numpy(np.asarray(p["b"]).copy()))
        for name, layer in (("mu", ref.mu), ("out", ref.outputlayer)):
            p = vae.params[name]
            layer.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T.copy()))
            layer.bias.copy_(torch.from_numpy(np.asarray(p["b"]).copy()))


def test_training_lockstep():
    """Train the torch transcription and the JAX VAE side by side on
    identical data with injected identical latent noise and dropout masks,
    D-Adaptation Adam on both sides (torch grads stepped by the independent
    numpy oracle of test_optim.py; JAX by the production optax
    transformation). Asserts per-epoch loss/d/parameter/BN-stat agreement
    at float32-ulp scale, final latents to tolerance, and downstream bins
    exactly — the full init/forward/loss/optimizer/BN chain of reference
    encode.py:359-440 (trainepoch) and :543-610 (trainmodel, DAdaptAdam at
    :578).

    Window length: 4 epochs (32 optimizer steps). Measured drift on this
    trajectory is ulp-scale through epoch 3 (max parameter deviation
    9.8e-7, d deviation 7e-7 relative) and then grows EXPONENTIALLY
    (9e-5 at epoch 4, 2.3e-1 at epoch 11) — adaptive-optimizer + BatchNorm
    training is chaotic, so any ulp-level arithmetic difference between two
    correct implementations eventually separates trajectories. A semantics
    bug (wrong momentum/variance bias/loss weight/optimizer term) shows up
    in epoch 0-1 at 1e-3+ magnitude, far above these gates. The reference
    draws the same conclusion for torch alone across platforms
    (test_results.py:11-15: "PyTorch cannot be made stable").
    """
    import jax

    from .test_optim import NumpyDAdaptAdamOracle
    from vamb_tpu.optim import dadapt_adam

    N, B, EPOCHS = 256, 32, 4
    DROP = 0.2
    rng = np.random.default_rng(11)

    # data with real latent-space structure (8 abundance groups) so the
    # final clustering comparison has margins instead of knife edges
    group = rng.integers(0, 8, N)
    profiles = rng.dirichlet(np.ones(S) * 0.4, 8).astype(np.float32)
    depths = (profiles[group] + rng.uniform(0, 0.02, (N, S))).astype(np.float32)
    depths /= depths.sum(1, keepdims=True)
    tnf = (rng.normal(size=(8, NTNF))[group] * 0.5
           + 0.1 * rng.normal(size=(N, NTNF))).astype(np.float32)
    ab = rng.normal(size=(N, 1)).astype(np.float32)
    weights = rng.uniform(0.5, 2.0, (N, 1)).astype(np.float32)

    vae = VAE(nsamples=S, nhiddens=NHIDDENS, nlatent=NLATENT, seed=7,
              dropout=DROP)
    ref = TorchReferenceVAE()
    _copy_dense_params(vae, ref)

    # torch parameter list in a fixed order; the D-Adaptation estimate
    # couples all parameters only through global sums, so ordering and the
    # weight transpose are immaterial to the oracle
    torch_params = []
    for i in range(len(NHIDDENS)):
        torch_params += [ref.encoderlayers[i].weight, ref.encoderlayers[i].bias,
                         ref.encodernorms[i].weight, ref.encodernorms[i].bias]
    torch_params += [ref.mu.weight, ref.mu.bias]
    for i in range(len(NHIDDENS)):
        torch_params += [ref.decoderlayers[i].weight, ref.decoderlayers[i].bias,
                         ref.decodernorms[i].weight, ref.decodernorms[i].bias]
    torch_params += [ref.outputlayer.weight, ref.outputlayer.bias]
    oracle = NumpyDAdaptAdamOracle([tuple(p.shape) for p in torch_params])

    opt = dadapt_adam()
    params, bn_state = vae.params, vae.bn_state
    opt_state = opt.init(params)

    @jax.jit
    def jax_step(params, bn_state, opt_state, batch, inject):
        d_in, t_in, a_in, w = batch

        def loss_fn(params, bn_state):
            (d, t, a, mu), new_state = vae.apply(
                params, bn_state, d_in, t_in, a_in, train=True, inject=inject
            )
            loss, *_ = vae.calc_loss(d_in, d, t_in, t, a_in, a, mu, w)
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, bn_state)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_state, opt_state, loss

    enc_widths = NHIDDENS
    dec_widths = NHIDDENS[::-1]
    keep_scale = np.float32(1.0 / (1.0 - DROP))
    ref.train()
    for epoch in range(EPOCHS):
        perm = rng.permutation(N)
        for b in range(N // B):
            idx = perm[b * B : (b + 1) * B]
            eps = rng.standard_normal((B, NLATENT)).astype(np.float32)
            enc_masks = [
                (rng.random((B, w)) >= DROP).astype(np.float32) * keep_scale
                for w in enc_widths
            ]
            dec_masks = [
                (rng.random((B, w)) >= DROP).astype(np.float32) * keep_scale
                for w in dec_widths
            ]
            batch = (depths[idx], tnf[idx], ab[idx], weights[idx])
            inject = {"eps": eps, "enc_masks": enc_masks, "dec_masks": dec_masks}
            params, bn_state, opt_state, jloss = jax_step(
                params, bn_state, opt_state, batch, inject
            )

            t_batch = [torch.from_numpy(a) for a in batch]
            masks_t = [torch.from_numpy(m) for m in enc_masks]
            dmasks_t = [torch.from_numpy(m) for m in dec_masks]
            d_o, t_o, a_o, mu_o = ref(
                t_batch[0], t_batch[1], t_batch[2],
                noise=torch.from_numpy(eps),
                enc_masks=masks_t, dec_masks=dmasks_t,
            )
            tloss, *_ = reference_calc_loss(
                t_batch[0], d_o, t_batch[1], t_o, t_batch[2], a_o, mu_o,
                t_batch[3], vae.alpha, vae.beta,
            )
            ref.zero_grad()
            tloss.backward()
            new_vals = oracle.step(
                [p.detach().numpy().copy() for p in torch_params],
                [p.grad.numpy().copy() for p in torch_params],
            )
            with torch.no_grad():
                for p, v in zip(torch_params, new_vals):
                    p.copy_(torch.from_numpy(v))
            np.testing.assert_allclose(
                float(jloss), float(tloss.detach()), rtol=1e-4,
                err_msg=f"loss drift at epoch {epoch} batch {b}",
            )

        # per-epoch drift gates at ulp scale (measured max through epoch 3
        # is ~1e-6; gates leave ~30x margin for BLAS variation across
        # machines): a drifting component fails HERE, not as an
        # inscrutable end-state mismatch
        np.testing.assert_allclose(
            float(opt_state.d), oracle.d, rtol=1e-4,
            err_msg=f"D-Adaptation d drift at epoch {epoch}",
        )
        for i in range(len(NHIDDENS)):
            np.testing.assert_allclose(
                np.asarray(params["enc"][i]["dense"]["w"]),
                ref.encoderlayers[i].weight.detach().numpy().T,
                atol=3e-5, err_msg=f"enc{i} weights drift at epoch {epoch}",
            )
            np.testing.assert_allclose(
                np.asarray(bn_state["enc"][i]["mean"]),
                ref.encodernorms[i].running_mean.numpy(),
                atol=3e-5, err_msg=f"enc{i} BN mean drift at epoch {epoch}",
            )
            np.testing.assert_allclose(
                np.asarray(bn_state["enc"][i]["var"]),
                ref.encodernorms[i].running_var.numpy(),
                atol=3e-5, err_msg=f"enc{i} BN var drift at epoch {epoch}",
            )
        np.testing.assert_allclose(
            np.asarray(params["out"]["w"]),
            ref.outputlayer.weight.detach().numpy().T,
            atol=3e-5, err_msg=f"output weights drift at epoch {epoch}",
        )

    # final latents: eval-mode encode on the full dataset, both frameworks
    vae.params, vae.bn_state = params, bn_state
    (_, _, _, mu_jax), _ = vae.apply(
        params, bn_state, depths, tnf, ab, train=False
    )
    ref.eval()
    with torch.no_grad():
        _, _, _, mu_torch = ref(
            torch.from_numpy(depths), torch.from_numpy(tnf),
            torch.from_numpy(ab),
        )
    latent_jax = np.asarray(mu_jax)
    latent_torch = mu_torch.numpy()
    np.testing.assert_allclose(latent_jax, latent_torch, atol=1e-4)

    # downstream bins must agree exactly: cluster both latent matrices with
    # the engine and compare the emitted partitions
    from vamb_tpu.cluster import ClusterGenerator
    from vamb_tpu.utils import mask_lower_bits

    lengths = rng.integers(2000, 10_000, N)
    partitions = []
    for latent in (latent_jax, latent_torch):
        latent = latent.copy()
        mask_lower_bits(latent, 12)
        gen = ClusterGenerator(latent, lengths, rng_seed=9)
        partitions.append(
            sorted(tuple(sorted(int(i) for i in cl.members)) for cl in gen)
        )
    assert partitions[0] == partitions[1], "bins diverged between frameworks"


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

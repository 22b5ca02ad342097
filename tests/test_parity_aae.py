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


def test_training_lockstep(models):
    """Lockstep the full 3-phase adversarial training step against a torch
    transcription of the reference loop (reference aamb_encode.py:203-417):
    identical parameters, identical injected eps/prior randomness, four
    Adam optimizers partitioned as the reference partitions them. Pins the
    step ORDERING semantics the forward-parity tests cannot see: generator
    update first, then disc-z on a fresh encode of the updated encoder,
    then disc-y (gradients stopped at the latents), BN batch-stats
    backprop, and the optimizer-partition boundaries."""
    import jax
    import jax.numpy as jnp
    import optax

    aae, ref = models
    torch_m = TorchReferenceAAE().train()
    # copy the shared fixture params into the fresh torch module
    for i, (lin_idx, bn_idx) in enumerate([(0, 1), (3, 4)]):
        _copy_dense(torch_m.encoder[lin_idx], aae.params["enc"][i]["dense"])
        bn = torch_m.encoder[bn_idx]
        with torch.no_grad():
            bn.weight.copy_(torch.from_numpy(aae.params["enc"][i]["bn"]["scale"]))
            bn.bias.copy_(torch.from_numpy(aae.params["enc"][i]["bn"]["bias"]))
            bn.running_mean.copy_(torch.from_numpy(aae.bn_state["enc"][i]["mean"]))
            bn.running_var.copy_(torch.from_numpy(aae.bn_state["enc"][i]["var"]))
    _copy_dense(torch_m.mu, aae.params["mu"])
    _copy_dense(torch_m.logvar, aae.params["logvar"])
    _copy_dense(torch_m.y_vector, aae.params["y"])
    for i, (lin_idx, bn_idx) in enumerate([(0, 1), (3, 4)]):
        _copy_dense(torch_m.decoder[lin_idx], aae.params["dec"][i]["dense"])
        bn = torch_m.decoder[bn_idx]
        with torch.no_grad():
            bn.weight.copy_(torch.from_numpy(aae.params["dec"][i]["bn"]["scale"]))
            bn.bias.copy_(torch.from_numpy(aae.params["dec"][i]["bn"]["bias"]))
            bn.running_mean.copy_(torch.from_numpy(aae.bn_state["dec"][i]["mean"]))
            bn.running_var.copy_(torch.from_numpy(aae.bn_state["dec"][i]["var"]))
    _copy_dense(torch_m.decoder[6], aae.params["dec_out"])
    for name in ("disc_z", "disc_y"):
        seq = getattr(torch_m, f"discriminator_{name[-1]}")
        for i, lin_idx in enumerate([0, 2, 4]):
            _copy_dense(seq[lin_idx], aae.params[name][i])

    BS, STEPS = 32, 6
    SL, SLR, ALPHA_W, T = 0.00964, 0.5, aae.alpha, 0.1596
    rng = np.random.default_rng(77)
    batches, noises = [], []
    for _ in range(STEPS):
        batches.append(make_batch(BS, seed=int(rng.integers(1 << 30))))
        noises.append(dict(
            eps=rng.normal(size=(BS, LD)).astype(np.float32),
            eps2=rng.normal(size=(BS, LD)).astype(np.float32),
            z_prior=rng.normal(size=(BS, LD)).astype(np.float32),
            g=rng.gumbel(size=(BS, YLEN)).astype(np.float32),
        ))

    # ---- torch side: reference loop transcription
    opt_e = torch.optim.Adam(
        [p for n, p in torch_m.named_parameters() if "encoder" in n], lr=1e-3)
    opt_d = torch.optim.Adam(
        [p for n, p in torch_m.named_parameters()
         if not any(k in n for k in ("encoder", "discriminator"))], lr=1e-3)
    opt_dz = torch.optim.Adam(
        [p for n, p in torch_m.named_parameters() if "discriminator_z" in n],
        lr=1e-3)
    opt_dy = torch.optim.Adam(
        [p for n, p in torch_m.named_parameters() if "discriminator_y" in n],
        lr=1e-3)
    bce = nn.BCELoss()
    ce_w = (1 - ALPHA_W) / np.log(S)
    sse_w = ALPHA_W / (NTNF * 2)
    t_metrics = []
    for i in range(STEPS):
        d_in = torch.from_numpy(batches[i][0])
        t_in = torch.from_numpy(batches[i][1])
        nz = noises[i]
        ones = torch.ones(BS, 1)
        zeros = torch.zeros(BS, 1)
        opt_e.zero_grad(); opt_d.zero_grad()
        mu, logvar, y = torch_m.encode(d_in, t_in)
        z = torch.from_numpy(nz["eps"]) * torch.exp(logvar / 2) + mu
        d_out, t_out = torch_m.decode(z, y)
        ce = -((d_out + 1e-9).log() * d_in).sum(dim=1).mean()
        sse = (t_out - t_in).pow(2).sum(dim=1).mean()
        rec = ce * ce_w + sse * sse_w
        ed = ((1 - SL) * rec
              + SL * SLR * bce(torch_m.discriminator_z(z), ones)
              + SL * (1 - SLR) * bce(torch_m.discriminator_y(y), ones))
        ed.backward(); opt_e.step(); opt_d.step()
        opt_dz.zero_grad()
        mu2, logvar2, ylat = torch_m.encode(d_in, t_in)
        z_lat = torch.from_numpy(nz["eps2"]) * torch.exp(logvar2 / 2) + mu2
        dzl = 0.5 * (bce(torch_m.discriminator_z(torch.from_numpy(nz["z_prior"])), ones)
                     + bce(torch_m.discriminator_z(z_lat), zeros))
        dzl.backward(); opt_dz.step()
        opt_dy.zero_grad()
        ylat2 = torch_m.encode(d_in, t_in)[2]
        y_prior = F.softmax(torch.from_numpy(nz["g"]) / T, dim=1)
        dyl = 0.5 * (bce(torch_m.discriminator_y(y_prior), ones)
                     + bce(torch_m.discriminator_y(ylat2), zeros))
        dyl.backward(); opt_dy.step()
        t_metrics.append((float(ed.detach()), float(dzl.detach()), float(dyl.detach())))

    # ---- jax side: this repo's step semantics with the same injections
    enc_keys = ("enc", "mu", "logvar", "y")
    dec_keys = ("dec", "dec_out")
    sp = lambda p: ({k: p[k] for k in enc_keys}, {k: p[k] for k in dec_keys})
    oe = optax.adam(1e-3, eps=1e-8); od = optax.adam(1e-3, eps=1e-8)
    oz = optax.adam(1e-3, eps=1e-8); oy = optax.adam(1e-3, eps=1e-8)
    params, bn_state = aae.params, aae.bn_state
    e_p, d_p = sp(params)
    st = (oe.init(e_p), od.init(d_p),
          oz.init(params["disc_z"]), oy.init(params["disc_y"]))

    def step(params, bn_state, st, d_in, t_in, eps, eps2, z_prior, g):
        st_e, st_d, st_dz, st_dy = st
        ones = jnp.ones((BS, 1)); zeros = jnp.zeros((BS, 1))

        def gen_loss(gp, bn_state):
            pf = {**params, **gp}
            mu, logvar, y, enc_s = aae.encode_apply(pf, bn_state, d_in, t_in, True)
            z = eps * jnp.exp(logvar / 2) + mu
            d_out, t_out, dec_s = aae.decode_apply(pf, bn_state, z, y, True)
            rec, _, _ = aae.calc_loss(d_in, d_out, t_in, t_out)
            ed = ((1 - SL) * rec
                  + SL * SLR * aae._bce(aae._disc(params["disc_z"], z), ones)
                  + SL * (1 - SLR) * aae._bce(aae._disc(params["disc_y"], y), ones))
            return ed, {"enc": enc_s, "dec": dec_s}
        e_p, d_p = sp(params)
        (ed, bn2), grads = jax.value_and_grad(gen_loss, has_aux=True)(
            {**e_p, **d_p}, bn_state)
        ue, st_e = oe.update({k: grads[k] for k in enc_keys}, st_e, e_p)
        ud, st_d = od.update({k: grads[k] for k in dec_keys}, st_d, d_p)
        params = {**params, **optax.apply_updates(e_p, ue),
                  **optax.apply_updates(d_p, ud)}
        bn_state = bn2
        mu2, logvar2, ylat, enc_s = aae.encode_apply(
            params, bn_state, d_in, t_in, True)
        bn_state = {"enc": enc_s, "dec": bn_state["dec"]}
        z_lat = jax.lax.stop_gradient(eps2 * jnp.exp(logvar2 / 2) + mu2)
        y_lat = jax.lax.stop_gradient(ylat)
        y_prior = jax.nn.softmax(g / T, axis=1)

        def dz_loss(dz):
            return 0.5 * (aae._bce(aae._disc(dz, z_prior), ones)
                          + aae._bce(aae._disc(dz, z_lat), zeros))
        dzv, gz = jax.value_and_grad(dz_loss)(params["disc_z"])
        uz, st_dz = oz.update(gz, st_dz, params["disc_z"])
        params = {**params, "disc_z": optax.apply_updates(params["disc_z"], uz)}

        # third train-mode encode mirrors the reference's disc-y phase
        # (only the encoder BN running-stat EMA advances again)
        _, _, _, enc_s3 = aae.encode_apply(params, bn_state, d_in, t_in, True)
        bn_state = {"enc": enc_s3, "dec": bn_state["dec"]}

        def dy_loss(dy):
            return 0.5 * (aae._bce(aae._disc(dy, y_prior), ones)
                          + aae._bce(aae._disc(dy, y_lat), zeros))
        dyv, gy = jax.value_and_grad(dy_loss)(params["disc_y"])
        uy, st_dy = oy.update(gy, st_dy, params["disc_y"])
        params = {**params, "disc_y": optax.apply_updates(params["disc_y"], uy)}
        return params, bn_state, (st_e, st_d, st_dz, st_dy), (ed, dzv, dyv)

    for i in range(STEPS):
        nz = noises[i]
        params, bn_state, st, m = step(
            params, bn_state, st, batches[i][0], batches[i][1],
            nz["eps"], nz["eps2"], nz["z_prior"], nz["g"])
        ed_t, dz_t, dy_t = t_metrics[i]
        assert abs(float(m[0]) - ed_t) < 2e-4, (i, float(m[0]), ed_t)
        assert abs(float(m[1]) - dz_t) < 2e-4, (i, float(m[1]), dz_t)
        assert abs(float(m[2]) - dy_t) < 2e-4, (i, float(m[2]), dy_t)

    # final parameters agree everywhere after 6 lockstep steps
    def tmax(a, b):
        return float(np.abs(np.asarray(a) - b.detach().numpy()).max())
    assert tmax(np.asarray(params["mu"]["w"]).T, torch_m.mu.weight) < 1e-4
    assert tmax(np.asarray(params["logvar"]["w"]).T, torch_m.logvar.weight) < 1e-4
    assert tmax(np.asarray(params["dec_out"]["w"]).T, torch_m.decoder[6].weight) < 1e-4
    assert tmax(np.asarray(params["disc_z"][0]["w"]).T,
                torch_m.discriminator_z[0].weight) < 1e-4

    # BN running stats agree too — they see THREE train-mode encodes per
    # step in the reference (gen, disc-z, disc-y), and eval-mode latents
    # normalize with them, so latent parity needs the same update count
    for i, bn_idx in enumerate([1, 4]):
        bn = torch_m.encoder[bn_idx]
        dm = tmax(bn_state["enc"][i]["mean"], bn.running_mean)
        dv = tmax(bn_state["enc"][i]["var"], bn.running_var)
        assert dm < 1e-3, (i, dm)
        assert dv < 1e-3, (i, dv)
    for i, bn_idx in enumerate([1, 4]):
        bn = torch_m.decoder[bn_idx]
        dm = tmax(bn_state["dec"][i]["mean"], bn.running_mean)
        dv = tmax(bn_state["dec"][i]["var"], bn.running_var)
        assert dm < 1e-3, (i, dm)
        assert dv < 1e-3, (i, dv)

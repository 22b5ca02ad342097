"""Lockstep the AAE 3-phase training step: torch transcription of the
reference loop (aamb_encode.py:203-417) vs this repo's step semantics,
identical init params and injected randomness, compared per step."""
import sys
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax, jax.numpy as jnp, optax

sys.path.insert(0, '/root/repo')
from vamb_tpu.models.aae import AAE
from vamb_tpu.models.dataset import make_dataset

S = 5
H, LD, YLEN = 547, 283, 700
BS = 256
STEPS = 8
SL, SLR, ALPHA, T = 0.00964, 0.5, 0.15, 0.1596


class TorchAAE(nn.Module):
    def __init__(self):
        super().__init__()
        input_len = 103 + S
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
        self.discriminator_z = nn.Sequential(
            nn.Linear(LD, H), nn.LeakyReLU(),
            nn.Linear(H, H // 2), nn.LeakyReLU(),
            nn.Linear(H // 2, 1), nn.Sigmoid(),
        )
        self.discriminator_y = nn.Sequential(
            nn.Linear(YLEN, H), nn.LeakyReLU(),
            nn.Linear(H, H // 2), nn.LeakyReLU(),
            nn.Linear(H // 2, 1), nn.Sigmoid(),
        )

    def _encode(self, depths, tnfs):
        x = self.encoder(torch.cat((depths, tnfs), 1))
        return self.mu(x), self.logvar(x), F.softmax(self.y_vector(x), dim=1)

    def _decode(self, z, y):
        rec = self.decoder(torch.cat((z, y), 1))
        return F.softmax(rec[:, :S], dim=1), rec[:, S:]

    def calc_loss(self, d_in, d_out, t_in, t_out):
        ce = -((d_out + 1e-9).log() * d_in).sum(dim=1).mean()
        ce_w = (1 - ALPHA) / np.log(S)
        sse = (t_out - t_in).pow(2).sum(dim=1).mean()
        sse_w = ALPHA / (103 * 2)
        return ce * ce_w + sse * sse_w, ce, sse


def set_torch_from_jax(tm, params):
    def cp(mod, p):
        mod.weight.data = torch.from_numpy(np.asarray(p["w"]).T.copy())
        mod.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())
    for i, blk in enumerate(params["enc"]):
        cp(tm.encoder[3 * i], blk["dense"])
        bn = tm.encoder[3 * i + 1]
        bn.weight.data = torch.from_numpy(np.asarray(blk["bn"]["scale"]).copy())
        bn.bias.data = torch.from_numpy(np.asarray(blk["bn"]["bias"]).copy())
    cp(tm.mu, params["mu"]); cp(tm.logvar, params["logvar"]); cp(tm.y_vector, params["y"])
    for i, blk in enumerate(params["dec"]):
        cp(tm.decoder[3 * i], blk["dense"])
        bn = tm.decoder[3 * i + 1]
        bn.weight.data = torch.from_numpy(np.asarray(blk["bn"]["scale"]).copy())
        bn.bias.data = torch.from_numpy(np.asarray(blk["bn"]["bias"]).copy())
    cp(tm.decoder[6], params["dec_out"])
    for d, name in ((tm.discriminator_z, "disc_z"), (tm.discriminator_y, "disc_y")):
        for j, li in enumerate((0, 2, 4)):
            cp(d[li], params[name][j])


def main():
    comp = np.load('/tmp/h2h_avamb/tpuout/composition.npz', allow_pickle=True)
    ab = np.load('/tmp/h2h_avamb/tpuout/abundance.npz', allow_pickle=True)
    ds = make_dataset(ab['matrix'].copy(), comp['matrix'].copy(), comp['lengths'].copy())
    aae = AAE(nsamples=S, seed=1)
    tm = TorchAAE()
    set_torch_from_jax(tm, aae.params)
    tm.train()

    rng = np.random.default_rng(42)
    batches, noises = [], []
    for i in range(STEPS):
        idx = rng.integers(0, ds.n_obs, BS)
        batches.append((ds.depths[idx].copy(), ds.tnf[idx].copy()))
        noises.append(dict(
            eps=rng.normal(size=(BS, LD)).astype(np.float32),
            eps2=rng.normal(size=(BS, LD)).astype(np.float32),
            z_prior=rng.normal(size=(BS, LD)).astype(np.float32),
            g=rng.gumbel(size=(BS, YLEN)).astype(np.float32),
        ))

    # ---------------- torch side (transcribed reference loop) ----------------
    opt_e = torch.optim.Adam(
        [p for n, p in tm.named_parameters() if "encoder" in n], lr=1e-3)
    opt_d = torch.optim.Adam(
        [p for n, p in tm.named_parameters()
         if not any(k in n for k in ("encoder", "discriminator"))], lr=1e-3)
    opt_dz = torch.optim.Adam(
        [p for n, p in tm.named_parameters() if "discriminator_z" in n], lr=1e-3)
    opt_dy = torch.optim.Adam(
        [p for n, p in tm.named_parameters() if "discriminator_y" in n], lr=1e-3)
    bce = nn.BCELoss()
    t_log = []
    for i in range(STEPS):
        d_in = torch.from_numpy(batches[i][0]); t_in = torch.from_numpy(batches[i][1])
        nz = noises[i]
        ones = torch.ones(BS, 1); zeros = torch.zeros(BS, 1)
        opt_e.zero_grad(); opt_d.zero_grad()
        mu, logvar, y = tm._encode(d_in, t_in)
        z = torch.from_numpy(nz["eps"]) * torch.exp(logvar / 2) + mu
        d_out, t_out = tm._decode(z, y)
        vae_loss, ce, sse = tm.calc_loss(d_in, d_out, t_in, t_out)
        adv_z = bce(tm.discriminator_z(z), ones)
        adv_y = bce(tm.discriminator_y(y), ones)
        ed = (1 - SL) * vae_loss + SL * SLR * adv_z + SL * (1 - SLR) * adv_y
        ed.backward(); opt_e.step(); opt_d.step()

        opt_dz.zero_grad()
        mu2, logvar2, ylat = tm._encode(d_in, t_in)
        z_lat = torch.from_numpy(nz["eps2"]) * torch.exp(logvar2 / 2) + mu2
        dzl = 0.5 * (bce(tm.discriminator_z(torch.from_numpy(nz["z_prior"])), ones)
                     + bce(tm.discriminator_z(z_lat), zeros))
        dzl.backward(); opt_dz.step()

        opt_dy.zero_grad()
        ylat2 = tm._encode(d_in, t_in)[2]
        y_prior = F.softmax(torch.from_numpy(nz["g"]) / T, dim=1)
        dyl = 0.5 * (bce(tm.discriminator_y(y_prior), ones)
                     + bce(tm.discriminator_y(ylat2), zeros))
        dyl.backward(); opt_dy.step()
        t_log.append((float(ed), float(dzl), float(dyl),
                      float(mu.abs().mean()), float(logvar.mean())))

    # ---------------- jax side (this repo's step semantics, eager) ----------------
    enc_keys = ("enc", "mu", "logvar", "y"); dec_keys = ("dec", "dec_out")
    params, bn_state = aae.params, aae.bn_state
    sp = lambda p: ({k: p[k] for k in enc_keys}, {k: p[k] for k in dec_keys})
    oe = optax.adam(1e-3, eps=1e-8); od = optax.adam(1e-3, eps=1e-8)
    oz = optax.adam(1e-3, eps=1e-8); oy = optax.adam(1e-3, eps=1e-8)
    e_p, d_p = sp(params)
    st = [oe.init(e_p), od.init(d_p), oz.init(params["disc_z"]), oy.init(params["disc_y"])]
    j_log = []

    @jax.jit
    def step(params, bn_state, st, d_in, t_in, eps, eps2, z_prior, g):
        st_e, st_d, st_dz, st_dy = st
        ones = jnp.ones((BS, 1)); zeros = jnp.zeros((BS, 1))

        def gen_loss(gp, bn_state):
            pf = {**params, **gp}
            mu, logvar, y, enc_s = aae.encode_apply(pf, bn_state, d_in, t_in, True)
            z = eps * jnp.exp(logvar / 2) + mu
            d_out, t_out, dec_s = aae.decode_apply(pf, bn_state, z, y, True)
            rec, ce, sse = aae.calc_loss(d_in, d_out, t_in, t_out)
            adv_z = aae._bce(aae._disc(params["disc_z"], z), ones)
            adv_y = aae._bce(aae._disc(params["disc_y"], y), ones)
            ed = (1 - SL) * rec + SL * SLR * adv_z + SL * (1 - SLR) * adv_y
            return ed, ({"enc": enc_s, "dec": dec_s}, mu, logvar)

        e_p, d_p = sp(params)
        (ed, (bn2, mu, logvar)), grads = jax.value_and_grad(gen_loss, has_aux=True)(
            {**e_p, **d_p}, bn_state)
        ue, st_e = oe.update({k: grads[k] for k in enc_keys}, st_e, e_p)
        ud, st_d = od.update({k: grads[k] for k in dec_keys}, st_d, d_p)
        params2 = {**params, **optax.apply_updates(e_p, ue), **optax.apply_updates(d_p, ud)}
        bn_state = bn2

        mu2, logvar2, ylat, enc_s = aae.encode_apply(params2, bn_state, d_in, t_in, True)
        bn_state = {"enc": enc_s, "dec": bn_state["dec"]}
        z_lat = jax.lax.stop_gradient(eps2 * jnp.exp(logvar2 / 2) + mu2)
        y_lat = jax.lax.stop_gradient(ylat)
        y_prior = jax.nn.softmax(g / T, axis=1)

        def dz_loss(dz):
            return 0.5 * (aae._bce(aae._disc(dz, z_prior), ones)
                          + aae._bce(aae._disc(dz, z_lat), zeros))
        dzv, gz = jax.value_and_grad(dz_loss)(params2["disc_z"])
        uz, st_dz = oz.update(gz, st_dz, params2["disc_z"])
        params2 = {**params2, "disc_z": optax.apply_updates(params2["disc_z"], uz)}

        def dy_loss(dy):
            return 0.5 * (aae._bce(aae._disc(dy, y_prior), ones)
                          + aae._bce(aae._disc(dy, y_lat), zeros))
        dyv, gy = jax.value_and_grad(dy_loss)(params2["disc_y"])
        uy, st_dy = oy.update(gy, st_dy, params2["disc_y"])
        params2 = {**params2, "disc_y": optax.apply_updates(params2["disc_y"], uy)}
        return params2, bn_state, (st_e, st_d, st_dz, st_dy), (
            ed, dzv, dyv, jnp.abs(mu).mean(), logvar.mean())

    for i in range(STEPS):
        nz = noises[i]
        params, bn_state, st, m = step(
            params, bn_state, tuple(st),
            batches[i][0], batches[i][1],
            nz["eps"], nz["eps2"], nz["z_prior"], nz["g"])
        j_log.append(tuple(float(x) for x in m))

    for i in range(STEPS):
        t = t_log[i]; j = j_log[i]
        print(f"step {i}: torch ed={t[0]:.6f} dz={t[1]:.6f} dy={t[2]:.6f} "
              f"|mu|={t[3]:.6f} lv={t[4]:.6f}")
        print(f"         jax  ed={j[0]:.6f} dz={j[1]:.6f} dy={j[2]:.6f} "
              f"|mu|={j[3]:.6f} lv={j[4]:.6f}")


if __name__ == "__main__":
    main()

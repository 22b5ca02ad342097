"""Record-and-replay of the REAL reference AAE run through the PRODUCT step.

tests/refshim/aae_replay.py replays the reference's recorded streams
through a torch transcription — proving transcription ≡ reference — and
tests/test_parity_aae.py locksteps the product step against that
transcription for 6 steps. This module collapses the chain: the recorded
streams (init state, per-step batch rows, eps/eps2/z_prior normals, gumbel
y priors, plus per-epoch param AND Adam-state snapshots) replay directly
through this repo's models/aae.py pieces (encode_apply / decode_apply /
calc_loss / _disc / _bce with the production optimizer partitioning), in
the same two modes as the VAE treatment (tests/refshim/vae_replay.py):

* continuous — from the recorded init through all 70 epochs; per-epoch
  ed/dz/dy means compared against the reference's own logged values
  (f32 chaos bounds the late-epoch agreement, as for the VAE);
* epoch-reset — params + all four Adam states reset to the reference's
  recorded epoch-start snapshots, pinning per-epoch step semantics.

Usage:
  python tests/refshim/head_to_head.py --mode avamb --workdir /tmp/h2h_avamb --keep  # once
  python tests/refshim/aae_replay_product.py record
  python tests/refshim/aae_replay_product.py replay

Reference anchors: vamb/aamb_encode.py:203-431 (trainmodel),
:120-130 (reparameterization), :434-512 (get_latents).
"""

import os
import sys

sys.path.insert(0, '/root/repo')

import numpy as np

RECDIR = '/tmp/aae_replay_product'
EPOCHS = 70
BATCHSTEPS = [25, 50]
SEED = 1
T = 0.1596
SL, SLR = 0.00964, 0.5


def record():
    from tests import refshim
    refshim.install()
    import torch

    import vamb.aamb_encode as am
    from vamb.encode import make_dataloader

    if not os.path.exists('/tmp/h2h_avamb/tpuout/composition.npz'):
        sys.exit("missing dataset artifacts: run head_to_head.py --mode avamb "
                 "--workdir /tmp/h2h_avamb --keep first")
    comp = np.load('/tmp/h2h_avamb/tpuout/composition.npz', allow_pickle=True)
    ab = np.load('/tmp/h2h_avamb/tpuout/abundance.npz', allow_pickle=True)
    dl = make_dataloader(ab['matrix'].copy(), comp['matrix'].copy(),
                         comp['lengths'].copy(), 256, destroy=True, cuda=False)
    dep_all = dl.dataset.tensors[0].numpy()
    tnf_all = dl.dataset.tensors[1].numpy()
    row_map = {}
    for i in range(len(dep_all)):
        row_map[dep_all[i].tobytes() + tnf_all[i][:8].tobytes()] = i

    rec = dict(batches=[], normals=[], gumbels=[])
    snapshots = []
    adams: list = []  # the four torch Adam instances, in creation order

    class RngProxy:
        def __init__(self, inner):
            self._inner = inner
        def normal(self, *a, **k):
            out = self._inner.normal(*a, **k)
            rec['normals'].append(np.asarray(out, np.float32).copy())
            return out
        def __getattr__(self, name):
            return getattr(self._inner, name)

    real_rohc = am.RelaxedOneHotCategorical

    class ROHCRecorder:
        def __init__(self, temp, probs):
            self._d = real_rohc(temp, probs)
        def sample(self):
            s = self._d.sample()
            rec['gumbels'].append(s.numpy().copy())
            return s

    am.RelaxedOneHotCategorical = ROHCRecorder

    class LoaderRecorder:
        def __init__(self, inner):
            self._inner = inner
        def __iter__(self):
            for batch in self._inner:
                d, t = batch[0].numpy(), batch[1].numpy()
                rec['batches'].append(np.array(
                    [row_map[d[j].tobytes() + t[j][:8].tobytes()]
                     for j in range(len(d))], np.int64))
                yield batch
        def __len__(self):
            return len(self._inner)
        def __getattr__(self, name):
            return getattr(self._inner, name)

    real_set_batchsize = am.set_batchsize

    def recording_set_batchsize(data_loader, batch_size, n_obs, encode=False):
        inner = (data_loader._inner
                 if isinstance(data_loader, LoaderRecorder) else data_loader)
        out = real_set_batchsize(inner, batch_size, n_obs, encode=encode)
        return out if encode else LoaderRecorder(out)

    am.set_batchsize = recording_set_batchsize

    real_adam = torch.optim.Adam

    class AdamRecorder(real_adam):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            adams.append(self)

    torch.optim.Adam = AdamRecorder

    model = am.AAE(dep_all.shape[1], 547, 283, 700, SL, SLR, 0.15, False, SEED)
    init_sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}
    model.rng = RngProxy(model.rng)
    name_of = {id(p): n for n, p in model.named_parameters()}

    def snapshot():
        sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}
        opt = []
        for optimizer in adams:
            st = {}
            for group in optimizer.param_groups:
                for p in group['params']:
                    s = optimizer.state.get(p, {})
                    st[name_of[id(p)]] = (
                        {k: (v.numpy().copy() if hasattr(v, 'numpy') else
                             float(v)) for k, v in s.items()} if s else {})
            opt.append(st)
        return dict(params=sd, opt=opt)

    # per-epoch snapshots via the epoch log line (trainmodel logs once per
    # epoch after the optimizer steps)
    epoch_lines = []
    import loguru
    orig_info = loguru.logger.info

    def info_hook(msg, *a, **k):
        if 'Epoch' in str(msg):
            epoch_lines.append(str(msg))
            snapshots.append(snapshot())
        return orig_info(msg, *a, **k)

    loguru.logger.info = info_hook

    snapshots.append(snapshot())  # init (optimizers appear after trainmodel starts)
    model.trainmodel(LoaderRecorder(dl), nepochs=EPOCHS,
                     batchsteps=BATCHSTEPS, T=T)
    loguru.logger.info = orig_info
    torch.optim.Adam = real_adam

    ref_means = []
    for ln in epoch_lines:
        parts = ln.replace(':', ' ').split()
        ref_means.append((float(parts[parts.index('Enc/Dec') + 1]),
                          float(parts[parts.index('Dz') + 2]),
                          float(parts[parts.index('Dy') + 2])))

    def obj_array(lst):
        out = np.empty(len(lst), dtype=object)
        for i, x in enumerate(lst):
            out[i] = x
        return out

    os.makedirs(RECDIR, exist_ok=True)
    np.savez(os.path.join(RECDIR, 'records.npz'),
             dep=dep_all, tnf=tnf_all, lengths=comp['lengths'],
             batches=obj_array(rec['batches']),
             normals=obj_array(rec['normals']),
             gumbels=obj_array(rec['gumbels']),
             ref_means=np.asarray(ref_means, np.float64),
             init=np.asarray([init_sd], dtype=object))
    np.savez(os.path.join(RECDIR, 'snapshots.npz'),
             snapshots=obj_array(snapshots))
    print(f"recorded {len(rec['batches'])} steps, {len(snapshots)} snapshots "
          f"-> {RECDIR}")


# ---------------------------------------------------------------- replay

def _sd_to_tree(sd):
    "Reference AAE state_dict -> this repo's AAE params/bn_state trees."
    def dense(prefix):
        return {"w": sd[f"{prefix}.weight"].T.copy(),
                "b": sd[f"{prefix}.bias"].copy()}

    params = {"enc": [], "dec": []}
    bn = {"enc": [], "dec": []}
    for i, (lin, bnorm) in enumerate([(0, 1), (3, 4)]):
        params["enc"].append({
            "dense": dense(f"encoder.{lin}"),
            "bn": {"scale": sd[f"encoder.{bnorm}.weight"].copy(),
                   "bias": sd[f"encoder.{bnorm}.bias"].copy()}})
        bn["enc"].append({"mean": sd[f"encoder.{bnorm}.running_mean"].copy(),
                          "var": sd[f"encoder.{bnorm}.running_var"].copy()})
        params["dec"].append({
            "dense": dense(f"decoder.{lin}"),
            "bn": {"scale": sd[f"decoder.{bnorm}.weight"].copy(),
                   "bias": sd[f"decoder.{bnorm}.bias"].copy()}})
        bn["dec"].append({"mean": sd[f"decoder.{bnorm}.running_mean"].copy(),
                          "var": sd[f"decoder.{bnorm}.running_var"].copy()})
    params["mu"] = dense("mu")
    params["logvar"] = dense("logvar")
    params["y"] = dense("y_vector")
    params["dec_out"] = dense("decoder.6")
    params["disc_z"] = [dense(f"discriminator_z.{j}") for j in (0, 2, 4)]
    params["disc_y"] = [dense(f"discriminator_y.{j}") for j in (0, 2, 4)]
    return params, bn


def replay():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import optax

    from vamb_tpu.models.aae import AAE

    rec = np.load(os.path.join(RECDIR, 'records.npz'), allow_pickle=True)
    snaps = np.load(os.path.join(RECDIR, 'snapshots.npz'),
                    allow_pickle=True)['snapshots']
    dep, tnf = rec['dep'], rec['tnf']
    batches = rec['batches']
    normals, gumbels = rec['normals'], rec['gumbels']
    ref_means = rec['ref_means']
    init_sd = rec['init'][0]

    aae = AAE(nsamples=dep.shape[1], nhiddens=547, nlatent_z=283,
              nlatent_y=700, sl=SL, slr=SLR, seed=SEED)
    enc_keys = ("enc", "mu", "logvar", "y")
    dec_keys = ("dec", "dec_out")

    def sp(p):
        return ({k: p[k] for k in enc_keys}, {k: p[k] for k in dec_keys})

    opt_e = optax.adam(1e-3, eps=1e-8)
    opt_d = optax.adam(1e-3, eps=1e-8)
    opt_dz = optax.adam(1e-3, eps=1e-8)
    opt_dy = optax.adam(1e-3, eps=1e-8)

    @jax.jit
    def step(params, bn_state, opts, batch, eps, eps2, z_prior, y_prior):
        st_e, st_d, st_dz, st_dy = opts
        d_in, t_in = batch
        bs = d_in.shape[0]
        ones = jnp.ones((bs, 1))
        zeros_t = jnp.zeros((bs, 1))

        def gen_loss(gen_params, bn_state):
            pf = {**params, **gen_params}
            mu, logvar, y, enc_s = aae.encode_apply(pf, bn_state, d_in, t_in, True)
            z = eps * jnp.exp(logvar / 2) + mu
            d_out, t_out, dec_s = aae.decode_apply(pf, bn_state, z, y, True)
            rec_loss, ce, sse = aae.calc_loss(d_in, d_out, t_in, t_out)
            ed = ((1 - aae.sl) * rec_loss
                  + aae.sl * aae.slr * aae._bce(aae._disc(params["disc_z"], z), ones)
                  + aae.sl * (1 - aae.slr) * aae._bce(aae._disc(params["disc_y"], y), ones))
            return ed, {"enc": enc_s, "dec": dec_s}

        e_p, d_p = sp(params)
        (ed, bn_state), grads = jax.value_and_grad(gen_loss, has_aux=True)(
            {**e_p, **d_p}, bn_state)
        ue, st_e = opt_e.update({k: grads[k] for k in enc_keys}, st_e, e_p)
        ud, st_d = opt_d.update({k: grads[k] for k in dec_keys}, st_d, d_p)
        params = {**params, **optax.apply_updates(e_p, ue),
                  **optax.apply_updates(d_p, ud)}

        bn_before = bn_state["enc"]
        mu, logvar, ylat, enc_s = aae.encode_apply(params, bn_state, d_in, t_in, True)
        bn_state = {"enc": enc_s, "dec": bn_state["dec"]}
        z_lat = jax.lax.stop_gradient(eps2 * jnp.exp(logvar / 2) + mu)
        y_lat = jax.lax.stop_gradient(ylat)

        def dz_loss(dz):
            return 0.5 * (aae._bce(aae._disc(dz, z_prior), ones)
                          + aae._bce(aae._disc(dz, z_lat), zeros_t))

        dzv, gz = jax.value_and_grad(dz_loss)(params["disc_z"])
        uz, st_dz = opt_dz.update(gz, st_dz, params["disc_z"])
        params = {**params, "disc_z": optax.apply_updates(params["disc_z"], uz)}

        # third BN EMA (closed form, as the product step applies it)
        m = 0.1
        bn3 = jax.tree.map(lambda s2, s1: (2 - m) * s2 - (1 - m) * s1,
                           bn_state["enc"], bn_before)
        bn_state = {"enc": bn3, "dec": bn_state["dec"]}

        def dy_loss(dy):
            return 0.5 * (aae._bce(aae._disc(dy, y_prior), ones)
                          + aae._bce(aae._disc(dy, y_lat), zeros_t))

        dyv, gy = jax.value_and_grad(dy_loss)(params["disc_y"])
        uy, st_dy = opt_dy.update(gy, st_dy, params["disc_y"])
        params = {**params, "disc_y": optax.apply_updates(params["disc_y"], uy)}
        return params, bn_state, (st_e, st_d, st_dz, st_dy), jnp.stack([ed, dzv, dyv])

    def steps_of_epoch(epoch):
        bs = 256 * (2 ** sum(epoch >= s for s in BATCHSTEPS))
        return len(dep) // bs

    def run_epoch(params, bn_state, opts, epoch, step0):
        vals = []
        for b in range(steps_of_epoch(epoch)):
            i = step0 + b
            idx = batches[i]
            z_prior = normals[3 * i + 0].astype(np.float32)
            eps = normals[3 * i + 1].astype(np.float32)
            eps2 = normals[3 * i + 2].astype(np.float32)
            y_prior = gumbels[i]
            params, bn_state, opts, m = step(
                params, bn_state, opts, (dep[idx], tnf[idx]),
                eps, eps2, z_prior, y_prior)
            vals.append(np.asarray(m, np.float64))
        return params, bn_state, opts, np.asarray(vals)

    def fresh_opts(params):
        e_p, d_p = sp(params)
        return (opt_e.init(e_p), opt_d.init(d_p),
                opt_dz.init(params["disc_z"]), opt_dy.init(params["disc_y"]))

    # ---- continuous replay
    params, bn_state = _sd_to_tree(init_sd)
    opts = fresh_opts(params)
    print("== continuous replay through the PRODUCT step ==")
    step0 = 0
    cont = []
    for epoch in range(EPOCHS):
        params, bn_state, opts, vals = run_epoch(params, bn_state, opts, epoch, step0)
        mine = vals.mean(axis=0)
        refm = ref_means[epoch]
        d = np.abs(mine - refm)
        cont.append(d)
        if epoch < 5 or epoch % 10 == 9:
            print(f"epoch {epoch + 1:>2}: ref ed/dz/dy "
                  f"{refm[0]:.6f} {refm[1]:.6f} {refm[2]:.6f} | replay "
                  f"{mine[0]:.6f} {mine[1]:.6f} {mine[2]:.6f} | "
                  f"diff {d[0]:.2e} {d[1]:.2e} {d[2]:.2e}", flush=True)
        step0 += len(vals)
    cont = np.asarray(cont)

    # ---- epoch-reset replay (params + all four Adam states reset)
    print("== epoch-reset replay (reference's recorded epoch-start state) ==")
    import optax as _optax

    def to_tree_named(sd):
        # build our params tree from a torch-param-name -> array dict;
        # entries absent or None (never-stepped params) become zeros
        full = {k: np.zeros_like(v) for k, v in init_sd.items()}
        for k, v in sd.items():
            if v is not None:
                full[k] = v
        tree, _ = _sd_to_tree(full)
        return tree

    def adam_state(opt_snap, subtree_pick, params_sub):
        tree = to_tree_named({k: (v["exp_avg"] if v else None)
                              for k, v in opt_snap.items()})
        mu = subtree_pick(tree)
        tree = to_tree_named({k: (v["exp_avg_sq"] if v else None)
                              for k, v in opt_snap.items()})
        nu = subtree_pick(tree)
        count = 0
        for v in opt_snap.values():
            if v:
                count = int(v["step"])
                break
        inner = _optax.ScaleByAdamState(
            count=jnp.asarray(count, jnp.int32),
            mu=mu, nu=nu)
        template = opt_e.init(params_sub)
        return (inner,) + tuple(template[1:])

    reset = []
    step0 = 0
    for epoch in range(EPOCHS):
        snap = snaps[epoch]
        p_e, bn_e = _sd_to_tree(snap['params'])
        e_p, d_p = sp(p_e)
        opt_snaps = snap['opt']
        if len(opt_snaps) == 4:
            # Adam state is per-param, so the reference's optimizer
            # PARTITION (its E-optimizer holds only the encoder stack;
            # mu/logvar/y ride in its decoder Adam) doesn't matter —
            # merge all four snapshots into one name->state map and carve
            # out OUR partition's subsets from it
            merged: dict = {}
            for os_ in opt_snaps:
                merged.update({k: v for k, v in os_.items() if v})
            opts = (
                adam_state(merged, lambda t: {k: t[k] for k in enc_keys}, e_p),
                adam_state(merged, lambda t: {k: t[k] for k in dec_keys}, d_p),
                adam_state(merged, lambda t: t["disc_z"], p_e["disc_z"]),
                adam_state(merged, lambda t: t["disc_y"], p_e["disc_y"]),
            )
        else:  # epoch 0 snapshot predates optimizer creation
            opts = fresh_opts(p_e)
        p_e, bn_e, opts, vals = run_epoch(p_e, bn_e, opts, epoch, step0)
        mine = vals.mean(axis=0)
        refm = ref_means[epoch]
        d = np.abs(mine - refm)
        reset.append(d)
        if epoch < 5 or epoch % 10 == 9:
            print(f"epoch {epoch + 1:>2}: diff ed/dz/dy "
                  f"{d[0]:.2e} {d[1]:.2e} {d[2]:.2e}", flush=True)
        step0 += len(vals)
    reset = np.asarray(reset)

    import json
    print("SUMMARY " + json.dumps({
        "epochs": EPOCHS,
        "continuous_ed_diff_max": float(cont[:, 0].max()),
        "continuous_ed_diff_first5_max": float(cont[:5, 0].max()),
        "reset_ed_diff_max": float(reset[:, 0].max()),
        "reset_dz_diff_max": float(reset[:, 1].max()),
        "reset_dy_diff_max": float(reset[:, 2].max()),
    }))


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'record':
        record()
    elif len(sys.argv) > 1 and sys.argv[1] == 'replay':
        replay()
    else:
        sys.exit("usage: aae_replay_product.py {record|replay}")

"""Record-and-replay of the REAL reference VAE training run.

Phase 1 (record): run the actual reference `vamb.encode.VAE.trainmodel`
under tests/refshim on the 20k head-to-head dataset, recording every piece
of realized stochasticity — init state_dict, per-step batch row indices,
per-step latent eps draws, per-step dropout masks (packed bits) — plus
per-batch loss components and per-epoch-boundary param/optimizer snapshots.
The recorders are stream-preserving: the dropout recorder draws its mask by
running F.dropout on a ones tensor of the same shape (identical RNG
consumption, and x*(1*1.25) == fused x*mask/0.8 exactly since 1.25 is a
power-exact float), so the recorded run is bit-identical to an unpatched
reference run with the same seed.

Phase 2 (replay): feed those exact streams through THIS repo's
models/vae.py step (apply(train=True, inject=...) + optim.dadapt_adam) in
two modes:

* continuous — from the recorded init, replay all epochs; per-epoch mean
  losses are compared against the reference's own realized values, and the
  final latents are clustered and compared bin-for-bin against the
  reference's own final latents clustered the same way;
* epoch-reset — before each epoch, parameters AND optimizer state are reset
  to the reference's recorded epoch-start snapshot, so every epoch's
  comparison starts from identical state and chaotic drift cannot compound;
  this pins the per-epoch step semantics at float-noise level through all
  four batch-size switches.

Divergence in either mode localizes a semantic difference; agreement means
our VAE step IS the reference step on identical streams (the same argument
tests/refshim/aae_replay.py makes for the AAE — that replay caught a real
f32 BCE NaN).

Usage:
  python tests/refshim/head_to_head.py --mode avamb --workdir /tmp/h2h_avamb --keep   # once, for artifacts
  python tests/refshim/vae_replay.py record   # ~2 min (torch CPU)
  python tests/refshim/vae_replay.py replay   # JAX side + comparison

Reference anchors: vamb/encode.py:359-440 (trainepoch), :276-286
(fixed-sigma reparameterize), :442-484 (encode), :543-610 (trainmodel).
"""

import os
import sys

sys.path.insert(0, '/root/repo')

import numpy as np

RECDIR = '/tmp/vae_replay'
EPOCHS = 20
BATCHSTEPS = [4, 8, 12, 16]  # all four switches, compressed schedule
SEED = 1
DROP_P = 0.2


def _load_dataset():
    if not os.path.exists('/tmp/h2h_avamb/tpuout/composition.npz'):
        sys.exit("missing dataset artifacts: generate them first with\n"
                 "  python tests/refshim/head_to_head.py --mode avamb "
                 "--workdir /tmp/h2h_avamb --keep")
    comp = np.load('/tmp/h2h_avamb/tpuout/composition.npz', allow_pickle=True)
    ab = np.load('/tmp/h2h_avamb/tpuout/abundance.npz', allow_pickle=True)
    return comp, ab


def record():
    from tests import refshim
    refshim.install()
    import torch
    import torch.nn.functional as F

    import vamb.encode as ve

    comp, ab = _load_dataset()
    dl = ve.make_dataloader(ab['matrix'].copy(), comp['matrix'].copy(),
                            comp['lengths'].copy(), 256, destroy=True,
                            cuda=False)
    dep_all, tnf_all, ab_all, w_all = (t.numpy() for t in dl.dataset.tensors)
    row_map = {}
    for i in range(len(dep_all)):
        row_map[dep_all[i].tobytes() + tnf_all[i][:8].tobytes()] = i

    rec = dict(batches=[], eps=[], maskbits=[], masklens=[], losses=[])
    snapshots = []  # (params_sd, opt_per_param, d, numerator) at each epoch start

    class DropoutRecorder(torch.nn.Module):
        "Stream-preserving dropout that records the realized keep mask."
        def __init__(self, p):
            super().__init__()
            self.p = p
            self.armed = True
        def forward(self, x):
            if not self.training:
                return x
            mask = F.dropout(torch.ones_like(x), self.p, True)
            if self.armed:
                bits = (mask.numpy() > 0)
                rec['maskbits'].append(np.packbits(bits.ravel()))
                rec['masklens'].append(bits.shape)
            return x * mask

    class LoaderRecorder:
        def __init__(self, inner):
            self._inner = inner
        def __iter__(self):
            for batch in self._inner:
                d, t = batch[0].numpy(), batch[1].numpy()
                idx = np.array(
                    [row_map[d[j].tobytes() + t[j][:8].tobytes()]
                     for j in range(len(d))], np.int64)
                rec['batches'].append(idx)
                yield batch
        def __len__(self):
            return len(self._inner)
        def __getattr__(self, name):
            return getattr(self._inner, name)

    real_set_batchsize = ve.set_batchsize

    def recording_set_batchsize(data_loader, batch_size, n_obs, encode=False):
        inner = (data_loader._inner
                 if isinstance(data_loader, LoaderRecorder) else data_loader)
        out = real_set_batchsize(inner, batch_size, n_obs, encode=encode)
        return out if encode else LoaderRecorder(out)

    ve.set_batchsize = recording_set_batchsize

    model = ve.VAE(dep_all.shape[1], seed=SEED)
    model.dropoutlayer = DropoutRecorder(DROP_P)

    real_reparam = ve.VAE.reparameterize

    def recording_reparam(self, mu):
        eps = torch.randn(mu.size(0), mu.size(1))
        if model.dropoutlayer.armed:
            rec['eps'].append(eps.numpy().copy())
        eps.requires_grad = True
        return mu + eps

    ve.VAE.reparameterize = recording_reparam

    real_calc_loss = ve.VAE.calc_loss

    def recording_calc_loss(self, *a, **k):
        out = real_calc_loss(self, *a, **k)
        if model.dropoutlayer.armed:
            rec['losses'].append([float(x.detach()) for x in out])
        return out

    ve.VAE.calc_loss = recording_calc_loss

    name_of = {id(p): n for n, p in model.named_parameters()}

    def snapshot(optimizer):
        sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}
        opt = {}
        for group in optimizer.param_groups:
            for p in group['params']:
                st = optimizer.state.get(p, {})
                opt[name_of[id(p)]] = (
                    {k: v.numpy().copy() for k, v in st.items()} if st else {}
                )
        return dict(params=sd, opt=opt, d=float(optimizer._d),
                    num=float(optimizer._numerator_weighted))

    # mirror trainmodel's loop so we can snapshot at epoch boundaries
    # (reference trainmodel: optimizer built once, trainepoch per epoch)
    import dadaptation
    optimizer = dadaptation.DAdaptAdam(model.parameters(), decouple=True)
    loader = LoaderRecorder(dl)
    steps_per_epoch = []
    import time
    for epoch in range(EPOCHS):
        snapshots.append(snapshot(optimizer))
        n_before = len(rec['batches'])
        t0 = time.time()
        loader = model.trainepoch(loader, epoch, optimizer, BATCHSTEPS)
        steps_per_epoch.append(len(rec['batches']) - n_before)
        print(f"epoch {epoch + 1}: {steps_per_epoch[-1]} steps "
              f"({time.time() - t0:.1f}s)", flush=True)
    snapshots.append(snapshot(optimizer))  # final state

    # final latents via the reference's own encode path
    model.dropoutlayer.armed = False
    latent = model.encode(loader)

    def obj_array(lst):
        out = np.empty(len(lst), dtype=object)
        for i, x in enumerate(lst):
            out[i] = x
        return out

    os.makedirs(RECDIR, exist_ok=True)
    np.savez(
        os.path.join(RECDIR, 'records.npz'),
        dep=dep_all, tnf=tnf_all, ab=ab_all, w=w_all,
        identifiers=comp['identifiers'], lengths=comp['lengths'],
        steps_per_epoch=np.asarray(steps_per_epoch),
        batches=obj_array(rec['batches']),
        eps=obj_array(rec['eps']),
        maskbits=obj_array(rec['maskbits']),
        masklens=obj_array(rec['masklens']),
        losses=np.asarray(rec['losses'], np.float64),
        ref_latent=latent,
    )
    np.savez(os.path.join(RECDIR, 'snapshots.npz'),
             snapshots=np.asarray(snapshots, dtype=object))
    total = sum(steps_per_epoch)
    assert len(rec['eps']) == total, (len(rec['eps']), total)
    assert len(rec['maskbits']) == 4 * total, (len(rec['maskbits']), total)
    print(f"recorded {total} steps over {EPOCHS} epochs -> {RECDIR}")


# ---------------------------------------------------------------- replay

def _torch_sd_to_tree(sd, nhid=2):
    "Reference state_dict -> this repo's VAE params/bn_state trees."
    params = {"enc": [], "dec": []}
    bn_state = {"enc": [], "dec": []}
    for i in range(nhid):
        params["enc"].append({
            "dense": {"w": sd[f"encoderlayers.{i}.weight"].T.copy(),
                      "b": sd[f"encoderlayers.{i}.bias"].copy()},
            "bn": {"scale": sd[f"encodernorms.{i}.weight"].copy(),
                   "bias": sd[f"encodernorms.{i}.bias"].copy()},
        })
        bn_state["enc"].append({
            "mean": sd[f"encodernorms.{i}.running_mean"].copy(),
            "var": sd[f"encodernorms.{i}.running_var"].copy(),
        })
        params["dec"].append({
            "dense": {"w": sd[f"decoderlayers.{i}.weight"].T.copy(),
                      "b": sd[f"decoderlayers.{i}.bias"].copy()},
            "bn": {"scale": sd[f"decodernorms.{i}.weight"].copy(),
                   "bias": sd[f"decodernorms.{i}.bias"].copy()},
        })
        bn_state["dec"].append({
            "mean": sd[f"decodernorms.{i}.running_mean"].copy(),
            "var": sd[f"decodernorms.{i}.running_var"].copy(),
        })
    params["mu"] = {"w": sd["mu.weight"].T.copy(), "b": sd["mu.bias"].copy()}
    params["out"] = {"w": sd["outputlayer.weight"].T.copy(),
                     "b": sd["outputlayer.bias"].copy()}
    return params, bn_state


def _torch_opt_to_state(snap, which):
    """Build our flat DAdaptAdamState tensor (`which` in m/v/s) from the
    recorded per-torch-param optimizer tensors (keyed by parameter name),
    reusing the params-tree conversion so the flat layout matches."""
    from jax.flatten_util import ravel_pytree

    sd = {}
    for name, st in snap['opt'].items():
        sd[name] = st[which] if st else np.zeros_like(snap['params'][name])
    # the bn running stats aren't parameters; fill with zeros so the
    # state_dict->tree converter can run, then drop them from the ravel
    for k, v in snap['params'].items():
        if k not in sd:
            sd[k] = np.zeros_like(v)
    tree, _ = _torch_sd_to_tree(sd)
    flat, _ = ravel_pytree(tree)
    return np.asarray(flat)


def replay():
    import jax

    # On TPU, JAX's DEFAULT matmul precision executes f32 dots as one bf16
    # MXU pass (fine for training throughput, wrong for a parity replay
    # against torch CPU f32). HIGHEST = true f32 dots.
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from vamb_tpu.models.vae import VAE
    from vamb_tpu.optim import dadapt_adam
    from vamb_tpu.optim.dadapt import DAdaptAdamState

    rec = np.load(os.path.join(RECDIR, 'records.npz'), allow_pickle=True)
    snaps = np.load(os.path.join(RECDIR, 'snapshots.npz'),
                    allow_pickle=True)['snapshots']
    dep, tnf, ab, w = rec['dep'], rec['tnf'], rec['ab'], rec['w']
    nsamples = dep.shape[1]
    steps_per_epoch = rec['steps_per_epoch']
    batches, eps_l = rec['batches'], rec['eps']
    maskbits, masklens = rec['maskbits'], rec['masklens']
    ref_losses = rec['losses']  # (steps, 5): loss, ab_sse, ce, sse, kld

    vae = VAE(nsamples=nsamples, seed=SEED)
    init_params, init_bn = _torch_sd_to_tree(snaps[0]['params'])
    opt = dadapt_adam()

    @jax.jit
    def step(params, bn_state, opt_state, batch, inject):
        d_in, t_in, a_in, w_in = batch

        def loss_fn(params, bn_state):
            (d, t, a, mu), new_state = vae.apply(
                params, bn_state, d_in, t_in, a_in, train=True, inject=inject)
            loss, ab_sse, ce, sse, kld = vae.calc_loss(
                d_in, d, t_in, t, a_in, a, mu, w_in)
            return loss, (new_state, ab_sse, ce, sse, kld)

        (loss, (new_state, ab_sse, ce, sse, kld)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, bn_state)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_state, opt_state, jnp.stack(
            [loss, ab_sse, ce, sse, kld])

    def masks_for(step_i, bs):
        out = []
        for j in range(4):
            k = 4 * step_i + j
            shape = tuple(masklens[k])
            assert shape[0] == bs, (shape, bs)
            bits = np.unpackbits(maskbits[k])[: shape[0] * shape[1]]
            out.append(
                bits.reshape(shape).astype(np.float32) * np.float32(1.25))
        return out[:2], out[2:]

    def run_epoch(params, bn_state, opt_state, epoch, step0):
        comps = []
        for b in range(int(steps_per_epoch[epoch])):
            i = step0 + b
            idx = batches[i]
            enc_m, dec_m = masks_for(i, len(idx))
            inject = {"eps": eps_l[i].astype(np.float32),
                      "enc_masks": enc_m, "dec_masks": dec_m}
            batch = (dep[idx], tnf[idx], ab[idx], w[idx])
            params, bn_state, opt_state, c = step(
                params, bn_state, opt_state, batch, inject)
            comps.append(np.asarray(c, np.float64))
        return params, bn_state, opt_state, np.asarray(comps)

    # ---- mode A: continuous replay from init
    params, bn_state = init_params, init_bn
    opt_state = opt.init(params)
    step0 = 0
    print("== continuous replay (drift compounds across epochs) ==")
    cont_rel = []
    step_rel_first = None
    for epoch in range(EPOCHS):
        params, bn_state, opt_state, comps = run_epoch(
            params, bn_state, opt_state, epoch, step0)
        n = len(comps)
        refm = ref_losses[step0:step0 + n].mean(axis=0)
        mine = comps.mean(axis=0)
        rel = abs(mine[0] - refm[0]) / abs(refm[0])
        cont_rel.append(rel)
        if epoch == 0:
            # per-step table for the first epoch: exactness at the noise
            # floor for the first ~10 steps, then chaotic amplification —
            # the cleanest per-step semantics evidence
            per = np.abs(comps[:, 0] - ref_losses[:n, 0]) / np.abs(
                ref_losses[:n, 0])
            step_rel_first = per
            for i in range(min(10, n)):
                print(f"    step {i}: ref {ref_losses[i, 0]:.8f} replay "
                      f"{comps[i, 0]:.8f} rel {per[i]:.2e}")
        print(f"epoch {epoch + 1:>2}: ref loss {refm[0]:.6f} replay "
              f"{mine[0]:.6f} rel {rel:.2e}", flush=True)
        step0 += n

    # latents + clustering comparison
    from vamb_tpu.utils import mask_lower_bits

    final_params, final_bn = _torch_sd_to_tree(snaps[EPOCHS]['params'])

    def encode_with(p, s):
        lat = np.empty((len(dep), vae.nlatent), np.float32)
        fwd = jax.jit(lambda pp, ss, d, t, a: vae.apply(
            pp, ss, d, t, a, train=False)[0][3])
        for st in range(0, len(dep), 4096):
            sp = min(st + 4096, len(dep))
            lat[st:sp] = np.asarray(fwd(p, s, dep[st:sp], tnf[st:sp], ab[st:sp]))
        mask_lower_bits(lat, 12)
        return lat

    lat_replay = encode_with(params, bn_state)
    lat_ref = rec['ref_latent']
    # forward-parity floor: our encode of the reference's OWN final params
    lat_refparams = encode_with(final_params, final_bn)
    d_replay = float(np.max(np.abs(lat_replay - lat_ref)))
    d_fwd = float(np.max(np.abs(lat_refparams - lat_ref)))
    print(f"latent max|diff|: replay-vs-ref {d_replay:.3e} "
          f"(forward-parity floor {d_fwd:.3e})")

    from vamb_tpu.cluster import ClusterGenerator

    def bins_of(lat):
        gen = ClusterGenerator(lat.copy(), rec['lengths'].copy(), rng_seed=1)
        return sorted(
            tuple(sorted(int(m) for m in cl.members)) for cl in gen)

    bins_ref = bins_of(lat_ref)
    bins_replay = bins_of(lat_replay)
    same = bins_ref == bins_replay
    n_common = len(set(bins_ref) & set(bins_replay))
    print(f"bins: ref {len(bins_ref)} replay {len(bins_replay)} "
          f"identical={same} (common {n_common})")
    # the chaos-free form of the bins claim: OUR forward on the
    # reference's own final parameters vs the reference's own latents
    bins_fwd = bins_of(lat_refparams)
    same_fwd = bins_ref == bins_fwd
    print(f"bins (our forward, reference params): {len(bins_fwd)} "
          f"identical={same_fwd}")

    # ---- mode B: epoch-reset replay (no compounding)
    print("== epoch-reset replay (each epoch from the reference's own "
          "recorded state) ==")
    reset_rel = []
    step0 = 0
    for epoch in range(EPOCHS):
        snap = snaps[epoch]
        p_e, bn_e = _torch_sd_to_tree(snap['params'])
        opt_state = DAdaptAdamState(
            m=jnp.asarray(_torch_opt_to_state(snap, 'm')),
            v=jnp.asarray(_torch_opt_to_state(snap, 'v')),
            s=jnp.asarray(_torch_opt_to_state(snap, 's')),
            d=jnp.asarray(snap['d'], jnp.float32),
            numerator_weighted=jnp.asarray(snap['num'], jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )
        p_e, bn_e, opt_state, comps = run_epoch(p_e, bn_e, opt_state,
                                                epoch, step0)
        n = len(comps)
        refm = ref_losses[step0:step0 + n].mean(axis=0)
        mine = comps.mean(axis=0)
        rel = abs(mine[0] - refm[0]) / abs(refm[0])
        worst_b = float(np.max(np.abs(
            comps[:, 0] - ref_losses[step0:step0 + n, 0])
            / np.abs(ref_losses[step0:step0 + n, 0])))
        reset_rel.append(rel)
        # compare end-of-epoch params against the next snapshot
        p_next, _ = _torch_sd_to_tree(snaps[epoch + 1]['params'])
        from jax.flatten_util import ravel_pytree
        fa, _ = ravel_pytree(p_e)
        fb, _ = ravel_pytree(p_next)
        pdiff = float(np.max(np.abs(np.asarray(fa) - np.asarray(fb))))
        print(f"epoch {epoch + 1:>2}: rel(epoch mean loss) {rel:.2e}  "
              f"worst-batch rel {worst_b:.2e}  end-params max|d| {pdiff:.2e}",
              flush=True)
        step0 += n

    import json
    print("SUMMARY " + json.dumps({
        "epochs": EPOCHS,
        "batchsteps": BATCHSTEPS,
        "first_10_steps_rel_max": float(np.max(step_rel_first[:10])),
        "continuous_rel_per_epoch_max": float(np.max(cont_rel)),
        "reset_rel_per_epoch_max": float(np.max(reset_rel)),
        "reset_rel_epochs_4_plus_max": float(np.max(reset_rel[3:])),
        "latent_maxdiff_replay": d_replay,
        "latent_maxdiff_forward_floor": d_fwd,
        "bins_identical_continuous": bool(same),
        "bins_identical_forward_on_ref_params": bool(same_fwd),
        "bins_ref": len(bins_ref),
        "bins_replay": len(bins_replay),
        "bins_common": n_common,
    }))


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'record':
        record()
    elif len(sys.argv) > 1 and sys.argv[1] == 'replay':
        replay()
    else:
        sys.exit("usage: vae_replay.py {record|replay}")

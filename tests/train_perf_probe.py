"""Attribution microbenchmarks for secondary-model training steps on TPU.

Not a test — run manually: python tests/train_perf_probe.py [aae|taxometer|vaevae]

BENCH_r04 measured the secondary families 12-67x below the flagship VAE in
contigs/s/chip, gaps not FLOP-explained (VERDICT round-4 weak #1). This
probe times scanned epochs of step VARIANTS built from each model's public
pieces (encode_apply/decode_apply/calc_loss/...), ablating one suspect at
a time — per-step RNG draws (threefry normals / gumbels / dropout bytes),
the D-Adaptation ravel, the adversarial phase count — so the per-contig
gap decomposes into measured parts instead of guesses.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, "/root/repo")

from vamb_tpu.models.aae import AAE
from vamb_tpu.models.dataset import make_dataset
from vamb_tpu.models.taxometer import Taxometer
from vamb_tpu.models import hier
from vamb_tpu.optim import dadapt_adam
from vamb_tpu.taxonomy import ContigTaxonomy

N, S, BS, EPOCHS = 25_000, 5, 1024, 10
NB = N // BS

rng = np.random.default_rng(3)
ds = make_dataset(
    rng.exponential(2.0, (N, S)).astype(np.float32),
    rng.normal(size=(N, 103)).astype(np.float32),
    rng.integers(2000, 50_000, N),
)
DATA = (jnp.asarray(ds.depths), jnp.asarray(ds.tnf),
        jnp.asarray(ds.abundance), jnp.asarray(ds.weights))


def _sync(tree):
    # timed fns return a scalar fingerprint; fetch just that
    def pull(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            x = jax.random.key_data(x)
        return np.asarray(x) if hasattr(x, "shape") else x
    jax.tree.map(pull, tree)


def timed_interleaved(variants, reps=5):
    """Time a list of (name, fn, args) round-robin with per-variant medians.

    The shared TPU pool's delivered rate swings >2x (measured >30x in one
    moment this round), so back-to-back timing of variants confounds the
    pool with the ablation; interleaving puts every pool moment across all
    variants and the median rejects the spikes."""
    walls = {name: [] for name, _, _ in variants}
    for name, fn, args in variants:  # compile + warm
        _sync(fn(*args))
    for _ in range(reps):
        for name, fn, args in variants:
            t0 = time.perf_counter()
            _sync(fn(*args))
            walls[name].append(time.perf_counter() - t0)
    for name, _, _ in variants:
        med = float(np.median(walls[name]))
        print(f"{name:32s} {med*1e3/EPOCHS:8.2f} ms/epoch  "
              f"{N*EPOCHS/med:.3g} contigs/s  "
              f"(spread {min(walls[name])*1e3/EPOCHS:.1f}-"
              f"{max(walls[name])*1e3/EPOCHS:.1f})")
    return walls


def scan_epochs(step, carry0, nb=NB, nepochs=EPOCHS):
    @jax.jit
    def run(carry):
        def one_epoch(c, _):
            c, _m = jax.lax.scan(step, c, jnp.arange(nb))
            return c, None
        carry, _ = jax.lax.scan(one_epoch, carry, None, length=nepochs)
        # reduce to a SCALAR fingerprint: fetching the full carry pulls
        # megabytes through the ~20 MB/s tunnel and times bandwidth, not
        # compute (a whole afternoon misread the pool because of this)
        leaves = [x for x in jax.tree.leaves(carry)
                  if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
        return sum(jnp.sum(x) for x in leaves)
    return run, carry0


def probe_aae():
    aae = AAE(nsamples=S, seed=1)
    opt_e = optax.adam(1e-3, eps=1e-8)
    opt_d = optax.adam(1e-3, eps=1e-8)
    opt_dz = optax.adam(1e-3, eps=1e-8)
    opt_dy = optax.adam(1e-3, eps=1e-8)
    enc_keys = ("enc", "mu", "logvar", "y")
    dec_keys = ("dec", "dec_out")
    sp = lambda p: ({k: p[k] for k in enc_keys}, {k: p[k] for k in dec_keys})
    e_p, d_p = sp(aae.params)
    opts = (opt_e.init(e_p), opt_d.init(d_p),
            opt_dz.init(aae.params["disc_z"]), opt_dy.init(aae.params["disc_y"]))
    dep, tnf = DATA[0], DATA[1]

    def make_step(no_rng=False, phases=3, third_encode=True):
        def step(carry, i):
            params, bn_state, opts, key = carry
            st_e, st_d, st_dz, st_dy = opts
            key, k_eps, k_pz, k_py, k_eps2 = jax.random.split(key, 5)
            d_in = jax.lax.dynamic_slice_in_dim(dep, (i % NB) * BS, BS)
            t_in = jax.lax.dynamic_slice_in_dim(tnf, (i % NB) * BS, BS)
            ones = jnp.ones((BS, 1)); zeros = jnp.zeros((BS, 1))
            if no_rng:
                eps = jnp.zeros((BS, aae.ld)); eps2 = eps
                z_prior = jnp.ones((BS, aae.ld))
                y_prior = jnp.full((BS, aae.y_len), 1.0 / aae.y_len)
            else:
                eps = jax.random.normal(k_eps, (BS, aae.ld))
                eps2 = jax.random.normal(k_eps2, (BS, aae.ld))
                z_prior = jax.random.normal(k_pz, (BS, aae.ld))
                y_prior = aae._gumbel_softmax_prior(k_py, BS, 0.1596)

            def gen_loss(gen_params, bn_state):
                pf = {**params, **gen_params}
                mu, logvar, y, enc_s = aae.encode_apply(pf, bn_state, d_in, t_in, True)
                z = eps * jnp.exp(logvar / 2) + mu
                d_out, t_out, dec_s = aae.decode_apply(pf, bn_state, z, y, True)
                rec, ce, sse = aae.calc_loss(d_in, d_out, t_in, t_out)
                ed = (1 - aae.sl) * rec \
                    + aae.sl * aae.slr * aae._bce(aae._disc(params["disc_z"], z), ones) \
                    + aae.sl * (1 - aae.slr) * aae._bce(aae._disc(params["disc_y"], y), ones)
                return ed, {"enc": enc_s, "dec": dec_s}
            e_p, d_p = sp(params)
            (ed, bn_state), grads = jax.value_and_grad(gen_loss, has_aux=True)(
                {**e_p, **d_p}, bn_state)
            ue, st_e = opt_e.update({k: grads[k] for k in enc_keys}, st_e, e_p)
            ud, st_d = opt_d.update({k: grads[k] for k in dec_keys}, st_d, d_p)
            params = {**params, **optax.apply_updates(e_p, ue),
                      **optax.apply_updates(d_p, ud)}
            if phases >= 2:
                mu, logvar, ylat, enc_s = aae.encode_apply(params, bn_state, d_in, t_in, True)
                bn_state = {"enc": enc_s, "dec": bn_state["dec"]}
                z_lat = jax.lax.stop_gradient(eps2 * jnp.exp(logvar / 2) + mu)
                y_lat = jax.lax.stop_gradient(ylat)

                def dz_loss(dz):
                    return 0.5 * (aae._bce(aae._disc(dz, z_prior), ones)
                                  + aae._bce(aae._disc(dz, z_lat), zeros))
                dzv, gz = jax.value_and_grad(dz_loss)(params["disc_z"])
                uz, st_dz = opt_dz.update(gz, st_dz, params["disc_z"])
                params = {**params, "disc_z": optax.apply_updates(params["disc_z"], uz)}
            if phases >= 3:
                if third_encode:
                    _, _, _, enc_s3 = aae.encode_apply(params, bn_state, d_in, t_in, True)
                    bn_state = {"enc": enc_s3, "dec": bn_state["dec"]}

                def dy_loss(dy):
                    return 0.5 * (aae._bce(aae._disc(dy, y_prior), ones)
                                  + aae._bce(aae._disc(dy, y_lat), zeros))
                dyv, gy = jax.value_and_grad(dy_loss)(params["disc_y"])
                uy, st_dy = opt_dy.update(gy, st_dy, params["disc_y"])
                params = {**params, "disc_y": optax.apply_updates(params["disc_y"], uy)}
            return (params, bn_state, (st_e, st_d, st_dz, st_dy), key), ed
        return step

    carry0 = (aae.params, aae.bn_state, opts, jax.random.key(0))
    variants = []
    for name, kw in [
        ("full (3 phases, rng)", {}),
        ("no third encode", dict(third_encode=False)),
        ("no rng", dict(no_rng=True)),
        ("2 phases", dict(phases=2)),
        ("gen phase only", dict(phases=1)),
        ("gen only + no rng", dict(phases=1, no_rng=True)),
    ]:
        run, c0 = scan_epochs(make_step(**kw), carry0)
        variants.append((name, run, (c0,)))
    timed_interleaved(variants)


def probe_taxometer():
    taxes = [ContigTaxonomy(["Bacteria", f"phylum{i % 8}", f"genus{i}"])
             for i in range(64)]
    nodes, ind_nodes, table_parent = hier.make_graph(taxes)
    targets = jnp.asarray(
        np.asarray([ind_nodes[f"genus{i % 64}"] for i in range(N)], np.int32))
    tx = Taxometer(nsamples=S, nlabels=len(nodes), nodes=nodes,
                   table_parent=table_parent, seed=1)
    tx0 = Taxometer(nsamples=S, nlabels=len(nodes), nodes=nodes,
                    table_parent=table_parent, seed=1, dropout=0.0)
    n_label_classes = max(tx.n_tree_nodes, 105)

    def make_step(model, optimizer, fwd_only=False, no_onehot=False):
        def step(carry, i):
            params, bn_state, opt_state, key = carry
            key, sub = jax.random.split(key)
            sl = (i % NB) * BS
            depths = jax.lax.dynamic_slice_in_dim(DATA[0], sl, BS)
            tnf = jax.lax.dynamic_slice_in_dim(DATA[1], sl, BS)
            ab = jax.lax.dynamic_slice_in_dim(DATA[2], sl, BS)
            labels = jax.lax.dynamic_slice_in_dim(targets, sl, BS)
            if no_onehot:
                onehot = jnp.zeros((BS, n_label_classes), jnp.float32)
            else:
                onehot = jax.nn.one_hot(labels, n_label_classes, dtype=jnp.float32)

            def loss_fn(params, bn_state):
                logits, new_state = model.apply(
                    params, bn_state, depths, tnf, ab, train=True, key=sub)
                loss = model.loss_fn(logits, onehot[:, : model._label_cols()])
                return loss, new_state

            if fwd_only:
                loss, bn_state = loss_fn(params, bn_state)
                return (params, bn_state, opt_state, key), loss
            (loss, bn_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, bn_state)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return (params, bn_state, opt_state, key), loss
        return step

    dd = dadapt_adam()
    ad = optax.adam(1e-3)
    variants = []
    for name, model, step, opt in [
        ("full (dadapt, dropout)", tx, make_step(tx, dd), dd),
        ("plain adam", tx, make_step(tx, ad), ad),
        ("no dropout", tx0, make_step(tx0, dd), dd),
        ("no one-hot", tx, make_step(tx, dd, no_onehot=True), dd),
        ("fwd only", tx, make_step(tx, dd, fwd_only=True), dd),
    ]:
        carry0 = (model.params, model.bn_state, opt.init(model.params),
                  jax.random.key(0))
        run, c0 = scan_epochs(step, carry0)
        variants.append((f"taxometer: {name}", run, (c0,)))
    timed_interleaved(variants)


def probe_vaevae():
    "Bank vs per-step-draw dropout A/B through the PRODUCT step."
    import os

    from vamb_tpu.models.vaevae import VAEVAE

    taxes = [ContigTaxonomy(["Bacteria", f"phylum{i % 8}", f"genus{i}"])
             for i in range(64)]
    nodes, ind_nodes, table_parent = hier.make_graph(taxes)
    targets = np.asarray(
        [ind_nodes[f"genus{i % 64}"] for i in range(N)], np.int32)

    def run(mode):
        os.environ["VAMB_TPU_DROPOUT_MODE"] = mode
        try:
            vv = VAEVAE(nsamples=S, nlabels=len(nodes), nodes=nodes,
                        table_parent=table_parent, hier_loss="flat_softmax",
                        seed=1)
            walls: list = []
            vv.trainmodel(ds, targets, nepochs=EPOCHS, batchsize=BS,
                          batchsteps=None, segment_walls=walls)
            wall = sum(w for _, w in walls)
            print(f"vaevae [{mode or 'bank'}]: {wall*1e3/EPOCHS:.2f} ms/epoch "
                  f"{N*EPOCHS/wall:.3g} contigs/s")
        finally:
            os.environ.pop("VAMB_TPU_DROPOUT_MODE", None)

    for mode in ("", "step", "", "step"):
        run(mode)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("aae", "all"):
        print(f"== AAE ({N}x{S}, bs {BS}) ==")
        probe_aae()
    if which in ("taxometer", "all"):
        print(f"== Taxometer ==")
        probe_taxometer()
    if which in ("vaevae", "all"):
        print(f"== VAEVAE (bank vs per-step dropout) ==")
        probe_vaevae()

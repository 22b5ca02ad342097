"""Adversarial autoencoder (Avamb's AAE model).

Behavioral parity: reference vamb/aamb_encode.py. Continuous z (default 283)
and categorical y (default 700) latents; two discriminators; alternating
generator / discriminator-z / discriminator-y updates with four Adam
optimizers at lr=1e-3 (reference :203-431). The y latent's argmax directly
defines clusters; the z latent is clustered with the medoid engine.

Architecture details kept exactly: encoder Linear→BatchNorm→LeakyReLU ×2
(note: BN before activation, no dropout — different from the VAE);
mu/logvar/y heads; decoder mirror ending in input_len; discriminators
Linear(h)→LeakyReLU→Linear(h/2)→LeakyReLU→Linear(1)→Sigmoid. Loss weights:
ce (1-alpha)/ln(S) (SSE if single sample), sse alpha/(2*103); adversarial
mix (1-sl)*rec + sl*slr*adv_z + sl*(1-slr)*adv_y. The y prior is a
Gumbel-softmax (RelaxedOneHotCategorical) sample at temperature T.

TPU design: the three optimization phases run inside ONE jitted scan step;
discriminator phases stop-gradient the encoder outputs (the reference
computes those gradients and then discards them — same result, less work).
"""

from pathlib import Path
from typing import IO, Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.checkpoint import load_meta, load_pytree, save_pytree
from . import layers
from .dataset import VAEDataset, encode_chunk_rows
from .training import MetricsDrain, run_segments_aot, validate_batchsteps

_ENCODE_CHUNK = 1 << 16


def _init_bn_block(rng, nin, nout):
    bn_p, bn_s = layers.init_batchnorm(nout)
    return {"dense": layers.init_dense(rng, nin, nout), "bn": bn_p}, bn_s


class AAE:
    "Adversarial autoencoder with z + y latents (reference aamb_encode.py:19)."

    def __init__(
        self,
        nsamples: int,
        nhiddens: int = 547,
        nlatent_z: int = 283,
        nlatent_y: int = 700,
        sl: float = 0.00964,
        slr: float = 0.5,
        alpha: Optional[float] = None,
        seed: int = 0,
    ):
        for variable, name in [
            (nsamples, "nsamples"),
            (nhiddens, "nhiddens"),
            (nlatent_z, "nlatent_z"),
            (nlatent_y, "nlatent_y"),
        ]:
            if variable < 1:
                raise ValueError(f"{name} must be at least 1, not {variable}")
        for variable, name in [(sl, "sl"), (slr, "slr")]:
            if not (0.0 <= variable <= 1.0):
                raise ValueError(
                    f"{name} must be in the interval [0.0, 1.0], not {variable}"
                )
        if alpha is None:
            alpha = 0.15 if nsamples > 1 else 0.50

        self.nsamples = nsamples
        self.ntnf = 103
        self.input_len = self.ntnf + nsamples
        self.h_n = nhiddens
        self.ld = nlatent_z
        self.y_len = nlatent_y
        self.sl = sl
        self.slr = slr
        self.alpha = alpha
        self.seed = seed
        self.rng = jax.random.key(seed)
        self.params, self.bn_state = self._init_params(np.random.default_rng(seed))

    def _init_params(self, rng):
        h, half = self.h_n, self.h_n // 2
        enc1, bns1 = _init_bn_block(rng, self.input_len, h)
        enc2, bns2 = _init_bn_block(rng, h, h)
        dec1, bnd1 = _init_bn_block(rng, self.ld + self.y_len, h)
        dec2, bnd2 = _init_bn_block(rng, h, h)
        params = {
            "enc": [enc1, enc2],
            "mu": layers.init_dense(rng, h, self.ld),
            "logvar": layers.init_dense(rng, h, self.ld),
            "y": layers.init_dense(rng, h, self.y_len),
            "dec": [dec1, dec2],
            "dec_out": layers.init_dense(rng, h, self.input_len),
            "disc_z": [
                layers.init_dense(rng, self.ld, h),
                layers.init_dense(rng, h, half),
                layers.init_dense(rng, half, 1),
            ],
            "disc_y": [
                layers.init_dense(rng, self.y_len, h),
                layers.init_dense(rng, h, half),
                layers.init_dense(rng, half, 1),
            ],
        }
        bn_state = {"enc": [bns1, bns2], "dec": [bnd1, bnd2]}
        return params, bn_state

    # ------------------------------------------------------------- forward

    def _stack(self, blocks, states, x, train, axis_name=None):
        "Linear -> BatchNorm -> LeakyReLU blocks (AAE ordering)."
        new_states = []
        for p, s in zip(blocks, states):
            x = layers.dense(p["dense"], x)
            if train:
                x, s = layers.batchnorm_train(p["bn"], s, x, axis_name=axis_name)
            else:
                x = layers.batchnorm_eval(p["bn"], s, x)
            x = layers.leaky_relu(x)
            new_states.append(s)
        return x, new_states

    def encode_apply(self, params, bn_state, depths, tnf, train, axis_name=None):
        x = jnp.concatenate((depths, tnf), axis=1)
        h, enc_s = self._stack(params["enc"], bn_state["enc"], x, train, axis_name)
        mu = layers.dense(params["mu"], h)
        logvar = layers.dense(params["logvar"], h)
        y = jax.nn.softmax(layers.dense(params["y"], h), axis=1)
        return mu, logvar, y, enc_s

    def decode_apply(self, params, bn_state, z, y, train, axis_name=None):
        h, dec_s = self._stack(
            params["dec"], bn_state["dec"], jnp.concatenate((z, y), axis=1),
            train, axis_name,
        )
        rec = layers.dense(params["dec_out"], h)
        depths_out = jax.nn.softmax(rec[:, : self.nsamples], axis=1)
        tnf_out = rec[:, self.nsamples :]
        return depths_out, tnf_out, dec_s

    @staticmethod
    def _disc(blocks, x):
        x = layers.leaky_relu(layers.dense(blocks[0], x))
        x = layers.leaky_relu(layers.dense(blocks[1], x))
        return jax.nn.sigmoid(layers.dense(blocks[2], x))

    def calc_loss(self, depths_in, depths_out, tnf_in, tnf_out):
        "Reconstruction loss (reference :176-188)."
        if self.nsamples > 1:
            ce = jnp.mean(-jnp.sum(jnp.log(depths_out + 1e-9) * depths_in, axis=1))
            ce_weight = (1 - self.alpha) / np.log(self.nsamples)
        else:
            ce = jnp.mean(jnp.sum(jnp.square(depths_out - depths_in), axis=1))
            ce_weight = 1 - self.alpha
        sse = jnp.mean(jnp.sum(jnp.square(tnf_out - tnf_in), axis=1))
        sse_weight = self.alpha / (self.ntnf * 2)
        return ce * ce_weight + sse * sse_weight, ce, sse

    @staticmethod
    def _bce(pred, target):
        """torch.nn.BCELoss: mean binary cross-entropy on probabilities.

        Saturation safety: once a discriminator wins hard, the f32
        sigmoid returns exactly 1.0 (logits >~ 17) — reached within two
        epochs on real data — and a naive log(1 - p) is -inf with a NaN
        gradient. A clip to [eps, 1 - 1e-12] does NOT fix this
        (1 - 1e-12 rounds to 1.0 in f32). Torch's BCELoss stays finite
        by clamping log outputs at -100 and hand-clamping the backward
        denominator; its effective logit gradient at exact saturation is
        sigmoid'(x) * (p-t)/max(p(1-p), 1e-12) = 0. Clipping pred to the
        nearest f32 numbers STRICTLY inside (0,1) reproduces both: logs
        stay finite (log(tiny) ~ -87, within torch's -100 clamp) and the
        clip boundary zeroes the saturated term's gradient, so the logit
        gradient is (p - t) unsaturated and 0 at exact saturation —
        matching torch everywhere except the reported loss VALUE at
        exact saturation (~87/16.6 here vs torch's clamped 100), which
        gradients never see."""
        tiny = jnp.float32(np.finfo(np.float32).tiny)
        pmax = jnp.float32(1.0 - 2.0 ** -24)
        p = jnp.clip(pred, tiny, pmax)
        return jnp.mean(-(target * jnp.log(p) + (1 - target) * jnp.log1p(-p)))

    def _gumbel_softmax_prior(self, key, n, temperature):
        "RelaxedOneHotCategorical(T, uniform logits) sample."
        gumbel = -jnp.log(
            -jnp.log(jax.random.uniform(key, (n, self.y_len)) + 1e-20) + 1e-20
        )
        return jax.nn.softmax(gumbel / temperature, axis=1)

    # ------------------------------------------------------------ training

    def trainmodel(
        self,
        dataset: VAEDataset,
        nepochs: int = 70,
        batchsize: int = 256,
        batchsteps: Optional[list[int]] = [25, 50],
        temperature: float = 0.1596,
        modelfile: Union[None, str, Path, IO[bytes]] = None,
        logger: Optional[Callable[[str], None]] = None,
        mesh=None,
        segment_walls: Optional[list] = None,
    ) -> None:
        if nepochs < 1:
            raise ValueError(f"Minimum 1 epoch, not {nepochs}")
        batchsteps_list = validate_batchsteps(nepochs, batchsteps)
        log = logger if logger is not None else lambda _m: None
        log("\tNetwork properties:")
        log(f"\t    Alpha: {self.alpha}")
        log(f"\t    Y length: {self.y_len}")
        log(f"\t    Z length: {self.ld}")
        log("\tTraining properties:")
        log(f"\t    N epochs: {nepochs}")
        log(f"\t    Starting batch size: {batchsize}")
        log(
            "\t    Batchsteps: "
            + (", ".join(map(str, batchsteps_list)) if batchsteps_list else "None")
        )
        log(f"\t    N sequences: {dataset.n_obs}")
        log(f"\t    N samples: {dataset.nsamples}")

        opt_e = optax.adam(1e-3, eps=1e-8)
        opt_d = optax.adam(1e-3, eps=1e-8)
        opt_dz = optax.adam(1e-3, eps=1e-8)
        opt_dy = optax.adam(1e-3, eps=1e-8)

        enc_keys = ("enc", "mu", "logvar", "y")
        dec_keys = ("dec", "dec_out")

        def split_params(params):
            enc = {k: params[k] for k in enc_keys}
            dec = {k: params[k] for k in dec_keys}
            return enc, dec

        # re-shard each gathered batch across the mesh so devices split the
        # compute (without this GSPMD replicates the batch; see
        # models/vae.py:_make_epoch_fn)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            batch_sharding = NamedSharding(
                mesh, PartitionSpec(mesh.axis_names[0])
            )
        else:
            batch_sharding = None

        from functools import partial as _partial

        @_partial(
            jax.jit,
            static_argnames=("bs", "nb", "n_obs", "nepochs"),
            donate_argnums=(0,),
        )
        def epoch_fn(train_state, data, rng, bs, nb, n_obs=None, nepochs=1):
            # `nepochs` epochs per dispatch; per-epoch key chain identical
            # to the former host loop (see models/training.py epoch_fn).
            depths, tnf = data
            n = depths.shape[0] if n_obs is None else n_obs

            def one_epoch(carry, _):
                train_state, rng = carry
                params, bn_state, opts = train_state
                rng, key = jax.random.split(rng)
                perm_key, scan_key = jax.random.split(key)
                perm = jax.random.permutation(perm_key, n)[: nb * bs]
                if batch_sharding is None:
                    # one epoch-wide gather, contiguous slices per step
                    # (per-step row gathers dominate; see models/vae.py)
                    d_shuf, t_shuf = depths[perm], tnf[perm]

                    def get_batch(i):
                        return (
                            jax.lax.dynamic_slice_in_dim(d_shuf, i * bs, bs),
                            jax.lax.dynamic_slice_in_dim(t_shuf, i * bs, bs),
                        )
                else:
                    # sharded: per-step gathers keep per-device memory and
                    # per-step collectives batch-sized (see models/vae.py)
                    idx2 = perm.reshape(nb, bs)

                    def get_batch(i):
                        idx = jax.lax.dynamic_index_in_dim(idx2, i, keepdims=False)
                        return (
                            jax.lax.with_sharding_constraint(depths[idx], batch_sharding),
                            jax.lax.with_sharding_constraint(tnf[idx], batch_sharding),
                        )

                (params, bn_state, opts, _), metrics = jax.lax.scan(
                    make_step(get_batch),
                    (params, bn_state, opts, scan_key),
                    jnp.arange(nb),
                )
                return ((params, bn_state, opts), rng), jnp.mean(metrics, axis=0)

            def make_step(get_batch):
                def step(carry, i):
                    params, bn_state, opts, key = carry
                    st_e, st_d, st_dz, st_dy = opts
                    key, k_eps, k_prior_z, k_prior_y, k_eps2 = jax.random.split(key, 5)
                    d_in, t_in = get_batch(i)
                    ones = jnp.ones((bs, 1))
                    zeros_t = jnp.zeros((bs, 1))

                    # ---- generator phase: update encoder + decoder
                    def gen_loss(gen_params, bn_state):
                        params_full = {**params, **gen_params}
                        mu, logvar, y, enc_s = self.encode_apply(
                            params_full, bn_state, d_in, t_in, True
                        )
                        eps = jax.random.normal(k_eps, mu.shape)
                        z = eps * jnp.exp(logvar / 2) + mu
                        d_out, t_out, dec_s = self.decode_apply(
                            params_full, bn_state, z, y, True
                        )
                        rec_loss, ce, sse = self.calc_loss(d_in, d_out, t_in, t_out)
                        adv_z = self._bce(self._disc(params["disc_z"], z), ones)
                        adv_y = self._bce(self._disc(params["disc_y"], y), ones)
                        ed = (
                            (1 - self.sl) * rec_loss
                            + (self.sl * self.slr) * adv_z
                            + (self.sl * (1 - self.slr)) * adv_y
                        )
                        return ed, ({"enc": enc_s, "dec": dec_s}, rec_loss, ce, sse)

                    enc_p, dec_p = split_params(params)
                    gen_params = {**enc_p, **dec_p}
                    (ed_loss, (bn_state, rec_loss, ce, sse)), grads = (
                        jax.value_and_grad(gen_loss, has_aux=True)(gen_params, bn_state)
                    )
                    enc_grads = {k: grads[k] for k in enc_keys}
                    dec_grads = {k: grads[k] for k in dec_keys}
                    upd_e, st_e = opt_e.update(enc_grads, st_e, enc_p)
                    upd_d, st_d = opt_d.update(dec_grads, st_d, dec_p)
                    params = {
                        **params,
                        **optax.apply_updates(enc_p, upd_e),
                        **optax.apply_updates(dec_p, upd_d),
                    }

                    # ---- discriminator z phase (fresh encode, grads only to disc)
                    bn_enc_before = bn_state["enc"]
                    mu, logvar, y_lat, bn_enc_s = self.encode_apply(
                        params, bn_state, d_in, t_in, True
                    )
                    bn_state = {"enc": bn_enc_s, "dec": bn_state["dec"]}
                    eps2 = jax.random.normal(k_eps2, mu.shape)
                    z_latent = jax.lax.stop_gradient(eps2 * jnp.exp(logvar / 2) + mu)
                    y_latent = jax.lax.stop_gradient(y_lat)
                    z_prior = jax.random.normal(k_prior_z, (bs, self.ld))
                    y_prior = self._gumbel_softmax_prior(k_prior_y, bs, temperature)

                    def dz_loss(disc_z):
                        return 0.5 * (
                            self._bce(self._disc(disc_z, z_prior), ones)
                            + self._bce(self._disc(disc_z, z_latent), zeros_t)
                        )

                    dz, grads_z = jax.value_and_grad(dz_loss)(params["disc_z"])
                    upd_z, st_dz = opt_dz.update(grads_z, st_dz, params["disc_z"])
                    params = {
                        **params,
                        "disc_z": optax.apply_updates(params["disc_z"], upd_z),
                    }

                    # ---- discriminator y phase
                    # The reference encodes a THIRD time for this phase
                    # (aamb_encode.py disc-y step). Its outputs are identical
                    # to the disc-z encode (same params, same batch) — only
                    # the encoder BN running-stat EMA applies once more,
                    # which eval-mode latent parity needs. With momentum m
                    # and batch stats b: s2 = (1-m)s1 + m*b and
                    # s3 = (1-m)s2 + m*b, so s3 = (2-m)*s2 - (1-m)*s1 —
                    # apply that closed form instead of a redundant forward.
                    m = 0.1  # layers.batchnorm_train default momentum
                    bn_enc_s3 = jax.tree.map(
                        lambda s2, s1: (2 - m) * s2 - (1 - m) * s1,
                        bn_enc_s, bn_enc_before,
                    )
                    bn_state = {"enc": bn_enc_s3, "dec": bn_state["dec"]}

                    def dy_loss(disc_y):
                        return 0.5 * (
                            self._bce(self._disc(disc_y, y_prior), ones)
                            + self._bce(self._disc(disc_y, y_latent), zeros_t)
                        )

                    dy, grads_y = jax.value_and_grad(dy_loss)(params["disc_y"])
                    upd_y, st_dy = opt_dy.update(grads_y, st_dy, params["disc_y"])
                    params = {
                        **params,
                        "disc_y": optax.apply_updates(params["disc_y"], upd_y),
                    }

                    metrics = jnp.stack([ed_loss, rec_loss, ce, sse, dz, dy])
                    return (params, bn_state, (st_e, st_d, st_dz, st_dy), key), metrics

                return step

            (train_state, rng), metrics = jax.lax.scan(
                one_epoch, (train_state, rng), None, length=nepochs
            )
            return train_state, rng, metrics  # (nepochs, 6)

        data = (jnp.asarray(dataset.depths), jnp.asarray(dataset.tnf))
        enc_p, dec_p = split_params(self.params)
        opts = (
            opt_e.init(enc_p),
            opt_d.init(dec_p),
            opt_dz.init(self.params["disc_z"]),
            opt_dy.init(self.params["disc_y"]),
        )
        train_state = (self.params, self.bn_state, opts)
        if mesh is not None:
            from ..parallel.mesh import replicate, shard_rows_padded

            data = tuple(shard_rows_padded(np.asarray(a), mesh) for a in data)
            train_state = replicate(train_state, mesh)

        def emit(epoch, m, bs, seconds):
            log(
                "\t\tEpoch: {:>3} Loss Enc/Dec: {:.5e} Rec. loss: {:.5e} "
                "CE: {:.5e} SSE: {:.5e} Dz loss: {:.5e} Dy loss: {:.5e} "
                "Batchsize: {:>4}  ({:.2f}s)".format(
                    epoch + 1, m[0], m[1], m[2], m[3], m[4], m[5], bs, seconds,
                )
            )

        drain = MetricsDrain(emit)
        train_state, rng = run_segments_aot(
            epoch_fn, train_state, data, self.rng,
            dataset.n_obs, nepochs, batchsize, batchsteps_list, drain.push,
            lambda bsz, nb, seg: dict(
                bs=bsz, nb=nb, n_obs=dataset.n_obs, nepochs=seg
            ),
            segment_walls=segment_walls,
        )
        drain.flush()
        self.rng = rng
        params, bn_state, _ = train_state
        self.params = jax.tree.map(np.asarray, params)
        self.bn_state = jax.tree.map(np.asarray, bn_state)

        if modelfile is not None:
            try:
                self.save(modelfile)
            except Exception:
                pass

    # ------------------------------------------------------------- latents

    def get_latents(
        self, contignames, dataset: VAEDataset
    ) -> tuple[dict[str, set[str]], np.ndarray]:
        """(y-argmax cluster dict, z latent matrix), eval mode
        (reference :434-512)."""

        @jax.jit
        def fwd(params, bn_state, depths, tnf):
            mu, _logvar, y, _ = self.encode_apply(
                params, bn_state, depths, tnf, False
            )
            return mu, jnp.argmax(y, axis=1)

        n = dataset.n_obs
        latent = np.empty((n, self.ld), dtype=np.float32)
        clust_y_dict: dict[str, set[str]] = dict()
        chunk = encode_chunk_rows(n, _ENCODE_CHUNK)
        for start in range(0, n, chunk):
            stop = min(start + chunk, n)
            d = dataset.depths[start:stop]
            t = dataset.tnf[start:stop]
            if stop - start < chunk:
                pad = chunk - (stop - start)
                d = np.concatenate([d, np.zeros((pad, d.shape[1]), d.dtype)])
                t = np.concatenate([t, np.zeros((pad, t.shape[1]), t.dtype)])
            mu, y_idx = fwd(self.params, self.bn_state, d, t)
            latent[start:stop] = np.asarray(mu)[: stop - start]
            for i, y in enumerate(np.asarray(y_idx)[: stop - start]):
                name = str(int(y) + 1)
                clust_y_dict.setdefault(name, set()).add(contignames[start + i])
        return clust_y_dict, latent

    # ------------------------------------------------------------ save/load

    def save(self, io: Union[str, Path, IO[bytes]]) -> None:
        save_pytree(
            io,
            {"params": self.params, "bn_state": self.bn_state},
            meta={
                "model": "aae",
                "nsamples": self.nsamples,
                "nhiddens": self.h_n,
                "nlatent_z": self.ld,
                "nlatent_y": self.y_len,
                "sl": self.sl,
                "slr": self.slr,
                "alpha": self.alpha,
                "seed": self.seed,
            },
        )

    @classmethod
    def load(cls, io: Union[str, Path, IO[bytes]]) -> "AAE":
        meta = load_meta(io)
        model = cls(
            nsamples=meta["nsamples"],
            nhiddens=meta["nhiddens"],
            nlatent_z=meta["nlatent_z"],
            nlatent_y=meta["nlatent_y"],
            sl=meta["sl"],
            slr=meta["slr"],
            alpha=meta["alpha"],
            seed=meta.get("seed", 0),
        )
        if hasattr(io, "seek"):
            io.seek(0)
        tree, _ = load_pytree(io, {"params": model.params, "bn_state": model.bn_state})
        model.params = tree["params"]
        model.bn_state = tree["bn_state"]
        return model

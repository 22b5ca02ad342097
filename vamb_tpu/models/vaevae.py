"""Semi-supervised bi-modal VAEVAE (TaxVamb's model).

Behavioral parity: reference vamb/semisupervised_encode.py:700-1145 (VAEVAE)
and vamb/taxvamb_encode.py:277-743 (the hierarchical-loss variants). Three
sub-VAEs share one latent space:

* `vamb`  — the plain feature VAE over [depths ‖ TNF ‖ total-ab]
  (fixed-sigma latent noise, exact 4-term loss);
* `labels` — a VAE over one-hot labels only (input = output = N_l,
  CE or hierarchical label loss + KLD);
* `joint` — a VAE over the concatenation [depths ‖ TNF ‖ ab ‖ labels],
  whose mu is decoded through BOTH single-modality decoders; its loss pulls
  mu_joint toward the single-modality encoders' mus on the same rows via
  kld_gauss both ways (semisupervised_encode.py:762-827).

Each training step processes a supervised batch and an (independently
permuted) unsupervised batch of the same rows and sums the three losses;
the composite trains with plain Adam lr=1e-3, matching the reference
(semisupervised_encode.py:1048-1053 — NOT D-Adaptation, unlike the other
models). Label CE is standard one-hot cross-entropy, or one of the
hierarchical losses when `hier_loss` is given (TaxVamb default flat_softmax).

TPU design: identical scan-per-epoch machinery as models/vae.py — the three
sub-VAEs evaluate inside ONE fused jitted step, so the whole composite is a
single XLA program per batch size.
"""

from pathlib import Path
from typing import IO, Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import mask_lower_bits
from ..utils.checkpoint import load_meta, load_pytree, save_pytree
from . import hier, layers
from .dataset import VAEDataset, encode_chunk_rows
from .training import MetricsDrain, run_segments_aot, validate_batchsteps

_ENCODE_CHUNK = 1 << 16


def kld_gauss(p_mu, p_logstd, q_mu, q_logstd):
    "Elementwise-mean KL(N(p) || N(q)) (semisupervised_encode.py:79-86)."
    loss = (
        q_logstd
        - p_logstd
        + (jnp.exp(p_logstd) ** 2 + (p_mu - q_mu) ** 2)
        / (2 * jnp.exp(q_logstd) ** 2)
        - 0.5
    )
    return jnp.mean(loss)


class _SubVAE:
    "Dims + pure apply fns for one encoder/decoder pair (VAE layout)."

    def __init__(self, nin: int, nhiddens: list[int], nlatent: int, nout: int, dropout: float):
        self.nin = nin
        self.nhiddens = nhiddens
        self.nlatent = nlatent
        self.nout = nout
        self.dropout = dropout

    def init(self, rng: np.random.Generator):
        dims_enc = [self.nin] + self.nhiddens
        dims_dec = [self.nlatent] + self.nhiddens[::-1]
        params: dict = {"enc": [], "dec": []}
        bn: dict = {"enc": [], "dec": []}
        for nin, nout in zip(dims_enc, dims_enc[1:]):
            bn_p, bn_s = layers.init_batchnorm(nout)
            params["enc"].append({"dense": layers.init_dense(rng, nin, nout), "bn": bn_p})
            bn["enc"].append(bn_s)
        params["mu"] = layers.init_dense(rng, self.nhiddens[-1], self.nlatent)
        for nin, nout in zip(dims_dec, dims_dec[1:]):
            bn_p, bn_s = layers.init_batchnorm(nout)
            params["dec"].append({"dense": layers.init_dense(rng, nin, nout), "bn": bn_p})
            bn["dec"].append(bn_s)
        params["out"] = layers.init_dense(rng, self.nhiddens[0], self.nout)
        return params, bn

    def _stack(self, stack_p, stack_s, x, train, key, axis_name,
               dropout_bits=None):
        new_states = []
        for i, (p, s) in enumerate(zip(stack_p, stack_s)):
            x = layers.leaky_relu(layers.dense(p["dense"], x))
            if train:
                if dropout_bits is not None:
                    x = layers.dropout_from_bits(dropout_bits[i], x, self.dropout)
                else:
                    x = layers.dropout(
                        jax.random.fold_in(key, i), x, self.dropout)
                x, s = layers.batchnorm_train(p["bn"], s, x, axis_name=axis_name)
            else:
                x = layers.batchnorm_eval(p["bn"], s, x)
            new_states.append(s)
        return x, new_states

    def encode(self, params, bn, x, train, key=None, axis_name=None,
               dropout_bits=None):
        h, enc_s = self._stack(params["enc"], bn["enc"], x, train, key,
                               axis_name, dropout_bits)
        return layers.dense(params["mu"], h), enc_s

    def decode(self, params, bn, latent, train, key=None, axis_name=None,
               dropout_bits=None):
        h, dec_s = self._stack(params["dec"], bn["dec"], latent, train, key,
                               axis_name, dropout_bits)
        return layers.dense(params["out"], h), dec_s


class VAEVAE:
    """Bi-modal semi-supervised VAE composite (TaxVamb when `hier_loss` set).

    `nodes`/`table_parent` are required for hierarchical losses; with
    `hier_loss=None` the label loss is plain one-hot cross-entropy
    (the reference's `VAEVAE`).
    """

    def __init__(
        self,
        nsamples: int,
        nlabels: int,
        nodes: Optional[list[str]] = None,
        table_parent: Optional[list[int]] = None,
        nhiddens: Optional[list[int]] = None,
        nlatent: int = 32,
        alpha: Optional[float] = None,
        beta: float = 200.0,
        dropout: Optional[float] = 0.2,
        hier_loss: Optional[str] = None,
        seed: int = 0,
    ):
        if nsamples < 1:
            raise ValueError(f"nsamples must be > 0, not {nsamples}")
        if alpha is None:
            alpha = 0.15 if nsamples > 1 else 0.50
        if nhiddens is None:
            nhiddens = [512, 512] if nsamples > 1 else [256, 256]
        if dropout is None:
            dropout = 0.2 if nsamples > 1 else 0.0
        if beta <= 0:
            raise ValueError(f"beta must be > 0, not {beta}")
        if not (0 < alpha < 1):
            raise ValueError(f"alpha must be 0 < alpha < 1, not {alpha}")
        if not (0 <= dropout < 1):
            raise ValueError(f"dropout must be 0 <= dropout < 1, not {dropout}")

        self.nsamples = nsamples
        self.ntnf = 103
        self.n_input_labels = max(nlabels, 105)  # N_l (reference :733)
        self.n_tree_nodes = nlabels
        self.nhiddens = list(nhiddens)
        self.nlatent = nlatent
        self.alpha = alpha
        self.beta = beta
        self.dropout = dropout
        self.seed = seed
        self.hier_loss_name = hier_loss
        self.nodes = nodes
        self.table_parent = table_parent

        N_l = self.n_input_labels
        nfeat = nsamples + self.ntnf + 1
        self.vamb = _SubVAE(nfeat, self.nhiddens, nlatent, nfeat, self.dropout)
        self.labels_vae = _SubVAE(N_l, self.nhiddens, nlatent, N_l, self.dropout)
        self.joint = _SubVAE(
            nfeat + N_l, self.nhiddens, nlatent, nfeat + N_l, self.dropout
        )

        if hier_loss is not None:
            if nodes is None or table_parent is None:
                raise ValueError("hier_loss requires nodes and table_parent")
            self.tree = hier.Hierarchy(np.array(table_parent))
            if hier_loss == "flat_softmax":
                self._label_loss = hier.FlatSoftmaxNLL(self.tree)
                self._label_logits = self.tree.num_leaf_nodes()
            elif hier_loss == "cond_softmax":
                self._label_loss = hier.HierSoftmaxCrossEntropy(self.tree)
                self._label_logits = self.tree.num_nodes() - 1
            elif hier_loss == "soft_margin":
                self._label_loss = hier.MarginLoss(
                    self.tree, hardness="soft", margin="incorrect", tau=0.01
                )
                self._label_logits = self.tree.num_nodes()
            else:
                raise AttributeError(f"Hierarchical loss {hier_loss} not found")
            # the label decoders emit hloss logits instead of N_l logits
            self.labels_vae = _SubVAE(
                N_l, self.nhiddens, nlatent, self._label_logits, self.dropout
            )
            self.joint = _SubVAE(
                nfeat + N_l, self.nhiddens, nlatent, nfeat + self._label_logits,
                self.dropout,
            )
        else:
            self.tree = None
            self._label_loss = None
            self._label_logits = N_l

        rng = np.random.default_rng(seed)
        pv, bv = self.vamb.init(rng)
        pl, bl = self.labels_vae.init(rng)
        pj, bj = self.joint.init(rng)
        self.params = {"vamb": pv, "labels": pl, "joint": pj}
        self.bn_state = {"vamb": bv, "labels": bl, "joint": bj}
        self.rng = jax.random.key(seed)

    # -------------------------------------------------------------- losses

    def _label_ce(self, logits, onehot):
        "Mean label loss: hloss or standard one-hot CE."
        if self._label_loss is not None:
            return self._label_loss(logits, onehot[:, : self.n_tree_nodes])
        idx = jnp.argmax(onehot, axis=1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.mean(-jnp.take_along_axis(logp, idx[:, None], axis=-1))

    def _split_features(self, rec):
        depths = rec[:, : self.nsamples]
        tnf = rec[:, self.nsamples : self.nsamples + self.ntnf]
        ab = rec[:, self.nsamples + self.ntnf : self.nsamples + self.ntnf + 1]
        rest = rec[:, self.nsamples + self.ntnf + 1 :]
        return depths, tnf, ab, rest

    def _vamb_loss(self, depths_in, d_out, tnf_in, t_out, ab_in, a_out, mu, weights):
        "The plain VAE loss (encode.py:316-357 semantics)."
        ab_sse = jnp.sum(jnp.square(a_out - ab_in), axis=1)
        ce = -jnp.sum(jnp.log(d_out + 1e-9) * depths_in, axis=1)
        sse = jnp.sum(jnp.square(t_out - tnf_in), axis=1)
        kld = 0.5 * jnp.sum(jnp.square(mu), axis=1)
        if self.nsamples == 1:
            ce_weight = 0.0
        else:
            ce_weight = ((1 - self.alpha) * (self.nsamples - 1)) / (
                self.nsamples * np.log(self.nsamples)
            )
        ab_w = (1 - self.alpha) / self.nsamples
        sse_w = self.alpha / self.ntnf
        kld_w = 1 / (self.nlatent * self.beta)
        # reference-exact: (B,) loss x (B,1) weights broadcasts to (B,B) in
        # the reference (semisupervised_encode.py:558), so its mean equals
        # mean(loss) * mean(weights) — see models/vae.py calc_loss
        loss = jnp.mean(
            ce * ce_weight + ab_sse * ab_w + sse * sse_w + kld * kld_w
        ) * jnp.mean(weights[:, 0])
        return loss, jnp.mean(ce), jnp.mean(sse), jnp.mean(kld)

    def calc_loss_labels(self, logits, onehot, mu):
        """Labels-only sub-VAE loss (reference VAELabels.calc_loss,
        semisupervised_encode.py:248-257): label CE plus mu-only KLD
        (logsigma is identically zero in the fixed-noise latent)."""
        ce_lab = self._label_ce(logits, onehot)
        kld_lab = 0.5 * jnp.mean(jnp.sum(jnp.square(mu), axis=1))
        kld_w = 1 / (self.nlatent * self.beta)
        return ce_lab + kld_lab * kld_w, ce_lab, kld_lab

    def calc_loss_joint(
        self,
        depths_in,
        d_out,
        tnf_in,
        t_out,
        ab_in,
        a_out,
        labels_logits,
        labels_onehot,
        mu_sup,
        mu_vamb_unsup,
        mu_labels_unsup,
        weights,
    ):
        """Joint sub-VAE loss (reference VAEVAE.calc_loss_joint,
        semisupervised_encode.py:762-827): the 3-term feature
        reconstruction, label CE, and symmetric-pair kld_gauss terms
        against the two single-modality posteriors (logsigmas are zero).
        The per-contig weights enter via the reference's degenerate (B,B)
        broadcast, whose mean factorizes (see models/vae.py calc_loss)."""
        ab_sse_j = jnp.sum(jnp.square(a_out - ab_in), axis=1)
        ce_j = -jnp.sum(jnp.log(d_out + 1e-9) * depths_in, axis=1)
        sse_j = jnp.sum(jnp.square(t_out - tnf_in), axis=1)
        if self.nsamples == 1:
            ce_weight = 0.0
        else:
            ce_weight = ((1 - self.alpha) * (self.nsamples - 1)) / (
                self.nsamples * np.log(self.nsamples)
            )
        ab_w = (1 - self.alpha) / self.nsamples
        sse_w = self.alpha / self.ntnf
        kld_w = 1 / (self.nlatent * self.beta)
        ce_labels_j = self._label_ce(labels_logits, labels_onehot)
        zeros = jnp.zeros_like(mu_sup)
        kld_vamb_j = kld_gauss(mu_sup, zeros, mu_vamb_unsup, zeros)
        kld_lab_j = kld_gauss(mu_sup, zeros, mu_labels_unsup, zeros)
        rec_j = ce_j * ce_weight + ab_sse_j * ab_w + sse_j * sse_w + ce_labels_j
        loss = jnp.mean(
            rec_j + (kld_vamb_j + kld_lab_j) * kld_w
        ) * jnp.mean(weights[:, 0])
        return loss, jnp.mean(ce_j), jnp.mean(sse_j), ce_labels_j, kld_vamb_j, kld_lab_j

    # ------------------------------------------------------------- forward

    # number of _SubVAE stack invocations per step (each = 2 dropout layers);
    # the per-epoch dropout byte bank allocates one slot pair per invocation
    _N_STACK_CALLS = 9
    # encode (e) / decode (d) per invocation, in _step_losses call order —
    # decode stacks run the hidden widths reversed
    _STACK_KINDS = "eddededde"

    def _draw_dropout_bank(self, key, batchsize):
        """One epoch's dropout bytes for every stack invocation and layer
        (distinct slices per slot; per-step rotation in the step). Same
        construction and soundness argument as models/vae.py's bank."""
        import os

        if self.dropout == 0.0 or os.environ.get("VAMB_TPU_DROPOUT_MODE") == "step":
            return None
        widths: list[int] = []
        for kind in self._STACK_KINDS:
            widths += self.nhiddens if kind == "e" else self.nhiddens[::-1]
        total = sum(widths)
        nwords = (total + 3) // 4
        words = jax.random.bits(key, (batchsize, nwords), jnp.uint32)
        bits = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(
            batchsize, nwords * 4)
        slices, off = [], 0
        for w in widths:
            slices.append(bits[:, off : off + w])
            off += w
        return slices

    def _step_losses(self, params, bn_state, sup, unsup, key, bank=None):
        """All three sub-VAE losses for one (sup, unsup) batch pair.

        Mirrors reference VAEVAE.trainepoch (semisupervised_encode.py:829-1008).
        Returns (total_loss, new_bn_state, metrics vector). `bank`, when
        given, is a list of len(nhiddens)*_N_STACK_CALLS uint8 (B, width)
        arrays — one pre-drawn dropout byte slice per (stack invocation,
        layer); each of the nine forwards below then applies byte-mask
        dropout instead of drawing threefry bytes in-step (18 (B,512) draws
        per step dominated this family's training throughput)."""
        d_s, t_s, a_s, w_s, y_s = sup
        d_u, t_u, a_u, w_u, y_u = unsup
        keys = jax.random.split(key, 12)
        L = len(self.nhiddens)
        slots = (lambda j: None) if bank is None else (
            lambda j: bank[L * j : L * (j + 1)])

        # --- joint forward on supervised rows
        x_joint = jnp.concatenate((d_s, t_s, a_s, y_s), axis=1)
        mu_sup, joint_enc_s = self.joint.encode(
            params["joint"], bn_state["joint"], x_joint, True, keys[0],
            dropout_bits=slots(0)
        )
        # decode mu_sup through the single-modality decoders (fresh noise each)
        eps1 = jax.random.normal(keys[1], mu_sup.shape)
        rec_vamb_sup, vamb_dec_s = self.vamb.decode(
            params["vamb"], bn_state["vamb"], mu_sup + eps1, True, keys[2],
            dropout_bits=slots(1)
        )
        d_os, t_os, a_os, _ = self._split_features(rec_vamb_sup)
        d_os = jax.nn.softmax(d_os, axis=1)
        eps2 = jax.random.normal(keys[3], mu_sup.shape)
        y_logits_sup, labels_dec_s = self.labels_vae.decode(
            params["labels"], bn_state["labels"], mu_sup + eps2, True, keys[4],
            dropout_bits=slots(2)
        )

        # --- single-modality forwards
        x_u = jnp.concatenate((d_u, t_u, a_u), axis=1)
        mu_vamb_u, vamb_enc_s = self.vamb.encode(
            params["vamb"], bn_state["vamb"], x_u, True, keys[5],
            dropout_bits=slots(3)
        )
        eps3 = jax.random.normal(keys[6], mu_vamb_u.shape)
        rec_vamb_u, vamb_dec_s2 = self.vamb.decode(
            params["vamb"], bn_state["vamb"], mu_vamb_u + eps3, True, keys[7],
            dropout_bits=slots(4)
        )
        d_ou, t_ou, a_ou, _ = self._split_features(rec_vamb_u)
        d_ou = jax.nn.softmax(d_ou, axis=1)

        x_s = jnp.concatenate((d_s, t_s, a_s), axis=1)
        mu_vamb_s, vamb_enc_s2 = self.vamb.encode(
            params["vamb"], bn_state["vamb"], x_s, True, keys[8],
            dropout_bits=slots(5)
        )

        mu_lab_u, labels_enc_s = self.labels_vae.encode(
            params["labels"], bn_state["labels"], y_u, True, keys[9],
            dropout_bits=slots(6)
        )
        eps4 = jax.random.normal(keys[10], mu_lab_u.shape)
        y_logits_u, labels_dec_s2 = self.labels_vae.decode(
            params["labels"], bn_state["labels"], mu_lab_u + eps4, True, keys[11],
            dropout_bits=slots(7)
        )
        mu_lab_s, labels_enc_s2 = self.labels_vae.encode(
            params["labels"], bn_state["labels"], y_s, True, keys[9],
            dropout_bits=slots(8)
        )

        # --- losses
        loss_vamb, ce_vamb, sse_vamb, kld_vamb = self._vamb_loss(
            d_u, d_ou, t_u, t_ou, a_u, a_ou, mu_vamb_u, w_u
        )
        loss_labels, ce_lab, kld_lab = self.calc_loss_labels(y_logits_u, y_u, mu_lab_u)
        loss_joint, _, _, ce_labels_j, _, _ = self.calc_loss_joint(
            d_s, d_os, t_s, t_os, a_s, a_os, y_logits_sup, y_s,
            mu_sup, mu_vamb_s, mu_lab_s, w_s,
        )

        total = loss_joint + loss_vamb + loss_labels

        # batchnorm state: take the last evaluation of each stack
        new_bn = {
            "vamb": {"enc": vamb_enc_s2, "dec": vamb_dec_s2},
            "labels": {"enc": labels_enc_s2, "dec": labels_dec_s2},
            "joint": {"enc": joint_enc_s, "dec": bn_state["joint"]["dec"]},
        }
        metrics = jnp.stack(
            [total, loss_vamb, loss_labels, loss_joint, ce_vamb, sse_vamb,
             kld_vamb, ce_lab, kld_lab, ce_labels_j]
        )
        return total, new_bn, metrics

    # ------------------------------------------------------------ training

    def trainmodel(
        self,
        dataset: VAEDataset,
        targets: np.ndarray,
        nepochs: int = 500,
        batchsize: int = 256,
        batchsteps: Optional[list[int]] = [25, 75, 150, 300],
        modelfile: Union[None, str, Path, IO[bytes]] = None,
        logger: Optional[Callable[[str], None]] = None,
        mesh=None,
        segment_walls: Optional[list] = None,
    ) -> None:
        if nepochs < 1:
            raise ValueError(f"Minimum 1 epoch, not {nepochs}")
        if dataset.n_obs < 2:
            raise ValueError("Cannot train on fewer than 2 sequences")
        batchsteps_list = validate_batchsteps(nepochs, batchsteps)
        log = logger if logger is not None else lambda _m: None
        log("\tNetwork properties:")
        log(f"\t    Alpha: {self.alpha}")
        log(f"\t    Beta: {self.beta}")
        log(f"\t    Dropout: {self.dropout}")
        log(f"\t    N hidden: {', '.join(map(str, self.nhiddens))}")
        log(f"\t    N latent: {self.nlatent}")
        log("\tTraining properties:")
        log(f"\t    N epochs: {nepochs}")
        log(f"\t    Starting batch size: {batchsize}")
        log(
            "\t    Batchsteps: "
            + (", ".join(map(str, batchsteps_list)) if batchsteps_list else "None")
        )
        log(f"\t    N sequences: {dataset.n_obs}")
        log(f"\t    N samples: {dataset.nsamples}")

        # plain Adam lr=1e-3 over all three sub-VAEs (reference :1048-1053)
        optimizer = optax.adam(1e-3, eps=1e-8)
        N_l = self.n_input_labels

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
            depths, tnf, ab, weights, targets_i = data
            n = depths.shape[0] if n_obs is None else n_obs

            def one_epoch(carry, _):
                train_state, rng = carry
                params, bn_state, opt_state = train_state
                rng, key = jax.random.split(rng)
                k_sup, k_unsup, scan_key, bank_key = jax.random.split(key, 4)
                bank = self._draw_dropout_bank(bank_key, bs)
                perm_sup = jax.random.permutation(k_sup, n)[: nb * bs]
                perm_uns = jax.random.permutation(k_unsup, n)[: nb * bs]

                if batch_sharding is None:
                    # one epoch-wide gather per stream, contiguous slices per
                    # step (per-step row gathers dominate; see models/vae.py)
                    shuf_s = tuple(a[perm_sup] for a in (depths, tnf, ab, weights, targets_i))
                    shuf_u = tuple(a[perm_uns] for a in (depths, tnf, ab, weights, targets_i))

                    def gather(shuf, i):
                        d, t, a, w, tg = (
                            jax.lax.dynamic_slice_in_dim(x, i * bs, bs) for x in shuf
                        )
                        onehot = jax.nn.one_hot(tg, N_l, dtype=jnp.float32)
                        return (d, t, a, w, onehot)
                else:
                    # sharded: per-step gathers keep per-device memory and
                    # per-step collectives batch-sized (see models/vae.py)
                    shuf_s = perm_sup.reshape(nb, bs)
                    shuf_u = perm_uns.reshape(nb, bs)

                    def gather(idx2, i):
                        idx = jax.lax.dynamic_index_in_dim(idx2, i, keepdims=False)
                        onehot = jax.nn.one_hot(targets_i[idx], N_l, dtype=jnp.float32)
                        batch = (depths[idx], tnf[idx], ab[idx], weights[idx], onehot)
                        return tuple(
                            jax.lax.with_sharding_constraint(x, batch_sharding)
                            for x in batch
                        )

                def step(carry, i):
                    params, bn_state, opt_state, key = carry
                    key, sub = jax.random.split(key)
                    if bank is None:
                        bank_i = None
                    else:
                        # per-step rotation of the epoch's dropout bytes
                        # (uint8 add fuses into the threshold compare)
                        rot = (i * 97).astype(jnp.uint8)
                        bank_i = [b + rot for b in bank]

                    def loss_fn(params, bn_state):
                        total, new_bn, metrics = self._step_losses(
                            params, bn_state, gather(shuf_s, i), gather(shuf_u, i), sub,
                            bank=bank_i,
                        )
                        return total, (new_bn, metrics)

                    (_, (bn_state, metrics)), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(params, bn_state)
                    updates, opt_state = optimizer.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, bn_state, opt_state, key), metrics

                (params, bn_state, opt_state, _), metrics = jax.lax.scan(
                    step, (params, bn_state, opt_state, scan_key),
                    jnp.arange(nb),
                )
                return ((params, bn_state, opt_state), rng), jnp.mean(metrics, axis=0)

            (train_state, rng), metrics = jax.lax.scan(
                one_epoch, (train_state, rng), None, length=nepochs
            )
            return train_state, rng, metrics  # (nepochs, n_metrics)

        data = (
            jnp.asarray(dataset.depths),
            jnp.asarray(dataset.tnf),
            jnp.asarray(dataset.abundance),
            jnp.asarray(dataset.weights),
            jnp.asarray(np.asarray(targets, dtype=np.int32)),
        )
        opt_state = optimizer.init(self.params)
        train_state = (self.params, self.bn_state, opt_state)
        if mesh is not None:
            from ..parallel.mesh import replicate, shard_rows_padded

            data = tuple(shard_rows_padded(np.asarray(a), mesh) for a in data)
            train_state = replicate(train_state, mesh)

        names = [
            "loss", "loss_vamb", "loss_labels", "loss_joint", "ce_vamb",
            "sse_vamb", "kld_vamb", "ce_labels", "kld_labels", "ce_labels_joint",
        ]
        def emit(epoch, m, bs, seconds):
            log(
                f"\t\tEpoch: {epoch + 1}  "
                + "  ".join(f"{k}: {v:.5e}" for k, v in zip(names, m))
                + f"  Batchsize: {bs}  ({seconds:.2f}s)"
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

    # ------------------------------------------------------------- encode

    def encode_joint(self, dataset: VAEDataset, targets: np.ndarray) -> np.ndarray:
        "mu of the joint encoder for every row (eval mode, mantissa-masked)."
        N_l = self.n_input_labels

        @jax.jit
        def fwd(params, bn_state, depths, tnf, ab, targets_i):
            onehot = jax.nn.one_hot(targets_i, N_l, dtype=jnp.float32)
            x = jnp.concatenate((depths, tnf, ab, onehot), axis=1)
            mu, _ = self.joint.encode(params["joint"], bn_state["joint"], x, False)
            return mu

        n = dataset.n_obs
        latent = np.empty((n, self.nlatent), dtype=np.float32)
        chunk = encode_chunk_rows(n, _ENCODE_CHUNK)
        targets = np.asarray(targets, dtype=np.int32)
        for start in range(0, n, chunk):
            stop = min(start + chunk, n)
            d = dataset.depths[start:stop]
            t = dataset.tnf[start:stop]
            a = dataset.abundance[start:stop]
            y = targets[start:stop]
            if stop - start < chunk:
                pad = chunk - (stop - start)
                d = np.concatenate([d, np.zeros((pad, d.shape[1]), d.dtype)])
                t = np.concatenate([t, np.zeros((pad, t.shape[1]), t.dtype)])
                a = np.concatenate([a, np.zeros((pad, a.shape[1]), a.dtype)])
                y = np.concatenate([y, np.zeros(pad, y.dtype)])
            mu = np.asarray(fwd(self.params, self.bn_state, d, t, a, y))
            latent[start:stop] = mu[: stop - start]
        mask_lower_bits(latent, 12)
        return latent

    # ------------------------------------------------------------ save/load

    def save(self, io: Union[str, Path, IO[bytes]]) -> None:
        save_pytree(
            io,
            {"params": self.params, "bn_state": self.bn_state},
            meta={
                "model": "vaevae",
                "nsamples": self.nsamples,
                "nlabels": self.n_tree_nodes,
                "nhiddens": self.nhiddens,
                "nlatent": self.nlatent,
                "alpha": self.alpha,
                "beta": self.beta,
                "dropout": self.dropout,
                "hier_loss": self.hier_loss_name,
                "nodes": self.nodes,
                "table_parent": self.table_parent,
                "seed": self.seed,
            },
        )

    @classmethod
    def load(cls, io: Union[str, Path, IO[bytes]]) -> "VAEVAE":
        meta = load_meta(io)
        model = cls(
            nsamples=meta["nsamples"],
            nlabels=meta["nlabels"],
            nodes=meta["nodes"],
            table_parent=meta["table_parent"],
            nhiddens=meta["nhiddens"],
            nlatent=meta["nlatent"],
            alpha=meta["alpha"],
            beta=meta["beta"],
            dropout=meta["dropout"],
            hier_loss=meta["hier_loss"],
            seed=meta.get("seed", 0),
        )
        if hasattr(io, "seek"):
            io.seek(0)
        tree, _ = load_pytree(io, {"params": model.params, "bn_state": model.bn_state})
        model.params = tree["params"]
        model.bn_state = tree["bn_state"]
        return model

"""Taxometer: feed-forward taxonomy predictor with hierarchical losses.

Behavioral parity: reference vamb/taxvamb_encode.py:746-1106 (`VAMB2Label`).
An MLP over [depths_S ‖ TNF_103 ‖ total_ab_1] producing per-node logits,
trained with one of three hierarchical losses (flat_softmax / cond_softmax /
soft_margin; reference :242-274), optimized with D-Adaptation Adam. The
prediction picker is `argmax_with_confidence` over non-trivial nodes with
threshold 0.5 (reference :890-918).
"""

from pathlib import Path
from typing import IO, Callable, Iterable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..optim import dadapt_adam
from ..utils.checkpoint import load_meta, load_pytree, save_pytree
from . import hier, layers
from .dataset import VAEDataset
from .training import (
    MetricsDrain,
    make_scan_epoch_fn,
    run_segments_aot,
    validate_batchsteps,
)

DEFAULT_HIER_LOSS = "flat_softmax"
_PREDICT_CHUNK = 1 << 16


class Taxometer:
    """Taxonomy label predictor (the reference's VAMB2Label).

    `nodes`/`table_parent` come from `hier.make_graph` over the input
    taxonomy; `hier_loss` selects the loss head:
      * flat_softmax: logits over leaves, NLL of summed leaf descendants
      * cond_softmax: logits per non-root node, conditional-softmax CE
      * soft_margin: logits over all nodes, soft margin with tau=0.01
    """

    def __init__(
        self,
        nsamples: int,
        nlabels: int,
        nodes: list[str],
        table_parent: list[int],
        nhiddens: Optional[list[int]] = None,
        alpha: Optional[float] = None,
        beta: float = 200.0,
        dropout: Optional[float] = 0.2,
        hier_loss: str = DEFAULT_HIER_LOSS,
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
        if any(i < 1 for i in nhiddens):
            raise ValueError(f"Minimum 1 neuron per layer, not {min(nhiddens)}")
        if beta <= 0:
            raise ValueError(f"beta must be > 0, not {beta}")
        if not (0 < alpha < 1):
            raise ValueError(f"alpha must be 0 < alpha < 1, not {alpha}")
        if not (0 <= dropout < 1):
            raise ValueError(f"dropout must be 0 <= dropout < 1, not {dropout}")

        self.nsamples = nsamples
        self.ntnf = 103
        self.alpha = alpha
        self.beta = beta
        self.nhiddens = list(nhiddens)
        self.dropout = dropout
        self.seed = seed
        self.nodes = list(nodes)
        self.table_parent = list(table_parent)
        self.n_tree_nodes = nlabels
        self.hier_loss_name = hier_loss

        self.tree = hier.Hierarchy(np.array(table_parent))
        if hier_loss == "flat_softmax":
            self.loss_fn = hier.FlatSoftmaxNLL(self.tree)
            self._pred_helper = hier.SumLeafDescendants(self.tree)
            self._pred_fn = lambda theta: self._pred_helper(
                jax.nn.softmax(theta, axis=-1)
            )
            self.nlabels = self.tree.num_leaf_nodes()
        elif hier_loss == "cond_softmax":
            self.loss_fn = hier.HierSoftmaxCrossEntropy(self.tree)
            self._pred_helper = hier.HierLogSoftmax(self.tree)
            self._pred_fn = lambda theta: jnp.exp(self._pred_helper(theta))
            self.nlabels = self.tree.num_nodes() - 1
        elif hier_loss == "soft_margin":
            self.loss_fn = hier.MarginLoss(
                self.tree, hardness="soft", margin="incorrect", tau=0.01
            )
            self._pred_helper = hier.SumDescendants(self.tree)
            self._pred_fn = lambda theta: self._pred_helper(
                jax.nn.softmax(theta, axis=-1)
            )
            self.nlabels = self.tree.num_nodes()
        else:
            raise AttributeError(f"Hierarchical loss {hier_loss} not found")

        self.specificity = -self.tree.num_leaf_descendants()
        self.not_trivial = self.tree.num_children() != 1
        self.rng = jax.random.key(seed)
        self.params, self.bn_state = self._init_params(np.random.default_rng(seed))

    @property
    def nfeatures(self) -> int:
        return self.nsamples + self.ntnf + 1

    def _init_params(self, rng: np.random.Generator):
        dims = [self.nfeatures] + self.nhiddens
        params: dict = {"enc": []}
        bn_state: dict = {"enc": []}
        for nin, nout in zip(dims, dims[1:]):
            bn_p, bn_s = layers.init_batchnorm(nout)
            params["enc"].append(
                {"dense": layers.init_dense(rng, nin, nout), "bn": bn_p}
            )
            bn_state["enc"].append(bn_s)
        params["out"] = layers.init_dense(rng, self.nhiddens[-1], self.nlabels)
        return params, bn_state

    def apply(
        self,
        params,
        bn_state,
        depths,
        tnf,
        abundance,
        *,
        train: bool,
        key=None,
        axis_name=None,
        dropout_bits=None,
    ):
        """Forward pass -> (logits, new_bn_state).

        `dropout_bits` (train only): one (B, width) uint8 array per hidden
        layer applies byte-mask dropout from a pre-drawn per-epoch bank
        instead of drawing threefry bytes in-step (the same fast path the
        flagship VAE uses; layers.dropout_from_bits documents soundness)."""
        x = jnp.concatenate((depths, tnf, abundance), axis=1)
        new_states = []
        for i, (p, s) in enumerate(zip(params["enc"], bn_state["enc"])):
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
        logits = layers.dense(params["out"], x)
        return logits, {"enc": new_states}

    def _draw_dropout_bank(self, key, batchsize):
        "One epoch's dropout bytes for all hidden layers (see models/vae.py)."
        import os

        if self.dropout == 0.0 or os.environ.get("VAMB_TPU_DROPOUT_MODE") == "step":
            return None
        total = sum(self.nhiddens)
        nwords = (total + 3) // 4
        words = jax.random.bits(key, (batchsize, nwords), jnp.uint32)
        bits = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(
            batchsize, nwords * 4)
        slices, off = [], 0
        for w in self.nhiddens:
            slices.append(bits[:, off : off + w])
            off += w
        return slices

    # ------------------------------------------------------------ training

    def trainmodel(
        self,
        dataset: VAEDataset,
        targets: np.ndarray,
        nepochs: int = 500,
        batchsize: int = 1024,
        batchsteps: Optional[list[int]] = [25, 75, 150, 300],
        modelfile: Union[None, str, Path, IO[bytes]] = None,
        logger: Optional[Callable[[str], None]] = None,
        mesh=None,
        segment_walls: Optional[list] = None,
    ) -> None:
        "Train in place on (dataset, integer node targets)."
        if nepochs < 1:
            raise ValueError(f"Minimum 1 epoch, not {nepochs}")
        batchsteps_list = validate_batchsteps(nepochs, batchsteps)
        log = logger if logger is not None else lambda _m: None
        log("\tNetwork properties:")
        log(f"\t    Hierarchical loss: {self.hier_loss_name}")
        log(f"\t    Alpha: {self.alpha}")
        log(f"\t    Beta: {self.beta}")
        log(f"\t    Dropout: {self.dropout}")
        log(f"\t    N hidden: {', '.join(map(str, self.nhiddens))}")
        log("\tTraining properties:")
        log(f"\t    N epochs: {nepochs}")
        log(f"\t    Starting batch size: {batchsize}")
        log(
            "\t    Batchsteps: "
            + (", ".join(map(str, batchsteps_list)) if batchsteps_list else "None")
        )
        log(f"\t    N labels: {self.nlabels}")

        optimizer = dadapt_adam()
        n_label_classes = max(self.n_tree_nodes, 105)

        def grad_and_update(train_state, batch, key, bank, step_i):
            params, bn_state, opt_state = train_state
            depths, tnf, ab, _w, labels = batch
            onehot = jax.nn.one_hot(labels, n_label_classes, dtype=jnp.float32)
            if bank is None:
                bits = None
            else:
                # rotate the epoch's dropout bytes per step (uint8 add fuses
                # into the threshold compare) — distinct masks every step
                # from one draw per epoch, as in models/vae.py
                rot = (step_i * 97).astype(jnp.uint8)
                bits = [b + rot for b in bank]

            def loss_fn(params, bn_state):
                logits, new_state = self.apply(
                    params, bn_state, depths, tnf, ab, train=True, key=key,
                    dropout_bits=bits,
                )
                loss = self.loss_fn(logits, onehot[:, : self._label_cols()])
                return loss, new_state

            (loss, bn_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bn_state
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return (params, bn_state, opt_state), jnp.stack([loss])

        epoch_fn = make_scan_epoch_fn(
            grad_and_update, 1, mesh=mesh,
            epoch_extra=self._draw_dropout_bank,
        )
        data = (
            jnp.asarray(dataset.depths),
            jnp.asarray(dataset.tnf),
            jnp.asarray(dataset.abundance),
            jnp.asarray(dataset.weights),
            jnp.asarray(np.asarray(targets, dtype=np.int32)),
        )
        if mesh is not None:
            from ..parallel.mesh import replicate, shard_rows_padded

            data = tuple(shard_rows_padded(np.asarray(a), mesh) for a in data)
            train_state = replicate(
                (self.params, self.bn_state, optimizer.init(self.params)), mesh
            )
        else:
            train_state = (self.params, self.bn_state, optimizer.init(self.params))

        def emit(epoch, m, bs, seconds):
            log(
                f"\tEpoch: {epoch + 1}\tCE: {float(m[0]):.7f}"
                f"\tBatchsize: {bs}  ({seconds:.2f}s)"
            )

        drain = MetricsDrain(emit)
        train_state, rng = run_segments_aot(
            epoch_fn, train_state, data, self.rng,
            dataset.n_obs, nepochs, batchsize, batchsteps_list, drain.push,
            lambda bs, nb, seg: dict(
                batchsize=bs, nbatches=nb, n_obs=dataset.n_obs, nepochs=seg
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

    def _label_cols(self) -> int:
        "The loss consumes one-hot labels over the tree's node count."
        return self.n_tree_nodes

    # ------------------------------------------------------------- predict

    def predict(
        self, dataset: VAEDataset, chunk: int = _PREDICT_CHUNK
    ) -> Iterable[tuple[np.ndarray, np.ndarray]]:
        """Yield (prob, pred) per chunk: node probabilities and the
        confidence-thresholded node prediction (reference :890-918)."""

        @jax.jit
        def fwd(params, bn_state, depths, tnf, ab):
            logits, _ = self.apply(params, bn_state, depths, tnf, ab, train=False)
            return self._pred_fn(logits)

        n = dataset.n_obs
        for start in range(0, n, chunk):
            stop = min(start + chunk, n)
            d = dataset.depths[start:stop]
            t = dataset.tnf[start:stop]
            a = dataset.abundance[start:stop]
            if stop - start < chunk and n > chunk:
                pad = chunk - (stop - start)
                d = np.concatenate([d, np.zeros((pad, d.shape[1]), d.dtype)])
                t = np.concatenate([t, np.zeros((pad, t.shape[1]), t.dtype)])
                a = np.concatenate([a, np.zeros((pad, a.shape[1]), a.dtype)])
            prob = np.asarray(fwd(self.params, self.bn_state, d, t, a))
            prob = prob[: stop - start]
            pred = hier.argmax_with_confidence(
                self.specificity, prob, 0.5, self.not_trivial
            )
            yield prob, pred

    # ------------------------------------------------------------ save/load

    def save(self, io: Union[str, Path, IO[bytes]]) -> None:
        save_pytree(
            io,
            {"params": self.params, "bn_state": self.bn_state},
            meta={
                "model": "taxometer",
                "nsamples": self.nsamples,
                "nhiddens": self.nhiddens,
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
    def load(cls, io: Union[str, Path, IO[bytes]]) -> "Taxometer":
        meta = load_meta(io)
        model = cls(
            nsamples=meta["nsamples"],
            nlabels=len(meta["nodes"]),
            nodes=meta["nodes"],
            table_parent=meta["table_parent"],
            nhiddens=meta["nhiddens"],
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

"""The flagship VAE: JAX/Optax variational autoencoder over [depths ‖ TNF ‖ ab].

Behavioral parity target: reference vamb/encode.py:149-610. Key semantics kept:

* architecture: Linear→LeakyReLU→Dropout→BatchNorm encoder/decoder stacks,
  single `mu` head (NO learned logsigma — the reference deliberately fixes the
  latent noise to N(0,1), encode.py:270-286), softmax over per-sample depths
  in the decoder output.
* loss: weighted CE(depths) + SSE(ab) + SSE(TNF) + KLD with the exact weights
  of encode.py:316-357, multiplied by per-contig length weights.
* defaults: nlatent 32, alpha 0.15 (0.50 single-sample), nhiddens [512,512]
  ([256,256] single-sample), beta 200, dropout 0.2 (0.0 single-sample).
* training: D-Adaptation Adam (decoupled), batch-size doubling at batchsteps,
  per-epoch loss component logging, drop-last shuffled batches.

TPU-first design departures (not a port):

* the whole normalized dataset is device-resident; an epoch is ONE jitted
  `lax.scan` over gathered minibatches — no host→device transfer per batch,
  no Python dispatch per step. Batch-size doubling yields at most
  len(batchsteps)+1 compiled epoch programs.
* encode() runs as a single padded, jitted forward over row chunks.
* all matmuls keep f32 accumulation (`preferred_element_type`); batch stats
  can be psum-synced across a mesh axis for global-batch BatchNorm under
  data parallelism (models/layers.py).
"""

from functools import partial
from pathlib import Path
from typing import IO, Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..optim import dadapt_adam
from ..utils import mask_lower_bits
from ..utils.checkpoint import load_pytree, load_meta, save_pytree
from . import layers
from .dataset import VAEDataset, batchsize_at_epoch, encode_chunk_rows, num_batches
from .training import MetricsDrain, segment_plan

_ENCODE_CHUNK = 1 << 18  # rows per jitted encode call


class VAE:
    """Variational autoencoder with fixed-sigma latent noise.

    Hyperparameters mirror the reference defaults (encode.py:171-208).
    Instances hold `params` (learnable), `bn_state` (BatchNorm running stats)
    and hyperparameters; all compute methods are pure jitted functions.
    """

    def __init__(
        self,
        nsamples: int,
        nhiddens: Optional[list[int]] = None,
        nlatent: int = 32,
        alpha: Optional[float] = None,
        beta: float = 200.0,
        dropout: Optional[float] = 0.2,
        seed: int = 0,
        precision: str = "f32",
    ):
        if nlatent < 1:
            raise ValueError(f"Minimum 1 latent neuron, not {nlatent}")
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
        if precision not in ("f32", "bf16"):
            raise ValueError(f"precision must be 'f32' or 'bf16', not {precision}")

        self.nsamples = nsamples
        self.ntnf = 103
        self.nhiddens = list(nhiddens)
        self.nlatent = nlatent
        self.alpha = alpha
        self.beta = beta
        self.dropout = dropout
        self.seed = seed
        # "bf16": matmul operands cast to bf16 with f32 master params /
        # BatchNorm stats / loss. Measured on TPU v5e this buys ~2% over
        # "f32" (bench.py), and the trace-level reason is now understood:
        # under JAX's DEFAULT matmul precision the f32 path's dots ALREADY
        # execute as one bf16 MXU pass (measured 68.6 TF/s f32-DEFAULT vs
        # 71.6 TF/s bf16 vs 23.9 TF/s f32-HIGHEST at 2048^3 on this chip),
        # so the opt-in only halves activation bytes between ops — and the
        # epoch is bound by non-matmul work at these layer widths (of a
        # 14.6 ms epoch at 100k x 10: ~3.6 ms dropout RNG+mask, ~0.9 ms
        # D-Adaptation, ~4 ms BN/loss/gathers/scan, ~6 ms matmuls). Kept
        # as an opt-in for backends where the tradeoff differs. The "f32"
        # default is the bit-exact path the parity/golden suites pin on
        # CPU (where f32 dots are true f32).
        self.precision = precision
        self._compute_dtype = jnp.bfloat16 if precision == "bf16" else None
        self.rng = jax.random.key(seed)
        self.params, self.bn_state = self._init_params(np.random.default_rng(seed))

    # ---------------------------------------------------------------- init

    @property
    def nfeatures(self) -> int:
        return self.nsamples + self.ntnf + 1

    def _init_params(self, rng: np.random.Generator):
        dims_enc = [self.nfeatures] + self.nhiddens
        dims_dec = [self.nlatent] + self.nhiddens[::-1]
        params: dict = {"enc": [], "dec": []}
        bn_state: dict = {"enc": [], "dec": []}
        for nin, nout in zip(dims_enc, dims_enc[1:]):
            bn_p, bn_s = layers.init_batchnorm(nout)
            params["enc"].append({"dense": layers.init_dense(rng, nin, nout), "bn": bn_p})
            bn_state["enc"].append(bn_s)
        params["mu"] = layers.init_dense(rng, self.nhiddens[-1], self.nlatent)
        for nin, nout in zip(dims_dec, dims_dec[1:]):
            bn_p, bn_s = layers.init_batchnorm(nout)
            params["dec"].append({"dense": layers.init_dense(rng, nin, nout), "bn": bn_p})
            bn_state["dec"].append(bn_s)
        params["out"] = layers.init_dense(rng, self.nhiddens[0], self.nfeatures)
        return params, bn_state

    # ------------------------------------------------------------- forward

    def _mlp_stack(
        self,
        stack_params,
        stack_state,
        x,
        train: bool,
        key,
        axis_name,
        compute_dtype=None,
        dropout_masks=None,
        dropout_bits=None,
    ):
        """Shared encoder/decoder stack: Dense → LeakyReLU → Dropout → BatchNorm.

        `dropout_masks` (one pre-scaled multiplicative mask per layer)
        replaces the RNG-drawn dropout when given — the injection seam the
        torch-lockstep parity test uses to drive both frameworks with
        identical randomness (tests/test_parity_vae.py). `dropout_bits`
        (one (B, width) uint8 array per layer) applies byte-mask dropout
        from a pre-drawn bank instead of drawing in-step — the epoch-bank
        fast path (see layers.dropout_from_bits).
        """
        new_states = []
        for i, (p, s) in enumerate(zip(stack_params, stack_state)):
            x = layers.leaky_relu(layers.dense(p["dense"], x, compute_dtype))
            if train:
                if dropout_masks is not None:
                    x = x * dropout_masks[i]
                elif dropout_bits is not None:
                    x = layers.dropout_from_bits(dropout_bits[i], x, self.dropout)
                else:
                    x = layers.dropout(jax.random.fold_in(key, i), x, self.dropout)
                x, s = layers.batchnorm_train(p["bn"], s, x, axis_name=axis_name)
            else:
                x = layers.batchnorm_eval(p["bn"], s, x)
            new_states.append(s)
        return x, new_states

    def apply(
        self,
        params,
        bn_state,
        depths,
        tnf,
        abundance,
        *,
        train: bool,
        key: Optional[jax.Array] = None,
        axis_name: Optional[str] = None,
        inject: Optional[dict] = None,
        dropout_bank: Optional[dict] = None,
    ):
        """Full forward pass.

        Returns ((depths_out, tnf_out, abundance_out, mu), new_bn_state).
        At train time the decoder sees `mu + eps`, eps ~ N(0,1) (fixed sigma).
        The bf16 compute dtype applies to *training* passes only: encode-time
        latents are always produced by the exact f32 forward, because the
        clustering engine's distance decisions sit on f32-scale margins.

        `inject` (train only) replaces all drawn randomness with caller-
        supplied arrays: {"eps": (B, nlatent) latent noise, "enc_masks"/
        "dec_masks": per-layer pre-scaled dropout masks}. This is the seam
        the torch-lockstep parity test uses to run both frameworks on an
        identical random stream (tests/test_parity_vae.py).

        `dropout_bank` (train only) supplies pre-drawn dropout bytes:
        {"enc"/"dec": list of (B, width) uint8 per layer}. The training
        epoch draws one bank per epoch and reuses it across that epoch's
        steps (layers.dropout_from_bits documents why that is sound).
        """
        x = jnp.concatenate((depths, tnf, abundance), axis=1)
        return self._forward(
            params, bn_state, x, train=train, key=key, axis_name=axis_name,
            inject=inject, dropout_bank=dropout_bank,
        )

    def _forward(
        self,
        params,
        bn_state,
        x,
        *,
        train: bool,
        key: Optional[jax.Array] = None,
        axis_name: Optional[str] = None,
        inject: Optional[dict] = None,
        dropout_bank: Optional[dict] = None,
    ):
        """`apply` on the already-concatenated (B, S+103+1) input row block.

        The training epoch feeds column slices of its packed data buffer
        here directly — the slices ARE the concatenation `apply` would
        build, so routing around the concat saves a (B, nfeatures) copy
        per step without changing a single computed value."""
        compute_dtype = self._compute_dtype if train else None
        if train and inject is None:
            ekey, dkey1, dkey2 = jax.random.split(key, 3)
        else:
            ekey = dkey1 = dkey2 = None
        h, enc_state = self._mlp_stack(
            params["enc"], bn_state["enc"], x, train, dkey1, axis_name,
            compute_dtype,
            dropout_masks=None if inject is None else inject["enc_masks"],
            dropout_bits=None if dropout_bank is None else dropout_bank["enc"],
        )
        # mu in f32 even under bf16 compute: the KLD and the emitted latents
        # read it, and the (B, nlatent) head is a trivial share of the FLOPs.
        mu = layers.dense(params["mu"], h.astype(jnp.float32))
        if train:
            eps = inject["eps"] if inject is not None else jax.random.normal(ekey, mu.shape)
            latent = mu + eps
        else:
            latent = mu
        h, dec_state = self._mlp_stack(
            params["dec"], bn_state["dec"], latent, train, dkey2, axis_name,
            compute_dtype,
            dropout_masks=None if inject is None else inject["dec_masks"],
            dropout_bits=None if dropout_bank is None else dropout_bank["dec"],
        )
        # Output head + loss in f32 (softmax/log stability under bf16).
        rec = layers.dense(params["out"], h.astype(jnp.float32))
        depths_out = jax.nn.softmax(rec[:, : self.nsamples], axis=1)
        tnf_out = rec[:, self.nsamples : self.nsamples + self.ntnf]
        abundance_out = rec[:, self.nsamples + self.ntnf :]
        return (depths_out, tnf_out, abundance_out, mu), {
            "enc": enc_state,
            "dec": dec_state,
        }

    def calc_loss(
        self, depths_in, depths_out, tnf_in, tnf_out, ab_in, ab_out, mu, weights
    ):
        "Exact 4-term weighted loss of reference encode.py:316-357."
        ab_sse = jnp.sum(jnp.square(ab_out - ab_in), axis=1)
        ce = -jnp.sum(jnp.log(depths_out + 1e-9) * depths_in, axis=1)
        sse = jnp.sum(jnp.square(tnf_out - tnf_in), axis=1)
        kld = 0.5 * jnp.sum(jnp.square(mu), axis=1)

        if self.nsamples == 1:
            ce_weight = 0.0
        else:
            ce_weight = ((1 - self.alpha) * (self.nsamples - 1)) / (
                self.nsamples * np.log(self.nsamples)
            )
        ab_sse_weight = (1 - self.alpha) / self.nsamples
        sse_weight = self.alpha / self.ntnf
        kld_weight = 1 / (self.nlatent * self.beta)

        w_ab = ab_sse * ab_sse_weight
        w_ce = ce * ce_weight
        w_sse = sse * sse_weight
        w_kld = kld * kld_weight
        # Reference-exact semantics (encode.py:349-351): the reference
        # multiplies the (B,) per-contig loss by the (B,1) weights column,
        # which broadcasts to (B,B), so its .mean() degenerates to
        # mean(loss) * mean(batch weights) — the per-contig length
        # weighting does NOT weight individual contigs. Reproduced here
        # because training dynamics (and therefore bins) depend on it.
        loss = jnp.mean(w_ce + w_ab + w_sse + w_kld) * jnp.mean(weights[:, 0])
        return (
            loss,
            jnp.mean(w_ab),
            jnp.mean(w_ce),
            jnp.mean(w_sse),
            jnp.mean(w_kld),
        )

    # ------------------------------------------------------------ training

    def _make_epoch_fn(
        self, optimizer, axis_name: Optional[str] = None, mesh=None
    ) -> Callable:
        """Build the jitted one-epoch function (one per (batchsize, nbatches)).

        The epoch is a `lax.scan` over minibatch index blocks gathered from the
        device-resident dataset — no per-batch dispatch or transfers.

        With `mesh`, each gathered batch is explicitly re-sharded row-wise
        across the mesh before the forward/backward pass. Without the
        constraint GSPMD resolves the shuffled gather by all-reducing the
        batch to every device and *replicating* the whole batch's compute
        (verified by HLO inspection, tests/test_parallel.py) — correct but
        zero scaling. With it, each device computes grads on its batch
        shard and XLA inserts the gradient all-reduce; per-step comms are
        batch-sized + param-sized, never dataset-sized.
        """
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            batch_sharding = NamedSharding(
                mesh, PartitionSpec(mesh.axis_names[0])
            )
        else:
            batch_sharding = None

        S, T = self.nsamples, self.ntnf

        def loss_fn(params, bn_state, batch, key, bank):
            # batch: ONE packed (B, S+103+2) row block laid out
            # [depths | tnf | abundance | weights]. Column slices are
            # views XLA fuses into their consumers, and the encoder input
            # is batch[:, :-1] itself — exactly the concatenation `apply`
            # would rebuild (dataset.py packs in this order).
            depths = batch[:, :S]
            tnf = batch[:, S : S + T]
            ab = batch[:, S + T : S + T + 1]
            weights = batch[:, S + T + 1 :]
            (d_out, t_out, a_out, mu), new_state = self._forward(
                params, bn_state, batch[:, : S + T + 1],
                train=True, key=key, axis_name=axis_name, dropout_bank=bank,
            )
            loss, w_ab, w_ce, w_sse, w_kld = self.calc_loss(
                depths, d_out, tnf, t_out, ab, a_out, mu, weights
            )
            return loss, (new_state, jnp.stack([loss, w_ab, w_ce, w_sse, w_kld]))

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def draw_dropout_bank(bank_key, batchsize):
            """One epoch's dropout bytes for every layer, in a single draw.

            Reused across the epoch's steps — each contig appears at most
            once per epoch, so each still gets one fresh mask per epoch
            (layers.dropout_from_bits). Drawing per step made threefry
            generation the single largest non-matmul cost of training.
            Set VAMB_TPU_DROPOUT_MODE=step to restore per-step draws
            (quality A/B switch; bin quality measured equivalent, see
            bench.py / CHANGELOG)."""
            if self.dropout == 0.0:
                return None
            import os

            if os.environ.get("VAMB_TPU_DROPOUT_MODE") == "step":
                return None
            widths = self.nhiddens + self.nhiddens[::-1]
            total = sum(widths)
            nwords = (total + 3) // 4
            words = jax.random.bits(bank_key, (batchsize, nwords), jnp.uint32)
            bits = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(
                batchsize, nwords * 4
            )
            n_enc = len(self.nhiddens)
            slices, off = [], 0
            for w in widths:
                slices.append(bits[:, off : off + w])
                off += w
            return {"enc": slices[:n_enc], "dec": slices[n_enc:]}

        @partial(
            jax.jit,
            static_argnames=("batchsize", "nbatches", "n_obs", "nepochs"),
            donate_argnums=(0, 1, 2),
        )
        def epoch_fn(
            params, bn_state, opt_state, data, rng,
            batchsize, nbatches, n_obs=None, nepochs=1,
        ):
            """Run `nepochs` epochs in ONE dispatch (outer scan over epochs).

            The per-epoch key chain (`rng, key = split(rng)`) is the exact
            split sequence trainmodel used to run on the host, so the random
            stream — and therefore every batch, dropout mask and latent
            draw — is bit-identical whether a segment is dispatched as one
            multi-epoch program or as nepochs single-epoch calls. Batching
            epochs removes the per-epoch host dispatch + metric sync, which
            dominated short epochs on the tunneled TPU platform.
            """
            # data may be zero-padded for even sharding; never gather padding
            n = data[0].shape[0] if n_obs is None else n_obs
            # ONE packed buffer [depths|tnf|abundance|weights]: every epoch
            # then needs a single row gather (vs four) and every step a
            # single slice, and the encoder input is a column view of the
            # batch (loss_fn above). Bit-identical values either way.
            # Under a mesh the concat preserves the row sharding.
            packed = jnp.concatenate(data, axis=1)

            def one_epoch(carry, _):
                params, bn_state, opt_state, rng = carry
                rng, key = jax.random.split(rng)
                perm_key, scan_key, bank_key = jax.random.split(key, 3)
                bank = draw_dropout_bank(bank_key, batchsize)
                perm = jax.random.permutation(perm_key, n)
                idx = perm[: nbatches * batchsize]
                if batch_sharding is None:
                    # ONE epoch-wide gather into a shuffled buffer the scan
                    # consumes as xs (contiguous slices per step): a
                    # per-step random-row gather was the single most
                    # expensive device op of the training step (2.5
                    # ms/epoch of 11.6 at 100k, from device traces) —
                    # same batches either way, row gathers are just
                    # DMA-hostile at batch granularity.
                    shuf = packed[idx].reshape(nbatches, batchsize, -1)

                    def get_batch(i):
                        return jax.lax.dynamic_index_in_dim(
                            shuf, i, keepdims=False
                        )
                else:
                    # Sharded: gather per step. The epoch-wide gather would
                    # make GSPMD all-gather the row-sharded dataset onto every
                    # device (dataset-sized memory per device); per-step
                    # gathers keep per-device memory and per-step collectives
                    # batch-sized (asserted by the HLO inventory test).
                    idx2 = idx.reshape(nbatches, batchsize)

                    def get_batch(i):
                        batch_idx = jax.lax.dynamic_index_in_dim(
                            idx2, i, keepdims=False
                        )
                        return jax.lax.with_sharding_constraint(
                            packed[batch_idx], batch_sharding
                        )

                def step(carry, i):
                    params, bn_state, opt_state, key = carry
                    key, sub = jax.random.split(key)
                    batch = get_batch(i)
                    if bank is None:
                        bank_i = None
                    else:
                        # rotate the epoch's dropout bytes per step (uint8
                        # add, fuses into the threshold compare): distinct
                        # masks every step from one draw per epoch
                        rot = (i * 97).astype(jnp.uint8)
                        bank_i = jax.tree.map(lambda b: b + rot, bank)
                    (_, (bn_state, comps)), grads = grad_fn(
                        params, bn_state, batch, sub, bank_i
                    )
                    updates, opt_state = optimizer.update(grads, opt_state, params)
                    params = jax.tree.map(lambda p, u: p + u, params, updates)
                    return (params, bn_state, opt_state, key), comps

                (params, bn_state, opt_state, _), comps = jax.lax.scan(
                    step,
                    (params, bn_state, opt_state, scan_key),
                    jnp.arange(nbatches),
                )
                return (params, bn_state, opt_state, rng), jnp.mean(comps, axis=0)

            (params, bn_state, opt_state, rng), comps = jax.lax.scan(
                one_epoch, (params, bn_state, opt_state, rng), None, length=nepochs
            )
            # comps: (nepochs, 5) per-epoch means
            return params, bn_state, opt_state, rng, comps

        return epoch_fn

    def trainmodel(
        self,
        dataset: VAEDataset,
        nepochs: int = 500,
        batchsize: int = 256,
        batchsteps: Optional[list[int]] = [25, 75, 150, 300],
        modelfile: Union[None, str, Path, IO[bytes]] = None,
        logger: Optional[Callable[[str], None]] = None,
        mesh=None,
        checkpoint_every: Optional[int] = None,
    ) -> None:
        """Train in place. Mirrors reference trainmodel (encode.py:543-610).

        With `checkpoint_every=k` and a path-like `modelfile`, the model is
        additionally checkpointed every k epochs (the reference only saves
        at the end, inside a bare try/except — encode.py:603-608), so an
        interrupted long run can be resumed from the latest snapshot via
        `VAE.load`.

        With `mesh` (a 1-D `jax.sharding.Mesh`), training is data-parallel:
        the dataset is row-sharded over the mesh, parameters replicated, and
        XLA GSPMD inserts the gradient collectives. The epoch program is
        written over the global batch, so BatchNorm statistics remain
        global-batch exact under sharding.
        """
        if nepochs < 1:
            raise ValueError(f"Minimum 1 epoch, not {nepochs}")
        if dataset.n_obs < 2:
            raise ValueError(
                "Cannot train on a dataset with fewer than 2 sequences, but got "
                f"{dataset.n_obs} sequences. "
                "If you are trying to fit a DL model to this few sequences, "
                "something probably went wrong in your pipeline."
            )
        if batchsteps is None:
            batchsteps_list: list[int] = []
        else:
            batchsteps = list(batchsteps)
            if not all(isinstance(i, int) for i in batchsteps):
                raise ValueError("All elements of batchsteps must be integers")
            if max(batchsteps, default=0) >= nepochs:
                raise ValueError("Max batchsteps must not equal or exceed nepochs")
            batchsteps_list = sorted(set(batchsteps))

        log = logger if logger is not None else lambda _msg: None
        log("\tNetwork properties:")
        log(f"\t    Alpha: {self.alpha}")
        log(f"\t    Beta: {self.beta}")
        log(f"\t    Dropout: {self.dropout}")
        if self.precision != "f32":
            log(f"\t    Precision: {self.precision}")
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

        optimizer = dadapt_adam()
        opt_state = optimizer.init(self.params)
        epoch_fn = self._make_epoch_fn(optimizer, mesh=mesh)
        params, bn_state = self.params, self.bn_state
        if mesh is None:
            data = tuple(jnp.asarray(a) for a in dataset)
        else:
            from ..parallel.mesh import replicate, shard_rows_padded

            data = tuple(shard_rows_padded(np.asarray(a), mesh) for a in dataset)
            params = replicate(params, mesh)
            bn_state = replicate(bn_state, mesh)
            opt_state = replicate(opt_state, mesh)

        def emit(epoch, comps, bs, seconds):
            log(
                "\t\tEpoch: {:>3}  Loss: {:.5e}  CE: {:.5e}  AB: {:.5e}  "
                "SSE: {:.5e}  KLD: {:.5e}  Batchsize: {:>4}  ({:.2f}s)".format(
                    epoch + 1, comps[0], comps[2], comps[1], comps[3], comps[4],
                    bs, seconds,
                )
            )

        # Epochs are dispatched in SEGMENTS — one jitted multi-epoch program
        # per run of constant batch size (bounded by checkpoint_every) — so
        # a 300-epoch default run is 5 device dispatches instead of 300.
        # The random stream is bit-identical to per-epoch dispatch (the
        # epoch key chain moved inside the program unchanged).
        #
        # All segment programs are AOT-compiled CONCURRENTLY up front
        # (lower + compile in a thread pool, which only waits on the
        # compiler): the default 300-epoch run needs 5 programs whose
        # serial compiles dominated the cold end-to-end wall (measured
        # ~95% of a cold 20k `bin default` was XLA compiles); overlapping
        # them hides all but the longest behind the first segments' work.
        drain = MetricsDrain(emit)
        rng = self.rng
        do_checkpoint = (
            checkpoint_every is not None
            and modelfile is not None
            and isinstance(modelfile, (str, Path))
        )
        plan = list(
            segment_plan(
                nepochs, batchsteps_list,
                checkpoint_every if do_checkpoint else None,
            )
        )

        def compile_segment(epoch, seg_len):
            bs = batchsize_at_epoch(batchsize, batchsteps_list, epoch)
            nb = num_batches(dataset.n_obs, bs)
            actual_bs = min(bs, dataset.n_obs)
            return actual_bs, epoch_fn.lower(
                params, bn_state, opt_state, data, rng,
                batchsize=actual_bs, nbatches=nb, n_obs=dataset.n_obs,
                nepochs=seg_len,
            ).compile()

        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=min(4, len(plan)))
        futures = {}
        seen = set()
        for epoch, seg_len in plan:
            bs0 = batchsize_at_epoch(batchsize, batchsteps_list, epoch)
            k = (min(bs0, dataset.n_obs), seg_len)
            if k not in seen:
                seen.add(k)
                futures[k] = pool.submit(compile_segment, epoch, seg_len)

        for epoch, seg_len in plan:
            bs = batchsize_at_epoch(batchsize, batchsteps_list, epoch)
            actual_bs = min(bs, dataset.n_obs)
            _, compiled = futures[(actual_bs, seg_len)].result()
            params, bn_state, opt_state, rng, comps = compiled(
                params, bn_state, opt_state, data, rng
            )
            for i in range(seg_len):
                drain.push(epoch + i, comps[i], actual_bs)
            epoch = epoch + seg_len
            if do_checkpoint and epoch % checkpoint_every == 0 and epoch < nepochs:
                drain.flush()  # the param fetch below synchronizes anyway
                snapshot_params, snapshot_bn = self.params, self.bn_state
                self.params = jax.tree.map(np.asarray, params)
                self.bn_state = jax.tree.map(np.asarray, bn_state)
                try:
                    self.save(modelfile)
                finally:
                    self.params, self.bn_state = snapshot_params, snapshot_bn

        pool.shutdown(wait=False)
        drain.flush()
        self.rng = rng
        self.params = jax.tree.map(np.asarray, params)
        self.bn_state = jax.tree.map(np.asarray, bn_state)

        if modelfile is not None:
            try:
                self.save(modelfile)
            except Exception:
                pass

    # ------------------------------------------------------------- encode

    def _encode_chunk_fn(self):
        @jax.jit
        def fwd(params, bn_state, depths, tnf, ab):
            (_, _, _, mu), _ = self.apply(
                params, bn_state, depths, tnf, ab, train=False
            )
            return mu

        return fwd

    def encode(self, dataset: VAEDataset) -> np.ndarray:
        "Latent mu for every row, eval mode. Output has 12 mantissa bits masked."
        fwd = self._encode_chunk_fn()
        n = dataset.n_obs
        latent = np.empty((n, self.nlatent), dtype=np.float32)
        chunk = encode_chunk_rows(n, _ENCODE_CHUNK)
        params = self.params
        bn_state = self.bn_state
        for start in range(0, n, chunk):
            stop = min(start + chunk, n)
            d = dataset.depths[start:stop]
            t = dataset.tnf[start:stop]
            a = dataset.abundance[start:stop]
            if stop - start < chunk:
                # pad to the fixed chunk shape to avoid a recompile
                pad = chunk - (stop - start)
                d = np.concatenate([d, np.zeros((pad, d.shape[1]), d.dtype)])
                t = np.concatenate([t, np.zeros((pad, t.shape[1]), t.dtype)])
                a = np.concatenate([a, np.zeros((pad, a.shape[1]), a.dtype)])
            mu = np.asarray(fwd(params, bn_state, d, t, a))
            latent[start:stop] = mu[: stop - start]
        mask_lower_bits(latent, 12)
        return latent

    # ------------------------------------------------------------- save/load

    def save(self, io: Union[str, Path, IO[bytes]]) -> None:
        save_pytree(
            io,
            {"params": self.params, "bn_state": self.bn_state},
            meta={
                "model": "vae",
                "nsamples": self.nsamples,
                "nhiddens": self.nhiddens,
                "nlatent": self.nlatent,
                "alpha": self.alpha,
                "beta": self.beta,
                "dropout": self.dropout,
                "seed": self.seed,
                "precision": self.precision,
            },
        )

    @classmethod
    def load(cls, io: Union[str, Path, IO[bytes]]) -> "VAE":
        meta = load_meta(io)
        vae = cls(
            nsamples=meta["nsamples"],
            nhiddens=meta["nhiddens"],
            nlatent=meta["nlatent"],
            alpha=meta["alpha"],
            beta=meta["beta"],
            dropout=meta["dropout"],
            seed=meta.get("seed", 0),
            precision=meta.get("precision", "f32"),
        )
        if hasattr(io, "seek"):
            io.seek(0)
        tree, _ = load_pytree(
            io, {"params": vae.params, "bn_state": vae.bn_state}
        )
        vae.params = tree["params"]
        vae.bn_state = tree["bn_state"]
        return vae

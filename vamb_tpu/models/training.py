"""Generic device-resident training-loop machinery.

Shared by every model family (VAE, Taxometer, VAEVAE, AAE): the dataset
lives in device HBM as a tuple of row-aligned arrays; one epoch is a single
jitted `lax.scan` over shuffled minibatch index blocks (reference-equivalent
shuffle + drop_last semantics), compiled once per distinct batch size.
"""

import time
from collections import deque
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def make_scan_epoch_fn(
    grad_and_update: Callable,
    n_metrics: int,
    mesh=None,
    epoch_extra: Optional[Callable] = None,
):
    """Build a jitted epoch function from a per-batch update.

    `grad_and_update(train_state, batch, key) -> (train_state, metrics)` where
    `train_state` is any pytree and `metrics` a length-`n_metrics` vector.
    Returns `epoch_fn(train_state, data, key, batchsize, nbatches)` where
    `data` is a tuple of (N, ...) arrays gathered per batch.

    `epoch_extra(key, batchsize) -> pytree`, when given, is evaluated ONCE
    per epoch (inside the compiled program) and its result is passed to the
    update as `grad_and_update(train_state, batch, key, extra, step_index)`
    — the hook the per-epoch dropout byte banks use (drawing threefry bytes
    per step dominated the training step; see layers.dropout_from_bits).

    With `mesh`, each gathered batch is re-sharded row-wise across the mesh
    so every device computes its shard's gradients (GSPMD then all-reduces
    them); without the constraint XLA replicates the whole batch's compute
    on every device (see models/vae.py:_make_epoch_fn).
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        batch_sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
    else:
        batch_sharding = None

    @partial(
        jax.jit,
        static_argnames=("batchsize", "nbatches", "n_obs", "nepochs"),
        donate_argnums=(0,),
    )
    def epoch_fn(train_state, data, rng, batchsize, nbatches, n_obs=None, nepochs=1):
        # Runs `nepochs` epochs in ONE dispatch (outer scan). The per-epoch
        # key chain (`rng, key = split(rng)`) is the exact split sequence
        # the trainmodel loops used to run on the host, so the random
        # stream is bit-identical to nepochs single-epoch dispatches.
        # n_obs: true row count; data may be zero-padded for even sharding,
        # and the permutation must never address padding rows.
        n = data[0].shape[0] if n_obs is None else n_obs

        def one_epoch(carry, _):
            train_state, rng = carry
            rng, key = jax.random.split(rng)
            if epoch_extra is None:
                perm_key, scan_key = jax.random.split(key)
                extra = None
            else:
                perm_key, scan_key, extra_key = jax.random.split(key, 3)
                extra = epoch_extra(extra_key, batchsize)
            perm = jax.random.permutation(perm_key, n)
            idx = perm[: nbatches * batchsize]
            if batch_sharding is None:
                # one epoch-wide gather, contiguous slices per step (see
                # models/vae.py epoch_fn: per-step row gathers dominate)
                shuf = tuple(a[idx] for a in data)

                def get_batch(i):
                    return tuple(
                        jax.lax.dynamic_slice_in_dim(a, i * batchsize, batchsize)
                        for a in shuf
                    )
            else:
                # sharded: per-step gathers keep per-device memory and
                # per-step collectives batch-sized (see models/vae.py)
                idx2 = idx.reshape(nbatches, batchsize)

                def get_batch(i):
                    batch_idx = jax.lax.dynamic_index_in_dim(idx2, i, keepdims=False)
                    return tuple(
                        jax.lax.with_sharding_constraint(a[batch_idx], batch_sharding)
                        for a in data
                    )

            def step(carry, i):
                train_state, key = carry
                key, sub = jax.random.split(key)
                batch = get_batch(i)
                if epoch_extra is None:
                    train_state, metrics = grad_and_update(train_state, batch, sub)
                else:
                    train_state, metrics = grad_and_update(
                        train_state, batch, sub, extra, i)
                return (train_state, key), metrics

            (train_state, _), metrics = jax.lax.scan(
                step, (train_state, scan_key), jnp.arange(nbatches)
            )
            return (train_state, rng), jnp.mean(metrics, axis=0)

        (train_state, rng), metrics = jax.lax.scan(
            one_epoch, (train_state, rng), None, length=nepochs
        )
        return train_state, rng, metrics  # metrics: (nepochs, n_metrics)

    return epoch_fn


def run_segments_aot(
    epoch_fn,
    train_state,
    data,
    rng,
    n_obs: int,
    nepochs: int,
    batchsize: int,
    batchsteps_list,
    drain_push,
    statics,
    segment_walls: Optional[list] = None,
):
    """Run the segment loop with all segment programs AOT-compiled
    CONCURRENTLY (compiles overlap the first segments' execution; a cold
    default run's serial compiles dominated end-to-end wall — see
    models/vae.py). `statics(actual_bs, nb, seg_len)` returns epoch_fn's
    static kwargs; epoch_fn returns (train_state, rng, metrics) with
    metrics (seg_len, n_metrics). `drain_push(epoch, metrics_row, bs)` is
    called once per epoch. Returns (train_state, rng).

    When the caller passes a `segment_walls` list, each segment's
    (seg_len, execution_wall_s) is appended to it — the wall from dispatch
    until the segment's metrics landed on host, excluding trace/lower/
    compile entirely. This forces a host sync per segment, so it is
    instrumentation-only (bench.py's steady-state training canaries);
    without it segments dispatch back-to-back and metric rows drain
    asynchronously. (XLA's compiled cost_analysis is deliberately NOT
    reported here: it counts each scan body once, so a multi-epoch segment
    program's figure is off by nbatches*nepochs — bench.py carries
    analytic per-family FLOP formulas instead.)"""
    from concurrent.futures import ThreadPoolExecutor

    from .dataset import batchsize_at_epoch, num_batches

    plan = list(segment_plan(nepochs, batchsteps_list))

    def compile_segment(epoch, seg_len):
        bs = min(batchsize_at_epoch(batchsize, batchsteps_list, epoch), n_obs)
        nb = num_batches(n_obs, bs)
        return epoch_fn.lower(
            train_state, data, rng, **statics(bs, nb, seg_len)
        ).compile()

    pool = ThreadPoolExecutor(max_workers=min(4, len(plan)))
    futures = {}
    for epoch, seg_len in plan:
        bs = min(batchsize_at_epoch(batchsize, batchsteps_list, epoch), n_obs)
        if (bs, seg_len) not in futures:
            futures[(bs, seg_len)] = pool.submit(compile_segment, epoch, seg_len)

    for epoch, seg_len in plan:
        bs = min(batchsize_at_epoch(batchsize, batchsteps_list, epoch), n_obs)
        compiled = futures[(bs, seg_len)].result()
        t0 = time.time()
        train_state, rng, metrics = compiled(train_state, data, rng)
        if segment_walls is not None:
            metrics = np.asarray(metrics)  # blocks until the segment finished
            segment_walls.append((seg_len, time.time() - t0))
        for i in range(seg_len):
            drain_push(epoch + i, metrics[i], bs)
    pool.shutdown(wait=False)
    return train_state, rng


def segment_plan(nepochs, batchsteps_list, checkpoint_every=None):
    """Yield (epoch_start, seg_len) runs of constant batch size.

    Segments are bounded by batch-size doubling steps, optional checkpoint
    multiples, and the end of training — each segment is dispatched as ONE
    multi-epoch device program (a 300-epoch default run is 5 dispatches)."""
    epoch = 0
    while epoch < nepochs:
        seg_end = min((s for s in batchsteps_list if s > epoch), default=nepochs)
        if checkpoint_every:
            seg_end = min(seg_end, (epoch // checkpoint_every + 1) * checkpoint_every)
        seg_end = min(seg_end, nepochs)
        yield epoch, seg_end - epoch
        epoch = seg_end


class MetricsDrain:
    """Emit per-epoch metric log lines without serializing the device stream.

    Fetching even a 5-float metrics vector after every epoch costs a full
    host<->device round trip before the next epoch can be dispatched — on a
    networked TPU that latency (~25 ms here) rivals the epoch's compute
    itself, so a synchronous fetch nearly halves training throughput at the
    100k-contig scale. Instead epochs dispatch back-to-back; each epoch's
    device-resident metrics vector is queued with an async device->host copy
    and its log line is emitted `lag` epochs later, once the copy has had
    time to land. `flush()` drains the queue (end of training, or before a
    mid-training checkpoint that synchronizes anyway).

    The per-line "(X.XXs)" is the wall time between this line's drain and
    the previous one's — at steady state exactly the epoch time, while the
    first line also carries compile time, same as a synchronous loop.
    """

    def __init__(self, emit: Callable[[int, np.ndarray, int, float], None], lag: int = 2):
        self._emit = emit  # emit(epoch, values, batchsize, seconds)
        self._lag = max(0, lag)
        self._pending: deque = deque()
        self._last = time.time()

    def push(self, epoch: int, metrics: jax.Array, batchsize: int) -> None:
        try:
            metrics.copy_to_host_async()
        except Exception:
            pass  # fetched synchronously at drain time instead
        self._pending.append((epoch, metrics, batchsize))
        while len(self._pending) > self._lag:
            self._drain_one()

    def _drain_one(self) -> None:
        epoch, metrics, batchsize = self._pending.popleft()
        values = np.asarray(metrics)
        now = time.time()
        self._emit(epoch, values, batchsize, now - self._last)
        self._last = now

    def flush(self) -> None:
        while self._pending:
            self._drain_one()


def validate_batchsteps(nepochs: int, batchsteps: Optional[list]) -> list[int]:
    "Reference batchsteps validation (encode.py:563-573)."
    if batchsteps is None:
        return []
    batchsteps = list(batchsteps)
    if not all(isinstance(i, int) for i in batchsteps):
        raise ValueError("All elements of batchsteps must be integers")
    if max(batchsteps, default=0) >= nepochs:
        raise ValueError("Max batchsteps must not equal or exceed nepochs")
    return sorted(set(batchsteps))

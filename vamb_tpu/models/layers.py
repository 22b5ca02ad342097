"""Functional neural-net building blocks (pure JAX pytrees).

The model layer is deliberately framework-free: every "module" is a pair of
functions, ``init_*`` returning a params/state pytree and ``apply`` functions
that are pure and jit/shard_map-friendly. This keeps full control over
BatchNorm statistics (which must be psum-synced across a data-parallel mesh to
match the reference's global-batch semantics; reference vamb/encode.py:238,246
uses torch BatchNorm1d) and avoids mutable-collection plumbing in pjit.

Semantics replicated from torch defaults used by the reference:
* Linear: Kaiming-uniform weight init (a=sqrt(5)), uniform bias in
  +-1/sqrt(fan_in) — torch.nn.Linear's default.
* BatchNorm1d: eps 1e-5, momentum 0.1, affine, running stats; training
  normalizes with biased batch variance but stores the unbiased variance into
  the running estimate; eval normalizes with running stats.
* LeakyReLU: negative slope 0.01 (torch default).
* Dropout: inverted dropout, scaling by 1/(1-p) at train time.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = dict


def init_dense(rng: np.random.Generator, nin: int, nout: int) -> Params:
    """Torch-default Linear init: Kaiming uniform (a=sqrt(5)) + uniform bias.

    Host-side numpy on purpose: parameter init must not dispatch device
    work. Drawing each layer's weights with per-shape jax.random programs
    compiled dozens of tiny one-off executables, which cost seconds per
    process over a networked TPU before the first real batch ran.
    """
    # kaiming_uniform with a=sqrt(5) reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    bound = 1.0 / np.sqrt(nin)
    w = rng.uniform(-bound, bound, (nin, nout)).astype(np.float32)
    b = rng.uniform(-bound, bound, (nout,)).astype(np.float32)
    return {"w": w, "b": b}


def dense(params: Params, x: jax.Array, compute_dtype=None) -> jax.Array:
    """Affine layer; optional reduced-precision matmul.

    With ``compute_dtype=jnp.bfloat16`` both operands are cast to bf16 and
    the product is emitted in bf16; master params stay f32 and the casts'
    VJPs round-trip gradients back to f32 at the parameter boundary.
    NOTE (measured, TPU v5e): under JAX's DEFAULT matmul precision the
    f32 path's dot ALREADY executes as a single bf16 MXU pass (f32
    operands are truncated on load), so the explicit bf16 mode only
    halves activation bytes between ops — worth ~2% at these layer
    widths, not the naive 2-3x (see models/vae.py precision notes).
    ``None`` (default) is the path the golden-parity suites pin; on the
    CPU backend it is true f32 arithmetic.
    """
    if compute_dtype is not None and compute_dtype != jnp.float32:
        x = x.astype(compute_dtype)
        w = params["w"].astype(compute_dtype)
        b = params["b"].astype(compute_dtype)
        return jnp.dot(x, w) + b
    return jnp.dot(x, params["w"], preferred_element_type=jnp.float32) + params["b"]


def init_batchnorm(n: int) -> tuple[Params, Params]:
    "Returns (learnable params, running state); host arrays (see init_dense)."
    params = {"scale": np.ones((n,), np.float32), "bias": np.zeros((n,), np.float32)}
    state = {
        "mean": np.zeros((n,), np.float32),
        "var": np.ones((n,), np.float32),
    }
    return params, state


def batchnorm_train(
    params: Params,
    state: Params,
    x: jax.Array,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
) -> tuple[jax.Array, Params]:
    """Normalize with batch statistics; return output and updated running state.

    If `axis_name` is given, batch statistics are averaged across that mapped
    mesh axis (global-batch semantics under data parallelism).
    """
    in_dtype = x.dtype
    # Batch statistics always in f32: with a bf16 compute dtype upstream,
    # mean-of-squares in bf16 loses enough mantissa to destabilize training.
    # For f32 inputs every cast here is a trace-time no-op, so the exact
    # arithmetic the golden-parity suites pin is unchanged.
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=0)
    mean2 = jnp.mean(x * x, axis=0)
    n = x.shape[0]
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean2 = jax.lax.pmean(mean2, axis_name)
        n = n * jax.lax.psum(1, axis_name)
    var = mean2 - mean * mean  # biased, used for normalization
    inv = jax.lax.rsqrt(var + eps)
    out = ((x - mean) * inv * params["scale"] + params["bias"]).astype(in_dtype)
    # torch stores the *unbiased* variance in the running estimate
    unbiased = var * (n / max(n - 1, 1)) if isinstance(n, int) else var * n / (n - 1)
    new_state = {
        "mean": (1 - momentum) * state["mean"] + momentum * mean,
        "var": (1 - momentum) * state["var"] + momentum * unbiased,
    }
    return out, new_state


def batchnorm_eval(params: Params, state: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    inv = jax.lax.rsqrt(state["var"] + eps)
    return (x - state["mean"]) * inv * params["scale"] + params["bias"]


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)


def dropout_threshold(rate: float) -> tuple[int, float]:
    "Quantized byte threshold and keep-scale shared by the dropout variants."
    t = min(255, int(round(rate * 256.0)))
    return t, 1.0 / (1.0 - t / 256.0)


def dropout_from_bits(bits: jax.Array, x: jax.Array, rate: float) -> jax.Array:
    """Apply byte-mask dropout with caller-supplied random bytes.

    `bits` is a uint8 array broadcastable to x's shape (one byte per
    element). Same quantized-threshold semantics as `dropout`; used by the
    per-epoch mask-bank path (models/vae.py), where one bank of bytes is
    drawn per epoch and reused across that epoch's steps — each contig
    appears at most once per epoch (drop_last shuffle), so every contig
    still receives exactly one mask per epoch; only contigs sharing a
    batch POSITION share masks within an epoch, and positions reshuffle
    every epoch. Cuts threefry generation ~nbatches-fold, which dominated
    the training step (~3.6 ms of a 14.5 ms epoch at 100k contigs).
    """
    if rate == 0.0:
        return x
    t, keep_scale = dropout_threshold(rate)
    return jnp.where(bits >= jnp.uint8(t), x * keep_scale, 0.0)


def dropout(key: jax.Array, x: jax.Array, rate: float) -> jax.Array:
    """Inverted dropout. rate==0 is the identity.

    The keep mask compares one random BYTE per element against a quantized
    threshold instead of drawing a 32-bit uniform per element. Threefry
    word generation dominated the whole training step before this (a VAE
    epoch at 100k contigs was 2.3x slower with per-element 32-bit draws),
    and 8 bits of drop-probability resolution is far below any measurable
    training effect. The drop probability is exactly t/256 with
    t = round(rate*256) (0.19921875 for the default 0.2), and survivors
    are scaled by the true quantized keep probability, so E[out] == x
    holds exactly. Threefry is kept (not the faster backend-specific
    rng_bit_generator) so masks are identical across CPU/TPU backends —
    the golden-file e2e tests rely on that.
    """
    if rate == 0.0:
        return x
    t, keep_scale = dropout_threshold(rate)
    ncols = x.shape[-1]
    nwords = (ncols + 3) // 4
    words = jax.random.bits(key, (*x.shape[:-1], nwords), jnp.uint32)
    bits = jax.lax.bitcast_convert_type(words, jnp.uint8)
    bits = bits.reshape(*x.shape[:-1], nwords * 4)[..., :ncols]
    return jnp.where(bits >= jnp.uint8(t), x * keep_scale, 0.0)

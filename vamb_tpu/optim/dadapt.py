"""D-Adaptation Adam as an optax GradientTransformation.

Learning-rate-free Adam from "Learning-Rate-Free Learning by D-Adaptation"
(Defazio & Mishchenko, ICML 2023). The reference trains every model with
`dadaptation.DAdaptAdam(parameters, decouple=True)` (reference
vamb/encode.py:578, taxvamb_encode.py:387,1074) and relies on the adaptive
step size instead of a tuned learning rate, so the update rule is behaviorally
load-bearing and is reproduced here exactly:

    dlr      = d * lr
    num'     = sqrt(b2) * num + (1-sqrt(b2)) * dlr * sum_p <g, s / (sqrt(v)+eps)>
    m'       = b1 * m + (1-b1) * dlr * g          (note: dlr folded into m)
    v'       = b2 * v + (1-b2) * g^2
    s'       = sqrt(b2) * s + (1-sqrt(b2)) * dlr * g
    d_hat    = num' / ((1-sqrt(b2)) * ||s'||_1)
    d'       = max(d, min(d_hat, d * growth_rate))     [skipped if ||s'||_1 == 0]
    update   = -m' / (sqrt(v')+eps)  -  decay * dlr * p   (decoupled decay)

Unlike torch Adam there is no bias correction; the d estimate plays that role.
The d/numerator scalars are global across the whole parameter pytree, so this
cannot be expressed by chaining per-leaf optax transforms — it is a single
custom transformation. All state lives on device and the step is jit-safe.
The flat layout assumes a uniform parameter dtype (all models here are
float32 throughout; ravel_pytree would silently promote mixed dtypes) and
replicated parameters (this package's data-parallel training replicates
params — sharded-parameter schemes would pay a gather for the ravel).

TPU note: the optimizer state (m, v, s) is stored FLAT and gradients are
raveled once per step, so the global reductions (<g, s/(sqrt(v)+eps)> and
||s||_1) and the moment updates are a handful of fused ops instead of
4 reductions + 4 elementwise passes *per parameter leaf* — on small MLPs
those per-leaf launches dominated the training step (measured: ~60% of a
VAE epoch). Summation order within the reductions changes (a flat sum vs
per-leaf partial sums), which moves the d trajectory by float32 ulps —
the same class of reorder the XLA-vs-BLAS backends already introduce.
"""

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


class DAdaptAdamState(NamedTuple):
    m: jax.Array  # first moment (flat), with d*lr folded in
    v: jax.Array  # second moment (flat)
    s: jax.Array  # weighted gradient sum (flat)
    d: jax.Array  # scalar estimate of initial distance to solution
    numerator_weighted: jax.Array  # scalar
    count: jax.Array


def dadapt_adam(
    learning_rate: float = 1.0,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    d0: float = 1e-6,
    growth_rate: Optional[float] = None,
) -> optax.GradientTransformation:
    """Create the D-Adaptation Adam transformation (decoupled weight decay).

    Use with `optax.apply_updates`. `learning_rate` is a multiplier on the
    adaptive step (leave at 1.0 for learning-rate-free behavior).
    """
    b1, b2 = betas
    sqrt_b2 = b2**0.5

    def init_fn(params: optax.Params) -> DAdaptAdamState:
        flat, _ = ravel_pytree(params)
        zeros = lambda: jnp.zeros_like(flat)  # noqa: E731
        return DAdaptAdamState(
            m=zeros(),
            v=zeros(),
            s=zeros(),
            d=jnp.asarray(d0, jnp.float32),
            numerator_weighted=jnp.asarray(0.0, jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )

    def update_fn(
        grads: optax.Updates,
        state: DAdaptAdamState,
        params: Optional[optax.Params] = None,
    ):
        if weight_decay != 0.0:
            chex.assert_trees_all_equal_structs(grads, params)
        dlr = state.d * learning_rate
        g, unravel = ravel_pytree(grads)

        # numerator increment uses the *previous* s and v
        delta_num = jnp.sum(g * (state.s / (jnp.sqrt(state.v) + eps)))
        numerator = sqrt_b2 * state.numerator_weighted + (1 - sqrt_b2) * dlr * delta_num

        m = b1 * state.m + (1 - b1) * dlr * g
        v = b2 * state.v + (1 - b2) * g * g
        s = sqrt_b2 * state.s + (1 - sqrt_b2) * dlr * g

        sk_l1 = jnp.sum(jnp.abs(s))
        d_hat = numerator / ((1 - sqrt_b2) * jnp.maximum(sk_l1, 1e-30))
        if growth_rate is not None:
            d_hat = jnp.minimum(d_hat, state.d * growth_rate)
        new_d = jnp.where(
            (sk_l1 > 0) & (learning_rate > 0), jnp.maximum(state.d, d_hat), state.d
        )

        flat_updates = -m / (jnp.sqrt(v) + eps)
        if weight_decay != 0.0:
            flat_p, _ = ravel_pytree(params)
            flat_updates = flat_updates - weight_decay * dlr * flat_p
        updates = unravel(flat_updates)

        new_state = DAdaptAdamState(
            m=m, v=v, s=s, d=new_d, numerator_weighted=numerator, count=state.count + 1
        )
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)

"""Tests for the D-Adaptation Adam optimizer."""

import numpy as np

import jax
import jax.numpy as jnp

from vamb_tpu.optim import dadapt_adam
from vamb_tpu.optim.dadapt import DAdaptAdamState


def _train_quadratic(opt, steps=300):
    "Minimize ||x - target||^2 from zero init; lr-free should get close."
    target = jnp.asarray(np.linspace(-2, 3, 10), jnp.float32)
    params = {"x": jnp.zeros(10)}
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(lambda p: jnp.sum((p["x"] - target) ** 2))(params)
        updates, state = opt.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, state

    for _ in range(steps):
        params, state = step(params, state)
    return params, state, target


def test_converges_without_lr_tuning():
    opt = dadapt_adam()
    params, state, target = _train_quadratic(opt)
    err = float(jnp.max(jnp.abs(params["x"] - target)))
    assert err < 0.05, f"did not converge: {err}"


def test_d_grows_from_d0():
    opt = dadapt_adam()
    _, state, _ = _train_quadratic(opt, steps=10)
    assert isinstance(state, DAdaptAdamState)
    assert float(state.d) > 1e-6  # grew beyond d0
    assert int(state.count) == 10


def test_zero_grad_step_is_stable():
    opt = dadapt_adam()
    params = {"x": jnp.ones(4)}
    state = opt.init(params)
    grads = {"x": jnp.zeros(4)}
    updates, state = opt.update(grads, state, params)
    assert np.all(np.isfinite(np.asarray(updates["x"])))
    np.testing.assert_allclose(np.asarray(updates["x"]), 0.0)
    assert float(state.d) == np.float32(1e-6)  # d untouched when ||s||_1 == 0


def test_decoupled_weight_decay_applied():
    opt = dadapt_adam(weight_decay=0.1)
    params = {"x": jnp.full((4,), 10.0)}
    state = opt.init(params)
    # seed with one nonzero-grad step so d, s are nonzero
    grads = {"x": jnp.ones(4)}
    updates, state = opt.update(grads, state, params)
    u = np.asarray(updates["x"])
    # decay term -decay*d*lr*p is tiny but present: compare against no-decay opt
    opt2 = dadapt_adam(weight_decay=0.0)
    state2 = opt2.init(params)
    updates2, _ = opt2.update(grads, state2, params)
    diff = u - np.asarray(updates2["x"])
    np.testing.assert_allclose(diff, -0.1 * 1e-6 * 1.0 * 10.0, rtol=1e-4)


# ---------------------------------------------------------------------------
# Lockstep oracle: numpy transcription of the published D-Adaptation Adam
# with decoupled weight decay (Defazio & Mishchenko, ICML 2023; the pip
# `dadaptation.DAdaptAdam(decouple=True)` update used by the reference at
# vamb/encode.py:578). Stepped side by side with optim/dadapt.py, asserting
# the parameter trajectories and the d estimates agree.


class NumpyDAdaptAdamOracle:
    """Per-step transcription of the torch implementation's two loops:
    pass 1 accumulates the numerator dot (with the PREVIOUS s and v),
    updates m/v/s and the |s| sum; then d is re-estimated; pass 2 applies
    -m/(sqrt(v)+eps) with decoupled decay."""

    def __init__(self, shapes, lr=1.0, betas=(0.9, 0.999), eps=1e-8,
                 weight_decay=0.0, d0=1e-6):
        self.lr = lr
        self.b1, self.b2 = betas
        self.sqrt_b2 = betas[1] ** 0.5
        self.eps = eps
        self.decay = weight_decay
        self.d = d0
        self.numerator_weighted = 0.0
        self.m = [np.zeros(s, np.float32) for s in shapes]
        self.v = [np.zeros(s, np.float32) for s in shapes]
        self.s = [np.zeros(s, np.float32) for s in shapes]

    def step(self, params, grads):
        dlr = self.d * self.lr
        numerator_acum = 0.0
        sk_l1 = 0.0
        for i, g in enumerate(grads):
            denom = np.sqrt(self.v[i]) + self.eps
            numerator_acum += float(dlr * np.sum(g * (self.s[i] / denom)))
            self.m[i] = self.b1 * self.m[i] + (1 - self.b1) * dlr * g
            self.v[i] = self.b2 * self.v[i] + (1 - self.b2) * g * g
            self.s[i] = self.sqrt_b2 * self.s[i] + (1 - self.sqrt_b2) * dlr * g
            sk_l1 += float(np.sum(np.abs(self.s[i])))
        self.numerator_weighted = (
            self.sqrt_b2 * self.numerator_weighted
            + (1 - self.sqrt_b2) * numerator_acum
        )
        if sk_l1 > 0 and self.lr > 0:
            d_hat = self.numerator_weighted / ((1 - self.sqrt_b2) * sk_l1)
            self.d = max(self.d, d_hat)
        out = []
        for i, p in enumerate(params):
            denom = np.sqrt(self.v[i]) + self.eps
            new_p = p.copy()
            if self.decay != 0.0:
                new_p = new_p - self.decay * dlr * new_p
            out.append(new_p - self.m[i] / denom)
        return out


def _lockstep(weight_decay, steps=50, seed=0):
    rng = np.random.default_rng(seed)
    shapes = [(7, 3), (3,), (4,)]
    params_np = [rng.normal(size=s).astype(np.float32) for s in shapes]
    grad_stream = [
        [rng.normal(size=s).astype(np.float32) for s in shapes]
        for _ in range(steps)
    ]

    opt = dadapt_adam(weight_decay=weight_decay)
    params_jax = [jnp.asarray(p) for p in params_np]
    state = opt.init(params_jax)
    oracle = NumpyDAdaptAdamOracle(shapes, weight_decay=weight_decay)
    oracle_params = [p.copy() for p in params_np]

    d_traj_jax, d_traj_oracle = [], []
    for grads in grad_stream:
        updates, state = opt.update(
            [jnp.asarray(g) for g in grads], state, params_jax
        )
        params_jax = [p + u for p, u in zip(params_jax, updates)]
        oracle_params = oracle.step(oracle_params, grads)
        d_traj_jax.append(float(state.d))
        d_traj_oracle.append(oracle.d)
        for a, b in zip(params_jax, oracle_params):
            np.testing.assert_allclose(
                np.asarray(a), b, rtol=2e-5, atol=1e-6
            )
    np.testing.assert_allclose(d_traj_jax, d_traj_oracle, rtol=2e-5)


def test_lockstep_against_published_update_rule():
    "50 steps, params and d trajectory must match the numpy transcription."
    _lockstep(weight_decay=0.0)


def test_lockstep_with_decoupled_weight_decay():
    _lockstep(weight_decay=0.01, seed=3)

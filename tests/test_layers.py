"""Cross-check the functional NN layers against torch's reference semantics."""

import numpy as np

import jax
import jax.numpy as jnp
import torch

from vamb_tpu.models import layers


def test_dense_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((7, 13)).astype(np.float32)
    params = layers.init_dense(np.random.default_rng(0), 13, 5)
    lin = torch.nn.Linear(13, 5)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(params["w"]).T))
        lin.bias.copy_(torch.from_numpy(np.asarray(params["b"])))
    out_jax = np.asarray(layers.dense(params, jnp.asarray(x)))
    out_torch = lin(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(out_jax, out_torch, rtol=1e-5, atol=1e-6)


def test_dense_init_scale():
    "Torch-default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both w and b."
    params = layers.init_dense(np.random.default_rng(3), 100, 400)
    bound = 1 / np.sqrt(100)
    w = np.asarray(params["w"])
    assert np.abs(w).max() <= bound
    assert np.abs(w).max() > 0.8 * bound  # actually fills the range
    assert np.abs(np.asarray(params["b"])).max() <= bound


def test_batchnorm_train_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((32, 10)).astype(np.float32) * 3 + 1
    params, state = layers.init_batchnorm(10)
    bn = torch.nn.BatchNorm1d(10)
    bn.train()
    out_torch = bn(torch.from_numpy(x)).detach().numpy()
    out_jax, new_state = layers.batchnorm_train(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_jax), out_torch, rtol=1e-4, atol=1e-5)
    # running stats update (momentum 0.1, unbiased var)
    np.testing.assert_allclose(
        np.asarray(new_state["mean"]), bn.running_mean.numpy(), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_state["var"]), bn.running_var.numpy(), rtol=1e-4, atol=1e-5
    )


def test_batchnorm_eval_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((16, 6)).astype(np.float32)
    params, state = layers.init_batchnorm(6)
    state = {
        "mean": jnp.asarray(rng.standard_normal(6).astype(np.float32)),
        "var": jnp.asarray(rng.uniform(0.5, 2.0, 6).astype(np.float32)),
    }
    params = {
        "scale": jnp.asarray(rng.uniform(0.5, 2.0, 6).astype(np.float32)),
        "bias": jnp.asarray(rng.standard_normal(6).astype(np.float32)),
    }
    bn = torch.nn.BatchNorm1d(6)
    with torch.no_grad():
        bn.running_mean.copy_(torch.from_numpy(np.asarray(state["mean"])))
        bn.running_var.copy_(torch.from_numpy(np.asarray(state["var"])))
        bn.weight.copy_(torch.from_numpy(np.asarray(params["scale"])))
        bn.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))
    bn.eval()
    out_torch = bn(torch.from_numpy(x)).detach().numpy()
    out_jax = np.asarray(layers.batchnorm_eval(params, state, jnp.asarray(x)))
    np.testing.assert_allclose(out_jax, out_torch, rtol=1e-4, atol=1e-5)


def test_batchnorm_global_batch_across_mesh():
    "psum-synced batch stats equal the single-device full-batch stats."
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("dp",))
    rng = np.random.default_rng(4)
    x = rng.standard_normal((32, 8)).astype(np.float32)
    params, state = layers.init_batchnorm(8)

    def local(x):
        out, new_state = layers.batchnorm_train(params, state, x, axis_name="dp")
        return out, new_state

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=P("dp", None),
        out_specs=(P("dp", None), P()),
    )
    out_sharded, state_sharded = sharded(jnp.asarray(x))
    out_full, state_full = layers.batchnorm_train(params, state, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_full), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state_sharded["var"]), np.asarray(state_full["var"]),
        rtol=1e-4, atol=1e-5,
    )


def test_leaky_relu_matches_torch():
    x = np.linspace(-3, 3, 50, dtype=np.float32)
    out_jax = np.asarray(layers.leaky_relu(jnp.asarray(x)))
    out_torch = torch.nn.LeakyReLU()(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(out_jax, out_torch, rtol=1e-6)


def test_dropout_scaling_and_identity():
    key = jax.random.key(0)
    x = jnp.ones((1000, 8))
    out = layers.dropout(key, x, 0.2)
    arr = np.asarray(out)
    # drop probability is quantized to t/256; survivors are scaled by the
    # true quantized keep probability so E[out] == x exactly
    t = round(0.2 * 256)
    surviving = arr[arr != 0]
    np.testing.assert_allclose(surviving, 1 / (1 - t / 256), rtol=1e-6)
    assert abs((arr == 0).mean() - t / 256) < 0.05
    assert layers.dropout(key, x, 0.0) is x


def test_dropout_unbiased_and_odd_width():
    # width not divisible by 4 exercises the byte-unpack padding path
    key = jax.random.key(1)
    x = jnp.ones((4000, 7))
    arr = np.asarray(layers.dropout(key, x, 0.35))
    t = round(0.35 * 256)
    np.testing.assert_allclose(arr.mean(), 1.0, atol=0.01)  # E[out] == x
    assert abs((arr == 0).mean() - t / 256) < 0.02

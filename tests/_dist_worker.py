"""Worker process for the multi-host (2-process) smoke test.

Launched by tests/test_distributed.py as:

    python tests/_dist_worker.py <coordinator> <num_processes> <process_id>

Each process gets 4 virtual CPU devices (8 global). Exercises, across
processes:
  1. `vamb_tpu.parallel.distributed_init` (jax.distributed.initialize),
  2. a psum over a global 2-D mesh,
  3. one data-parallel VAE epoch on globally row-sharded data via
     `jax.make_array_from_process_local_data`, asserting the replicated
     parameters agree on every process,
  4. one sharded medoid distance+histogram sweep (the clustering inner
     loop's collective pattern).

Prints "DIST_OK <checksum>" on success; the parent asserts both workers
print the same checksum.
"""

import os
import sys

for var in ("MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS", "OMP_NUM_THREADS"):
    os.environ.setdefault(var, "2")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def cli_main(coordinator: str, num_processes: int, process_id: int) -> None:
    """CLI mode: run the real `vamb_tpu bin default` end to end under
    jax.distributed, exercising the --nprocs/--procid wiring, the global
    mesh, and process-0 output gating. The parent compares process 0's
    cluster TSV against a single-process run of the same command.

    argv: <coordinator> <num_processes> <process_id> cli <fasta> <tsv> <outdir>
    """
    fasta, tsv, outdir = sys.argv[5], sys.argv[6], sys.argv[7]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vamb_tpu.__main__ import main as vamb_main

    argv = [
        "bin", "default",
        "--outdir", outdir,
        "--fasta", fasta,
        "--abundance_tsv", tsv,
        "-e", "3", "-q", "1",
        "--seed", "4",
    ]
    if num_processes > 1:
        argv += [
            "--coordinator", coordinator,
            "--nprocs", str(num_processes),
            "--procid", str(process_id),
        ]
    vamb_main(argv)
    print("DIST_CLI_OK", flush=True)


def main() -> None:
    coordinator, num_processes, process_id = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
    )
    if len(sys.argv) > 4 and sys.argv[4] == "cli":
        cli_main(coordinator, num_processes, process_id)
        return
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vamb_tpu.parallel import distributed_init

    distributed_init(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == num_processes * n_local, (n_global, n_local)

    mesh = Mesh(np.array(jax.devices()), ("dp",))

    # --- 2. cross-process psum --------------------------------------------
    sharding = NamedSharding(mesh, P("dp"))
    local = np.full(n_local, float(process_id + 1), np.float32)
    global_arr = jax.make_array_from_process_local_data(
        sharding, local, (n_global,)
    )
    total = jax.jit(jnp.sum)(global_arr)
    expected = n_local * sum(range(1, num_processes + 1))
    np.testing.assert_allclose(float(total), expected)

    # --- 3. one DP VAE epoch on globally sharded data ---------------------
    from vamb_tpu.models.dataset import make_dataset, num_batches
    from vamb_tpu.models.vae import VAE
    from vamb_tpu.optim import dadapt_adam

    rng = np.random.default_rng(0)  # same data on both processes
    n, s = 256, 3
    ds = make_dataset(
        rng.uniform(0, 5, (n, s)).astype(np.float32),
        rng.standard_normal((n, 103)).astype(np.float32),
        rng.integers(2000, 9000, n),
    )
    rows_per_proc = n // num_processes
    lo = process_id * rows_per_proc

    def global_shard(a):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("dp", None)),
            np.asarray(a[lo : lo + rows_per_proc]),
            a.shape,
        )

    data = tuple(global_shard(a) for a in ds)
    vae = VAE(nsamples=s, nhiddens=[32, 32], nlatent=8, seed=0)
    opt = dadapt_adam()
    epoch_fn = vae._make_epoch_fn(opt, mesh=mesh)
    params = jax.device_put(vae.params, NamedSharding(mesh, P()))
    bn = jax.device_put(vae.bn_state, NamedSharding(mesh, P()))
    opt_state = jax.device_put(opt.init(vae.params), NamedSharding(mesh, P()))
    params, bn, opt_state, _rng, comps = epoch_fn(
        params, bn, opt_state, data, jax.random.key(0),
        batchsize=64, nbatches=num_batches(n, 64), n_obs=n,
    )
    comps = np.asarray(comps)
    assert np.all(np.isfinite(comps)), comps
    # replicated params must be identical on every process: fold them into
    # the checksum the parent compares across workers
    leaf_sum = sum(
        float(jnp.sum(leaf)) for leaf in jax.tree_util.tree_leaves(params)
    )

    # --- 4. sharded distance + histogram sweep ----------------------------
    latents = rng.standard_normal((n, 8)).astype(np.float32)
    latents /= np.linalg.norm(latents, axis=1, keepdims=True) * np.sqrt(2)
    mT = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(None, "dp")),
        np.ascontiguousarray(latents.T[:, lo : lo + rows_per_proc]),
        (8, n),
    )
    lengths = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")),
        np.full(rows_per_proc, 2500.0, np.float32),
        (n,),
    )

    @jax.jit
    def sweep(mT, lengths):
        d = 0.5 - jnp.einsum(
            "fn,f->n", mT, mT[:, 0],
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        bins = jnp.clip((d / 0.005).astype(jnp.int32), 0, 59)
        w = jnp.where((d >= 0) & (d <= 0.3), lengths, 0.0)
        return jnp.sum(
            jnp.where(bins[:, None] == jnp.arange(60)[None, :], w[:, None], 0.0),
            axis=0,
        )

    hist = np.asarray(sweep(mT, lengths))
    assert hist.shape == (60,) and np.all(np.isfinite(hist))

    checksum = round(leaf_sum + float(hist.sum()), 4)
    print(f"DIST_OK {checksum}", flush=True)


if __name__ == "__main__":
    main()

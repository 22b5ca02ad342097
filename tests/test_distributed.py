"""Multi-host smoke test: 2 `jax.distributed` CPU processes.

Spawns tests/_dist_worker.py twice (coordinator + worker), each with 4
virtual CPU devices, and asserts both complete a cross-process psum, a
data-parallel VAE epoch over a global mesh (replicated parameters agree —
checksums match across processes), and a sharded clustering distance sweep.
This exercises `vamb_tpu.parallel.distributed_init` end-to-end (VERDICT
round-1 item 5); the single-process virtual-mesh tests cover everything
else."""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
WORKER = Path(__file__).resolve().parent / "_dist_worker.py"


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_smoke():
    import os

    coordinator = f"127.0.0.1:{free_port()}"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = str(ROOT)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coordinator, "2", str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=str(ROOT),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    checksums = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("DIST_OK")]
        assert lines, out
        checksums.append(lines[-1])
    # replicated training state must be identical across processes
    assert checksums[0] == checksums[1], checksums


@pytest.mark.slow
def test_two_process_cli_end_to_end(tmp_path):
    """The real `vamb_tpu bin default` across 2 jax.distributed processes
    (--coordinator/--nprocs/--procid wiring): process 0 writes the outputs,
    other processes' scratch dirs are cleaned up, and the emitted bins are
    identical to a single-process run of the same command (same 8 global
    devices either way: 2x4 virtual CPU vs 1x8)."""
    import os
    import random

    import numpy as np

    # dataset: 150 contigs, 4 samples (pipeline minimum is 100 contigs)
    rng = random.Random(3)
    nprng = np.random.default_rng(3)
    names = [f"S{1 + i % 3}C{i}" for i in range(150)]
    fasta = tmp_path / "contigs.fna"
    with open(fasta, "w") as f:
        for i, name in enumerate(names):
            f.write(f">{name}\n{''.join(rng.choices('ACGT', k=2000 + 11 * i))}\n")
    tsv = tmp_path / "abundance.tsv"
    depths = nprng.uniform(0.0, 10.0, (150, 4)).astype(np.float32)
    with open(tsv, "w") as f:
        f.write("contigname\t" + "\t".join(f"s{j}" for j in range(4)) + "\n")
        for name, row in zip(names, depths):
            f.write(name + "\t" + "\t".join(f"{v:.4f}" for v in row) + "\n")

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = str(ROOT)

    def launch(coordinator, nprocs, pid, outdir, device_count):
        worker_env = dict(env)
        worker_env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={device_count}"
        )
        return subprocess.Popen(
            [
                sys.executable, str(WORKER), coordinator, str(nprocs),
                str(pid), "cli", str(fasta), str(tsv), str(outdir),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=worker_env,
            cwd=str(ROOT),
        )

    # single-process reference run (8 local devices)
    out_single = tmp_path / "out_single"
    p = launch("unused", 1, 0, out_single, 8)
    out, err = p.communicate(timeout=900)
    assert p.returncode == 0, f"single-process run failed:\n{err[-3000:]}"

    # 2-process run (4 devices each, 8 global)
    coordinator = f"127.0.0.1:{free_port()}"
    out_multi = tmp_path / "out_multi"
    procs = [launch(coordinator, 2, i, out_multi, 4) for i in range(2)]
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        assert "DIST_CLI_OK" in out

    # process-0 outputs in place, non-primary scratch cleaned up
    assert (out_multi / "vae_clusters_unsplit.tsv").is_file()
    assert not (out_multi / ".proc1").exists()

    # identical bins to the single-process run
    single = (out_single / "vae_clusters_unsplit.tsv").read_text()
    multi = (out_multi / "vae_clusters_unsplit.tsv").read_text()
    assert single == multi


def test_cli_rejects_partial_multiprocess_flags(tmp_path):
    """--procid/--coordinator without --nprocs must fail fast: a forgotten
    --nprocs would otherwise run N independent single-process pipelines
    clobbering each other's outputs in the shared --outdir."""
    from vamb_tpu.__main__ import _maybe_init_distributed

    class Args:
        dist = False
        nprocs = None
        procid = 2
        coordinator = None

    with pytest.raises(SystemExit):
        _maybe_init_distributed(Args())

    class Args2:
        dist = False
        nprocs = None
        procid = None
        coordinator = "h0:9876"

    with pytest.raises(SystemExit):
        _maybe_init_distributed(Args2())

    class Args3:
        dist = False
        nprocs = 4
        procid = None
        coordinator = "h0:9876"

    with pytest.raises(SystemExit):
        _maybe_init_distributed(Args3())

    class ArgsOk:  # single process, nothing requested: no-op
        dist = False
        nprocs = None
        procid = None
        coordinator = None

    _maybe_init_distributed(ArgsOk())

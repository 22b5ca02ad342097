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

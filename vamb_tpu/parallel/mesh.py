"""Mesh construction and sharding helpers."""

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"

# (process_id, num_processes) recorded by distributed_init so callers (the
# CLI output gating in __main__.run) can consult multi-process state without
# touching the JAX backend — jax.process_index() would trigger backend
# initialization, which the pipeline deliberately overlaps with parsing.
_process_info: tuple[int, int] = (0, 1)


def process_info() -> tuple[int, int]:
    "(process_id, num_processes) as recorded at distributed_init time."
    return _process_info


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    auto: bool = False,
) -> bool:
    """Initialize multi-host JAX. Returns True if multi-process.

    Explicit mode: pass coordinator/num_processes/process_id (any launcher).
    Auto mode (`auto=True`): argless `jax.distributed.initialize()` — on TPU
    pods and managed clusters the coordinator and process topology are
    discovered from the environment. Must be called before the first JAX
    backend use. Single-process explicit calls are a no-op.
    """
    global _process_info
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif auto:
        jax.distributed.initialize()
    else:
        return False
    _process_info = (jax.process_index(), jax.process_count())
    return _process_info[1] > 1


def warm_backend_async() -> None:
    """Start JAX backend initialization on a daemon thread.

    First device contact (plugin load, runtime handshake — seconds over a
    networked TPU) otherwise lands inside the first training stage. Called
    at pipeline start so it overlaps FASTA parsing; jax guards backend
    init with a lock, so a concurrent first use simply waits on the same
    init instead of racing it.
    """
    import threading

    def touch():
        try:
            jax.devices()
        except Exception:
            pass  # surfaced later by the first real device use

    threading.Thread(target=touch, name="jax-backend-warmup", daemon=True).start()


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    "1-D mesh over the first `n_devices` devices (all by default)."
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_rows(array, mesh: Mesh, axis: str = DATA_AXIS):
    "Place an array with its leading dimension sharded over `axis`."
    ndim = np.ndim(array)
    spec = P(axis, *([None] * (ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


def shard_rows_padded(array, mesh: Mesh, axis: str = DATA_AXIS):
    """Row-shard, zero-padding the leading dim to a multiple of the mesh.

    Callers that gather rows by index must draw indices < the original
    length so the padding rows are never touched.
    """
    array = np.asarray(array)
    size = mesh.devices.size
    pad = (-array.shape[0]) % size
    if pad:
        array = np.concatenate(
            [array, np.zeros((pad, *array.shape[1:]), array.dtype)]
        )
    return shard_rows(array, mesh, axis)


def replicate(tree: Any, mesh: Mesh):
    "Replicate every leaf of a pytree across the mesh."
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)

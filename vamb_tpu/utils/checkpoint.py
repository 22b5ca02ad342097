"""Flat-npz checkpointing for JAX pytrees of arrays.

Model weights are saved as a single compressed .npz whose keys are
slash-joined tree paths, plus a JSON metadata blob for hyperparameters.
This replaces the reference's `torch.save` state dicts (reference
vamb/encode.py:486-541) with a torch-free, mmap-able format.
"""

import json
from pathlib import Path
from typing import IO, Any, Union

import jax
import numpy as np

_META_KEY = "__meta__"


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_pytree(
    io: Union[str, Path, IO[bytes]], tree: Any, meta: dict | None = None
) -> None:
    "Save an array pytree (+ JSON-serializable metadata) to an npz."
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {_path_str(path): np.asarray(leaf) for path, leaf in leaves}
    if _META_KEY in arrays:
        raise ValueError(f"Tree may not contain a key named {_META_KEY!r}")
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    np.savez(io, **arrays)


def load_pytree(io: Union[str, Path, IO[bytes]], like: Any) -> tuple[Any, dict]:
    """Load arrays saved by `save_pytree` into the structure of `like`.

    Returns (tree, meta). `like` provides the pytree structure; its leaf
    values are ignored but shapes are validated.
    """
    with np.load(io, allow_pickle=False) as arrs:
        meta = json.loads(bytes(arrs[_META_KEY]).decode())
        leaves = jax.tree_util.tree_flatten_with_path(like)
        out_leaves = []
        for path, leaf in leaves[0]:
            key = _path_str(path)
            if key not in arrs:
                raise KeyError(f"Checkpoint is missing array {key!r}")
            arr = arrs[key]
            if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"Checkpoint array {key!r} has shape {arr.shape}, "
                    f"expected {tuple(leaf.shape)}"
                )
            out_leaves.append(arr)
    return jax.tree_util.tree_unflatten(leaves[1], out_leaves), meta


def load_meta(io: Union[str, Path, IO[bytes]]) -> dict:
    "Read only the JSON metadata from a `save_pytree` npz."
    with np.load(io, allow_pickle=False) as arrs:
        return json.loads(bytes(arrs[_META_KEY]).decode())

"""Checkpoint save/load for parameter pytrees.

The analog of the reference's flow.save/load
(python/oneflow/framework/check_point_v2.py:298,390): a state dict of
arrays plus a structure manifest. Storage is a single .npz (arrays) + the
pytree structure restored by path-keyed names — no pickle, no host-specific
state, safe across processes. Sharded arrays are pulled to host before
saving (the analog of the reference's consolidated global-tensor save,
tensor_getstate check_point_v2.py:159-236).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    items = []
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        items.append((key, leaf))
    return items, treedef


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree of arrays to ``path`` (.npz created atomically)."""
    items, _ = _flatten_with_paths(tree)
    arrays = {}
    for i, (key, leaf) in enumerate(items):
        arrays[f"arr_{i}"] = np.asarray(jax.device_get(leaf))
    manifest = [key for key, _ in items]
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, manifest=json.dumps(manifest), **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, like: Any, restore_shardings: bool = True) -> Any:
    """Load into the structure of ``like`` (arrays restored in like's order).

    With ``restore_shardings`` (default), any leaf of ``like`` that carries
    a sharding gets the loaded array placed with the same sharding — the
    analog of the reference restoring global tensors to their placement
    (check_point_v2.py tensor_setstate)."""
    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(str(z["manifest"]))
        arrays = [z[f"arr_{i}"] for i in range(len(manifest))]
    items, treedef = _flatten_with_paths(like)
    if [k for k, _ in items] != manifest:
        raise ValueError(
            "checkpoint structure mismatch:\n"
            f"  file:   {manifest}\n  target: {[k for k, _ in items]}"
        )
    leaves = []
    for (key, ref), a in zip(items, arrays):
        sharding = getattr(ref, "sharding", None) if restore_shardings else None
        if sharding is not None and hasattr(ref, "is_fully_addressable"):
            leaves.append(jax.device_put(jnp.asarray(a), sharding))
        else:
            leaves.append(jnp.asarray(a))
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# Orbax-backed sharded checkpointing (multi-host scale path).
# ---------------------------------------------------------------------------


def save_sharded(path: str, tree: Any) -> None:
    """Sharded checkpoint via orbax: each host writes only its shards —
    the reference's per-rank save mode (check_point_v2.py global_dst_rank
    None branch), but in a format that restores to any mesh."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def load_sharded(path: str, like: Any) -> Any:
    """Restore an orbax checkpoint, resharding to ``like``'s shardings."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), like)

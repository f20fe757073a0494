"""Estimator state snapshots: save/restore the full device state to disk.

Greenfield capability (SURVEY.md §5 — the reference has no checkpoint or
resume support; its trajectory saving is a stub). Because every piece of
estimator state is a fixed-shape array pytree, checkpointing is a flat
np.savez of the leaves plus the treedef — resume is exact (bit-for-bit the
same arrays the step function would have consumed).
"""

from __future__ import annotations

import json

import jax
import numpy as np


def save_state(path: str, state) -> None:
    """Serialize an estimator-state pytree (NamedTuples of arrays) to `path`.

    Writes exactly `path` (np.savez would silently append .npz otherwise)
    and atomically (temp file + rename), so a crash mid-write during
    periodic checkpointing never corrupts the previous snapshot.
    """
    import os
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, path)


def load_state(path: str, template):
    """Restore a state saved by save_state into the structure of `template`
    (a freshly initialized state of the same configuration)."""
    data = np.load(path)
    leaves_t, treedef = jax.tree.flatten(template)
    stored_td = bytes(data["__treedef__"]).decode()
    if json.loads(stored_td) != str(treedef):
        raise ValueError("checkpoint tree structure differs from template "
                         "— config mismatch")
    leaves = []
    for i, t in enumerate(leaves_t):
        arr = data[f"leaf_{i}"]
        if tuple(arr.shape) != tuple(np.shape(t)):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template "
                f"{np.shape(t)} — config mismatch")
        leaves.append(jax.numpy.asarray(arr))
    return jax.tree.unflatten(treedef, leaves)

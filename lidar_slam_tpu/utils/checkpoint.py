"""Checkpoint/resume of SLAM state.

The reference has none ("a crash loses the run", SURVEY §5): state lives in C
globals and only the final map CSV survives. Here any model state (SlamState,
ParticleState, EkfSlamState, PoseGraph — arbitrary pytrees of arrays) can be
saved atomically and restored into the matching structure, so a long mapping
run resumes mid-dataset.
"""

from __future__ import annotations

import os
import tempfile

import jax
import numpy as np


def save_state(path: str, state) -> None:
    """Atomically save a pytree of arrays to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.asarray(str(treedef))
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_state(path: str, template):
    """Restore a pytree saved by ``save_state``. ``template`` supplies the
    structure (and is checked against the stored one)."""
    blob = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    stored = str(blob["__treedef__"])
    if stored != str(treedef):
        raise ValueError(
            f"checkpoint structure mismatch:\n saved: {stored}\n want:  {treedef}")
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = blob[f"leaf_{i}"]
        want = np.shape(np.asarray(leaf))
        if arr.shape != want:
            raise ValueError(f"leaf {i} shape {arr.shape} != template {want}")
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)

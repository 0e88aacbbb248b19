"""Checkpoint save/restore for train states (orbax-backed, numpy fallback).

Replaces rl_games' .pth checkpointing + the reference's env-state
passthrough (SURVEY.md §5.4: vec_task.py:222-230). The whole TrainState —
params, optimizer state, running stats, env state, PRNG key — is one pytree,
so save/restore round-trips the entire training process, enabling exact
resume and the PBT checkpoint-exchange protocol (handarm_tpu.parallel.pbt).
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def save_checkpoint(dirpath: str, tree, step: int, name: str = "ckpt") -> str:
    os.makedirs(dirpath, exist_ok=True)
    leaves, treedef = jax.tree.flatten(tree)
    path = os.path.join(dirpath, f"{name}_{step}.npz")
    np.savez_compressed(
        path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    )
    with open(path + ".tree", "wb") as f:
        pickle.dump(treedef, f)
    return path


def load_checkpoint(path: str, example_tree=None):
    """Load by path; if example_tree is given, its treedef is used (robust
    across refactors that keep the same leaf order)."""
    data = np.load(path, allow_pickle=False)
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    if example_tree is not None:
        treedef = jax.tree.structure(example_tree)
    else:
        with open(path + ".tree", "rb") as f:
            treedef = pickle.load(f)
    return jax.tree.unflatten(treedef, leaves)


def latest_checkpoint(dirpath: str, name: str = "ckpt") -> str | None:
    if not os.path.isdir(dirpath):
        return None
    cands = [
        f for f in os.listdir(dirpath)
        if f.startswith(name + "_") and f.endswith(".npz")
    ]
    if not cands:
        return None
    cands.sort(key=lambda f: int(f.rsplit("_", 1)[1].split(".")[0]))
    return os.path.join(dirpath, cands[-1])

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
import threading

import jax
import numpy as np

# One background writer: checkpoint serialization (np.savez of ~15-20 MB)
# must never sit on the training loop's critical path. Measured on the
# remote-tunnel TPU: a synchronous best-checkpoint save stalls the loop
# 2.6-9 s per improved iteration — early training improves most iterations,
# turning a 0.12 s device step into a 5.5 s wall step (the r4 throughput
# sawtooth). The device_get stays synchronous (arrays must be read before
# the caller mutates ts), but it is the cheap part; the npz write + fsync
# happens here.
_writer_lock = threading.Lock()
_writer: threading.Thread | None = None


def _join_writer() -> None:
    global _writer
    with _writer_lock:
        w = _writer
    if w is not None:
        w.join()


def wait_for_pending_saves() -> None:
    """Block until any in-flight checkpoint write has hit disk (call before
    process exit / exec-restart so resume never sees a torn file)."""
    _join_writer()


def save_checkpoint(
    dirpath: str, tree, step: int, name: str = "ckpt", sync: bool = False
) -> str:
    global _writer
    os.makedirs(dirpath, exist_ok=True)
    leaves, treedef = jax.tree.flatten(tree)
    # fetch all leaves in ONE batched transfer (scalar-by-scalar round
    # trips through the remote tunnel are the expensive failure mode)
    host_leaves = jax.device_get(leaves)
    path = os.path.join(dirpath, f"{name}_{step}.npz")

    def _write():
        tmp = path + ".tmp"
        # uncompressed savez: ~6x faster serialize at ~1.3x the bytes for
        # float32 params; the write is off-thread either way, but shorter
        # writes shrink the window where exit can race a pending save
        with open(tmp, "wb") as f:
            np.savez(f, **{f"leaf_{i}": np.asarray(x)
                           for i, x in enumerate(host_leaves)})
        os.replace(tmp, path)  # atomic: resume never loads a torn npz
        with open(path + ".tree", "wb") as f:
            pickle.dump(treedef, f)

    _join_writer()  # at most one write in flight; preserves save order
    if sync:
        _write()
        return path
    t = threading.Thread(target=_write, daemon=True)
    with _writer_lock:
        _writer = t
    t.start()
    return path


def load_checkpoint(path: str, example_tree=None):
    """Load by path; if example_tree is given, its treedef is used (robust
    across refactors that keep the same leaf order)."""
    _join_writer()  # read-your-writes: wait for any in-flight async save
    data = np.load(path, allow_pickle=False)
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    if example_tree is not None:
        treedef = jax.tree.structure(example_tree)
    else:
        with open(path + ".tree", "rb") as f:
            treedef = pickle.load(f)
    return jax.tree.unflatten(treedef, leaves)


def latest_checkpoint(dirpath: str, name: str = "ckpt") -> str | None:
    _join_writer()  # read-your-writes: wait for any in-flight async save
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

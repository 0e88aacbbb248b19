"""Device-mesh sharding for env batches + replicated learner params.

TPU-native replacement for the reference's torchrun/NCCL data parallelism
(SURVEY.md §2.10: rank wiring in utils/rlgames_utils.py:89-107, gradient
all-reduce hidden inside rl_games). Here there are no ranks and no explicit
collectives: env state shards over the `data` mesh axis, params/opt-state
replicate, and XLA inserts psums for the learner reductions under jit.

Works identically on a single chip (1-device mesh), a v5p-8, a multi-host
pod slice (call jax.distributed.initialize() first), or the
`--xla_force_host_platform_device_count` virtual CPU mesh used in tests.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(mesh: Mesh, tree):
    """Place a [B, ...] pytree with B sharded over the mesh; leaves without a
    divisible leading axis (global metrics, PRNG keys) replicate."""
    n = mesh.devices.size
    es, rs = env_sharding(mesh), replicated(mesh)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] >= n:
            return jax.device_put(x, es)
        return jax.device_put(x, rs)

    return jax.tree.map(place, tree)


def shard_train_state(mesh: Mesh, ts):
    """TrainState placement: per-env leaves (env_state, last_obs, teacher
    obs, LSTM carries) sharded on the env axis, everything else (params,
    opt state, stats, scalars) replicated."""
    rs = replicated(mesh)
    placed = jax.tree.map(lambda x: jax.device_put(x, rs), ts)
    placed = placed._replace(
        env_state=shard_env_state(mesh, ts.env_state),
        last_obs=jax.device_put(ts.last_obs, env_sharding(mesh)),
    )
    if getattr(ts, "last_teacher_obs", None) is not None:
        placed = placed._replace(
            last_teacher_obs=jax.device_put(
                ts.last_teacher_obs, env_sharding(mesh)
            )
        )
    if getattr(ts, "hidden", None) is not None:
        placed = placed._replace(hidden=shard_env_state(mesh, ts.hidden))
    return placed


def assert_sharded(mesh: Mesh, ts) -> dict:
    """Verify every TrainState leaf is placed as intended; returns a
    summary {sharded: n, replicated: n}. Raises on any leaf that is
    neither fully replicated nor env-axis sharded over this mesh."""
    n = mesh.devices.size
    counts = {"sharded": 0, "replicated": 0}

    def check(path, x):
        if not hasattr(x, "sharding"):
            return
        spec = getattr(x.sharding, "spec", None)
        if spec is None:
            raise AssertionError(f"{path}: no sharding")
        if tuple(spec) and tuple(spec)[0] == DATA_AXIS:
            counts["sharded"] += 1
            assert x.shape[0] % n == 0, (path, x.shape)
        elif all(s is None for s in tuple(spec)) or not tuple(spec):
            counts["replicated"] += 1
        else:
            raise AssertionError(f"{path}: unexpected spec {spec}")

    from jax.tree_util import tree_flatten_with_path

    leaves, _ = tree_flatten_with_path(ts)
    for path, leaf in leaves:
        check(jax.tree_util.keystr(path), leaf)
    return counts

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
    """TrainState placement: env_state/last_obs sharded on env axis,
    everything else (params, opt state, stats, scalars) replicated."""
    rs = replicated(mesh)
    placed = jax.tree.map(lambda x: jax.device_put(x, rs), ts)
    return placed._replace(
        env_state=shard_env_state(mesh, ts.env_state),
        last_obs=jax.device_put(ts.last_obs, env_sharding(mesh)),
    )

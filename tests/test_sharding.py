"""Multi-device sharding: env state sharded over the data axis, learner
replicated, full PPO iteration under a mesh (virtual 8-device CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv
from handarm_tpu.learn.ppo import PPO, PPOConfig
from handarm_tpu.parallel.mesh import (
    DATA_AXIS,
    env_sharding,
    make_mesh,
    shard_train_state,
)


@pytest.fixture(scope="module")
def env8():
    return HandArmEnv(
        HandArmConfig(
            num_envs=16, episode_length=5,
            observations=("ur5_joint_pos", "target_object_pos"),
            actions=("ur5_relative_joint_pos",),
            solver_iterations=2,
        )
    )


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices


def test_env_step_sharded(env8):
    mesh = make_mesh()
    state, obs = jax.jit(env8.reset)(jax.random.PRNGKey(0))
    from handarm_tpu.parallel.mesh import shard_env_state

    state = shard_env_state(mesh, state)
    q_shard = state.physics.robot.q.sharding
    assert q_shard.is_equivalent_to(env_sharding(mesh), 2)
    actions = jax.device_put(
        jnp.zeros((16, env8.num_actions)), env_sharding(mesh)
    )
    step = jax.jit(env8.step)
    state2, res = step(state, actions)
    # leading env axis stays sharded through the step
    assert not res.obs.sharding.is_fully_replicated
    # dones only from staggered episode-clock timeouts (reset() randomizes
    # initial progress); nothing crashed
    assert bool(jnp.all(jnp.isfinite(res.obs)))
    assert bool(jnp.all(jnp.isfinite(res.reward)))


def test_ppo_train_iter_sharded_matches_single(env8):
    """One sharded train iteration runs and produces finite stats; params
    remain replicated across devices."""
    mesh = make_mesh()
    ppo = PPO(env8, PPOConfig(horizon=2, minibatch_size=8, mini_epochs=1, hidden=(16,)))
    ts = ppo.init(jax.random.PRNGKey(0))
    ts_sharded = shard_train_state(mesh, ts)
    train = jax.jit(ppo.train_iter)
    ts2, stats = train(ts_sharded)
    assert np.isfinite(float(stats["kl"]))
    p_leaf = jax.tree.leaves(ts2.params)[0]
    assert p_leaf.sharding.is_fully_replicated
    env_leaf = ts2.env_state.physics.robot.q
    assert not env_leaf.sharding.is_fully_replicated


def test_dryrun_multichip_entry(monkeypatch):
    import __graft_entry__ as ge

    # tiny shape in-suite; the driver artifact runs the realistic default
    monkeypatch.setenv("HANDARM_DRYRUN_TINY", "1")
    ge.dryrun_multichip(8)


def test_sharded_update_has_no_allgather(env8):
    """The SGD phase must run data-parallel: with data_shards=mesh size the
    compiled train_iter contains gradient all-reduces but NO batch
    all-gathers (the r3 scaling bug: T-major minibatch flatten all-gathered
    the whole rollout to every device and replicated the update)."""
    mesh = make_mesh()
    ppo = PPO(
        env8,
        PPOConfig(horizon=2, minibatch_size=16, mini_epochs=1, hidden=(16,),
                  data_shards=8),
    )
    ts = ppo.init(jax.random.PRNGKey(0))
    ts = shard_train_state(mesh, ts)
    ctx = (
        jax.sharding.use_mesh(mesh)
        if hasattr(jax.sharding, "use_mesh")
        else mesh
    )
    with ctx:
        compiled = jax.jit(ppo.train_iter).lower(ts).compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo  # gradient psum present
    # no batch all-gather: tolerate none at all (XLA names vary by version,
    # but the r3 pathology produced 20 of these)
    n_ag = hlo.count(" all-gather")
    assert n_ag == 0, f"{n_ag} all-gathers in sharded train_iter"

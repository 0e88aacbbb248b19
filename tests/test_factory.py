"""Factory nut-bolt family (reference tasks/factory/): SDF mesh objects,
task-space impedance control, cylindrical screw joint."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handarm_tpu.envs.factory import (
    BOLT_HEAD_HEIGHT,
    BOLT_SHANK_LENGTH,
    TABLE_HEIGHT,
    THREAD_PITCH,
    make_factory,
)


def test_factory_pick_spaces_and_rest():
    env = make_factory(task="pick", num_envs=4)
    assert env.num_obs == 20 and env.num_actions == 12
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (4, 20)
    step = jax.jit(env.step)
    for _ in range(30):
        state, res = step(state, jnp.zeros((4, 12)))
    # nut rests on the table (half height ~8 mm + SDF margin)
    z = np.asarray(state.physics.objects.pos[:, 0, 2])
    assert (np.abs(z - TABLE_HEIGHT) < 0.03).all(), z
    assert bool(jnp.all(jnp.isfinite(res.obs)))
    # keypoint reward is negative distance: moving the gripper onto the
    # grasp frame increases reward
    assert float(res.reward.mean()) < 0.0


def test_factory_place_obs_and_gripper_holds_nut():
    env = make_factory(task="place", num_envs=4)
    assert env.num_obs == 27
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    for _ in range(25):
        state, res = step(state, jnp.zeros((4, 12)))
    # the nut spawned in the closed gripper must not fall to the table
    z = np.asarray(state.physics.objects.pos[:, 0, 2])
    assert (z > TABLE_HEIGHT + 0.05).all(), z


def test_factory_screw_thread_kinematics():
    """Spinning the nut clockwise descends it by pitch * turns (the
    cylindrical rail + env thread coupling)."""
    env = make_factory(task="screw", num_envs=2)
    assert env.num_obs == 32
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    z0 = float(state.physics.objects.pos[0, 0, 2])
    s = state
    for _ in range(30):
        s = s._replace(physics=s.physics._replace(
            objects=s.physics.objects._replace(
                angvel=s.physics.objects.angvel.at[:, 0, 2].set(-20.0)
            )
        ))
        s, res = step(s, jnp.zeros((2, 12)))
    z1 = float(s.physics.objects.pos[0, 0, 2])
    theta = float(s.theta[0])
    assert theta < -5.0  # it spun
    expect = np.clip(
        z0 + THREAD_PITCH * theta / (2 * np.pi),
        TABLE_HEIGHT + BOLT_HEAD_HEIGHT,
        TABLE_HEIGHT + BOLT_HEAD_HEIGHT + BOLT_SHANK_LENGTH,
    )
    np.testing.assert_allclose(z1, expect, atol=1e-3)
    # nut stays centered on the bolt axis
    xy = np.asarray(s.physics.objects.pos[:, 0, :2])
    np.testing.assert_allclose(xy, np.zeros((2, 2)), atol=1e-4)


def test_factory_gears_scene_steps():
    """FactoryTaskGears parity: gear base + 3 gears on the table, OSC
    control steps, zero task reward (reference scaffold,
    factory_task_gears.py:119-125)."""
    env = make_factory(task="gears", num_envs=2, episode_length=20)
    assert env.K == 3 and env.num_obs == 20
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(3))
    assert obs.shape == (2, 20)
    step = jax.jit(env.step)
    for _ in range(15):
        state, res = step(state, jnp.zeros((2, 12)))
    assert bool(jnp.all(jnp.isfinite(res.obs)))
    assert float(jnp.abs(res.reward).max()) == 0.0
    # all four objects rest near the table, none exploded
    z = np.asarray(state.physics.objects.pos[:, :, 2])
    assert (np.abs(z - TABLE_HEIGHT) < 0.15).all(), z


def test_factory_insertion_scene_steps():
    """FactoryTaskInsertion parity: peg + socket scene (reference reward
    scaffold, factory_task_insertion.py)."""
    env = make_factory(task="insertion", num_envs=2, episode_length=60)
    assert env.K == 2
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(4))
    step = jax.jit(env.step)
    # full episode: a spawn-penetration ejection peaks after ~30 steps
    # (advisor r2 finding), so a short horizon would mask it
    for _ in range(50):
        state, res = step(state, jnp.zeros((2, 12)))
    assert bool(jnp.all(jnp.isfinite(res.obs)))
    assert float(jnp.abs(res.reward).max()) == 0.0
    z = np.asarray(state.physics.objects.pos[:, :, 2])
    # both bodies rest on/near the table: origin height above the table is
    # bounded by each mesh's z half-extent (a few cm), not ejected upward
    assert (z - TABLE_HEIGHT > -0.01).all(), z
    assert (z - TABLE_HEIGHT < 0.05).all(), z


def test_registry_resolver_names():
    """Reference task-map names resolve: AllegroKuka/AllegroKukaTwoArms
    subtask resolvers, AllegroHandADR, AllegroHandManualDR
    (tasks/__init__.py:66-99)."""
    from handarm_tpu.envs.registry import CLASSIC_TASKS

    for name in ("AllegroKuka", "AllegroKukaTwoArms", "AllegroHandADR",
                 "AllegroHandManualDR", "FactoryTaskGears",
                 "FactoryTaskInsertion"):
        assert name in CLASSIC_TASKS, name


def test_allegro_manual_dr_ranges_fixed():
    """ManualDR: parameter ranges never move (zero delta), but rollout
    workers still sample inside the manual ranges."""
    from handarm_tpu.envs.dextreme import make_allegro_dextreme_manual

    env = make_allegro_dextreme_manual(num_envs=8, episode_length=30)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(5))
    step = jax.jit(env.step)
    lo0, hi0 = np.asarray(state.adr.lo), np.asarray(state.adr.hi)
    for _ in range(40):
        state, res = step(state, jnp.zeros((8, env.num_actions)))
    assert np.allclose(np.asarray(state.adr.lo), lo0)
    assert np.allclose(np.asarray(state.adr.hi), hi0)
    vals = np.asarray(state.adr.values)
    assert (vals >= lo0[None] - 1e-6).all() and (vals <= hi0[None] + 1e-6).all()


def test_allegro_kuka_subtask_override():
    """make_env('AllegroKuka', ['env.subtask=throw']) resolves the throw
    variant (reference resolve_allegro_kuka)."""
    from handarm_tpu.envs.registry import make_env

    env, _ = make_env("AllegroKuka",
                      ["env.num_envs=2", "env.subtask=throw"])
    assert env.cfg.variant == "throw"

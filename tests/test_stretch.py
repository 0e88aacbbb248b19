"""Stretch robot family parity (reference tasks/hand_arm/base/stretch.py +
env/stretch_multi_object.py): grouped relative action semantics, fingertip
observables, reset pose, and a stepping multi-object scene."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handarm_tpu.envs.registry import make_env


@pytest.fixture(scope="module")
def stretch_env():
    env, _ = make_env(
        "StretchMultiObjectManipulation",
        ["num_envs=4", "episode_length=12"],
    )
    return env


def test_stretch_model_and_spaces(stretch_env):
    env = stretch_env
    # 5-dim grouped action (stretch.py:216-229: mast, lift, arm-group,
    # wrist, gripper) and the configured observable stack
    assert env.num_actions == 5
    assert env.art.nv == 9
    sizes = {o.name: o.size for o in env.active_obs}
    assert sizes["stretch_joint_pos"] == 9
    assert sizes["stretch_flange_pose"] == 7
    assert sizes["stretch_fingertip_pos"] == 6  # 2 fingertips x 3
    assert sizes["stretch_fingertip_linvel"] == 6
    assert env.num_obs == sum(sizes[n] for n in env.cfg.observations)


def test_stretch_reset_pose(stretch_env):
    from handarm_tpu.robots.stretch import RESET_JOINT_CONFIG

    env = stretch_env
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    q = np.asarray(state.physics.robot.q)
    # reset joint config reached (modulo reset noise)
    np.testing.assert_allclose(
        q, np.tile(RESET_JOINT_CONFIG, (4, 1)), atol=0.26
    )
    assert np.all(np.isfinite(np.asarray(obs)))


def test_stretch_grouped_action_moves_joint_groups(stretch_env):
    """Action slot 2 drives ALL four telescoping arm segments together
    (stretch.py:216-229); slot 4 drives both gripper fingers."""
    env = stretch_env
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(1))
    # zero the randomized episode clocks so no env auto-resets mid-probe
    state = state._replace(
        task=state.task._replace(progress=jnp.zeros_like(state.task.progress))
    )
    step = jax.jit(env.step)
    a = jnp.zeros((4, 5)).at[:, 2].set(1.0)  # extend the arm group
    q0 = np.asarray(state.physics.robot.q)
    s = state
    for _ in range(10):
        s, res = step(s, a)
    q1 = np.asarray(s.physics.robot.q)
    d = q1 - q0
    arm = d[:, 2:6]
    assert (arm > 0.003).all(), arm  # all 4 segments extended
    # non-arm joints essentially unmoved by the arm action
    assert np.abs(d[:, [0, 6]]).max() < 0.02, d


def test_stretch_multiobject_steps_finite(stretch_env):
    env = stretch_env
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(3)
    for i in range(14):  # crosses the episode boundary (auto-reset)
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (4, 5), minval=-1, maxval=1)
        state, res = step(state, a)
    assert np.all(np.isfinite(np.asarray(res.obs)))
    assert np.all(np.isfinite(np.asarray(res.reward)))
    assert np.all(np.isfinite(np.asarray(state.physics.robot.q)))
    # objects stayed in the workspace (no ejections)
    z = np.asarray(state.physics.objects.pos[..., 2])
    assert (z > -0.1).all() and (z < 2.0).all(), z


def test_stretch_lift_registered_and_learner_builds():
    from handarm_tpu.learn.ppo import PPO, PPOConfig

    env, _ = make_env("StretchLift", ["num_envs=8", "episode_length=8"])
    ppo = PPO(
        env, PPOConfig(horizon=4, minibatch_size=16, mini_epochs=1,
                       hidden=(32,)),
    )
    ts = ppo.init(jax.random.PRNGKey(4))
    ts2, stats = jax.jit(ppo.train_iter)(ts)
    assert np.isfinite(float(stats["kl"]))

"""NaN containment: a physics blowup mid-training must not poison the
learner (regression for the round-2 lift_r2d NaN rows).

Root cause chain being guarded against (see VERDICT r2 weak#1):
  blown-up env -> non-finite obs leak (info-derived terms / unguarded
  quat|angvel leaves) -> NaN critic value -> `gamma * value * done`
  (NaN * 0 == NaN) -> NaN reward in EVERY transition -> GAE propagates NaN
  across the horizon -> NaN loss / KL -> permanent kl_guard loop.

Reference behavior: PhysX never returns NaN so the reference
(isaacgymenvs/tasks/base/vec_task.py:390-441) has no guards; our engine
guards instead (envs/hand_arm.py finite guard + obs sanitize,
learn/ppo.py rollout-boundary guards).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv
from handarm_tpu.learn.ppo import PPO, PPOConfig


@pytest.fixture(scope="module")
def env():
    cfg = HandArmConfig(
        num_envs=8, episode_length=6,
        observations=(
            "ur5_joint_pos", "target_object_pos", "dof_position_targets",
        ),
        actions=("ur5_relative_joint_pos",),
        solver_iterations=4,
    )
    return HandArmEnv(cfg)


def _poison_env_state(env_state, env_idx=0):
    """Set robot q/qd and object state of one env to NaN — simulates a
    solver blowup that happened on-device."""
    phys = env_state.physics
    nan = jnp.nan
    robot = phys.robot._replace(
        q=phys.robot.q.at[env_idx].set(nan),
        qd=phys.robot.qd.at[env_idx].set(nan),
    )
    objects = phys.objects._replace(
        pos=phys.objects.pos.at[env_idx].set(nan),
        quat=phys.objects.quat.at[env_idx].set(nan),
        linvel=phys.objects.linvel.at[env_idx].set(nan),
        angvel=phys.objects.angvel.at[env_idx].set(nan),
    )
    return env_state._replace(
        physics=phys._replace(robot=robot, objects=objects)
    )


def test_env_step_contains_nan_state(env):
    """A NaN env resets immediately, emits finite obs and zero reward."""
    state, _ = env.reset(jax.random.PRNGKey(0))
    state = _poison_env_state(state, env_idx=0)
    actions = jnp.zeros((env.cfg.num_envs, env.num_actions))
    state2, res = jax.jit(env.step)(state, actions)
    assert bool(res.done[0])
    assert float(res.reward[0]) == 0.0
    assert np.all(np.isfinite(np.asarray(res.obs)))
    assert np.all(np.isfinite(np.asarray(res.teacher_obs)))
    # the poisoned env was replaced by a fresh finite state
    assert np.all(np.isfinite(np.asarray(state2.physics.robot.q)))
    assert np.all(np.isfinite(np.asarray(state2.physics.objects.pos)))
    # healthy envs were untouched by the reset merge
    assert np.allclose(
        np.asarray(state2.physics.robot.q[1:]),
        np.asarray(jax.jit(env.step)(state, actions)[0].physics.robot.q[1:]),
    )


def test_learner_survives_and_recovers_from_nan_state(env):
    """Inject NaN mid-training: every subsequent iteration stays finite and
    the learner keeps updating (no permanent guard loop)."""
    ppo = PPO(
        env,
        PPOConfig(horizon=4, minibatch_size=16, mini_epochs=2, hidden=(32, 32)),
    )
    ts = ppo.init(jax.random.PRNGKey(0))
    train = jax.jit(ppo.train_iter)
    for _ in range(2):
        ts, stats = train(ts)
    ts = ts._replace(env_state=_poison_env_state(ts.env_state, env_idx=0))
    for i in range(4):
        ts, stats = train(ts)
        for k in ("kl", "reward_mean", "value_loss", "policy_loss", "lr"):
            assert np.isfinite(float(stats[k])), (i, k, stats[k])
    # params, opt state, and running stats all stayed finite
    for leaf in jax.tree.leaves(
        (ts.params, ts.obs_stats, ts.value_stats, ts.lr)
    ):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # the env itself recovered (reset replaced the poisoned member)
    assert np.all(np.isfinite(np.asarray(ts.env_state.physics.robot.q)))
    assert np.all(np.isfinite(np.asarray(ts.last_obs)))


def test_kl_guard_reverts_normalization_stats(env):
    """When the trust-region guard fires, the running normalization stats
    from the poisoned rollout are discarded with the params (advisor r2)."""
    ppo = PPO(
        env,
        PPOConfig(
            horizon=4, minibatch_size=16, mini_epochs=2, hidden=(32, 32),
            kl_guard=1e-12,  # always fires once armed
        ),
    )
    ts = ppo.init(jax.random.PRNGKey(0))
    train = jax.jit(ppo.train_iter)
    for _ in range(9):  # arm the guard (epoch >= 8)
        ts, stats = train(ts)
    before = ts
    ts, stats = train(ts)
    assert float(stats["kl_guard_triggered"]) == 1.0
    assert np.allclose(
        np.asarray(ts.obs_stats.mean), np.asarray(before.obs_stats.mean)
    )
    assert float(ts.value_stats.count) == float(before.value_stats.count)
    for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(before.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

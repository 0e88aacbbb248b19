"""Task-level behavior: cartpole learns, goal modes, ROS seam, registry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_cartpole_learns_fast():
    """Reference headline: Cartpole balances within a few seconds
    (README.md:62-66). 40 PPO iterations at 256 envs must reach sustained
    near-max reward."""
    from handarm_tpu.envs.classic import make_cartpole
    from handarm_tpu.learn.ppo import PPO, PPOConfig

    env = make_cartpole(num_envs=256, episode_length=500)
    ppo = PPO(env, PPOConfig(horizon=16, minibatch_size=2048, mini_epochs=4,
                             hidden=(64, 64), reward_scale=1.0))
    ts = ppo.init(jax.random.PRNGKey(0))
    train = jax.jit(ppo.train_iter)
    rew = 0.0
    for _ in range(40):
        ts, stats = train(ts)
        rew = float(stats["reward_mean"])
    assert rew > 0.8, rew
    assert float(stats["episode_done_frac"]) < 0.02


def test_registry_make_env_classic_and_handarm():
    from handarm_tpu.envs.registry import make_env

    env, ppo_cfg = make_env("Cartpole", ["num_envs=32"])
    assert env.num_obs == 4 and env.num_actions == 1
    env2, _ = make_env("Ur5SihLift", ["num_envs=4", "episode_length=5"])
    assert env2.num_actions == 11


def test_oriented_reposition_goal():
    from handarm_tpu.envs.registry import make_env

    env, _ = make_env(
        "Ur5SihOrientedReposition", ["num_envs=4", "episode_length=5"]
    )
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    # goal quats are randomized unit quaternions
    gq = np.asarray(state.task.goal_quat)
    np.testing.assert_allclose(np.linalg.norm(gq, axis=-1), 1.0, atol=1e-5)
    assert np.std(gq[:, 0]) > 0.01
    state, res = jax.jit(env.step)(state, jnp.zeros((4, env.num_actions)))
    assert np.isfinite(np.asarray(res.reward)).all()
    assert "goal_quat" in env.obs_slices


def test_ros_bridge_records_commands():
    from handarm_tpu.real.ros_bridge import (
        CrossCheckConfig,
        SimRealCrossCheck,
        Ur5SihRosBridge,
    )

    bridge = Ur5SihRosBridge()
    bridge.publish_arm_joint_targets(np.zeros(6), 0.016)
    bridge.publish_sih_ticks(np.array([2650, 250, 1450, 2300, 1000]))
    kinds = [c[0] for c in bridge.outbox]
    assert kinds == ["arm", "sih"]

    chk = SimRealCrossCheck(CrossCheckConfig(max_joint_divergence=0.01))
    chk.update_real(joint_pos=np.zeros(6))
    chk.check(np.full(6, 0.005))  # within tolerance
    with pytest.raises(RuntimeError):
        chk.check(np.full(6, 0.05))  # diverged -> hard fail

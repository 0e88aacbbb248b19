"""Locomotion task family (Ant/Humanoid): construction parity with the
reference (obs/action widths, ant.py:401-407 layout), physical settling on
the ground plane, and PPO learning progress."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def ant():
    from handarm_tpu.envs.locomotion import make_ant

    return make_ant(num_envs=32)


def test_ant_spaces(ant):
    # reference Ant: 60 obs (ant.py:75 num_observations), 8 actions
    assert ant.num_obs == 60
    assert ant.num_actions == 8
    assert len(ant.feet_bodies) == 4
    np.testing.assert_allclose(np.asarray(ant.gears[6:]), 15.0)


def test_ant_settles_upright(ant):
    """Zero torque from the spawn pose: the ant must come to rest standing
    on its feet (not fall through, not explode), up_proj ~ 1."""
    key = jax.random.PRNGKey(0)
    state, obs = jax.jit(ant.reset)(key)
    assert obs.shape == (32, 60)
    step = jax.jit(ant.step)
    for _ in range(90):
        state, res = step(state, jnp.zeros((32, 8)))
    z = np.asarray(state.physics.robot.base_pos[:, 2])
    assert (z > 0.2).all() and (z < 0.5).all(), z
    up = np.asarray(res.obs[:, 10])
    assert (up > 0.9).all(), up
    # feet carry the weight in nearly all envs (an occasional ant settles
    # leaning on a lower-leg link — physically fine, just not foot contact)
    fz = np.asarray(state.feet_force[..., 2]).sum(-1)
    frac = (fz > 0.5 * 0.911 * 9.81).mean()
    assert frac >= 0.9, (frac, np.sort(fz)[:4])
    assert bool(jnp.all(jnp.isfinite(res.obs)))


def test_ant_survives_random_flailing(ant):
    """Full-power random torques for 5 sim seconds: state must stay finite
    (velocity clamps bound the airborne gyroscopic blowup)."""
    key = jax.random.PRNGKey(1)
    state, _ = jax.jit(ant.reset)(key)
    step = jax.jit(ant.step)

    def body(carry, k):
        st, _ = carry
        a = jax.random.uniform(k, (32, 8), minval=-1.0, maxval=1.0)
        st, res = step(st, a)
        return (st, res.obs), None

    keys = jax.random.split(jax.random.PRNGKey(2), 300)
    (state, obs), _ = jax.jit(
        lambda st, ks: jax.lax.scan(body, (st, jnp.zeros((32, 60))), ks)
    )(state, keys)
    assert bool(jnp.all(jnp.isfinite(obs)))
    assert bool(jnp.all(jnp.isfinite(state.physics.robot.qd)))


def test_ant_ppo_learns():
    """Reward must clearly move above the standing baseline within 70
    iterations (reference AntPPO.yaml hyperparameters, scaled down; with
    full resting friction gait discovery takes longer than on the old
    near-frictionless contacts)."""
    from handarm_tpu.envs.locomotion import make_ant
    from handarm_tpu.learn.ppo import PPO, PPOConfig

    env = make_ant(num_envs=256)
    ppo = PPO(
        env,
        PPOConfig(
            horizon=16,
            minibatch_size=2048,
            mini_epochs=4,
            hidden=(256, 128, 64),
            kl_threshold=0.008,
            reward_scale=0.01,
        ),
    )
    ts = ppo.init(jax.random.PRNGKey(0))
    train = jax.jit(ppo.train_iter)
    rewards = []
    for _ in range(70):
        ts, stats = train(ts)
        rewards.append(float(stats["reward_mean"]))
    first = np.mean(rewards[:3])
    tail = np.mean(rewards[-10:])
    assert tail > first + 1.0, (first, tail, rewards[::8])


def test_humanoid_spaces_and_steps():
    from handarm_tpu.envs.locomotion import make_humanoid

    env = make_humanoid(num_envs=8)
    # reference Humanoid: 108 obs, 21 actions (humanoid.py:73-76)
    assert env.num_obs == 108
    assert env.num_actions == 21
    assert len(env.feet_bodies) == 2
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (8, 108)
    step = jax.jit(env.step)
    for _ in range(30):
        state, res = step(state, jnp.zeros((8, 21)))
    assert bool(jnp.all(jnp.isfinite(res.obs)))
    z = np.asarray(state.physics.robot.base_pos[:, 2])
    assert (z > 0.0).all() and (z < 2.0).all()


def test_registry_ant_humanoid():
    from handarm_tpu.envs.registry import make_env

    env, ppo_cfg = make_env("Ant", ["num_envs=16"])
    assert env.num_obs == 60 and ppo_cfg["minibatch_size"] == 32768
    env2, _ = make_env("Humanoid", ["num_envs=16"])
    assert env2.num_obs == 108

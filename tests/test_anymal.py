"""ANYmal-C velocity-command locomotion (reference tasks/anymal.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from handarm_tpu.envs.anymal import make_anymal


def test_anymal_spaces_and_stance():
    env = make_anymal(num_envs=8, episode_length=200)
    assert env.num_obs == 48 and env.num_actions == 12
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (8, 48)
    step = jax.jit(env.step)
    for _ in range(120):  # 2 s standing at the default stance targets
        state, res = step(state, jnp.zeros((8, 12)))
    z = np.asarray(state.physics.robot.base_pos[:, 2])
    # settled into stance, not collapsed (crash reset would re-spawn at 0.62)
    assert (z > 0.3).all() and (z < 0.7).all(), z
    assert not bool(res.done.any())
    assert bool(jnp.all(jnp.isfinite(res.obs)))


def test_anymal_velocity_reward_tracks_commands():
    """Standing still must earn more reward when the command is zero than
    when a fast velocity is commanded (exp tracking terms)."""
    env = make_anymal(num_envs=4, episode_length=300)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    for _ in range(60):
        state, _ = step(state, jnp.zeros((4, 12)))
    zero_cmd = state._replace(commands=jnp.zeros((4, 3)))
    fast_cmd = state._replace(
        commands=jnp.broadcast_to(jnp.asarray([2.0, 0.0, 0.0]), (4, 3))
    )
    _, r0 = step(zero_cmd, jnp.zeros((4, 12)))
    _, r1 = step(fast_cmd, jnp.zeros((4, 12)))
    assert float(r0.reward.mean()) > float(r1.reward.mean())


def test_ball_balance_spaces_and_physics():
    """BallBalance (reference tasks/ball_balance.py): tripod stays up, the
    ball interacts with the tray, fallen balls reset their env."""
    from handarm_tpu.envs.ball_balance import make_ball_balance

    env = make_ball_balance(num_envs=8, episode_length=300)
    assert env.num_obs == 24 and env.num_actions == 3
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (8, 24)
    step = jax.jit(env.step)
    resets = 0
    for _ in range(240):  # 4 s
        state, res = step(state, jnp.zeros((8, 3)))
        resets += int(res.done.sum())
    z_tray = np.asarray(state.physics.robot.base_pos[:, 2])
    assert (z_tray > 0.3).all(), z_tray  # tripod never collapsed
    assert bool(jnp.all(jnp.isfinite(res.obs)))
    # with zero control most balls eventually roll off and respawn
    assert resets >= 1


def test_quadcopter_thrust_lifts():
    """Quadcopter (reference tasks/quadcopter.py): full thrust overcomes
    gravity; zero thrust falls."""
    from handarm_tpu.envs.quadcopter import make_quadcopter

    env = make_quadcopter(num_envs=4, episode_length=300)
    assert env.num_obs == 21 and env.num_actions == 12
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    up = jnp.zeros((4, 12)).at[:, 8:].set(1.0)
    z0 = np.asarray(state.physics.robot.base_pos[:, 2]).copy()
    for _ in range(40):
        state, res = step(state, up)
    z1 = np.asarray(state.physics.robot.base_pos[:, 2])
    # most envs climb (some may reset mid-run when they fly out of range)
    assert (z1 > z0).mean() >= 0.75, (z0, z1)
    assert bool(jnp.all(jnp.isfinite(res.obs)))


def test_ingenuity_mars_gravity_flight():
    """Ingenuity (reference tasks/ingenuity.py): climbs under coaxial
    thrust at Mars gravity, falls without."""
    from handarm_tpu.envs.ingenuity import make_ingenuity

    env = make_ingenuity(num_envs=4, episode_length=1000)
    assert env.num_obs == 13 and env.num_actions == 6
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    up = jnp.zeros((4, 6)).at[:, 2].set(0.3).at[:, 5].set(0.3)
    for _ in range(40):
        state, res = step(state, up)
    z1 = np.asarray(state.physics.robot.base_pos[:, 2])
    assert (z1 > 1.2).all(), z1
    for _ in range(90):
        state, res = step(state, jnp.zeros((4, 6)))
    z2 = np.asarray(state.physics.robot.base_pos[:, 2])
    assert (z2 < 1.3).all(), z2  # fell (or reset to spawn at 1.0)

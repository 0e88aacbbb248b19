"""IndustReal insertion (reference tasks/industreal/): SDF reward, SAPU,
SBC curriculum, welded pre-grasp."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handarm_tpu.envs.industreal import TABLE_HEIGHT, make_industreal


@pytest.fixture(scope="module")
def pegs_env():
    return make_industreal(task="pegs", num_envs=4)


def test_industreal_spaces_and_weld(pegs_env):
    env = pegs_env
    assert env.num_obs == 24 and env.num_actions == 6
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (4, 24)
    state = state._replace(progress=jnp.zeros(4, jnp.int32))
    step = jax.jit(env.step)
    for _ in range(20):
        state, res = step(state, jnp.zeros((4, 6)))
    # the welded plug tracks the gripper
    _, gp, gq, _, _ = env._eef(state.physics)
    from handarm_tpu.math.quat import quat_rotate

    expect = np.asarray(gp + quat_rotate(gq, state.weld_p))
    np.testing.assert_allclose(
        np.asarray(state.physics.objects.pos[:, 0]), expect, atol=1e-5
    )
    assert bool(jnp.all(jnp.isfinite(res.obs)))


def test_industreal_sdf_reward_monotone(pegs_env):
    """SDF reward grows as the plug approaches the goal pose (the dense
    insertion signal, industreal_algo_utils.py:239-283)."""
    env = pegs_env
    B = 4
    quat = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (B, 4))
    goal = jnp.broadcast_to(env.plug_goal_pos, (B, 3))
    r_at_goal = env.sdf_reward(goal, quat)
    r_above = env.sdf_reward(goal + jnp.asarray([0.0, 0.0, 0.03]), quat)
    r_far = env.sdf_reward(goal + jnp.asarray([0.1, 0.0, 0.1]), quat)
    assert float(r_at_goal[0]) > float(r_above[0]) > float(r_far[0])


def test_industreal_sapu_penalizes_interpenetration(pegs_env):
    """SAPU scale is 1 free-space, < 1 at small interpenetration, and 0
    beyond the threshold (algo_utils.py:158-198)."""
    env = pegs_env
    B = 4
    quat = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (B, 4))
    sq = quat
    sp = jnp.broadcast_to(
        jnp.asarray([0.5, 0.0, TABLE_HEIGHT + env.socket_height / 2]), (B, 3)
    )
    free = jnp.broadcast_to(jnp.asarray([0.5, 0.0, 0.8]), (B, 3))
    s_free, _ = env.sapu_scale(free, quat, sp, sq)
    # ram the plug sideways INTO the socket plate body
    inside = sp + jnp.asarray([0.012, 0.0, 0.0])
    s_in, pen = env.sapu_scale(inside, quat, sp, sq)
    assert float(s_free[0]) == pytest.approx(1.0, abs=1e-3)
    assert float(pen[0]) > 0.001
    assert float(s_in[0]) < 0.1


def test_industreal_sbc_curriculum_moves():
    """SBC lowers max initial engagement when success is high and raises
    it when low (algo_utils.py:304-333)."""
    env = make_industreal(task="pegs", num_envs=4, curriculum_interval=1)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    d0 = float(state.max_disp)
    # force high success: everything inserted, all episodes ending
    s_hi = state._replace(
        inserted=jnp.ones(4, bool),
        success_ewma=jnp.asarray(1.0),
        progress=jnp.full(4, env.cfg.episode_length, jnp.int32),
    )
    s2, _ = step(s_hi, jnp.zeros((4, 6)))
    assert float(s2.max_disp) < d0  # harder (less initial engagement)
    s_lo = state._replace(
        success_ewma=jnp.asarray(0.0),
        progress=jnp.full(4, env.cfg.episode_length, jnp.int32),
    )
    s3, _ = step(s_lo, jnp.zeros((4, 6)))
    assert float(s3.max_disp) >= d0  # easier or clamped at the bound

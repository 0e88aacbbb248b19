"""FrankaCubeStack + the OSC controller (reference franka_cube_stack.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from handarm_tpu.envs.franka import make_franka_cube_stack


def test_franka_spaces_and_rest():
    env = make_franka_cube_stack(num_envs=4)
    assert env.num_obs == 19 and env.num_actions == 7
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (4, 19)
    step = jax.jit(env.step)
    for _ in range(60):
        state, res = step(state, jnp.zeros((4, 7)))
    z = np.asarray(state.physics.objects.pos[:, :, 2])
    # cubes rest on the table at their half-extents
    np.testing.assert_allclose(z[:, 0], 1.05, atol=0.01)
    np.testing.assert_allclose(z[:, 1], 1.06, atol=0.01)
    assert bool(jnp.all(jnp.isfinite(res.obs)))


def test_franka_osc_tracks_dpose():
    """A constant downward dpose command must move the end effector down
    (task-space impedance actually controls the eef)."""
    env = make_franka_cube_stack(num_envs=2)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    _, p0, *_ = env._eef(state.physics)
    down = jnp.zeros((2, 7)).at[:, 2].set(-1.0).at[:, 6].set(1.0)
    for _ in range(40):
        state, _ = step(state, down)
    _, p1, *_ = env._eef(state.physics)
    dz = np.asarray(p1[:, 2] - p0[:, 2])
    assert (dz < -0.05).all(), dz
    # and x/y stayed comparatively put
    dxy = np.linalg.norm(np.asarray(p1[:, :2] - p0[:, :2]), axis=-1)
    assert (dxy < np.abs(dz)).all(), (dxy, dz)


def test_trifinger_spaces_and_reach():
    """Trifinger (reference tasks/trifinger.py): cube rests in the arena,
    torque control reaches the floor, keypoint reward increases as the
    object keypoints approach the goal keypoints."""
    from handarm_tpu.envs.trifinger import make_trifinger, gen_keypoints, _lgsk

    env = make_trifinger(num_envs=4, episode_length=200)
    assert env.num_obs == 41 and env.num_actions == 9
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (4, 41)
    step = jax.jit(env.step)
    for _ in range(30):
        state, res = step(state, jnp.zeros((4, 9)))
    z = np.asarray(state.physics.objects.pos[:, 0, 2])
    np.testing.assert_allclose(z, 0.0325, atol=0.005)
    assert bool(jnp.all(jnp.isfinite(res.obs)))
    # reward monotonicity: moving the cube onto the goal raises reward
    on_goal = state._replace(
        physics=state.physics._replace(
            objects=state.physics.objects._replace(
                pos=state.goal_pos[:, None],
                quat=state.goal_quat[:, None],
            )
        )
    )
    _, r_on = step(on_goal, jnp.zeros((4, 9)))
    _, r_off = step(state, jnp.zeros((4, 9)))
    assert float(r_on.reward.mean()) > float(r_off.reward.mean())


def test_franka_cabinet_spaces_and_drawer_rail():
    """FrankaCabinet (reference tasks/franka_cabinet.py): 23 obs / 9 act;
    the drawer is rail-constrained (slides +x only, clamped to [0, 0.4],
    fixed orientation) and opening it raises the reward."""
    from handarm_tpu.envs.franka_cabinet import make_franka_cabinet

    env = make_franka_cabinet(num_envs=4, episode_length=200)
    assert env.num_obs == 23 and env.num_actions == 9
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (4, 23)
    step = jax.jit(env.step)
    for _ in range(30):
        state, res = step(state, jnp.zeros((4, 9)))
    # drawer stays closed and on the rail under no interaction
    p_drawer = np.asarray(state.physics.objects.pos[:, 0])
    np.testing.assert_allclose(
        p_drawer, np.tile(env.drawer_closed_pos, (4, 1)), atol=1e-3
    )
    q_drawer = np.asarray(state.physics.objects.quat[:, 0])
    np.testing.assert_allclose(q_drawer, np.tile([1.0, 0, 0, 0], (4, 1)), atol=1e-5)
    assert bool(jnp.all(jnp.isfinite(res.obs)))

    # shove the drawer outward: it slides along +x only and clamps at 0.4
    shoved = state._replace(
        physics=state.physics._replace(
            objects=state.physics.objects._replace(
                # gentle shove: damping (2/s) stops it well short of the
                # 0.39 open-success limit so no env auto-resets mid-test
                linvel=state.physics.objects.linvel.at[:, 0].set(
                    jnp.asarray([0.6, 0.3, 0.3])
                )
            )
        )
    )
    s2 = shoved
    for _ in range(60):
        s2, r2 = step(s2, jnp.zeros((4, 9)))
    p2 = np.asarray(s2.physics.objects.pos[:, 0])
    s_open = p2[:, 0] - env.drawer_closed_pos[0]
    assert (s_open > 0.05).all(), s_open  # it moved out
    assert (s_open <= 0.4 + 1e-4).all(), s_open  # clamped at the limit
    np.testing.assert_allclose(p2[:, 1:], np.tile(env.drawer_closed_pos[1:], (4, 1)), atol=1e-3)
    # open drawer scores higher than closed (open_reward dominates)
    _, r_open = step(shoved, jnp.zeros((4, 9)))
    _, r_closed = step(state, jnp.zeros((4, 9)))
    # compare after the shove has opened it
    _, r_open2 = step(s2, jnp.zeros((4, 9)))
    assert float(r_open2.reward.mean()) > float(r_closed.reward.mean())

"""AllegroKuka family (reference tasks/allegro_kuka/*): DexPBT reward
machinery, goal-only resets, regrasp cycle, tolerance curriculum."""

import numpy as np
import jax
import jax.numpy as jnp

from handarm_tpu.envs.allegro_kuka import make_allegro_kuka


def test_allegro_kuka_reorientation_spaces_and_rest():
    env = make_allegro_kuka(variant="reorientation", num_envs=6)
    assert env.num_obs == 117 and env.num_actions == 23
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (6, 117)
    step = jax.jit(env.step)
    for _ in range(30):
        state, res = step(state, jnp.zeros((6, 23)))
    # active objects rest on the table (top 0.53 + half extent)
    slot = np.asarray(env._active(6))
    opos = np.asarray(state.physics.objects.pos[np.arange(6), slot])
    half = np.asarray(env.obj_halves)[slot]
    assert (np.abs(opos[:, 2] - (0.53 + half[:, 2])) < 0.02).all(), opos[:, 2]
    assert bool(jnp.all(jnp.isfinite(res.obs)))


def test_allegro_kuka_success_resets_goal_and_rewards_bonus():
    """Moving the object's keypoints onto the goal must award the reach
    bonus and resample the goal (goal-only reset,
    allegro_kuka_base.py:861-876)."""
    env = make_allegro_kuka(variant="reorientation", num_envs=4)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    state, _ = step(state, jnp.zeros((4, 23)))
    # teleport object onto the goal (pose match => keypoints match),
    # mark as lifted so the keypoint machinery is active
    slot = env._active(4)
    idx = (jnp.arange(4), slot)
    on_goal = state._replace(
        physics=state.physics._replace(
            objects=state.physics.objects._replace(
                pos=state.physics.objects.pos.at[idx].set(state.goal_pos),
                quat=state.physics.objects.quat.at[idx].set(state.goal_quat),
                linvel=state.physics.objects.linvel * 0.0,
                angvel=state.physics.objects.angvel * 0.0,
            )
        ),
        lifted=jnp.ones(4, bool),
    )
    goal_before = np.asarray(on_goal.goal_pos)
    s2, res = step(on_goal, jnp.zeros((4, 23)))
    # gravity pulls the object a hair in one substep; keypoints stay within
    # the success tolerance => success bonus fires
    assert (np.asarray(res.reward) > 500.0).all(), res.reward
    assert (np.asarray(s2.successes) >= 1).all()
    # and the goal moved on (resampled)
    goal_after = np.asarray(s2.goal_pos)
    assert (np.linalg.norm(goal_after - goal_before, axis=-1) > 1e-4).all()


def test_allegro_kuka_regrasp_returns_object_to_table():
    """Regrasping: success teleports the object back to the start zone
    and clears the lifted flag (allegro_kuka_regrasping.py:77-100)."""
    env = make_allegro_kuka(variant="regrasping", num_envs=4)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    slot = env._active(4)
    idx = (jnp.arange(4), slot)
    on_goal = state._replace(
        physics=state.physics._replace(
            objects=state.physics.objects._replace(
                pos=state.physics.objects.pos.at[idx].set(state.goal_pos),
                linvel=state.physics.objects.linvel * 0.0,
                angvel=state.physics.objects.angvel * 0.0,
            )
        ),
        lifted=jnp.ones(4, bool),
    )
    s2, res = step(on_goal, jnp.zeros((4, 23)))
    opos = np.asarray(s2.physics.objects.pos[jnp.arange(4), slot])
    # back near the start zone on the table, not at the (aerial) goal
    assert (np.abs(opos[:, 2] - 0.63) < 0.1).all(), opos[:, 2]
    assert not bool(s2.lifted.any())


def test_allegro_kuka_two_arms_spaces_and_rest():
    """Two mirrored arms over one table (reference
    allegro_kuka_two_arms.py:598-625): 46 dofs, composite URDF, object
    rests on the shared table."""
    from handarm_tpu.envs.allegro_kuka import make_allegro_kuka_two_arms

    env = make_allegro_kuka_two_arms(num_envs=4)
    assert env.art.nv == 46 and env.num_actions == 46
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (4, env.num_obs)
    # the two arm bases face each other at x = +-1.1 (FK sanity)
    from handarm_tpu.physics.kinematics import forward_kinematics, site_poses
    m = env.scene.model
    bq = jnp.broadcast_to(env.scene.base_quat, (4, 4))
    bp = jnp.broadcast_to(env.scene.base_pos, (4, 3))
    fk = forward_kinematics(m, state.physics.robot.q, bq, bp)
    pos = {}
    for name in ("a0_iiwa7_link_0", "a1_iiwa7_link_0"):
        st = env.art.sites[name]
        _, sp = site_poses(
            fk, np.array([st.body]), jnp.asarray(st.pos)[None],
            jnp.asarray(st.quat)[None], base_quat=bq, base_pos=bp,
        )
        pos[name] = np.asarray(sp[0, 0])
    assert pos["a0_iiwa7_link_0"][0] < -1.0
    assert pos["a1_iiwa7_link_0"][0] > 1.0
    step = jax.jit(env.step)
    for _ in range(40):
        state, res = step(state, jnp.zeros((4, 46)))
    slot = np.asarray(env._active(4))
    opos = np.asarray(state.physics.objects.pos[np.arange(4), slot])
    half = np.asarray(env.obj_halves)[slot]
    assert (np.abs(opos[:, 2] - (0.53 + half[:, 2])) < 0.05).all(), opos[:, 2]
    assert bool(jnp.all(jnp.isfinite(res.obs)))

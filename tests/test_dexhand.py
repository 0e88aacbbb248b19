"""AllegroHand in-hand reorientation task (reference tasks/allegro_hand.py
+ cfg/task/AllegroHand.yaml)."""

import numpy as np
import jax
import jax.numpy as jnp

from handarm_tpu.envs.dexhand import DexHandConfig, AllegroHandEnv, make_allegro


def test_allegro_spaces_and_step():
    env = make_allegro(num_envs=8)
    assert env.num_actions == 16
    assert env.num_obs == 88  # full_state (allegro_hand.py:462-483)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (8, 88)
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(1)
    for i in range(20):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (8, 16), minval=-1, maxval=1)
        state, res = step(state, a)
    assert bool(jnp.all(jnp.isfinite(res.obs)))
    assert bool(jnp.all(jnp.isfinite(res.reward)))


def test_allegro_cube_rests_in_palm():
    """With zero actions the cube must stay near the palm for 2 s in most
    envs (the hand faces up and the reference spawns the cube on it)."""
    env = make_allegro(num_envs=8)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    hold = jnp.zeros((8, 16))
    falls = 0
    for i in range(60):  # 2 s at 30 Hz
        state, res = step(state, hold)
        falls += int(jnp.sum(res.done & (state.progress[0] * 0 == 0)))
    # some unlucky random-init envs may drop the cube; most must hold it
    opos = np.asarray(state.physics.objects.pos[:, 0])
    near = np.linalg.norm(opos - np.asarray(env.obj_start), axis=-1) < 0.15
    assert near.mean() >= 0.5, (near, opos)


def test_allegro_goal_resample_on_success():
    """Forcing the object quat onto the goal must trigger the success path:
    positive bonus reward and a goal resample."""
    env = make_allegro(num_envs=4)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(3))
    # surgically align object orientation with the goal
    obj = state.physics.objects._replace(
        quat=state.goal_quat[:, None],
    )
    state = state._replace(physics=state.physics._replace(objects=obj))
    state2, res = jax.jit(env.step)(state, jnp.zeros((4, 16)))
    assert float(res.reward.min()) > 100.0  # reach_goal_bonus = 250
    # goals were resampled away from the (pre-step) object orientation
    assert bool(jnp.any(jnp.abs(state2.goal_quat - state.goal_quat) > 1e-3))


def test_shadow_spaces_and_step():
    from handarm_tpu.envs.dexhand import make_shadow

    env = make_shadow(num_envs=4)
    assert env.num_actions == 20  # mjcf position actuators
    assert env.num_obs == 211  # full_state (shadow_hand.py:462-520)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (4, 211)
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(1)
    for _ in range(15):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (4, 20), minval=-1, maxval=1)
        state, res = step(state, a)
    assert bool(jnp.all(jnp.isfinite(res.obs)))
    assert bool(jnp.all(jnp.isfinite(res.reward)))


def test_shadow_cube_rests_in_palm():
    from handarm_tpu.envs.dexhand import make_shadow

    env = make_shadow(num_envs=8)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    hold = jnp.zeros((8, 20))
    for _ in range(120):  # 2 s at 60 Hz
        state, res = step(state, hold)
    opos = np.asarray(state.physics.objects.pos[:, 0])
    near = np.linalg.norm(opos - np.asarray(env.obj_start), axis=-1) < 0.15
    assert near.mean() >= 0.5, (near, opos)


def test_shadow_tendon_coupling():
    """Distal *FJ0 joints must track their J1 neighbour's target (mjcf
    fixed-tendon coupling approximation)."""
    from handarm_tpu.envs.dexhand import make_shadow

    env = make_shadow(num_envs=2)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(4))
    a = jnp.zeros((2, 20)).at[:, 4].set(1.0)  # FFJ1 actuator fully flexed
    t = env._targets_from_actions(a, state.targets)
    names = env.art.joint_names
    i0, i1 = names.index("robot0:FFJ0"), names.index("robot0:FFJ1")
    np.testing.assert_allclose(np.asarray(t[:, i0]), np.asarray(t[:, i1]))

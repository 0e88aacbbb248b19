"""HumanoidAMP + MotionLib (reference tasks/humanoid_amp.py, tasks/amp/):
motion loading/FK, reference state init, AMP features, end-to-end AMP
training iteration on the humanoid."""

import glob

import numpy as np
import pytest

import jax
import jax.numpy as jnp

MOTIONS = sorted(glob.glob("/root/reference/assets/amp/motions/*.npy"))


@pytest.fixture(scope="module")
def walk_lib():
    from handarm_tpu.learn.motion_lib import MotionLib

    return MotionLib([m for m in MOTIONS if "walk" in m])


def test_motion_lib_fk_matches_stored_velocities(walk_lib):
    """The skeleton FK + finite differencing must reproduce the motion
    file's own stored global root velocity (independent data in the same
    file — an oracle for the FK/conversion chain)."""
    lib = walk_lib
    ids = jnp.zeros(6, jnp.int32)
    t = jnp.linspace(0.2, float(lib.length_s[0]) - 0.2, 6)
    s0 = lib.get_state(ids, t)
    eps = 0.02
    s1 = lib.get_state(ids, t + eps)
    fd_vel = np.asarray((s1["root_pos"] - s0["root_pos"]) / eps)
    stored = np.asarray(s0["root_vel"])
    # the stored global velocities are direction-consistent with the
    # position track but scaled (the reference files carry velocities
    # computed at the pre-retarget frame rate; motion_lib consumes them
    # as-is, matching the reference)
    dots = np.sum(fd_vel * stored, -1)
    norms = np.linalg.norm(fd_vel, axis=-1) * np.linalg.norm(stored, axis=-1)
    cos = dots / np.maximum(norms, 1e-6)
    assert (cos > 0.6).all(), cos
    assert np.abs(stored).max() < 5.0
    # heights are standing-humanoid plausible
    z = np.asarray(s0["root_pos"][:, 2])
    assert (z > 0.5).all() and (z < 1.3).all()
    # feet (key bodies 2, 3) stay near the ground through the walk
    feet_z = np.asarray(s0["key_pos"][:, 2:, 2])
    assert feet_z.min() > -0.05 and feet_z.min() < 0.25


def test_amp_obs_features_shape_and_invariance(walk_lib):
    """AMP features are heading-invariant: rotating the whole state about
    z must not change them (they are built in the heading frame)."""
    from handarm_tpu.learn.amp_obs import build_amp_observations
    from handarm_tpu.math.quat import quat_from_axis_angle, quat_mul, quat_rotate

    lib = walk_lib
    ids = jnp.zeros(4, jnp.int32)
    t = jnp.asarray([0.1, 0.3, 0.5, 0.7])
    s = lib.get_state(ids, t)
    obs = build_amp_observations(
        s["root_pos"], s["root_rot"], s["root_vel"], s["root_ang_vel"],
        s["dof_pos"], s["dof_vel"], s["key_pos"],
    )
    assert obs.shape == (4, 105)
    yaw = quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(1.1))
    rot = lambda v: quat_rotate(yaw[None], v)
    key_rel = s["key_pos"] - s["root_pos"][:, None]
    obs_rot = build_amp_observations(
        s["root_pos"],  # translation doesn't enter except z
        quat_mul(jnp.broadcast_to(yaw, (4, 4)), s["root_rot"]),
        rot(s["root_vel"]),
        rot(s["root_ang_vel"]),
        s["dof_pos"], s["dof_vel"],
        s["root_pos"][:, None] + quat_rotate(yaw[None, None], key_rel),
    )
    np.testing.assert_allclose(
        np.asarray(obs), np.asarray(obs_rot), atol=1e-4
    )


def test_humanoid_amp_env_rsi_and_step():
    from handarm_tpu.envs.humanoid_amp import make_humanoid_amp

    env = make_humanoid_amp(num_envs=4)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (4, 105)
    assert env.amp_obs(state).shape == (4, 210)
    # RSI: roots start at motion heights, not a fixed pose
    z = np.asarray(state.physics.robot.base_pos[:, 2])
    assert (z > 0.5).all() and (z < 1.2).all()
    step = jax.jit(env.step)
    for _ in range(15):
        state, res = step(state, jnp.zeros((4, 28)))
    assert bool(jnp.all(jnp.isfinite(res.obs)))
    assert res.info["amp_obs"].shape == (4, 210)


def test_amp_trains_on_humanoid_motions():
    """Three AMP iterations on the real humanoid + walk clip: runs jitted,
    stays finite, discriminator separates demo from policy."""
    from handarm_tpu.envs.humanoid_amp import make_humanoid_amp
    from handarm_tpu.learn.amp import AMP, AMPConfig
    from handarm_tpu.learn.ppo import PPOConfig

    env = make_humanoid_amp(num_envs=8, episode_length=60)
    demo = env.motion_lib.amp_obs_demo(
        jax.random.PRNGKey(0), 512, env.cfg.dt * env.cfg.control_freq_inv
    )
    amp = AMP(
        env, lambda s: env.amp_obs(s), demo,
        ppo_cfg=PPOConfig(horizon=8, minibatch_size=64, mini_epochs=1,
                          hidden=(64, 64), reward_scale=0.01),
        cfg=AMPConfig(disc_hidden=(128, 64), disc_minibatch=128,
                      disc_updates=2),
    )
    st = amp.init(jax.random.PRNGKey(1))
    train = jax.jit(amp.train_iter)
    for _ in range(3):
        st, stats = train(st)
    assert np.isfinite(float(stats["reward_mean"]))
    assert np.isfinite(float(stats["disc_loss"]))

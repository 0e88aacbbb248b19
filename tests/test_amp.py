"""AMP machinery: discriminator separates demo from policy motion, style
rewards track discriminator belief, end-to-end AMP iteration runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handarm_tpu.envs.classic import make_cartpole
from handarm_tpu.learn.amp import AMP, AMPConfig
from handarm_tpu.learn.ppo import PPOConfig


@pytest.fixture(scope="module")
def amp_setup():
    env = make_cartpole(num_envs=32, episode_length=100)

    # amp features: [cart_pos, cart_vel, pole_angle, pole_vel]
    def amp_obs_fn(env_state):
        q, qd = env_state.q, env_state.qd
        return jnp.stack([q[:, 0], qd[:, 0], q[:, 1], qd[:, 1]], axis=-1)

    # "demo motion": a distinctive manifold (cart far right, pole tilted
    # at +0.5 rad, near-zero velocities) the random policy never visits
    rng = np.random.default_rng(0)
    demo = np.stack(
        [
            2.0 + 0.05 * rng.normal(size=2048),
            0.02 * rng.normal(size=2048),
            0.5 + 0.02 * rng.normal(size=2048),
            0.02 * rng.normal(size=2048),
        ],
        axis=-1,
    ).astype(np.float32)
    amp = AMP(
        env, amp_obs_fn, demo,
        ppo_cfg=PPOConfig(horizon=8, minibatch_size=128, mini_epochs=1,
                          hidden=(32, 32), reward_scale=1.0),
        cfg=AMPConfig(disc_hidden=(64, 64), disc_minibatch=256,
                      disc_lr=1e-3, disc_updates=4,
                      replay_capacity=4096, demo_capacity=4096),
    )
    return env, amp


def test_amp_iteration_and_discriminator_learns(amp_setup):
    env, amp = amp_setup
    st = amp.init(jax.random.PRNGKey(0))
    train = jax.jit(amp.train_iter)
    accs = []
    for _ in range(12):
        st, stats = train(st)
        accs.append(
            (float(stats["disc_acc_demo"]), float(stats["disc_acc_policy"]))
        )
        assert np.isfinite(float(stats["disc_loss"]))
    # discriminator learns to separate balanced demos from the random
    # policy's flailing motion
    d_acc, p_acc = accs[-1]
    assert d_acc > 0.9, accs
    assert p_acc > 0.9, accs


def test_style_reward_prefers_demo_like_states(amp_setup):
    env, amp = amp_setup
    st = amp.init(jax.random.PRNGKey(1))
    train = jax.jit(amp.train_iter)
    for _ in range(10):
        st, _ = train(st)
    demo_like = jnp.asarray(
        np.tile([2.0, 0.0, 0.5, 0.0], (16, 1)).astype(np.float32)
    )
    wild = jnp.asarray(
        np.random.default_rng(2).uniform(-1, 1, (16, 4)).astype(np.float32)
    )
    r_demo = float(amp.style_reward(st.disc_params, demo_like).mean())
    r_wild = float(amp.style_reward(st.disc_params, wild).mean())
    assert r_demo > r_wild, (r_demo, r_wild)

"""Asymmetric central-value wiring where the reference uses it: IndustReal
(47-dim privileged state + noisy actor goal) and ShadowHandOpenAI_* (42-dim
actor obs, 211-dim critic state); DeXtreme ADR runs the LSTM policy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handarm_tpu.envs.registry import make_env
from handarm_tpu.learn.ppo import PPO, PPOConfig


def test_industreal_teacher_obs_and_noisy_goal():
    env, ppo_cfg = make_env(
        "IndustRealTaskPegsInsert", ["num_envs=4", "episode_length=16"]
    )
    assert ppo_cfg["asymmetric_critic"] is True
    assert env.num_teacher_obs == 47  # numStates 47 (IndustRealTaskPegsInsert.yaml:14)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    o, t, _ = env.observe(state)
    assert o.shape == (4, 24) and t.shape == (4, 47)
    # the actor's goal (obs[14:17]) is the TRUE goal (teacher[27:30]) plus
    # the per-episode perception noise (teacher[44:47])
    np.testing.assert_allclose(
        np.asarray(o[:, 14:17]),
        np.asarray(t[:, 27:30] + t[:, 44:47]),
        atol=1e-6,
    )
    noise = np.asarray(state.socket_obs_noise)
    assert np.abs(noise[:, :2]).max() > 0  # xy noise actually sampled
    assert np.abs(noise[:, 2]).max() == 0  # z noise configured zero
    _, res = jax.jit(env.step)(state, jnp.zeros((4, 6)))
    assert res.teacher_obs.shape == (4, 47)
    assert np.all(np.isfinite(np.asarray(res.teacher_obs)))


def test_industreal_asym_ppo_iter():
    env, ppo_cfg = make_env(
        "IndustRealTaskPegsInsert", ["num_envs=4", "episode_length=16"]
    )
    cfg = PPOConfig(
        horizon=4, minibatch_size=16, mini_epochs=1, hidden=(32,),
        asymmetric_critic=True,
    )
    ppo = PPO(env, cfg)
    ts = ppo.init(jax.random.PRNGKey(0))
    ts2, stats = jax.jit(ppo.train_iter)(ts)
    assert np.isfinite(float(stats["kl"]))
    c0 = jax.tree.leaves(ts.params["critic"])
    c1 = jax.tree.leaves(ts2.params["critic"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(c0, c1)
    )


def test_shadow_openai_asymmetric_obs():
    env, ppo_cfg = make_env(
        "ShadowHandOpenAI_FF", ["num_envs=4", "episode_length=20"]
    )
    assert ppo_cfg["asymmetric_critic"] is True
    assert env.num_obs == 42 and env.num_teacher_obs == 211
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(1))
    assert obs.shape == (4, 42)
    o, t, _ = env.observe(state)
    assert t.shape == (4, 211)
    _, res = jax.jit(env.step)(state, jnp.zeros((4, 20)))
    assert res.obs.shape == (4, 42)
    assert res.teacher_obs.shape == (4, 211)
    assert np.all(np.isfinite(np.asarray(res.obs)))


def test_shadow_openai_lstm_registry_config():
    _, ppo_cfg = make_env(
        "ShadowHandOpenAI_LSTM", ["num_envs=4", "episode_length=20"]
    )
    assert ppo_cfg["rnn_units"] == 1024
    assert ppo_cfg["asymmetric_critic"] is True


def test_dextreme_adr_lstm_trains():
    env, ppo_cfg = make_env(
        "AllegroHandDextremeADR", ["num_envs=8", "episode_length=16"]
    )
    assert ppo_cfg["rnn_units"] > 0  # the reference policy is an LSTM
    cfg = PPOConfig(
        horizon=8, minibatch_size=32, mini_epochs=1, hidden=(32,),
        rnn_units=16, seq_len=4, zero_rnn_on_done=False,
    )
    ppo = PPO(env, cfg)
    ts = ppo.init(jax.random.PRNGKey(2))
    train = jax.jit(ppo.train_iter)
    for _ in range(2):
        ts, stats = train(ts)
    assert np.isfinite(float(stats["kl"]))
    assert np.isfinite(float(stats["reward_mean"]))

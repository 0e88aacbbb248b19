"""Recurrent (LSTM) PPO: rollout carry threading, stored-state BPTT over
seq_len chunks, and a memory-dependent toy task an MLP provably cannot
solve (reference rnn block: cfg/train/AllegroHandDextremeADRPPO.yaml;
hand-arm LSTM variant cfg/train/HandArmTaskMultiObjectManipulationPPO.yaml
seq_len: 4)."""

from types import SimpleNamespace
from typing import NamedTuple

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handarm_tpu.learn.ppo import PPO, PPOConfig


class _MemState(NamedTuple):
    cue: jnp.ndarray  # [B] +-1, shown only at t=0
    t: jnp.ndarray  # [B]
    key: jnp.ndarray


class _Res(NamedTuple):
    obs: jnp.ndarray
    teacher_obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict


class MemoryEnv:
    """Remember-the-cue: obs = [cue * (t == 0), t/T]. Reward at every step
    after the first is cue * tanh(action): positive iff the policy
    remembers which cue it saw at t=0. Episode length T; memoryless
    policies have zero achievable expected reward."""

    T = 8

    def __init__(self, num_envs: int):
        self.cfg = SimpleNamespace(num_envs=num_envs)
        self.num_obs = 2
        self.num_actions = 1
        self.num_teacher_obs = 0

    def _obs(self, s: _MemState):
        cue_vis = jnp.where(s.t == 0, s.cue, 0.0)
        return jnp.stack([cue_vis, s.t / self.T], axis=-1)

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        B = self.cfg.num_envs
        cue = jnp.sign(jax.random.uniform(k1, (B,)) - 0.5)
        s = _MemState(cue=cue, t=jnp.zeros((B,), jnp.int32), key=k2)
        return s, self._obs(s)

    def step(self, s: _MemState, actions):
        B = self.cfg.num_envs
        reward = jnp.where(
            s.t > 0, s.cue * jnp.tanh(actions[:, 0]), 0.0
        )
        t2 = s.t + 1
        done = t2 >= self.T
        key, k_cue = jax.random.split(s.key)
        new_cue = jnp.sign(jax.random.uniform(k_cue, (B,)) - 0.5)
        s2 = _MemState(
            cue=jnp.where(done, new_cue, s.cue),
            t=jnp.where(done, 0, t2),
            key=key,
        )
        return s2, _Res(
            obs=self._obs(s2),
            teacher_obs=jnp.zeros((B, 0)),
            reward=reward,
            done=done,
            info={},
        )


def _train(env, cfg, iters, seed=0):
    ppo = PPO(env, cfg)
    ts = ppo.init(jax.random.PRNGKey(seed))
    train = jax.jit(ppo.train_iter)
    last = None
    for _ in range(iters):
        ts, last = train(ts)
    return ppo, ts, last


def _mem_cfg(**kw):
    base = dict(
        horizon=16, minibatch_size=1024, mini_epochs=2, hidden=(32,),
        reward_scale=1.0, entropy_coef=0.001, learning_rate=1e-3,
        value_bootstrap=False,
    )
    base.update(kw)
    return PPOConfig(**base)


def test_lstm_solves_memory_task_mlp_cannot():
    env = MemoryEnv(num_envs=128)
    _, _, mlp_stats = _train(env, _mem_cfg(), iters=60)
    _, _, lstm_stats = _train(
        env, _mem_cfg(rnn_units=32, seq_len=8), iters=60
    )
    mlp_r = float(mlp_stats["reward_mean"])
    lstm_r = float(lstm_stats["reward_mean"])
    # max achievable per-step reward (averaged over the horizon incl. the
    # unrewarded first step) is 7/8 ~ 0.875; memoryless expectation is 0
    assert lstm_r > 0.4, (mlp_r, lstm_r)
    assert mlp_r < 0.2, (mlp_r, lstm_r)
    assert lstm_r > mlp_r + 0.3


def test_rnn_rollout_carry_resets_on_done():
    """The rollout zeroes the carry at episode boundaries: two consecutive
    train iterations keep all stats finite and the stored TrainState hidden
    matches the env batch."""
    env = MemoryEnv(num_envs=32)
    ppo, ts, stats = _train(
        env, _mem_cfg(rnn_units=16, seq_len=4, minibatch_size=256), iters=2
    )
    assert ppo.recurrent
    h, c = ts.hidden
    assert h.shape == (32, 16) and c.shape == (32, 16)
    for k in ("kl", "reward_mean", "value_loss"):
        assert np.isfinite(float(stats[k]))


def test_rnn_act_threads_hidden():
    env = MemoryEnv(num_envs=4)
    ppo = PPO(env, _mem_cfg(rnn_units=16, seq_len=4, minibatch_size=64))
    ts = ppo.init(jax.random.PRNGKey(0))
    obs = ts.last_obs
    a1, h1 = ppo.act(ts, obs)
    a2, h2 = ppo.act(ts, obs, hidden=h1)
    assert a1.shape == (4, 1)
    # hidden actually evolves and changes the action distribution input
    assert not np.allclose(np.asarray(h1[0]), np.asarray(h2[0]))


def test_rnn_asymmetric_critic_runs():
    """LSTM actor + separate LSTM central-value critic (reference
    central_value_config rnn block)."""
    from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv

    env = HandArmEnv(
        HandArmConfig(
            num_envs=8, episode_length=8,
            observations=("ur5_joint_pos", "dof_position_targets"),
            teacher_observations=(
                "ur5_joint_pos", "object_linvel", "dof_position_targets",
            ),
            actions=("ur5_relative_joint_pos",),
            solver_iterations=2,
        )
    )
    ppo = PPO(
        env,
        PPOConfig(
            horizon=8, minibatch_size=16, mini_epochs=1, hidden=(32,),
            rnn_units=16, critic_rnn_units=24, seq_len=4,
            asymmetric_critic=True,
        ),
    )
    ts = ppo.init(jax.random.PRNGKey(1))
    assert "actor" in ts.hidden and "critic" in ts.hidden
    assert ts.hidden["critic"][0].shape == (8, 24)
    ts2, stats = jax.jit(ppo.train_iter)(ts)
    assert np.isfinite(float(stats["kl"]))
    assert np.isfinite(float(stats["value_loss"]))
    c0 = jax.tree.leaves(ts.params["critic"])
    c1 = jax.tree.leaves(ts2.params["critic"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(c0, c1)
    )

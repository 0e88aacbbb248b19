"""Hierarchical RL: a high-level policy driving a frozen low-level policy.

TPU-native analog of the reference's HRLAgent (isaacgymenvs/learning/
hrl_continuous.py:56-156: a task policy emits latents at a reduced rate;
a pretrained low-level controller converts latent + proprioception into
joint actions). Here the low-level controller runs INSIDE the wrapped env's
jitted step — the high-level learner is just standard PPO over the wrapper,
so the whole hierarchy stays one XLA program.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class HRLWrapperState(NamedTuple):
    inner: object  # wrapped env state
    latent: jnp.ndarray  # [B, latent_dim] current high-level command
    steps_since_latent: jnp.ndarray  # [B]


class HRLEnv:
    """Wrap an env so the action space becomes a latent command consumed by
    a frozen low-level policy.

    low_level(latent, obs) -> inner action, typically a trained policy's
    act() with the latent concatenated to (part of) the observation.
    `latent_steps` = how many inner control steps each latent persists
    (reference steps_num / llc_steps)."""

    def __init__(
        self,
        env,
        low_level: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        latent_dim: int,
        latent_steps: int = 5,
    ):
        self.env = env
        self.low_level = low_level
        self.latent_dim = latent_dim
        self.latent_steps = latent_steps
        self.num_obs = env.num_obs
        self.num_teacher_obs = getattr(env, "num_teacher_obs", 0)
        self.num_actions = latent_dim
        self.cfg = env.cfg

    def reset(self, key):
        inner, obs = self.env.reset(key)
        B = obs.shape[0]
        state = HRLWrapperState(
            inner=inner,
            latent=jnp.zeros((B, self.latent_dim), obs.dtype),
            steps_since_latent=jnp.zeros(B, jnp.int32),
        )
        return state, obs

    def step(self, state: HRLWrapperState, latent_action):
        """One high-level step = `latent_steps` low-level env steps under a
        fixed latent; rewards accumulate (undiscounted within the macro
        step, like the reference's llc loop)."""
        latent = jnp.clip(latent_action, -1.0, 1.0)

        def inner_step(carry, _):
            inner, obs, total_r, done_any = carry
            a = self.low_level(latent, obs)
            inner, res = self.env.step(inner, a)
            return (
                inner, res.obs, total_r + res.reward, done_any | res.done
            ), res

        B = latent.shape[0]
        _, obs0 = self._peek_obs(state.inner)
        (inner, obs, total_r, done), reses = jax.lax.scan(
            inner_step,
            (state.inner, obs0, jnp.zeros(B), jnp.zeros(B, bool)),
            None,
            length=self.latent_steps,
        )
        last = jax.tree.map(lambda x: x[-1], reses)
        new_state = HRLWrapperState(
            inner=inner,
            latent=latent,
            steps_since_latent=jnp.zeros(B, jnp.int32),
        )
        return new_state, last._replace(reward=total_r, done=done)

    def _peek_obs(self, inner):
        if hasattr(self.env, "observe"):
            obs, _, _ = self.env.observe(inner)
            return inner, obs
        # classic envs: obs is a pure function of (q, qd)
        return inner, self.env.obs_fn(inner.q, inner.qd)


def make_low_level_from_ppo(ppo, ts, latent_slice: tuple[int, int]):
    """Adapter: a trained PPO policy whose observation vector contains a
    goal/command block at `latent_slice` becomes an HRL low-level
    controller — the latent overwrites that block (the reference drives its
    pretrained AMP controller the same way)."""
    s, e = latent_slice

    def low_level(latent, obs):
        obs = obs.at[:, s:e].set(latent[:, : e - s])
        return ppo.act(ts, obs, deterministic=True)

    return low_level

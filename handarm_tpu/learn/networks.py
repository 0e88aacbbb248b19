"""Policy/value networks (flax linen).

Mirrors the reference's rl_games actor_critic network surface
(cfg/train/HandArmTaskMultiObjectManipulationPPO.yaml: shared MLP 768-512-256
elu, fixed state-independent log-std, value head) — but TPU-native: bf16
matmuls ride the MXU, params stay f32.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ValueNet(nn.Module):
    """Standalone critic for asymmetric actor-critic (central value on
    privileged observations, reference rl_games central_value_config)."""

    hidden: Sequence[int] = (768, 512, 256)
    activation: str = "elu"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        act = getattr(nn, self.activation)
        x = obs.astype(self.compute_dtype)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, name=f"dense_{i}", dtype=self.compute_dtype)(x)
            x = act(x)
        v = nn.Dense(1, name="value", dtype=self.compute_dtype)(x)
        return v[..., 0].astype(jnp.float32)


class ActorCritic(nn.Module):
    num_actions: int
    hidden: Sequence[int] = (768, 512, 256)
    activation: str = "elu"
    separate: bool = False
    sigma_init: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        act = getattr(nn, self.activation)
        x = obs.astype(self.compute_dtype)

        def trunk(x, prefix):
            for i, h in enumerate(self.hidden):
                x = nn.Dense(h, name=f"{prefix}dense_{i}", dtype=self.compute_dtype)(x)
                x = act(x)
            return x

        if self.separate:
            xa = trunk(x, "actor_")
            xc = trunk(x, "critic_")
        else:
            xa = xc = trunk(x, "")
        mu = nn.Dense(self.num_actions, name="mu", dtype=self.compute_dtype)(xa)
        value = nn.Dense(1, name="value", dtype=self.compute_dtype)(xc)
        log_std = self.param(
            "log_std",
            lambda key, shape: jnp.full(shape, self.sigma_init, jnp.float32),
            (self.num_actions,),
        )
        return (
            mu.astype(jnp.float32),
            jnp.broadcast_to(log_std, mu.shape).astype(jnp.float32),
            value[..., 0].astype(jnp.float32),
        )

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


class RecurrentActorCritic(nn.Module):
    """LSTM-before-MLP actor-critic (reference rl_games rnn block:
    cfg/train/AllegroHandDextremeADRPPO.yaml rnn {name: lstm, units: 1024,
    layers: 1, before_mlp: True, layer_norm: True}; hand-arm PPO has an
    LSTM variant with seq_len 4,
    cfg/train/HandArmTaskMultiObjectManipulationPPO.yaml:69).

    carry is the flax LSTM carry (c, h), each [B, rnn_units]; callers zero
    it on episode reset. Memory is load-bearing for DR robustness: under
    randomized dynamics the belief over the true parameters lives in the
    hidden state."""

    num_actions: int
    rnn_units: int = 1024
    hidden: Sequence[int] = (512, 512)
    activation: str = "elu"
    layer_norm: bool = True
    sigma_init: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs, carry):
        act = getattr(nn, self.activation)
        x = obs.astype(self.compute_dtype)
        cell = nn.OptimizedLSTMCell(self.rnn_units, name="lstm")
        carry, x = cell(carry, x)
        if self.layer_norm:
            x = nn.LayerNorm(name="rnn_ln")(x)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, name=f"dense_{i}", dtype=self.compute_dtype)(x)
            x = act(x)
        mu = nn.Dense(self.num_actions, name="mu", dtype=self.compute_dtype)(x)
        value = nn.Dense(1, name="value", dtype=self.compute_dtype)(x)
        log_std = self.param(
            "log_std",
            lambda key, shape: jnp.full(shape, self.sigma_init, jnp.float32),
            (self.num_actions,),
        )
        return (
            mu.astype(jnp.float32),
            jnp.broadcast_to(log_std, mu.shape).astype(jnp.float32),
            value[..., 0].astype(jnp.float32),
            carry,
        )

    def init_carry(self, batch: int):
        z = jnp.zeros((batch, self.rnn_units), jnp.float32)
        return (z, z)


class RecurrentValueNet(nn.Module):
    """Recurrent central-value critic (reference central_value_config rnn
    block, AllegroHandDextremeADRPPO.yaml: lstm 2048 + mlp [1024, 512])."""

    rnn_units: int = 1024
    hidden: Sequence[int] = (512, 512)
    activation: str = "elu"
    layer_norm: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs, carry):
        act = getattr(nn, self.activation)
        x = obs.astype(self.compute_dtype)
        cell = nn.OptimizedLSTMCell(self.rnn_units, name="lstm")
        carry, x = cell(carry, x)
        if self.layer_norm:
            x = nn.LayerNorm(name="rnn_ln")(x)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, name=f"dense_{i}", dtype=self.compute_dtype)(x)
            x = act(x)
        v = nn.Dense(1, name="value", dtype=self.compute_dtype)(x)
        return v[..., 0].astype(jnp.float32), carry

    def init_carry(self, batch: int):
        z = jnp.zeros((batch, self.rnn_units), jnp.float32)
        return (z, z)


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

"""Random Network Adversary (DeXtreme; reference utils/rna_util.py:37-139).

A fixed random MLP perturbs policy actions; per-env dropout masks stand in
for "a different random network per env" (the reference's own trick for
GPU batching — rna_util.py docstring). Outputs are BINNED per action
channel and argmax-decoded to [-1, 1] (OpenAI et al. 2019 B.3: continuous
tanh adversaries collapse to ~0). Weights are fixed at init; dropout masks
resample per env on episode reset (refresh_nets analog).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RNAParams(NamedTuple):
    w1: jnp.ndarray  # [in, H]
    b1: jnp.ndarray  # [H]
    w2: jnp.ndarray  # [H, H]
    b2: jnp.ndarray  # [H]
    w3: jnp.ndarray  # [H, out * bins]
    num_actions: int
    bins: int


class RNAState(NamedTuple):
    mask1: jnp.ndarray  # [B, H] per-env dropout masks
    mask2: jnp.ndarray  # [B, H]


def rna_init(key, obs_dim: int, num_actions: int, hidden: int = 256,
             bins: int = 32) -> RNAParams:
    k1, k2, k3 = jax.random.split(key, 3)
    scale = lambda fan: 1.0 / jnp.sqrt(fan)
    return RNAParams(
        w1=jax.random.normal(k1, (obs_dim, hidden)) * scale(obs_dim),
        b1=jnp.zeros(hidden),
        w2=jax.random.normal(k2, (hidden, hidden)) * scale(hidden),
        b2=jnp.zeros(hidden),
        w3=jax.random.normal(k3, (hidden, num_actions * bins)) * scale(hidden),
        num_actions=num_actions,
        bins=bins,
    )


def rna_masks(key, B: int, params: RNAParams, keep: float = 0.5) -> RNAState:
    """Fresh per-env dropout masks (resample on env reset)."""
    H = params.b1.shape[0]
    k1, k2 = jax.random.split(key)
    m1 = jax.random.bernoulli(k1, keep, (B, H)).astype(jnp.float32) / keep
    m2 = jax.random.bernoulli(k2, keep, (B, H)).astype(jnp.float32) / keep
    return RNAState(mask1=m1, mask2=m2)


def rna_apply(params: RNAParams, state: RNAState, obs: jnp.ndarray):
    """[B, obs] -> adversarial actions [B, num_actions] in [-1, 1]."""
    x = jax.nn.relu((obs @ params.w1 + params.b1) * state.mask1)
    x = jax.nn.relu((x @ params.w2 + params.b2) * state.mask2)
    logits = (x @ params.w3).reshape(
        obs.shape[0], params.num_actions, params.bins
    )
    idx = jnp.argmax(logits, axis=-1).astype(jnp.float32)
    return 2.0 * idx / (params.bins - 1) - 1.0

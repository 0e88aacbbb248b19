"""Welford-style running mean/std normalization as a pure pytree.

Replaces rl_games' RunningMeanStd torch module (used by normalize_input /
normalize_value in the reference train configs). Update and apply are pure
functions; under pjit the batch statistics reduce over the sharded env axis
automatically.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RunningStats(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray  # scalar


def init_stats(shape) -> RunningStats:
    return RunningStats(
        mean=jnp.zeros(shape), var=jnp.ones(shape), count=jnp.asarray(1e-4)
    )


def update_stats(stats: RunningStats, batch: jnp.ndarray) -> RunningStats:
    """batch: [N, ...shape] (leading axes are flattened).

    Non-finite samples are replaced by the current mean (zero update): one
    exploded env must not poison the running statistics forever. Finite
    outliers are winsorized to mean +- 10 sigma once the stats have seen a
    few batches — a physics blowup emitting 1e12-scale (finite) values
    would otherwise inflate the running variance so every normal obs
    normalizes to ~0 and the policy KL explodes in one update."""
    x = batch.reshape((-1,) + stats.mean.shape)
    x = jnp.where(jnp.isfinite(x), x, stats.mean)
    sigma = jnp.sqrt(stats.var + 1e-2)
    lo, hi = stats.mean - 10.0 * sigma, stats.mean + 10.0 * sigma
    x = jnp.where(stats.count > 2.0 * x.shape[0], jnp.clip(x, lo, hi), x)
    n = x.shape[0]
    b_mean = jnp.mean(x, axis=0)
    b_var = jnp.var(x, axis=0)
    delta = b_mean - stats.mean
    tot = stats.count + n
    new_mean = stats.mean + delta * n / tot
    m_a = stats.var * stats.count
    m_b = b_var * n
    m2 = m_a + m_b + delta**2 * stats.count * n / tot
    return RunningStats(mean=new_mean, var=m2 / tot, count=tot)


def normalize(stats: RunningStats, x: jnp.ndarray, clip: float = 5.0) -> jnp.ndarray:
    return jnp.clip(
        (x - stats.mean) / jnp.sqrt(stats.var + 1e-5), -clip, clip
    )


def denormalize(stats: RunningStats, x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.sqrt(stats.var + 1e-5) + stats.mean

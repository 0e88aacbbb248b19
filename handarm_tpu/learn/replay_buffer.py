"""Uniform replay ring buffer as a pure pytree (reference learning/
replay_buffer.py:32-112 — a torch tensor ring buffer used by the AMP demo
store). Functional: `add` returns a new buffer state; `sample` gathers a
uniform batch. Works under jit and shards over leading storage dims."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class ReplayBuffer(NamedTuple):
    storage: Any  # pytree with leaves [capacity, ...]
    size: jnp.ndarray  # scalar int32 (elements currently valid)
    head: jnp.ndarray  # scalar int32 (next write position)

    @property
    def capacity(self) -> int:
        return jax.tree.leaves(self.storage)[0].shape[0]


def create(example: Any, capacity: int) -> ReplayBuffer:
    """example: pytree with leaves [batch?, ...] — only trailing shapes and
    dtypes are used."""
    storage = jax.tree.map(
        lambda x: jnp.zeros((capacity,) + x.shape[1:], x.dtype), example
    )
    return ReplayBuffer(
        storage=storage, size=jnp.zeros((), jnp.int32), head=jnp.zeros((), jnp.int32)
    )


def add(buf: ReplayBuffer, batch: Any) -> ReplayBuffer:
    """Insert a [N, ...] pytree batch at the ring head (wrapping)."""
    n = jax.tree.leaves(batch)[0].shape[0]
    cap = buf.capacity
    idx = (buf.head + jnp.arange(n)) % cap

    storage = jax.tree.map(
        lambda s, b: s.at[idx].set(b), buf.storage, batch
    )
    return ReplayBuffer(
        storage=storage,
        size=jnp.minimum(buf.size + n, cap),
        head=(buf.head + n) % cap,
    )


def sample(buf: ReplayBuffer, key, n: int) -> Any:
    """Uniform sample of n elements from the valid region."""
    idx = jax.random.randint(key, (n,), 0, jnp.maximum(buf.size, 1))
    return jax.tree.map(lambda s: s[idx], buf.storage)

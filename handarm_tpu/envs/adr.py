"""Adaptive Domain Randomization (DeXtreme / OpenAI ADR, Algorithm 1).

TPU-native re-design of the reference's ADRVecTask
(isaacgymenvs/tasks/dextreme/adr_vec_task.py:57-102, 666-918): instead of
python deques + masked torch scatter on the host, the whole ADR state is a
small pytree updated inside the jitted env step:

- every env is a WORKER: rollout workers sample each parameter uniformly
  in the current [lo, hi] range; boundary workers pin ONE parameter at one
  of its range bounds (mode = 2*p + side) and measure the objective there.
- finished boundary episodes scatter-add their objective into per-(param,
  side) accumulation queues (one-hot einsum, no host syncs).
- when a queue reaches `queue_len` samples, its boundary moves: mean
  objective above `objective_hi` pushes the bound OUTWARD (the policy is
  comfortable — widen the randomization), below `objective_lo` pulls it
  back IN (reference modify_adr_param 'up'/'down'); the queue then clears.
- finished envs are recycled into rollout/boundary roles with fresh
  parameter samples (reference recycle_envs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class AdrConfig:
    enabled: bool = False
    # canonical per-env physical parameters (fixed order):
    #   mass_scale, friction_scale, gain_scale (multipliers, init 1.0) and
    #   gravity_z (additive m/s^2, init 0.0)
    names: tuple = ("mass_scale", "friction_scale", "gain_scale", "gravity_z")
    init_lo: tuple = (1.0, 1.0, 1.0, 0.0)
    init_hi: tuple = (1.0, 1.0, 1.0, 0.0)
    limit_lo: tuple = (0.3, 0.3, 0.6, -2.0)
    limit_hi: tuple = (3.0, 3.0, 1.6, 2.0)
    delta: tuple = (0.05, 0.05, 0.04, 0.1)
    boundary_fraction: float = 0.4  # worker_adr_boundary_fraction
    queue_len: int = 256  # adr_queue_threshold_length
    objective_lo: float = 0.05  # pull the bound back in below this
    objective_hi: float = 0.5  # push the bound outward above this

    @property
    def P(self) -> int:
        return len(self.names)


class AdrState(NamedTuple):
    lo: jnp.ndarray  # [P] current range lower bounds
    hi: jnp.ndarray  # [P]
    worker_mode: jnp.ndarray  # [B] int32: -1 rollout, else 2p+side
    values: jnp.ndarray  # [B, P] per-env parameter values in play
    q_sum: jnp.ndarray  # [2P] objective accumulators per (param, side)
    q_cnt: jnp.ndarray  # [2P]


def _sample_values(cfg: AdrConfig, lo, hi, mode, key, B):
    """values[b, p] ~ U(lo_p, hi_p), except env b's own boundary param
    which pins to the evaluated bound."""
    P = cfg.P
    u = jax.random.uniform(key, (B, P))
    vals = lo[None] + u * (hi - lo)[None]
    p_idx = jnp.clip(mode // 2, 0, P - 1)
    side = mode % 2
    pinned = jnp.where(side == 0, lo[p_idx], hi[p_idx])  # [B]
    onehot = jax.nn.one_hot(p_idx, P) * (mode >= 0)[:, None]
    return vals * (1.0 - onehot) + onehot * pinned[:, None]


def _assign_modes(cfg: AdrConfig, key, B):
    k1, k2 = jax.random.split(key)
    is_boundary = jax.random.uniform(k1, (B,)) < cfg.boundary_fraction
    mode = jax.random.randint(k2, (B,), 0, 2 * cfg.P)
    return jnp.where(is_boundary, mode, -1).astype(jnp.int32)


def init_adr_state(cfg: AdrConfig, key, B) -> AdrState:
    k1, k2 = jax.random.split(key)
    lo = jnp.asarray(cfg.init_lo, jnp.float32)
    hi = jnp.asarray(cfg.init_hi, jnp.float32)
    mode = _assign_modes(cfg, k1, B)
    return AdrState(
        lo=lo,
        hi=hi,
        worker_mode=mode,
        values=_sample_values(cfg, lo, hi, mode, k2, B),
        q_sum=jnp.zeros(2 * cfg.P),
        q_cnt=jnp.zeros(2 * cfg.P),
    )


def adr_step(cfg: AdrConfig, s: AdrState, done, objective, key) -> AdrState:
    """One per-env-step ADR transition: queue finished boundary episodes,
    move ranges whose queues are full, recycle finished envs."""
    B = done.shape[0]
    P = cfg.P
    # 1. scatter finished boundary objectives into the queues
    is_boundary = s.worker_mode >= 0
    contrib = (done & is_boundary).astype(jnp.float32)
    onehot = jax.nn.one_hot(jnp.clip(s.worker_mode, 0, 2 * P - 1), 2 * P)
    q_sum = s.q_sum + jnp.einsum("b,bq->q", contrib * objective, onehot)
    q_cnt = s.q_cnt + jnp.einsum("b,bq->q", contrib, onehot)

    # 2. range update where a queue is full
    ready = q_cnt >= cfg.queue_len
    mean = q_sum / jnp.maximum(q_cnt, 1.0)
    expand = ready & (mean > cfg.objective_hi)
    shrink = ready & (mean < cfg.objective_lo)
    delta = jnp.asarray(cfg.delta, jnp.float32)
    ex, sh = expand.reshape(P, 2), shrink.reshape(P, 2)
    # low side (even mode): expand -> lo moves DOWN, shrink -> lo moves UP
    lo = s.lo - delta * ex[:, 0] + delta * sh[:, 0]
    hi = s.hi + delta * ex[:, 1] - delta * sh[:, 1]
    lo = jnp.clip(lo, jnp.asarray(cfg.limit_lo), jnp.asarray(cfg.init_lo))
    hi = jnp.clip(hi, jnp.asarray(cfg.init_hi), jnp.asarray(cfg.limit_hi))
    consumed = ready & (expand | shrink)
    q_sum = jnp.where(consumed, 0.0, q_sum)
    q_cnt = jnp.where(consumed, 0.0, q_cnt)

    # 3. recycle finished envs with fresh roles + samples
    k_mode, k_vals = jax.random.split(key)
    new_mode = _assign_modes(cfg, k_mode, B)
    mode = jnp.where(done, new_mode, s.worker_mode)
    fresh_vals = _sample_values(cfg, lo, hi, mode, k_vals, B)
    values = jnp.where(done[:, None], fresh_vals, s.values)
    return AdrState(
        lo=lo, hi=hi, worker_mode=mode, values=values,
        q_sum=q_sum, q_cnt=q_cnt,
    )


def adr_entropy(s: AdrState) -> jnp.ndarray:
    """Sum of log range widths — the ADR 'nats' progress metric
    (reference adr_update total_nats)."""
    return jnp.sum(jnp.log(jnp.maximum(s.hi - s.lo, 1e-6)))

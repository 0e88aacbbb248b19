"""Domain randomization as pure per-env functions of RNG keys.

TPU-native replacement for the reference's DR engine (isaacgymenvs/tasks/
base/vec_task.py:646-876 apply_randomizations + utils/dr_utils.py): instead
of python loops over actors mutating PhysX properties, every randomized
quantity is a per-env tensor sampled at reset and consumed inside the jitted
step. This removes the reference's biggest perf wart (per-env property
loops) and makes DR exactly reproducible per env key.

Supported (the reference's operative set for hand_arm + shadow-hand style
tasks):
- observation noise (additive/scaling, gaussian/uniform, correlated noise
  resampled per reset + uncorrelated per step — dr_utils.py:71-133)
- action noise (same families)
- object mass / friction scaling (per env x object)
- PD gain scaling (per env x dof)
- gravity perturbation (per env)
- object disturbance impulses (hand_arm randomization_params)
- scheduling: linear ramp of randomization strength by total env steps
  (dr_utils schedule 'linear'/'constant')
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class NoiseSpec:
    """One noise channel. op: 'additive' | 'scaling';
    dist: 'gaussian' | 'uniform'."""

    dist: str = "gaussian"
    op: str = "additive"
    amount: float = 0.0  # std (gaussian) or half-range (uniform)
    correlated: float = 0.0  # per-episode-frozen component


@dataclass(frozen=True)
class DRConfig:
    enabled: bool = False
    observation_noise: NoiseSpec = field(default_factory=NoiseSpec)
    action_noise: NoiseSpec = field(default_factory=NoiseSpec)
    mass_scale_range: tuple = (1.0, 1.0)  # uniform multiplier per env x obj
    friction_scale_range: tuple = (1.0, 1.0)
    gain_scale_range: tuple = (1.0, 1.0)  # PD gain multiplier per env
    gravity_noise: float = 0.0  # additive m/s^2 per env (z)
    disturbance_probability: float = 0.0
    disturbance_magnitude: float = 0.0
    # linear schedule: strength ramps 0 -> 1 over this many env steps
    # (0 = always full strength), reference dr_utils.py:95-116
    schedule_steps: int = 0


class DRState(NamedTuple):
    """Per-env frozen randomizations, resampled on reset."""

    mass_scale: jnp.ndarray  # [B, K]
    friction_scale: jnp.ndarray  # [B]
    gain_scale: jnp.ndarray  # [B, nv]
    gravity_z: jnp.ndarray  # [B]
    obs_corr: jnp.ndarray  # [B, obs_dim] correlated obs noise draw
    act_corr: jnp.ndarray  # [B, act_dim]


def init_dr_state(cfg: DRConfig, key, B, K, nv, obs_dim, act_dim) -> DRState:
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    lo, hi = cfg.mass_scale_range
    mass = jax.random.uniform(k1, (B, K), minval=lo, maxval=hi)
    lo, hi = cfg.friction_scale_range
    fric = jax.random.uniform(k2, (B,), minval=lo, maxval=hi)
    lo, hi = cfg.gain_scale_range
    gain = jax.random.uniform(k3, (B, nv), minval=lo, maxval=hi)
    grav = cfg.gravity_noise * jax.random.normal(k4, (B,))
    obs_corr = _draw(cfg.observation_noise, k5, (B, obs_dim), corr=True)
    act_corr = _draw(cfg.action_noise, k6, (B, act_dim), corr=True)
    return DRState(
        mass_scale=mass, friction_scale=fric, gain_scale=gain,
        gravity_z=grav, obs_corr=obs_corr, act_corr=act_corr,
    )


def _draw(spec: NoiseSpec, key, shape, corr: bool = False):
    amt = spec.correlated if corr else spec.amount
    if spec.dist == "gaussian":
        x = amt * jax.random.normal(key, shape)
    else:
        x = jax.random.uniform(key, shape, minval=-amt, maxval=amt)
    if spec.op == "scaling":
        x = 1.0 + x
    return x


def schedule_strength(cfg: DRConfig, total_steps) -> jnp.ndarray:
    if cfg.schedule_steps <= 0:
        return jnp.asarray(1.0)
    return jnp.clip(total_steps / cfg.schedule_steps, 0.0, 1.0)


def apply_noise(spec: NoiseSpec, key, x, corr_draw, strength=1.0):
    """Apply uncorrelated-per-call + correlated-per-episode noise to x."""
    if spec.amount == 0.0 and spec.correlated == 0.0:
        return x
    un = _draw(spec, key, x.shape)
    if spec.op == "scaling":
        return x * (1.0 + strength * (un - 1.0)) * (
            1.0 + strength * (corr_draw - 1.0)
        )
    return x + strength * (un + corr_draw)


def merge_on_reset(done, fresh: DRState, old: DRState) -> DRState:
    def w(new, prev):
        d = done.reshape(done.shape + (1,) * (new.ndim - 1))
        return jnp.where(d, new, prev)

    return DRState(*[w(n, o) for n, o in zip(fresh, old)])

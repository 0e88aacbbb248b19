"""Classic (contact-free) task suite: lightweight fixed-base articulation
envs with effort or PD actuation and task-specific reward/reset functions.

Covers the upstream IsaacGymEnvs-style simple tasks (SURVEY.md §2.5) —
first member: Cartpole (reference isaacgymenvs/tasks/cartpole.py: effort
drive on the slider, obs [cart_pos, cart_vel, pole_angle, pole_vel],
balance reward, tilt/track-limit termination). Contact-free tasks skip the
entire contact pipeline — the step is FK + dynamics + integration, so
throughput is bounded only by the dense linalg.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.physics.dynamics import (
    compute_dyn,
    stable_pd_torque,
)
from handarm_tpu.physics.kinematics import forward_kinematics, model_arrays
from handarm_tpu.physics.model import compile_urdf


@dataclass(frozen=True)
class ClassicConfig:
    urdf: str = "/root/reference/assets/urdf/cartpole.urdf"
    num_envs: int = 512
    episode_length: int = 500
    dt: float = 1.0 / 60.0
    substeps: int = 2
    control_freq_inv: int = 1
    actuation: str = "effort"  # effort | position
    effort_scale: tuple | float = 400.0  # action -> torque scaling
    actuated_dofs: tuple = (0,)  # which dofs receive actions
    kp: float = 0.0
    kd: float = 0.0
    reset_noise: float = 0.1  # uniform initial q/qd noise half-range
    gravity: tuple = (0.0, 0.0, -9.81)


class ClassicState(NamedTuple):
    q: jnp.ndarray
    qd: jnp.ndarray
    progress: jnp.ndarray
    key: jnp.ndarray


class ClassicStepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict
    teacher_obs: jnp.ndarray = None
    obs_dict: dict = {}


class ClassicEnv:
    """Contact-free articulation env parameterized by obs/reward fns.

    obs_fn(q, qd) -> [B, obs]; reward_fn(q, qd, progress, cfg) ->
    (reward [B], terminated [B])."""

    def __init__(
        self,
        cfg: ClassicConfig,
        obs_fn: Callable,
        reward_fn: Callable,
        num_obs: int,
    ):
        self.cfg = cfg
        self.art = compile_urdf(cfg.urdf, default_armature=0.0)
        self.m = model_arrays(self.art)
        self.obs_fn = obs_fn
        self.reward_fn = reward_fn
        self.num_obs = num_obs
        self.num_actions = len(cfg.actuated_dofs)
        self.num_teacher_obs = 0
        self.gravity = jnp.asarray(cfg.gravity, jnp.float32)
        es = cfg.effort_scale
        scale = np.zeros(self.art.nv)
        es_arr = np.broadcast_to(np.asarray(es, dtype=np.float64), (self.num_actions,))
        for i, d in enumerate(cfg.actuated_dofs):
            scale[d] = es_arr[i]
        self.effort_map = jnp.asarray(scale, jnp.float32)
        self.kp = jnp.full(self.art.nv, cfg.kp, jnp.float32)
        self.kd = jnp.full(self.art.nv, cfg.kd, jnp.float32)

    def _fresh(self, key, B):
        k1, k2, k3 = jax.random.split(key, 3)
        n = self.cfg.reset_noise
        q = jax.random.uniform(k1, (B, self.art.nv), minval=-n, maxval=n)
        qd = jax.random.uniform(k2, (B, self.art.nv), minval=-n, maxval=n)
        return ClassicState(
            q=q, qd=qd, progress=jnp.zeros(B, jnp.int32), key=k3
        )

    def reset(self, key):
        state = self._fresh(key, self.cfg.num_envs)
        return state, self.obs_fn(state.q, state.qd)

    def step(self, state: ClassicState, actions):
        cfg = self.cfg
        B = actions.shape[0]
        actions = jnp.clip(actions, -1.0, 1.0)
        key, k_reset = jax.random.split(state.key)
        h = cfg.dt / cfg.substeps

        tau_ext = jnp.zeros((B, self.art.nv))
        for i, d in enumerate(cfg.actuated_dofs):
            tau_ext = tau_ext.at[:, d].set(actions[:, i] * self.effort_map[d])

        def sub(carry, _):
            q, qd = carry
            fk = forward_kinematics(self.m, q)
            dyn = compute_dyn(self.m, fk, qd, self.gravity, self.kp, self.kd, h)
            tau = tau_ext
            if cfg.actuation == "position":
                tau = tau + stable_pd_torque(
                    q, qd, tau_ext / jnp.maximum(self.effort_map, 1e-9),
                    self.kp, self.kd, h, self.m.effort_limit,
                )
            qdd = dyn.solve(tau - dyn.bias)
            qd = qd + h * qdd
            q = q + h * qd
            # joint limits
            q = jnp.clip(q, self.m.q_min, self.m.q_max)
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(
            sub, (state.q, state.qd), None,
            length=cfg.substeps * cfg.control_freq_inv,
        )
        progress = state.progress + 1
        reward, terminated = self.reward_fn(q, qd, progress, cfg)
        done = terminated | (progress >= cfg.episode_length)

        fresh = self._fresh(k_reset, B)
        d = done[:, None]
        q = jnp.where(d, fresh.q, q)
        qd = jnp.where(d, fresh.qd, qd)
        progress = jnp.where(done, 0, progress)
        new_state = ClassicState(q=q, qd=qd, progress=progress, key=key)
        obs = self.obs_fn(q, qd)
        return new_state, ClassicStepResult(
            obs=obs, reward=reward, done=done, info={},
            teacher_obs=jnp.zeros((B, 0), obs.dtype),
        )


# --- Cartpole ---------------------------------------------------------------


def _cartpole_obs(q, qd):
    return jnp.stack([q[:, 0], qd[:, 0], q[:, 1], qd[:, 1]], axis=-1)


def _cartpole_reward(q, qd, progress, cfg):
    cart_pos, pole_angle = q[:, 0], q[:, 1]
    cart_vel, pole_vel = qd[:, 0], qd[:, 1]
    reward = (
        1.0
        - pole_angle * pole_angle
        - 0.01 * jnp.abs(cart_vel)
        - 0.005 * jnp.abs(pole_vel)
    )
    bad = (jnp.abs(cart_pos) > 3.0) | (jnp.abs(pole_angle) > jnp.pi / 2)
    reward = jnp.where(bad, -2.0, reward)
    return reward, bad


def make_cartpole(
    num_envs: int = 512, episode_length: int = 500, **kw
) -> ClassicEnv:
    """Reference Cartpole (cfg/task/Cartpole.yaml: maxEffort 400, resetDist 3,
    reward/termination from tasks/cartpole.py compute_cartpole_reward)."""
    cfg = ClassicConfig(
        num_envs=num_envs,
        episode_length=episode_length,
        **{"actuated_dofs": (0,), "effort_scale": 400.0,
           "reset_noise": 0.1, **kw},
    )
    env = ClassicEnv(cfg, _cartpole_obs, _cartpole_reward, num_obs=4)
    # sanity: slider (prismatic) then pole (revolute)
    assert env.art.nv == 2, env.art.joint_names
    return env

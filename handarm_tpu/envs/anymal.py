"""ANYmal-C commanded-velocity locomotion (reference tasks/anymal.py +
cfg/task/Anymal.yaml).

Floating-base URDF quadruped on the shared engine: per-episode velocity
commands (vx, vy, yaw-rate), PD position targets around the default
stance, velocity-tracking rewards with a torque penalty, resets on
base/thigh contact. Same jitted [B] layout as envs/locomotion.py."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import quat_rotate, quat_rotate_inv
from handarm_tpu.physics.contacts import StaticGeom
from handarm_tpu.physics.engine import (
    PhysicsState,
    RobotState,
    ObjectState,
    SimParams,
    build_scene,
    step as engine_step,
)
from handarm_tpu.physics.model import compile_urdf
from handarm_tpu.physics.shapes import stack_objects
from handarm_tpu.physics.solver import SolverParams
from handarm_tpu.robots.spherefit import make_generic_spheres

ANYMAL_URDF = "/root/reference/assets/urdf/anymal_c/urdf/anymal.urdf"

# cfg/task/Anymal.yaml defaultJointAngles
DEFAULT_ANGLES = {
    "LF_HAA": 0.03, "LH_HAA": 0.03, "RF_HAA": -0.03, "RH_HAA": -0.03,
    "LF_HFE": 0.4, "LH_HFE": -0.4, "RF_HFE": 0.4, "RH_HFE": -0.4,
    "LF_KFE": -0.8, "LH_KFE": 0.8, "RF_KFE": -0.8, "RH_KFE": 0.8,
}


@dataclass(frozen=True)
class AnymalConfig:
    num_envs: int = 256
    episode_length: int = 1000  # yaml: 50 s (trimmed for training practicality)
    dt: float = 1.0 / 60.0
    substeps: int = 2
    action_scale: float = 0.5
    kp: float = 85.0
    kd: float = 2.0
    # command ranges (yaml randomCommandVelocityRanges)
    cmd_lin_x: tuple = (-2.0, 2.0)
    cmd_lin_y: tuple = (-1.0, 1.0)
    cmd_yaw: tuple = (-1.0, 1.0)
    # reward scales (yaml learn block)
    lin_vel_scale_rew: float = 1.0
    ang_vel_scale_rew: float = 0.5
    torque_scale_rew: float = -0.000025
    # obs scales
    lin_vel_scale: float = 2.0
    ang_vel_scale: float = 0.25
    dof_pos_scale: float = 1.0
    dof_vel_scale: float = 0.05
    base_height: float = 0.62


class AnymalState(NamedTuple):
    physics: PhysicsState
    progress: jnp.ndarray
    commands: jnp.ndarray  # [B, 3] vx, vy, yaw-rate
    actions: jnp.ndarray
    key: jnp.ndarray


class AnymalStepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict
    teacher_obs: jnp.ndarray


class AnymalEnv:
    def __init__(self, cfg: AnymalConfig = AnymalConfig()):
        self.cfg = cfg
        art = compile_urdf(ANYMAL_URDF, floating_base=True)
        self.art = art
        nj = art.nv - 6  # 12

        spheres = make_generic_spheres(ANYMAL_URDF, art, spheres_per_link=2)
        shapes = stack_objects([])
        geom = StaticGeom(
            table_lo=jnp.asarray([-1e4, -1e4]),
            table_hi=jnp.asarray([1e4, 1e4]),
            table_height=jnp.asarray(0.0),
            friction=jnp.asarray(1.0),
        )
        kp = np.zeros(art.nv)
        kd = np.zeros(art.nv)
        kp[6:] = cfg.kp
        kd[6:] = cfg.kd
        self.scene = build_scene(
            art, shapes, spheres, geom,
            kp=kp, kd=kd,
            params=SimParams(
                dt=cfg.dt, substeps=cfg.substeps,
                solver=SolverParams(iterations=8),
            ),
        )
        # default stance targets in joint order
        self.default_q = jnp.asarray(
            [0.0] * 6
            + [DEFAULT_ANGLES[n] for n in art.joint_names[6:]],
            jnp.float32,
        )
        self.base_body = 0
        # reset-triggering contacts: base + thighs (reference knee_names =
        # THIGH bodies, anymal.py:195)
        crash = [art.sites[n].body for n in art.sites
                 if "THIGH" in n and art.sites[n].body >= 0]
        self.crash_bodies = np.unique(np.array([0] + crash, np.int32))

        self.num_actions = nj
        self.num_obs = 3 + 3 + 3 + 3 + nj + nj + nj  # 48
        self.num_teacher_obs = 0
        self.obs_slices = {"obs": (0, self.num_obs)}

    def _fresh(self, key, B) -> AnymalState:
        from handarm_tpu.physics.engine import initial_state

        k_cmd, k_q, k_next = jax.random.split(key, 3)
        phys = initial_state(
            self.scene, B,
            q0=self.default_q[None],
            base_pos0=jnp.asarray([0.0, 0.0, self.cfg.base_height]),
        )
        # dof position scale noise U(0.5, 1.5) (anymal.py:283-287)
        scale = jax.random.uniform(k_q, (B, self.art.nv), minval=0.5, maxval=1.5)
        q0 = (self.default_q[None] * scale).at[:, :6].set(0.0)
        phys = phys._replace(
            robot=phys.robot._replace(q=q0, targets=q0)
        )
        cmds = self._sample_commands(k_cmd, B)
        return AnymalState(
            physics=phys,
            progress=jnp.zeros(B, jnp.int32),
            commands=cmds,
            actions=jnp.zeros((B, self.num_actions)),
            key=k_next,
        )

    def _sample_commands(self, key, B):
        cfg = self.cfg
        u = jax.random.uniform(key, (B, 3))
        lo = jnp.asarray([cfg.cmd_lin_x[0], cfg.cmd_lin_y[0], cfg.cmd_yaw[0]])
        hi = jnp.asarray([cfg.cmd_lin_x[1], cfg.cmd_lin_y[1], cfg.cmd_yaw[1]])
        return lo[None] + u * (hi - lo)[None]

    def reset(self, key):
        state = self._fresh(key, self.cfg.num_envs)
        return state, self._obs(state)

    def _base_vels(self, phys):
        """Base linear/angular velocity in the BASE frame (reference uses
        quat_rotate_inverse on root_states)."""
        qd = phys.robot.qd
        bq, bp = phys.robot.base_quat, phys.robot.base_pos
        w = qd[:, 3:6]
        v = qd[:, 0:3] + jnp.cross(w, bp)  # world linear velocity at base
        return quat_rotate_inv(bq, v), quat_rotate_inv(bq, w)

    def _obs(self, s: AnymalState):
        cfg = self.cfg
        phys = s.physics
        lin, ang = self._base_vels(phys)
        grav = quat_rotate_inv(
            phys.robot.base_quat,
            jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), lin.shape),
        )
        q, qd = phys.robot.q[:, 6:], phys.robot.qd[:, 6:]
        cmd_scale = jnp.asarray(
            [cfg.lin_vel_scale, cfg.lin_vel_scale, cfg.ang_vel_scale]
        )
        return jnp.concatenate(
            [
                lin * cfg.lin_vel_scale,
                ang * cfg.ang_vel_scale,
                grav,
                s.commands * cmd_scale[None],
                (q - self.default_q[None, 6:]) * cfg.dof_pos_scale,
                qd * cfg.dof_vel_scale,
                s.actions,
            ],
            axis=-1,
        )

    def step(self, state: AnymalState, actions):
        cfg = self.cfg
        B = actions.shape[0]
        actions = jnp.clip(actions, -1.0, 1.0)
        key, k_reset = jax.random.split(state.key)

        targets = jnp.broadcast_to(
            self.default_q[None], (B, self.art.nv)
        ).at[:, 6:].add(cfg.action_scale * actions)
        phys = state.physics._replace(
            robot=state.physics.robot._replace(targets=targets)
        )
        phys, info = engine_step(self.scene, phys)

        progress = state.progress + 1
        lin, ang = self._base_vels(phys)
        q, qd = phys.robot.q, phys.robot.qd
        # applied-torque estimate (same stable-PD clamp as the engine)
        tau = jnp.clip(
            self.scene.kp[None] * (targets - q) - self.scene.kd[None] * qd,
            -jnp.asarray(self.art.effort_limit)[None],
            jnp.asarray(self.art.effort_limit)[None],
        )[:, 6:]

        lin_err = jnp.sum(jnp.square(state.commands[:, :2] - lin[:, :2]), -1)
        ang_err = jnp.square(state.commands[:, 2] - ang[:, 2])
        reward = (
            jnp.exp(-lin_err / 0.25) * cfg.lin_vel_scale_rew
            + jnp.exp(-ang_err / 0.25) * cfg.ang_vel_scale_rew
            + jnp.sum(jnp.square(tau), -1) * cfg.torque_scale_rew
        )
        reward = jnp.maximum(reward, 0.0)

        crash_f = jnp.linalg.norm(
            info.body_contact_force[:, self.crash_bodies], axis=-1
        )
        crashed = jnp.any(crash_f > 1.0, axis=-1)
        finite = (
            jnp.all(jnp.isfinite(q), axis=-1)
            & jnp.all(jnp.isfinite(phys.robot.base_pos), axis=-1)
        )
        done = crashed | (progress >= cfg.episode_length) | ~finite
        reward = jnp.where(jnp.isfinite(reward), reward, 0.0)

        mid = AnymalState(
            physics=phys, progress=progress, commands=state.commands,
            actions=actions, key=key,
        )
        fresh = self._fresh(k_reset, B)
        new_state = jax.tree_util.tree_map(
            lambda f, c: (
                jnp.where(done.reshape((B,) + (1,) * (c.ndim - 1)), f, c)
                if c.ndim and c.shape[0] == B
                else c
            ),
            fresh._replace(key=None),
            mid._replace(key=None),
        )._replace(key=key)
        obs = self._obs(new_state)
        obs = jnp.where(jnp.isfinite(obs), obs, 0.0)
        return new_state, AnymalStepResult(
            obs=obs,
            reward=reward,
            done=done,
            info={"lin_vel_err": jnp.mean(lin_err)},
            teacher_obs=jnp.zeros((B, 0), obs.dtype),
        )


def make_anymal(num_envs=256, episode_length=1000, **kw) -> AnymalEnv:
    return AnymalEnv(AnymalConfig(
        num_envs=num_envs, episode_length=episode_length, **kw
    ))

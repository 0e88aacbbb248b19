"""ANYmal rough-terrain locomotion with curriculum (reference
tasks/anymal_terrain.py + cfg/task/AnymalTerrain.yaml).

Extends the flat Anymal env with:
- procedural heightfield terrain (physics/terrain.py) sampled bilinearly
  for contacts (replacing the reference's heightfield->trimesh->PhysX)
- 188-dim observations incl. 140 yaw-rotated height measurements around
  the base (anymal_terrain.py:302-313, init_height_points)
- the full reward set: velocity tracking, z/roll-pitch penalties, torque,
  joint acceleration, knee collision, action rate, feet air time
  (anymal_terrain.py:316-365)
- game-inspired terrain curriculum: walk far -> harder row, walk <25% of
  commanded distance -> easier row (anymal_terrain.py:428-435)
- random pushes every pushInterval_s (anymal_terrain.py:443-447)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import quat_rotate, quat_rotate_inv
from handarm_tpu.physics.contacts import StaticGeom
from handarm_tpu.physics.engine import (
    SimParams,
    build_scene,
    initial_state,
    step as engine_step,
)
from handarm_tpu.physics.model import compile_urdf
from handarm_tpu.physics.shapes import stack_objects
from handarm_tpu.physics.solver import SolverParams
from handarm_tpu.physics.terrain import Heightfield, generate_terrain
from handarm_tpu.robots.spherefit import make_generic_spheres

ANYMAL_URDF = "/root/reference/assets/urdf/anymal_c/urdf/anymal.urdf"
DEFAULT_ANGLES = {
    "LF_HAA": 0.03, "LH_HAA": 0.03, "RF_HAA": -0.03, "RH_HAA": -0.03,
    "LF_HFE": 0.4, "LH_HFE": -0.4, "RF_HFE": 0.4, "RH_HFE": -0.4,
    "LF_KFE": -0.8, "LH_KFE": 0.8, "RF_KFE": -0.8, "RH_KFE": 0.8,
}


@dataclass(frozen=True)
class AnymalTerrainConfig:
    num_envs: int = 256
    episode_length: int = 1000  # 20 s at 50 Hz control in the reference
    dt: float = 1.0 / 60.0
    substeps: int = 2
    action_scale: float = 0.5
    kp: float = 80.0  # AnymalTerrain.yaml control block
    kd: float = 2.0
    # terrain
    num_levels: int = 6
    num_types: int = 10
    map_length: float = 8.0
    curriculum: bool = True
    max_init_level: int = 0
    # commands (yaml randomCommandVelocityRanges)
    cmd_lin_x: tuple = (-1.0, 1.0)
    cmd_lin_y: tuple = (-1.0, 1.0)
    cmd_yaw: tuple = (-3.14, 3.14)
    # reward scales (yaml learn block; dt-scaled like the reference which
    # multiplies by dt at 50 Hz)
    r_lin_xy: float = 1.0
    r_lin_z: float = -4.0
    r_ang_xy: float = -0.05
    r_ang_z: float = 0.5
    r_torque: float = -0.00002
    r_joint_acc: float = -0.0005
    r_air_time: float = 1.0
    r_knee_collision: float = -0.25
    r_action_rate: float = -0.01
    allow_knee_contacts: bool = True
    # obs scales
    lin_vel_scale: float = 2.0
    ang_vel_scale: float = 0.25
    dof_pos_scale: float = 1.0
    dof_vel_scale: float = 0.05
    height_scale: float = 5.0
    base_height: float = 0.62
    push_interval: int = 900  # steps (15 s)
    push_vel: float = 1.0


class ATState(NamedTuple):
    physics: object
    progress: jnp.ndarray
    commands: jnp.ndarray  # [B, 3]
    actions: jnp.ndarray  # [B, 12]
    last_qd: jnp.ndarray  # [B, 12]
    feet_air_time: jnp.ndarray  # [B, 4]
    terrain_level: jnp.ndarray  # [B] int
    spawn_xy: jnp.ndarray  # [B, 2] episode start position
    key: jnp.ndarray


class ATStepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict
    teacher_obs: jnp.ndarray


class AnymalTerrainEnv:
    def __init__(self, cfg: AnymalTerrainConfig = AnymalTerrainConfig()):
        self.cfg = cfg
        art = compile_urdf(ANYMAL_URDF, floating_base=True)
        self.art = art
        nj = art.nv - 6  # 12

        self.terrain: Heightfield = generate_terrain(
            num_levels=cfg.num_levels, num_types=cfg.num_types,
            length=cfg.map_length, width=cfg.map_length,
        )
        geom = StaticGeom(
            table_lo=jnp.asarray([-1e4, -1e4]),
            table_hi=jnp.asarray([-9e3, -9e3]),
            table_height=jnp.asarray(0.0),
            friction=jnp.asarray(1.0),
            hf_height=jnp.asarray(self.terrain.height),
            hf_cell=float(self.terrain.cell),
            hf_origin=jnp.asarray(self.terrain.origin),
        )
        spheres = make_generic_spheres(ANYMAL_URDF, art, spheres_per_link=2)
        shapes = stack_objects([])
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
        self.default_q = jnp.asarray(
            [0.0] * 6 + [DEFAULT_ANGLES[n] for n in art.joint_names[6:]],
            jnp.float32,
        )
        feet = [art.sites[n].body for n in art.sites
                if "FOOT" in n and art.sites[n].body >= 0]
        self.feet_bodies = np.unique(np.array(feet, np.int32))
        knees = [art.sites[n].body for n in art.sites
                 if "THIGH" in n and art.sites[n].body >= 0]
        self.knee_bodies = np.unique(np.array(knees, np.int32))
        self.base_body = 0
        self.env_origins = jnp.asarray(
            self.terrain.env_origins.reshape(-1, 3)
        )  # [levels*types, 3]

        # height measurement grid (anymal_terrain.py:503-512):
        # x in ±(0.2..0.8), y in ±(0.1..0.5) -> 14 x 10 = 140 points
        hx = 0.1 * np.array([-8, -7, -6, -5, -4, -3, -2, 2, 3, 4, 5, 6, 7, 8])
        hy = 0.1 * np.array([-5, -4, -3, -2, -1, 1, 2, 3, 4, 5])
        gx, gy = np.meshgrid(hx, hy, indexing="ij")
        self.height_points = jnp.asarray(
            np.stack([gx.ravel(), gy.ravel()], -1), jnp.float32
        )  # [140, 2]
        self.num_height_points = 140

        self.num_actions = nj
        self.num_obs = 3 + 3 + 3 + 3 + nj + nj + self.num_height_points + nj
        self.num_teacher_obs = 0
        self.obs_slices = {"obs": (0, self.num_obs)}

    # -- terrain helpers ---------------------------------------------------

    def _terrain_height(self, xy):
        """Bilinear terrain height at world xy [..., 2]."""
        H = self.scene.geom.hf_height
        R, C = H.shape
        u = jnp.clip(xy[..., 0] / self.terrain.cell, 0.0, R - 1.001)
        v = jnp.clip(xy[..., 1] / self.terrain.cell, 0.0, C - 1.001)
        i0 = jnp.floor(u).astype(jnp.int32)
        j0 = jnp.floor(v).astype(jnp.int32)
        fu, fv = u - i0, v - j0
        flat = H.reshape(-1)
        idx = i0 * C + j0
        h00, h10 = flat[idx], flat[idx + C]
        h01, h11 = flat[idx + 1], flat[idx + C + 1]
        return (h00 * (1 - fu) * (1 - fv) + h10 * fu * (1 - fv)
                + h01 * (1 - fu) * fv + h11 * fu * fv)

    def _origin_for(self, level, type_idx):
        flat = level * self.cfg.num_types + type_idx
        return self.env_origins[flat]

    # -- resets -------------------------------------------------------------

    def _types(self, B):
        return jnp.arange(B, dtype=jnp.int32) % self.cfg.num_types

    def _fresh(self, key, B, level=None) -> ATState:
        cfg = self.cfg
        k_cmd, k_q, k_xy, k_lvl, k_next = jax.random.split(key, 5)
        if level is None:
            level = jax.random.randint(
                k_lvl, (B,), 0, cfg.max_init_level + 1
            )
        types = self._types(B)
        origin = self._origin_for(level, types)  # [B, 3]
        xy_noise = jax.random.uniform(k_xy, (B, 2), minval=-0.5, maxval=0.5)
        base_pos = jnp.concatenate(
            [origin[:, :2] + xy_noise,
             (origin[:, 2] + cfg.base_height)[:, None]], -1,
        )
        phys = initial_state(self.scene, B, q0=self.default_q[None],
                             base_pos0=base_pos)
        scale = jax.random.uniform(k_q, (B, self.art.nv), minval=0.5,
                                   maxval=1.5)
        q0 = (self.default_q[None] * scale).at[:, :6].set(0.0)
        phys = phys._replace(robot=phys.robot._replace(q=q0, targets=q0))
        return ATState(
            physics=phys,
            progress=jnp.zeros(B, jnp.int32),
            commands=self._sample_commands(k_cmd, B),
            actions=jnp.zeros((B, self.num_actions)),
            last_qd=jnp.zeros((B, self.num_actions)),
            feet_air_time=jnp.zeros((B, 4)),
            terrain_level=level,
            spawn_xy=base_pos[:, :2],
            key=k_next,
        )

    def _sample_commands(self, key, B):
        cfg = self.cfg
        u = jax.random.uniform(key, (B, 3))
        lo = jnp.asarray([cfg.cmd_lin_x[0], cfg.cmd_lin_y[0], cfg.cmd_yaw[0]])
        hi = jnp.asarray([cfg.cmd_lin_x[1], cfg.cmd_lin_y[1], cfg.cmd_yaw[1]])
        cmd = lo[None] + u * (hi - lo)[None]
        # zero-out small commands (anymal_terrain.py:411)
        keep = jnp.linalg.norm(cmd[:, :2], axis=-1) > 0.25
        return cmd * keep[:, None]

    def reset(self, key):
        s = self._fresh(key, self.cfg.num_envs)
        k_prog = jax.random.fold_in(key, 23)
        s = s._replace(progress=jax.random.randint(
            k_prog, (self.cfg.num_envs,), 0, self.cfg.episode_length
        ))
        return s, self._obs(s)

    # -- observation ---------------------------------------------------------

    def _base_vels(self, phys):
        qd = phys.robot.qd
        bq, bp = phys.robot.base_quat, phys.robot.base_pos
        w = qd[:, 3:6]
        v = qd[:, 0:3] + jnp.cross(w, bp)
        return quat_rotate_inv(bq, v), quat_rotate_inv(bq, w)

    def _measured_heights(self, phys):
        """Heights under the yaw-rotated measurement grid (140 pts)."""
        bq, bp = phys.robot.base_quat, phys.robot.base_pos
        # yaw-only rotation (quat_apply_yaw analog)
        yaw = jnp.arctan2(
            2.0 * (bq[:, 0] * bq[:, 3] + bq[:, 1] * bq[:, 2]),
            1.0 - 2.0 * (bq[:, 2] ** 2 + bq[:, 3] ** 2),
        )
        c, s = jnp.cos(yaw)[:, None], jnp.sin(yaw)[:, None]
        px = self.height_points[None, :, 0]
        py = self.height_points[None, :, 1]
        wx = bp[:, 0:1] + c * px - s * py
        wy = bp[:, 1:2] + s * px + c * py
        return self._terrain_height(jnp.stack([wx, wy], -1))  # [B, 140]

    def _obs(self, s: ATState):
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
        heights = jnp.clip(
            phys.robot.base_pos[:, 2:3] - 0.5 - self._measured_heights(phys),
            -1.0, 1.0,
        ) * cfg.height_scale
        return jnp.concatenate(
            [
                lin * cfg.lin_vel_scale,
                ang * cfg.ang_vel_scale,
                grav,
                s.commands * cmd_scale[None],
                (q - self.default_q[None, 6:]) * cfg.dof_pos_scale,
                qd * cfg.dof_vel_scale,
                heights,
                s.actions,
            ],
            axis=-1,
        )

    # -- step ----------------------------------------------------------------

    def step(self, state: ATState, actions):
        cfg = self.cfg
        B = actions.shape[0]
        actions = jnp.clip(actions, -1.0, 1.0)
        key, k_push, k_reset = jax.random.split(state.key, 3)

        targets = jnp.broadcast_to(
            self.default_q[None], (B, self.art.nv)
        ).at[:, 6:].add(cfg.action_scale * actions)
        phys = state.physics._replace(
            robot=state.physics.robot._replace(targets=targets)
        )
        # random pushes (anymal_terrain.py:443-447): overwrite base xy vel
        push_now = (state.progress % cfg.push_interval) == (
            cfg.push_interval - 1
        )
        push = jax.random.uniform(
            k_push, (B, 2), minval=-cfg.push_vel, maxval=cfg.push_vel
        )
        qd = phys.robot.qd
        qd = qd.at[:, 0:2].set(
            jnp.where(push_now[:, None], push, qd[:, 0:2])
        )
        phys = phys._replace(robot=phys.robot._replace(qd=qd))
        phys, info = engine_step(self.scene, phys)

        progress = state.progress + 1
        lin, ang = self._base_vels(phys)
        q, qd = phys.robot.q, phys.robot.qd
        tau = jnp.clip(
            self.scene.kp[None] * (targets - q) - self.scene.kd[None] * qd,
            -jnp.asarray(self.art.effort_limit)[None],
            jnp.asarray(self.art.effort_limit)[None],
        )[:, 6:]

        # rewards (anymal_terrain.py:316-365), dt-scaled
        dt = cfg.dt
        lin_err = jnp.sum(jnp.square(state.commands[:, :2] - lin[:, :2]), -1)
        ang_err = jnp.square(state.commands[:, 2] - ang[:, 2])
        rew = jnp.exp(-lin_err / 0.25) * cfg.r_lin_xy * dt
        rew += jnp.exp(-ang_err / 0.25) * cfg.r_ang_z * dt
        rew += jnp.square(lin[:, 2]) * cfg.r_lin_z * dt
        rew += jnp.sum(jnp.square(ang[:, :2]), -1) * cfg.r_ang_xy * dt
        rew += jnp.sum(jnp.square(tau), -1) * cfg.r_torque * dt
        rew += jnp.sum(
            jnp.square(state.last_qd - qd[:, 6:]), -1
        ) * cfg.r_joint_acc * dt
        knee_f = jnp.linalg.norm(
            info.body_contact_force[:, self.knee_bodies], axis=-1
        )
        knee_contact = knee_f > 1.0
        rew += jnp.sum(knee_contact, -1) * cfg.r_knee_collision * dt
        rew += jnp.sum(
            jnp.square(state.actions - actions), -1
        ) * cfg.r_action_rate * dt
        # feet air time
        feet_fz = info.body_contact_force[:, self.feet_bodies, 2]
        contact = feet_fz > 1.0
        air = state.feet_air_time + dt
        first_contact = (state.feet_air_time > 0.0) & contact
        air_rew = jnp.sum((air - 0.5) * first_contact, -1)
        air_rew *= jnp.linalg.norm(state.commands[:, :2], axis=-1) > 0.1
        rew += air_rew * cfg.r_air_time
        feet_air_time = air * (~contact)
        rew = jnp.clip(rew, 0.0, None)

        # termination (anymal_terrain.py:294-300)
        base_f = jnp.linalg.norm(
            info.body_contact_force[:, self.base_body], axis=-1
        )
        crashed = base_f > 1.0
        if not cfg.allow_knee_contacts:
            crashed = crashed | jnp.any(knee_contact, -1)
        finite = (
            jnp.all(jnp.isfinite(q), axis=-1)
            & jnp.all(jnp.isfinite(phys.robot.base_pos), axis=-1)
        )
        timeout = progress >= cfg.episode_length
        done = crashed | timeout | ~finite
        rew = jnp.where(jnp.isfinite(rew), rew, 0.0)

        # terrain curriculum on timeout (anymal_terrain.py:428-435)
        walked = jnp.linalg.norm(
            phys.robot.base_pos[:, :2] - state.spawn_xy, axis=-1
        )
        cmd_dist = (
            jnp.linalg.norm(state.commands[:, :2], axis=-1)
            * cfg.episode_length * cfg.dt * 0.25
        )
        lvl = state.terrain_level
        if cfg.curriculum:
            lvl = jnp.where(
                timeout & (walked > self.terrain.patch_length / 2),
                lvl + 1, lvl,
            )
            lvl = jnp.where(timeout & (walked < cmd_dist), lvl - 1, lvl)
            lvl = jnp.clip(lvl, 0, cfg.num_levels - 1)

        mid = ATState(
            physics=phys, progress=progress, commands=state.commands,
            actions=actions, last_qd=qd[:, 6:],
            feet_air_time=feet_air_time,
            terrain_level=lvl, spawn_xy=state.spawn_xy, key=key,
        )
        fresh = self._fresh(k_reset, B, level=lvl)
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
        return new_state, ATStepResult(
            obs=obs,
            reward=rew,
            done=done,
            info={
                "terrain_level_mean": jnp.mean(lvl.astype(jnp.float32)),
                "lin_vel_err": jnp.mean(lin_err),
            },
            teacher_obs=jnp.zeros((B, 0), obs.dtype),
        )


def make_anymal_terrain(num_envs=256, episode_length=1000, **kw):
    return AnymalTerrainEnv(AnymalTerrainConfig(
        num_envs=num_envs, episode_length=episode_length, **kw
    ))

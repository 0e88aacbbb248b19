"""Ingenuity Mars-helicopter waypoint task (reference tasks/ingenuity.py).

Coaxial twin-rotor craft under Mars gravity (-3.721): the reference builds
a procedural MJCF (free chassis, two rotor bodies on locked hinges) and
applies per-rotor thrust forces in the body frame with a bounded lateral
component. Targets re-sample every 500 steps inside a 10 m box."""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import quat_rotate, quat_to_matrix
from handarm_tpu.physics.contacts import RobotSpheres, StaticGeom
from handarm_tpu.physics.engine import (
    SimParams,
    build_scene,
    initial_state,
    step as engine_step,
)
from handarm_tpu.physics.kinematics import forward_kinematics
from handarm_tpu.physics.mjcf import parse_mjcf
from handarm_tpu.physics.model import compile_model
from handarm_tpu.physics.shapes import stack_objects
from handarm_tpu.physics.solver import SolverParams


def _ingenuity_mjcf() -> str:
    """Reference procedural asset (ingenuity.py:120-215), collision geoms
    only (the display meshes are contype 0)."""
    cs = 0.06
    rr, rt = 0.15, 0.01
    rotors = []
    for i in range(2):
        z = 0.025 * i
        rotors.append(f"""
        <body name="rotor_physics_{i}" pos="0 0 {z:g}">
          <geom type="cylinder" size="{rr:g} {0.5 * rt:g}" density="1000"/>
          <joint name="rotor_roll{i}" type="hinge" limited="true"
                 range="0 0" pos="0 0 0"/>
        </body>""")
    return f"""
    <mujoco model="Ingenuity">
      <compiler angle="degree" coordinate="local" inertiafromgeom="true"/>
      <worldbody>
        <body name="chassis" pos="0 0 0">
          <geom type="box" size="{cs:g} {cs:g} {cs:g}" density="50"/>
          <joint name="root_joint" type="free"/>
          {''.join(rotors)}
        </body>
      </worldbody>
    </mujoco>"""


@dataclass(frozen=True)
class IngenuityConfig:
    num_envs: int = 256
    episode_length: int = 2000
    dt: float = 1.0 / 60.0
    substeps: int = 2
    thrust_scale: float = 2000.0
    thrust_limit: float = 2000.0
    lateral_fraction: float = 0.2
    gravity_z: float = -3.721  # Mars


class IngenuityState(NamedTuple):
    physics: object
    target: jnp.ndarray  # [B, 3]
    progress: jnp.ndarray
    key: jnp.ndarray


class IngenuityStepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict
    teacher_obs: jnp.ndarray


class IngenuityEnv:
    def __init__(self, cfg: IngenuityConfig = IngenuityConfig()):
        self.cfg = cfg
        path = os.path.join(tempfile.gettempdir(), "handarm_ingenuity.xml")
        with open(path, "w") as f:
            f.write(_ingenuity_mjcf())
        urdf, extras = parse_mjcf(path)
        art = compile_model(urdf, floating_base=True, default_density=1000.0)
        self.art = art

        bodies, offs, rads = [], [], []
        for bname, sph in extras.link_spheres.items():
            site = art.sites[bname]
            if site.body < 0:
                continue
            Rl = np.asarray(quat_to_matrix(jnp.asarray(site.quat)))
            for pos, r in sph:
                bodies.append(site.body)
                offs.append(Rl @ np.asarray(pos) + site.pos)
                rads.append(r)
        spheres = RobotSpheres(
            body=np.asarray(bodies, np.int32),
            offset=jnp.asarray(np.asarray(offs), jnp.float32),
            radius=jnp.asarray(np.asarray(rads), jnp.float32),
            friction=jnp.asarray(np.full(len(rads), 1.0), jnp.float32),
        )
        geom = StaticGeom(
            table_lo=jnp.asarray([-1e4, -1e4]),
            table_hi=jnp.asarray([1e4, 1e4]),
            table_height=jnp.asarray(0.0),
            friction=jnp.asarray(1.0),
        )
        nv = art.nv
        self.scene = build_scene(
            art, stack_objects([]), spheres, geom,
            kp=np.zeros(nv), kd=np.zeros(nv),
            params=SimParams(
                dt=cfg.dt, substeps=cfg.substeps,
                solver=SolverParams(iterations=4),
            ),
        )
        self.scene = self.scene._replace(
            gravity=jnp.asarray([0.0, 0.0, cfg.gravity_z], jnp.float32)
        )
        self.rotor_bodies = np.array(
            [art.sites[f"rotor_physics_{i}"].body for i in range(2)], np.int32
        )
        self.num_actions = 6
        self.num_obs = 13
        self.num_teacher_obs = 0
        self.obs_slices = {"obs": (0, self.num_obs)}

    def _sample_targets(self, key, B):
        u = jax.random.uniform(key, (B, 3))
        return jnp.stack(
            [u[:, 0] * 10.0 - 5.0, u[:, 1] * 10.0 - 5.0, u[:, 2] + 1.0], -1
        )

    def _fresh(self, key, B) -> IngenuityState:
        k_root, k_tgt, k_next = jax.random.split(key, 3)
        u = jax.random.uniform(k_root, (B, 2), minval=-1.0, maxval=1.0)
        base = jnp.stack([u[:, 0] * 1.5, u[:, 1] * 1.5, jnp.full((B,), 1.0)], -1)
        phys = initial_state(self.scene, B)
        phys = phys._replace(robot=phys.robot._replace(base_pos=base))
        return IngenuityState(
            physics=phys,
            target=self._sample_targets(k_tgt, B),
            progress=jnp.zeros(B, jnp.int32),
            key=k_next,
        )

    def reset(self, key):
        s = self._fresh(key, self.cfg.num_envs)
        return s, self._obs(s)

    def _obs(self, s: IngenuityState):
        rob = s.physics.robot
        w = rob.qd[:, 3:6]
        v = rob.qd[:, 0:3] + jnp.cross(w, rob.base_pos)
        return jnp.concatenate(
            [
                (s.target - rob.base_pos) / 3.0,
                rob.base_quat,
                v / 2.0,
                w / np.pi,
            ],
            axis=-1,
        )

    def step(self, state: IngenuityState, actions):
        cfg = self.cfg
        B = actions.shape[0]
        actions = jnp.clip(actions, -1.0, 1.0)
        key, k_tgt, k_reset = jax.random.split(state.key, 3)

        # thrust assembly (ingenuity.py:338-352): vertical components scaled
        # by dt * 2000, lateral fraction clamped to 0.2
        vert = jnp.clip(
            actions[:, [2, 5]] * cfg.thrust_scale,
            -cfg.thrust_limit, cfg.thrust_limit,
        )
        latf0 = jnp.clip(actions[:, 0:2], -cfg.lateral_fraction, cfg.lateral_fraction)
        latf1 = jnp.clip(actions[:, 3:5], -cfg.lateral_fraction, cfg.lateral_fraction)
        tz = cfg.dt * vert  # [B, 2]
        f_local = jnp.stack(
            [
                jnp.concatenate([tz[:, 0:1] * latf0, tz[:, 0:1]], -1),
                jnp.concatenate([tz[:, 1:2] * latf1, tz[:, 1:2]], -1),
            ],
            axis=1,
        )  # [B, 2, 3]

        m = self.scene.model
        phys = state.physics
        fk = forward_kinematics(
            m, phys.robot.q, phys.robot.base_quat, phys.robot.base_pos
        )
        rb = self.rotor_bodies
        f_w = quat_rotate(fk.body_quat[:, rb], f_local)
        p = fk.body_pos[:, rb]
        spat = jnp.concatenate([jnp.cross(p, f_w), f_w], -1)
        anc = jnp.asarray(np.asarray(m.ancestor_mask)[rb])
        tau = jnp.einsum("bua,bka,ku->bu", fk.screw, spat, anc)

        phys = phys._replace(robot=phys.robot._replace(tau_ext=tau))
        phys, info = engine_step(self.scene, phys)
        phys = phys._replace(robot=phys.robot._replace(tau_ext=None))

        progress = state.progress + 1
        # targets re-sample every 500 steps (ingenuity.py:324-327)
        new_tgt = self._sample_targets(k_tgt, B)
        retarget = (progress % 500) == 0
        target = jnp.where(retarget[:, None], new_tgt, state.target)

        pos = phys.robot.base_pos
        target_dist = jnp.linalg.norm(target - pos, axis=-1)
        pos_reward = 1.0 / (1.0 + target_dist**2)
        up = quat_rotate(
            phys.robot.base_quat,
            jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), pos.shape),
        )[:, 2]
        up_reward = 5.0 / (1.0 + (1.0 - up) ** 2)
        spin = jnp.abs(phys.robot.qd[:, 5])
        spin_reward = 1.0 / (1.0 + spin**2)
        reward = pos_reward + pos_reward * (up_reward + spin_reward)

        finite = jnp.all(jnp.isfinite(pos), axis=-1)
        done = (
            (progress >= cfg.episode_length)
            | (target_dist > 8.0)
            | (pos[:, 2] < 0.3)
            | ~finite
        )
        reward = jnp.where(jnp.isfinite(reward), reward, 0.0)

        mid = IngenuityState(
            physics=phys, target=target, progress=progress, key=key
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
        return new_state, IngenuityStepResult(
            obs=obs,
            reward=reward,
            done=done,
            info={"target_dist": jnp.mean(target_dist)},
            teacher_obs=jnp.zeros((B, 0), obs.dtype),
        )


def make_ingenuity(num_envs=256, episode_length=2000, **kw) -> IngenuityEnv:
    return IngenuityEnv(IngenuityConfig(
        num_envs=num_envs, episode_length=episode_length, **kw
    ))

"""Quadcopter hover task (reference tasks/quadcopter.py).

The reference procedurally generates a quadcopter MJCF (free chassis + 4
rotor arms, each with pitch/roll hinges = 8 dofs) and flies it with per-
rotor thrust forces applied in the rotor's local frame. Here the same
model is generated as an MJCF string, and thrusts map to generalized
torques through the current kinematics (tau_u = sum_b s_u . (p_b x f_b,
f_b) over ancestors — the engine's tau_ext hook)."""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import quat_rotate
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
from handarm_tpu.math.quat import quat_to_matrix


def _quad_mjcf() -> str:
    """The reference's procedural quadcopter (quadcopter.py:121-202)."""
    import math

    cr, ct = 0.1, 0.03  # chassis radius/thickness
    rr, rt = 0.04, 0.01  # rotor radius/thickness
    rar = 0.01  # rotor arm radius
    arm_off = cr + 0.25 * rar
    rot_off = rr + 0.25 * rar
    bodies = []
    for i, ang in enumerate([0.25, 0.75, 1.25, 1.75]):
        a = ang * math.pi
        c, s = math.cos(a / 2), math.sin(a / 2)
        px, py = math.cos(a) * arm_off, math.sin(a) * arm_off
        bodies.append(f"""
        <body name="rotor_arm{i}" pos="{px:g} {py:g} 0" quat="{c:g} 0 0 {s:g}">
          <geom type="sphere" size="{rar:g}" density="200"/>
          <joint name="rotor_pitch{i}" type="hinge" pos="0 0 0" axis="0 1 0"
                 limited="true" range="-30 30"/>
          <body name="rotor{i}" pos="{rot_off:g} 0 0">
            <geom type="cylinder" size="{rr:g} {0.5 * rt:g}" density="1000"/>
            <joint name="rotor_roll{i}" type="hinge" pos="0 0 0" axis="1 0 0"
                   limited="true" range="-30 30"/>
          </body>
        </body>""")
    return f"""
    <mujoco model="Quadcopter">
      <compiler angle="degree" coordinate="local" inertiafromgeom="true"/>
      <worldbody>
        <body name="chassis" pos="0 0 0">
          <geom type="cylinder" size="{cr:g} {0.5 * ct:g}" density="50"/>
          <joint name="root_joint" type="free"/>
          {''.join(bodies)}
        </body>
      </worldbody>
    </mujoco>"""


@dataclass(frozen=True)
class QuadcopterConfig:
    num_envs: int = 256
    episode_length: int = 500
    dt: float = 1.0 / 60.0
    substeps: int = 2
    max_thrust: float = 2.0
    dof_speed_scale: float = 8.0 * np.pi
    thrust_speed_scale: float = 200.0


class QuadState(NamedTuple):
    physics: object
    targets: jnp.ndarray
    thrusts: jnp.ndarray  # [B, 4]
    progress: jnp.ndarray
    key: jnp.ndarray


class QuadStepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict
    teacher_obs: jnp.ndarray


class QuadcopterEnv:
    def __init__(self, cfg: QuadcopterConfig = QuadcopterConfig()):
        self.cfg = cfg
        path = os.path.join(tempfile.gettempdir(), "handarm_quadcopter.xml")
        with open(path, "w") as f:
            f.write(_quad_mjcf())
        urdf, extras = parse_mjcf(path)
        art = compile_model(urdf, floating_base=True, default_density=1000.0)
        self.art = art  # nv = 6 + 8

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
        kp = np.zeros(nv)
        kd = np.zeros(nv)
        kp[6:] = 1000.0  # reference dof props (quadcopter.py:246-248)
        kd[6:] = 0.0
        self.scene = build_scene(
            art, stack_objects([]), spheres, geom,
            kp=kp, kd=kd,
            params=SimParams(
                dt=cfg.dt, substeps=cfg.substeps,
                solver=SolverParams(iterations=4),
                max_base_angvel=4 * np.pi,  # asset max_angular_velocity
            ),
        )
        self.q_lo = jnp.asarray(art.q_min, jnp.float32)
        self.q_hi = jnp.asarray(art.q_max, jnp.float32)
        self.rotor_bodies = np.array(
            [art.sites[f"rotor{i}"].body for i in range(4)], np.int32
        )
        self.num_actions = 12  # 8 dof targets + 4 thrusts
        self.num_obs = 21
        self.num_teacher_obs = 0
        self.obs_slices = {"obs": (0, self.num_obs)}

    def _fresh(self, key, B) -> QuadState:
        k_root, k_dof, k_next = jax.random.split(key, 3)
        u = jax.random.uniform(k_root, (B, 3), minval=-1.0, maxval=1.0)
        base = jnp.stack(
            [u[:, 0] * 1.5, u[:, 1] * 1.5, 1.0 + u[:, 2] * 0.85 + 0.65], -1
        )
        q0 = jax.random.uniform(
            k_dof, (B, self.art.nv), minval=-0.2, maxval=0.2
        ).at[:, :6].set(0.0)
        phys = initial_state(self.scene, B, q0=q0, base_pos0=None)
        phys = phys._replace(
            robot=phys.robot._replace(base_pos=base, targets=q0)
        )
        return QuadState(
            physics=phys,
            targets=q0,
            thrusts=jnp.zeros((B, 4)),
            progress=jnp.zeros(B, jnp.int32),
            key=k_next,
        )

    def reset(self, key):
        s = self._fresh(key, self.cfg.num_envs)
        return s, self._obs(s)

    def _obs(self, s: QuadState):
        phys = s.physics
        rob = phys.robot
        target = jnp.asarray([0.0, 0.0, 1.0])
        w = rob.qd[:, 3:6]
        v = rob.qd[:, 0:3] + jnp.cross(w, rob.base_pos)
        dof_pos = 2.0 * (rob.q[:, 6:] - self.q_lo[6:]) / (
            self.q_hi[6:] - self.q_lo[6:]
        ) - 1.0
        return jnp.concatenate(
            [
                (target[None] - rob.base_pos) / 3.0,
                rob.base_quat,
                v / 2.0,
                w / np.pi,
                dof_pos,
            ],
            axis=-1,
        )

    def _thrust_tau(self, phys, thrusts):
        """Generalized torque of per-rotor local +z forces: tau_u =
        sum_b 1[u ancestor of b] s_u . (p_b x f_b, f_b)."""
        m = self.scene.model
        fk = forward_kinematics(
            m, phys.robot.q, phys.robot.base_quat, phys.robot.base_pos
        )
        rb = self.rotor_bodies
        f_local = jnp.concatenate(
            [jnp.zeros(thrusts.shape + (2,)), thrusts[..., None]], -1
        )
        f_w = quat_rotate(fk.body_quat[:, rb], f_local)  # [B, 4, 3]
        p = fk.body_pos[:, rb]
        spat = jnp.concatenate([jnp.cross(p, f_w), f_w], -1)  # [B, 4, 6]
        anc = jnp.asarray(np.asarray(m.ancestor_mask)[rb])  # [4, nv]
        return jnp.einsum("bua,bka,ku->bu", fk.screw, spat, anc)

    def step(self, state: QuadState, actions):
        cfg = self.cfg
        B = actions.shape[0]
        actions = jnp.clip(actions, -1.0, 1.0)
        key, k_reset = jax.random.split(state.key)

        targets = state.targets.at[:, 6:].add(
            cfg.dt * cfg.dof_speed_scale * actions[:, :8]
        )
        targets = jnp.clip(targets, self.q_lo[None], self.q_hi[None])
        thrusts = jnp.clip(
            state.thrusts + cfg.dt * cfg.thrust_speed_scale * actions[:, 8:],
            0.0, cfg.max_thrust,
        )
        tau = self._thrust_tau(state.physics, thrusts)
        phys = state.physics._replace(
            robot=state.physics.robot._replace(targets=targets, tau_ext=tau)
        )
        phys, info = engine_step(self.scene, phys)
        phys = phys._replace(robot=phys.robot._replace(tau_ext=None))

        progress = state.progress + 1
        p = phys.robot.base_pos
        target_dist = jnp.sqrt(
            p[:, 0] ** 2 + p[:, 1] ** 2 + (1.0 - p[:, 2]) ** 2
        )
        pos_reward = 1.0 / (1.0 + target_dist**2)
        up = quat_rotate(
            phys.robot.base_quat,
            jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), p.shape),
        )[:, 2]
        up_reward = 1.0 / (1.0 + (1.0 - up) ** 2)
        spin = jnp.abs(phys.robot.qd[:, 5])
        spin_reward = 1.0 / (1.0 + spin**2)
        reward = pos_reward + pos_reward * (up_reward + spin_reward)

        finite = jnp.all(jnp.isfinite(phys.robot.q), axis=-1) & jnp.all(
            jnp.isfinite(p), axis=-1
        )
        done = (
            (progress >= cfg.episode_length)
            | (target_dist > 3.0)
            | (p[:, 2] < 0.1)
            | ~finite
        )
        reward = jnp.where(jnp.isfinite(reward), reward, 0.0)

        mid = QuadState(
            physics=phys, targets=targets, thrusts=thrusts,
            progress=progress, key=key,
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
        return new_state, QuadStepResult(
            obs=obs,
            reward=reward,
            done=done,
            info={"target_dist": jnp.mean(target_dist)},
            teacher_obs=jnp.zeros((B, 0), obs.dtype),
        )


def make_quadcopter(num_envs=256, episode_length=500, **kw) -> QuadcopterEnv:
    return QuadcopterEnv(QuadcopterConfig(
        num_envs=num_envs, episode_length=episode_length, **kw
    ))

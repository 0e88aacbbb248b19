"""FrankaCubeStack (reference tasks/franka_cube_stack.py + yaml).

Fixed-base Franka Panda with gripper stacks cubeA (5 cm) on cubeB (7 cm)
on a table. Default control is Operational Space Control: 6D dpose
actions -> task-space impedance torques (physics/osc.py port of
franka_cube_stack.py:601-627) on the 7 arm dofs via tau_ext, plus a
binary open/close gripper position target. Observations (19): cubeA
pose, cubeA->cubeB, eef pose, gripper q. Staged reward: reach ->
lift -> align -> stack (compute_franka_reward port)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import quat_rotate
from handarm_tpu.physics.contacts import StaticGeom
from handarm_tpu.physics.dynamics import compute_dyn
from handarm_tpu.physics.engine import (
    SimParams,
    build_scene,
    initial_state,
    step as engine_step,
)
from handarm_tpu.physics.kinematics import (
    body_velocities,
    forward_kinematics,
    site_poses,
)
from handarm_tpu.physics.model import compile_urdf
from handarm_tpu.physics.osc import eef_jacobian, osc_torques
from handarm_tpu.physics.shapes import make_box_object, stack_objects
from handarm_tpu.physics.solver import SolverParams
from handarm_tpu.robots.spherefit import make_generic_spheres

FRANKA_URDF = (
    "/root/reference/assets/urdf/franka_description/robots/"
    "franka_panda_gripper.urdf"
)
DEFAULT_DOF = np.array(
    [0, 0.1963, 0, -2.6180, 0, 2.9416, 0.7854, 0.035, 0.035], np.float32
)
CUBE_A, CUBE_B = 0.050, 0.070


@dataclass(frozen=True)
class FrankaCubeStackConfig:
    num_envs: int = 256
    episode_length: int = 300
    dt: float = 1.0 / 60.0
    substeps: int = 2
    action_scale: float = 1.0
    start_position_noise: float = 0.25
    # reward scales (FrankaCubeStack.yaml)
    r_dist_scale: float = 0.1
    r_lift_scale: float = 1.5
    r_align_scale: float = 2.0
    r_stack_scale: float = 16.0
    osc_kp: float = 150.0
    table_height: float = 1.025  # table top (1.0 + 0.05/2)


class FrankaState(NamedTuple):
    physics: object
    progress: jnp.ndarray
    actions: jnp.ndarray
    key: jnp.ndarray


class FrankaStepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict
    teacher_obs: jnp.ndarray


class FrankaCubeStackEnv:
    def __init__(self, cfg: FrankaCubeStackConfig = FrankaCubeStackConfig()):
        self.cfg = cfg
        art = compile_urdf(FRANKA_URDF)
        self.art = art
        nv = art.nv  # 9

        cubeA = make_box_object([CUBE_A / 2] * 3, mass=0.1)
        cubeB = make_box_object([CUBE_B / 2] * 3, mass=0.2)
        shapes = stack_objects([cubeA, cubeB])
        spheres = make_generic_spheres(FRANKA_URDF, art, spheres_per_link=3)
        geom = StaticGeom(
            table_lo=jnp.asarray([-0.6, -0.6]),
            table_hi=jnp.asarray([0.6, 0.6]),
            table_height=jnp.asarray(cfg.table_height),
            friction=jnp.asarray(1.0),
        )
        # arm dofs are TORQUE driven (osc): zero PD; fingers position PD
        kp = np.zeros(nv)
        kd = np.zeros(nv)
        kp[7:] = 800.0
        kd[7:] = 40.0
        self.scene = build_scene(
            art, shapes, spheres, geom,
            kp=kp, kd=kd,
            # franka base on its stand (franka_cube_stack.py:269-271)
            base_pos=(-0.45, 0.0, 1.125),
            params=SimParams(
                dt=cfg.dt, substeps=cfg.substeps,
                solver=SolverParams(iterations=8, rolling_friction=0.002),
                robot_gravity=False,  # reference franka has DOF gravity
                # compensation through PhysX defaults + OSC nullspace
            ),
        )
        self.q_lo = jnp.asarray(art.q_min, jnp.float32)
        self.q_hi = jnp.asarray(art.q_max, jnp.float32)
        self.hand_body = art.sites["panda_hand"].body
        self.grip_site = art.sites["panda_grip_site"]
        self.lf_site = art.sites["panda_leftfinger_tip"]
        self.rf_site = art.sites["panda_rightfinger_tip"]
        self.arm_mask = jnp.asarray([1.0] * 7 + [0.0] * 2)
        self.default_q = jnp.asarray(DEFAULT_DOF)
        # cmd limits (franka_cube_stack.py:160)
        self.cmd_limit = jnp.asarray([0.1, 0.1, 0.1, 0.5, 0.5, 0.5])

        self.num_actions = 7  # 6 dpose + 1 gripper
        self.num_obs = 19
        self.num_teacher_obs = 0
        self.obs_slices = {"obs": (0, self.num_obs)}

    # -- helpers ----------------------------------------------------------

    def _eef(self, phys):
        m = self.scene.model
        B0 = phys.robot.q.shape[0]
        fk = forward_kinematics(
            m, phys.robot.q,
            jnp.broadcast_to(self.scene.base_quat, (B0, 4)),
            jnp.broadcast_to(self.scene.base_pos, (B0, 3)),
        )
        B = phys.robot.q.shape[0]
        bq = jnp.broadcast_to(self.scene.base_quat, (B, 4))
        bp = jnp.broadcast_to(self.scene.base_pos, (B, 3))
        gq, gp = site_poses(
            fk, np.array([self.grip_site.body]),
            jnp.asarray(self.grip_site.pos)[None],
            jnp.asarray(self.grip_site.quat)[None],
            base_quat=bq, base_pos=bp,
        )
        bv = body_velocities(m, fk, phys.robot.qd)
        w = bv[:, self.hand_body, :3]
        v = bv[:, self.hand_body, 3:] + jnp.cross(w, gp[:, 0])
        _, lf = site_poses(
            fk, np.array([self.lf_site.body]),
            jnp.asarray(self.lf_site.pos)[None],
            jnp.asarray(self.lf_site.quat)[None],
            base_quat=bq, base_pos=bp,
        )
        _, rf = site_poses(
            fk, np.array([self.rf_site.body]),
            jnp.asarray(self.rf_site.pos)[None],
            jnp.asarray(self.rf_site.quat)[None],
            base_quat=bq, base_pos=bp,
        )
        return fk, gp[:, 0], gq[:, 0], jnp.concatenate([v, w], -1), lf[:, 0], rf[:, 0]

    def _fresh(self, key, B) -> FrankaState:
        cfg = self.cfg
        kA, kB, kq, k_next = jax.random.split(key, 4)
        phys = initial_state(self.scene, B, q0=self.default_q[None])
        # cubes on the table around the center with xy noise; B center-ish,
        # A offset (reference _reset_init_cube_state simplified: resample
        # until no overlap is replaced by disjoint halves + noise)
        nA = cfg.start_position_noise * jax.random.uniform(
            kA, (B, 2), minval=-1.0, maxval=1.0
        )
        nB = cfg.start_position_noise * 0.5 * jax.random.uniform(
            kB, (B, 2), minval=-1.0, maxval=1.0
        )
        posA = jnp.concatenate(
            [nA + jnp.asarray([0.1, 0.15])[None],
             jnp.full((B, 1), cfg.table_height + CUBE_A / 2)], -1,
        )
        posB = jnp.concatenate(
            [nB + jnp.asarray([0.1, -0.15])[None],
             jnp.full((B, 1), cfg.table_height + CUBE_B / 2)], -1,
        )
        obj = phys.objects._replace(
            pos=jnp.stack([posA, posB], axis=1)
        )
        phys = phys._replace(objects=obj)
        return FrankaState(
            physics=phys,
            progress=jnp.zeros(B, jnp.int32),
            actions=jnp.zeros((B, self.num_actions)),
            key=k_next,
        )

    def reset(self, key):
        s = self._fresh(key, self.cfg.num_envs)
        return s, self._obs(s)

    def _obs(self, s: FrankaState):
        phys = s.physics
        _, eef_p, eef_q, _, _, _ = self._eef(phys)
        pA = phys.objects.pos[:, 0]
        qA = phys.objects.quat[:, 0]
        pB = phys.objects.pos[:, 1]
        return jnp.concatenate(
            [qA, pA, pB - pA, eef_p, eef_q, phys.robot.q[:, 7:]], axis=-1
        )

    def step(self, state: FrankaState, actions):
        cfg = self.cfg
        B = actions.shape[0]
        actions = jnp.clip(actions, -1.0, 1.0)
        key, k_reset = jax.random.split(state.key)

        phys = state.physics
        fk, eef_p, eef_q, eef_v, _, _ = self._eef(phys)
        dpose = actions[:, :6] * self.cmd_limit[None] / cfg.action_scale
        dyn = compute_dyn(
            self.scene.model, fk, phys.robot.qd,
            jnp.zeros(3), self.scene.kp, self.scene.kd, cfg.dt / cfg.substeps,
        )
        J = eef_jacobian(self.scene.model, fk, self.hand_body, eef_p)
        J = J * self.arm_mask[None, None, :]
        tau_arm = osc_torques(
            dyn.Minv, J, dpose, eef_v,
            phys.robot.q, phys.robot.qd, self.default_q,
            kp=cfg.osc_kp, arm_mask=self.arm_mask,
        )
        tau_arm = jnp.clip(
            tau_arm * self.arm_mask[None],
            -jnp.asarray(self.art.effort_limit)[None],
            jnp.asarray(self.art.effort_limit)[None],
        )
        # gripper: binary open/close position targets
        grip_open = actions[:, 6] >= 0.0
        finger_t = jnp.where(grip_open[:, None], self.q_hi[None, 7:], self.q_lo[None, 7:])
        targets = phys.robot.targets.at[:, 7:].set(finger_t)
        phys = phys._replace(
            robot=phys.robot._replace(targets=targets, tau_ext=tau_arm)
        )
        phys, info = engine_step(self.scene, phys)
        phys = phys._replace(robot=phys.robot._replace(tau_ext=None))

        progress = state.progress + 1
        _, eef_p, eef_q, _, lf, rf = self._eef(phys)
        pA, pB = phys.objects.pos[:, 0], phys.objects.pos[:, 1]

        # staged reward (compute_franka_reward)
        d = jnp.linalg.norm(pA - eef_p, axis=-1)
        d_lf = jnp.linalg.norm(pA - lf, axis=-1)
        d_rf = jnp.linalg.norm(pA - rf, axis=-1)
        dist_reward = 1.0 - jnp.tanh(10.0 * (d + d_lf + d_rf) / 3.0)
        heightA = pA[:, 2] - cfg.table_height
        lifted = (heightA - CUBE_A) > 0.04
        offset = jnp.asarray([0.0, 0.0, (CUBE_A + CUBE_B) / 2])
        d_ab = jnp.linalg.norm(pB - pA + offset[None], axis=-1)
        align_reward = (1.0 - jnp.tanh(10.0 * d_ab)) * lifted
        dist_reward = jnp.maximum(dist_reward, align_reward)
        # stack: aligned above cubeB, near target height, gripper away
        target_h = CUBE_B + CUBE_A / 2
        cubeA_on_cubeB = (
            (jnp.linalg.norm((pB - pA)[:, :2], axis=-1) < 0.02)
            & (jnp.abs(heightA - target_h) < 0.02)
        )
        gripper_away = d > 0.04
        stacked = cubeA_on_cubeB & gripper_away
        reward = jnp.where(
            stacked,
            cfg.r_stack_scale * stacked.astype(jnp.float32),
            cfg.r_dist_scale * dist_reward
            + cfg.r_lift_scale * lifted
            + cfg.r_align_scale * align_reward,
        )

        finite = jnp.all(jnp.isfinite(phys.robot.q), axis=-1) & jnp.all(
            jnp.isfinite(pA), axis=-1
        )
        done = (progress >= cfg.episode_length) | stacked | ~finite
        reward = jnp.where(jnp.isfinite(reward), reward, 0.0)

        mid = FrankaState(
            physics=phys, progress=progress, actions=actions, key=key
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
        return new_state, FrankaStepResult(
            obs=obs,
            reward=reward,
            done=done,
            info={"stacked_frac": jnp.mean(stacked.astype(jnp.float32))},
            teacher_obs=jnp.zeros((B, 0), obs.dtype),
        )


def make_franka_cube_stack(num_envs=256, episode_length=300, **kw):
    return FrankaCubeStackEnv(FrankaCubeStackConfig(
        num_envs=num_envs, episode_length=episode_length, **kw
    ))

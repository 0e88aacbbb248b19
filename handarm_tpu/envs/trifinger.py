"""Trifinger cube-repositioning task (reference tasks/trifinger.py +
cfg/task/Trifinger.yaml).

Three 3-dof fingers around a 6.5 cm cube on a bounded table; torque
command mode (actions scaled to +/-0.36 Nm with safety damping), goal
poses sampled in the arena, keypoint-based logistic-kernel reward with a
finger-reach delta term and movement penalty."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import quat_from_axis_angle, quat_rotate
from handarm_tpu.physics.contacts import StaticGeom
from handarm_tpu.physics.engine import (
    SimParams,
    build_scene,
    initial_state,
    step as engine_step,
)
from handarm_tpu.physics.kinematics import forward_kinematics, site_poses
from handarm_tpu.physics.model import compile_urdf
from handarm_tpu.physics.shapes import make_box_object, stack_objects
from handarm_tpu.physics.solver import SolverParams
from handarm_tpu.robots.spherefit import make_generic_spheres

TRIFINGER_URDF = (
    "/root/reference/assets/trifinger/robot_properties_fingers/urdf/pro/"
    "trifingerpro.urdf"
)
CUBE = 0.065
DEFAULT_Q = np.array([0.0, 0.9, -2.0] * 3, np.float32)
MAX_TORQUE = 0.36
ARENA_R = 0.195


def _lgsk(x, scale=30.0, eps=2.0):
    """Logistic kernel (reference trifinger.py lgsk_kernel)."""
    s = x * scale
    return 1.0 / (jnp.exp(s) + eps + jnp.exp(-s))


def gen_keypoints(pos, quat, size=CUBE):
    """8 cube-corner keypoints in world frame (trifinger.py:1278-1290)."""
    corners = (
        jnp.asarray(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            jnp.float32,
        )
        * size / 2.0
    )  # [8, 3]
    B = pos.shape[0]
    c = jnp.broadcast_to(corners[None], (B, 8, 3))
    return pos[:, None] + quat_rotate(quat[:, None], c)


@dataclass(frozen=True)
class TrifingerConfig:
    num_envs: int = 256
    episode_length: int = 750
    dt: float = 1.0 / 60.0
    substeps: int = 2
    # reward weights (Trifinger.yaml reward_terms)
    finger_move_penalty: float = -0.05
    finger_reach_weight: float = -250.0
    object_dist_weight: float = 2000.0
    safety_damping: float = 0.1


class TrifingerState(NamedTuple):
    physics: object
    progress: jnp.ndarray
    goal_pos: jnp.ndarray
    goal_quat: jnp.ndarray
    actions: jnp.ndarray
    prev_tips: jnp.ndarray  # [B, 3, 3]
    prev_obj: jnp.ndarray  # [B, 3]
    key: jnp.ndarray


class TrifingerStepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict
    teacher_obs: jnp.ndarray


class TrifingerEnv:
    def __init__(self, cfg: TrifingerConfig = TrifingerConfig()):
        self.cfg = cfg
        art = compile_urdf(TRIFINGER_URDF)
        self.art = art
        nv = art.nv  # 9

        cube = make_box_object([CUBE / 2] * 3, mass=0.094)
        shapes = stack_objects([cube])
        spheres = make_generic_spheres(TRIFINGER_URDF, art, spheres_per_link=2)
        # arena: table at z=0 with 4 boundary walls approximating the
        # circular high_table_boundary at +/-ARENA_R
        walls, whi = [], []
        t, zh = 0.01, 0.15
        for lo, hi in (
            ((-ARENA_R - t, -ARENA_R - t, 0.0), (-ARENA_R, ARENA_R + t, zh)),
            ((ARENA_R, -ARENA_R - t, 0.0), (ARENA_R + t, ARENA_R + t, zh)),
            ((-ARENA_R - t, -ARENA_R - t, 0.0), (ARENA_R + t, -ARENA_R, zh)),
            ((-ARENA_R - t, ARENA_R, 0.0), (ARENA_R + t, ARENA_R + t, zh)),
        ):
            walls.append(lo)
            whi.append(hi)
        geom = StaticGeom(
            table_lo=jnp.asarray([-10.0, -10.0]),
            table_hi=jnp.asarray([10.0, 10.0]),
            table_height=jnp.asarray(0.0),
            friction=jnp.asarray(1.0),
            wall_lo=np.asarray(walls, np.float32),
            wall_hi=np.asarray(whi, np.float32),
        )
        # torque mode: zero PD (tau_ext carries the command)
        self.scene = build_scene(
            art, shapes, spheres, geom,
            kp=np.zeros(nv), kd=np.zeros(nv),
            # the URDF already mounts the finger bases at height
            params=SimParams(
                dt=cfg.dt, substeps=cfg.substeps,
                solver=SolverParams(iterations=8, rolling_friction=0.002),
                robot_gravity=False,
            ),
        )
        self.tip_sites = [
            art.sites[f"finger_tip_link_{i}"] for i in (0, 120, 240)
        ]
        self.q_default = jnp.asarray(DEFAULT_Q)
        self.num_actions = nv
        self.num_obs = 9 + 9 + 7 + 7 + 9  # 41
        self.num_teacher_obs = 0
        self.obs_slices = {"obs": (0, self.num_obs)}

    def _tips(self, phys):
        B = phys.robot.q.shape[0]
        bq = jnp.broadcast_to(self.scene.base_quat, (B, 4))
        bp = jnp.broadcast_to(self.scene.base_pos, (B, 3))
        fk = forward_kinematics(self.scene.model, phys.robot.q, bq, bp)
        bodies = np.array([s.body for s in self.tip_sites])
        pos = jnp.stack([jnp.asarray(s.pos) for s in self.tip_sites])
        quat = jnp.stack([jnp.asarray(s.quat) for s in self.tip_sites])
        _, tp = site_poses(fk, bodies, pos, quat, base_quat=bq, base_pos=bp)
        return tp  # [B, 3, 3]

    def _sample_goal(self, key, B):
        kp_, kq = jax.random.split(key)
        u = jax.random.uniform(kp_, (B, 3))
        r = 0.11 * jnp.sqrt(u[:, 0])
        th = 2 * np.pi * u[:, 1]
        pos = jnp.stack(
            [r * jnp.cos(th), r * jnp.sin(th), CUBE / 2 + u[:, 2] * 0.2], -1
        )
        yaw = jax.random.uniform(kq, (B,), minval=-np.pi, maxval=np.pi)
        quat = quat_from_axis_angle(
            jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (B, 3)), yaw
        )
        return pos, quat

    def _fresh(self, key, B) -> TrifingerState:
        k_obj, k_goal, k_next = jax.random.split(key, 3)
        u = jax.random.uniform(k_obj, (B, 2))
        r = 0.11 * jnp.sqrt(u[:, 0])
        th = 2 * np.pi * u[:, 1]
        opos = jnp.stack([r * jnp.cos(th), r * jnp.sin(th),
                          jnp.full((B,), CUBE / 2)], -1)
        phys = initial_state(
            self.scene, B,
            q0=self.q_default[None],
            obj_pos0=opos[:, None],
        )
        gp, gq = self._sample_goal(k_goal, B)
        tips = self._tips(phys)
        return TrifingerState(
            physics=phys,
            progress=jnp.zeros(B, jnp.int32),
            goal_pos=gp,
            goal_quat=gq,
            actions=jnp.zeros((B, self.num_actions)),
            prev_tips=tips,
            prev_obj=opos,
            key=k_next,
        )

    def reset(self, key):
        s = self._fresh(key, self.cfg.num_envs)
        return s, self._obs(s)

    def _obs(self, s: TrifingerState):
        phys = s.physics
        opos, oquat = phys.objects.pos[:, 0], phys.objects.quat[:, 0]
        return jnp.concatenate(
            [
                phys.robot.q,
                phys.robot.qd * 0.1,
                opos, oquat,
                s.goal_pos, s.goal_quat,
                s.actions,
            ],
            axis=-1,
        )

    def step(self, state: TrifingerState, actions):
        cfg = self.cfg
        B = actions.shape[0]
        actions = jnp.clip(actions, -1.0, 1.0)
        key, k_reset = jax.random.split(state.key)

        # torque command + safety damping (trifinger.py:1014-1037)
        tau = MAX_TORQUE * actions - cfg.safety_damping * state.physics.robot.qd
        tau = jnp.clip(tau, -MAX_TORQUE, MAX_TORQUE)
        phys = state.physics._replace(
            robot=state.physics.robot._replace(tau_ext=tau)
        )
        phys, info = engine_step(self.scene, phys)
        phys = phys._replace(robot=phys.robot._replace(tau_ext=None))

        progress = state.progress + 1
        opos, oquat = phys.objects.pos[:, 0], phys.objects.quat[:, 0]
        tips = self._tips(phys)

        # reward (compute_trifinger_reward, keypoint variant)
        tip_vel = (tips - state.prev_tips) / cfg.dt
        move_pen = cfg.finger_move_penalty * jnp.sum(
            tip_vel**2, axis=(-1, -2)
        )
        curr_n = jnp.linalg.norm(tips - opos[:, None], axis=-1)
        prev_n = jnp.linalg.norm(
            state.prev_tips - state.prev_obj[:, None], axis=-1
        )
        reach = cfg.finger_reach_weight * jnp.sum(curr_n - prev_n, axis=-1)
        kp_obj = gen_keypoints(opos, oquat)
        kp_goal = gen_keypoints(state.goal_pos, state.goal_quat)
        d = jnp.linalg.norm(kp_obj - kp_goal, axis=-1)  # [B, 8]
        pose_reward = cfg.object_dist_weight * cfg.dt * jnp.mean(
            _lgsk(d, 30.0, 2.0), axis=-1
        )
        reward = move_pen + reach + pose_reward

        finite = jnp.all(jnp.isfinite(opos), axis=-1) & jnp.all(
            jnp.isfinite(phys.robot.q), axis=-1
        )
        done = (progress >= cfg.episode_length) | ~finite
        reward = jnp.where(jnp.isfinite(reward), reward, 0.0)

        mid = TrifingerState(
            physics=phys, progress=progress, goal_pos=state.goal_pos,
            goal_quat=state.goal_quat, actions=actions,
            prev_tips=tips, prev_obj=opos, key=key,
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
        kp_dist = jnp.mean(d, axis=-1)
        return new_state, TrifingerStepResult(
            obs=obs,
            reward=reward,
            done=done,
            info={"keypoint_dist": jnp.mean(kp_dist)},
            teacher_obs=jnp.zeros((B, 0), obs.dtype),
        )


def make_trifinger(num_envs=256, episode_length=750, **kw) -> TrifingerEnv:
    return TrifingerEnv(TrifingerConfig(
        num_envs=num_envs, episode_length=episode_length, **kw
    ))

"""FrankaCabinet (reference tasks/franka_cabinet.py + FrankaCabinet.yaml).

Fixed-base Franka Panda opens the top drawer of a sektion cabinet.
TPU-native scene: the drawer is a single rigid body (compound-box SDF:
tub + front panel + handle posts + handle bar, replacing the reference's
7 convex-decomposition hulls) constrained to a prismatic rail
(engine.RailSpec, replacing the cabinet's drawer_top_joint,
assets/.../sektion_cabinet_2.urdf:439-446: axis +x, limits [0, 0.4],
damping). The cabinet shell is static wall AABBs.

Parity with the reference:
- actions (9): joint position-target deltas, targets += speed_scales *
  dt * action * actionScale (franka_cabinet.py:424-428; speed scale 1.0
  arm / 0.1 fingers, actionScale 7.5).
- observations (23): dof_pos scaled to [-1,1], dof_vel * 0.1,
  to_target (drawer grasp - franka grasp), drawer joint pos + vel
  (franka_cabinet.py:380-385).
- reward: compute_franka_reward (franka_cabinet.py:489-555) — squared
  inverse-distance, signed-square axis alignment, around-handle bonus,
  finger distance, open reward, action penalty, open bonuses at
  0.01/0.2/0.39, style penalty behind the handle plane.
- reset: drawer closed, franka dofs = default + U(-0.125, 0.125)
  (franka_cabinet.py:390-395); done when drawer > 0.39 or timeout.

numProps (clutter boxes inside the drawer) defaults to 0 here — the
reference's 16 props affect neither obs nor reward, only PhysX load.
Set num_props > 0 to add them as free boxes riding in the drawer.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import quat_rotate
from handarm_tpu.physics.contacts import StaticGeom
from handarm_tpu.physics.engine import (
    RailSpec,
    SimParams,
    build_scene,
    initial_state,
    step as engine_step,
)
from handarm_tpu.physics.kinematics import forward_kinematics, site_poses
from handarm_tpu.physics.model import compile_urdf
from handarm_tpu.physics.shapes import (
    make_box_object,
    make_compound_box_object,
    stack_objects,
)
from handarm_tpu.physics.solver import SolverParams
from handarm_tpu.robots.spherefit import make_generic_spheres

FRANKA_URDF = (
    "/root/reference/assets/urdf/franka_description/robots/"
    "franka_panda_gripper.urdf"
)
# franka_cabinet.py:92
DEFAULT_DOF = np.array(
    [1.157, -1.066, -0.155, -2.239, -1.841, 1.003, 0.469, 0.035, 0.035],
    np.float32,
)
# cabinet at (0, 0, 0.4), drawer_top joint origin (0.0515, 0, 0.3172)
DRAWER_JOINT_WORLD = np.array([0.0515, 0.0, 0.7172])
DRAWER_TRAVEL = 0.4
# drawer compound geometry, joint-child ("drawer") frame: tub slab behind
# a front panel carrying two posts + a graspable bar (handle grasp point
# (0.3, 0, 0.01) drawer-frame, franka_cabinet.py:326)
DRAWER_PARTS = [
    ((0.00, 0.0, -0.040), (0.250, 0.200, 0.055)),  # tub slab
    ((0.285, 0.0, 0.000), (0.015, 0.210, 0.085)),  # front panel
    ((0.315, 0.060, 0.010), (0.018, 0.010, 0.010)),  # post R
    ((0.315, -0.060, 0.010), (0.018, 0.010, 0.010)),  # post L
    ((0.340, 0.0, 0.010), (0.010, 0.085, 0.012)),  # handle bar
]
HANDLE_GRASP_D = np.array([0.33, 0.0, 0.01])  # grasp point, drawer frame
DRAWER_MASS = 5.0


@dataclass(frozen=True)
class FrankaCabinetConfig:
    num_envs: int = 256
    episode_length: int = 500
    dt: float = 1.0 / 60.0
    substeps: int = 2
    num_props: int = 0
    action_scale: float = 7.5
    dof_vel_scale: float = 0.1
    start_position_noise: float = 0.25  # franka dof reset noise magnitude
    # reward scales (FrankaCabinet.yaml:24-29)
    dist_reward_scale: float = 2.0
    rot_reward_scale: float = 0.5
    around_handle_reward_scale: float = 0.25
    open_reward_scale: float = 7.5
    finger_dist_reward_scale: float = 5.0
    action_penalty_scale: float = 0.01
    dist_x_offset: float = 0.04
    open_target: float = 0.39


class CabinetState(NamedTuple):
    physics: object
    targets: jnp.ndarray  # [B, 9] persistent franka dof targets
    progress: jnp.ndarray
    actions: jnp.ndarray
    key: jnp.ndarray


class CabinetStepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict
    teacher_obs: jnp.ndarray


def _drawer_record():
    """Compound drawer re-centered on its com; returns (record, com)."""
    rec = make_compound_box_object(DRAWER_PARTS, mass=DRAWER_MASS)
    # shift body frame onto the com (engine requirement): recompute with
    # shifted parts using the same uniform-density com
    vols = np.array([8.0 * np.prod(h) for _, h in DRAWER_PARTS])
    centers = np.array([c for c, _ in DRAWER_PARTS])
    com = (vols[:, None] * centers).sum(0) / vols.sum()
    parts = [(np.asarray(c) - com, h) for c, h in DRAWER_PARTS]
    return make_compound_box_object(parts, mass=DRAWER_MASS), com


class FrankaCabinetEnv:
    def __init__(self, cfg: FrankaCabinetConfig = FrankaCabinetConfig()):
        self.cfg = cfg
        art = compile_urdf(FRANKA_URDF)
        self.art = art
        nv = art.nv  # 9

        drawer, com_d = _drawer_record()
        self.com_d = com_d
        objs = [drawer]
        for _ in range(cfg.num_props):
            objs.append(make_box_object([0.04, 0.04, 0.04], mass=0.08))
        shapes = stack_objects(objs)
        K = len(objs)

        # drawer rail: slides +x from the closed pose
        self.drawer_closed_pos = DRAWER_JOINT_WORLD + com_d
        axis = np.zeros((K, 3), np.float32)
        axis[0] = [1.0, 0.0, 0.0]
        origin = np.zeros((K, 3), np.float32)
        origin[0] = self.drawer_closed_pos
        mask = np.zeros(K, np.float32)
        mask[0] = 1.0
        rails = RailSpec(
            axis=jnp.asarray(axis),
            origin=jnp.asarray(origin),
            quat=jnp.asarray(
                np.tile(np.array([1.0, 0, 0, 0], np.float32), (K, 1))
            ),
            lo=jnp.zeros(K),
            hi=jnp.asarray(np.where(mask > 0, DRAWER_TRAVEL, 0.0).astype(np.float32)),
            # cabinet_dof_props damping = 10 (franka_cabinet.py:202) on a
            # 5 kg drawer -> 2.0 1/s decay
            damping=jnp.full((K,), 2.0),
            mask=jnp.asarray(mask),
        )

        # cabinet shell: side panels, top panel above the drawer opening,
        # lower front face below it (static AABBs; reference loads the
        # sektion shell as a fixed-base articulation link)
        z_top = DRAWER_JOINT_WORLD[2] + 0.095
        z_bot = DRAWER_JOINT_WORLD[2] - 0.095
        wall_lo = np.array(
            [
                [-0.35, 0.215, 0.05],
                [-0.35, -0.265, 0.05],
                [-0.35, -0.265, z_top + 0.005],
                [0.30, -0.265, 0.05],
            ],
            np.float32,
        )
        wall_hi = np.array(
            [
                [0.33, 0.265, 1.20],
                [0.33, -0.215, 1.20],
                [0.33, 0.265, z_top + 0.055],
                [0.345, 0.265, z_bot - 0.005],
            ],
            np.float32,
        )
        geom = StaticGeom(
            table_lo=jnp.asarray([-200.0, -200.0]),
            table_hi=jnp.asarray([-199.0, -199.0]),
            table_height=jnp.asarray(0.0),
            friction=jnp.asarray(0.6),
            wall_lo=wall_lo,
            wall_hi=wall_hi,
        )
        spheres = make_generic_spheres(FRANKA_URDF, art, spheres_per_link=3)
        kp = np.full(nv, 400.0)
        kd = np.full(nv, 80.0)
        kp[7:] = 7000.0  # franka_cabinet.py:186
        kd[7:] = 50.0
        self.scene = build_scene(
            art, shapes, spheres, geom,
            kp=kp, kd=kd,
            # franka at (1, 0, 0) facing the cabinet (yaw pi),
            # franka_cabinet.py:209-211
            base_pos=(1.0, 0.0, 0.0),
            base_quat=(0.0, 0.0, 0.0, 1.0),
            params=SimParams(
                dt=cfg.dt, substeps=cfg.substeps,
                solver=SolverParams(iterations=8),
                robot_gravity=False,
            ),
            rails=rails,
        )
        self.q_lo = jnp.asarray(art.q_min, jnp.float32)
        self.q_hi = jnp.asarray(art.q_max, jnp.float32)
        self.grip_site = art.sites["panda_grip_site"]
        self.lf_site = art.sites["panda_leftfinger_tip"]
        self.rf_site = art.sites["panda_rightfinger_tip"]
        self.hand_body = art.sites["panda_hand"].body
        # dof speed scales: 1 arm, 0.1 fingers (franka_cabinet.py:194-195)
        self.speed_scales = jnp.asarray([1.0] * 7 + [0.1, 0.1])
        self.default_q = jnp.asarray(DEFAULT_DOF)
        self.num_actions = 9
        self.num_obs = 23
        self.num_teacher_obs = 0
        self.obs_slices = {"obs": (0, self.num_obs)}

    # -- helpers ---------------------------------------------------------

    def _hand(self, phys):
        m = self.scene.model
        B = phys.robot.q.shape[0]
        bq = jnp.broadcast_to(self.scene.base_quat, (B, 4))
        bp = jnp.broadcast_to(self.scene.base_pos, (B, 3))
        fk = forward_kinematics(m, phys.robot.q, bq, bp)
        bodies = np.array(
            [self.grip_site.body, self.lf_site.body, self.rf_site.body]
        )
        pos = jnp.stack(
            [
                jnp.asarray(self.grip_site.pos),
                jnp.asarray(self.lf_site.pos),
                jnp.asarray(self.rf_site.pos),
            ]
        )
        quat = jnp.stack(
            [
                jnp.asarray(self.grip_site.quat),
                jnp.asarray(self.lf_site.quat),
                jnp.asarray(self.rf_site.quat),
            ]
        )
        sq, sp = site_poses(fk, bodies, pos, quat, base_quat=bq, base_pos=bp)
        return sq[:, 0], sp[:, 0], sp[:, 1], sp[:, 2]

    def _drawer_s(self, phys):
        return phys.objects.pos[:, 0, 0] - self.drawer_closed_pos[0]

    def _fresh(self, key, B) -> CabinetState:
        cfg = self.cfg
        kq, k_next = jax.random.split(key)
        q0 = jnp.clip(
            self.default_q[None]
            + cfg.start_position_noise
            * (jax.random.uniform(kq, (B, 9)) - 0.5),
            self.q_lo[None],
            self.q_hi[None],
        )
        phys = initial_state(self.scene, B, q0=q0)
        opos = phys.objects.pos
        opos = opos.at[:, 0].set(jnp.asarray(self.drawer_closed_pos))
        if cfg.num_props:
            # props rest inside the drawer tub in a grid
            n = cfg.num_props
            gx = jnp.arange(n) % 4
            gy = jnp.arange(n) // 4
            px = self.drawer_closed_pos[0] - 0.15 + 0.09 * gx
            py = -0.14 + 0.09 * gy
            pz = jnp.full((n,), DRAWER_JOINT_WORLD[2] + 0.065)
            opos = opos.at[:, 1:].set(
                jnp.stack([px, py, pz], -1)[None].repeat(B, 0)
            )
        phys = phys._replace(
            objects=phys.objects._replace(pos=opos),
            robot=phys.robot._replace(targets=q0),
        )
        return CabinetState(
            physics=phys,
            targets=q0,
            progress=jnp.zeros(B, jnp.int32),
            actions=jnp.zeros((B, self.num_actions)),
            key=k_next,
        )

    def reset(self, key):
        s = self._fresh(key, self.cfg.num_envs)
        return s, self._obs(s)

    def _obs(self, s: CabinetState):
        phys = s.physics
        cfg = self.cfg
        _, grip_p, _, _ = self._hand(phys)
        drawer_grasp = (
            phys.objects.pos[:, 0]
            + (jnp.asarray(HANDLE_GRASP_D) - jnp.asarray(self.com_d))[None]
        )
        q, qd = phys.robot.q, phys.robot.qd
        dof_scaled = 2.0 * (q - self.q_lo[None]) / (
            self.q_hi[None] - self.q_lo[None]
        ) - 1.0
        s_draw = self._drawer_s(phys)
        ds_draw = phys.objects.linvel[:, 0, 0]
        return jnp.concatenate(
            [
                dof_scaled,
                qd * cfg.dof_vel_scale,
                drawer_grasp - grip_p,
                s_draw[:, None],
                ds_draw[:, None],
            ],
            axis=-1,
        )

    def step(self, state: CabinetState, actions):
        cfg = self.cfg
        B = actions.shape[0]
        actions = jnp.clip(actions, -1.0, 1.0)
        key, k_reset = jax.random.split(state.key)

        targets = jnp.clip(
            state.targets
            + self.speed_scales[None] * cfg.dt * actions * cfg.action_scale,
            self.q_lo[None],
            self.q_hi[None],
        )
        phys = state.physics
        phys = phys._replace(robot=phys.robot._replace(targets=targets))
        phys, _ = engine_step(self.scene, phys)

        progress = state.progress + 1
        grip_q, grip_p, lf, rf = self._hand(phys)
        drawer_grasp = (
            phys.objects.pos[:, 0]
            + (jnp.asarray(HANDLE_GRASP_D) - jnp.asarray(self.com_d))[None]
        )
        s_draw = self._drawer_s(phys)

        # compute_franka_reward (franka_cabinet.py:489-555)
        d = jnp.linalg.norm(grip_p - drawer_grasp, axis=-1)
        dist_reward = 1.0 / (1.0 + d**2)
        dist_reward = dist_reward * dist_reward
        dist_reward = jnp.where(d <= 0.02, dist_reward * 2.0, dist_reward)

        fwd = quat_rotate(grip_q, jnp.asarray([0.0, 0.0, 1.0])[None])
        up = quat_rotate(grip_q, jnp.asarray([0.0, 1.0, 0.0])[None])
        dot1 = -fwd[:, 0]  # drawer inward axis is world -x
        dot2 = up[:, 2]  # drawer up axis is world +z
        rot_reward = 0.5 * (
            jnp.sign(dot1) * dot1**2 + jnp.sign(dot2) * dot2**2
        )

        around = (lf[:, 2] > drawer_grasp[:, 2]) & (
            rf[:, 2] < drawer_grasp[:, 2]
        )
        around_handle_reward = 0.5 * around.astype(jnp.float32)
        lf_d = jnp.abs(lf[:, 2] - drawer_grasp[:, 2])
        rf_d = jnp.abs(rf[:, 2] - drawer_grasp[:, 2])
        finger_dist_reward = jnp.where(
            around, (0.04 - lf_d) + (0.04 - rf_d), 0.0
        )
        action_penalty = jnp.sum(actions**2, axis=-1)
        open_reward = s_draw * around_handle_reward + s_draw

        reward = (
            cfg.dist_reward_scale * dist_reward
            + cfg.rot_reward_scale * rot_reward
            + cfg.around_handle_reward_scale * around_handle_reward
            + cfg.open_reward_scale * open_reward
            + cfg.finger_dist_reward_scale * finger_dist_reward
            - cfg.action_penalty_scale * action_penalty
        )
        reward = jnp.where(s_draw > 0.01, reward + 0.5, reward)
        reward = jnp.where(
            s_draw > 0.2, reward + around_handle_reward, reward
        )
        opened = s_draw > cfg.open_target
        reward = jnp.where(opened, reward + 2.0 * around_handle_reward, reward)
        # style: fingers must stay in front of the handle plane
        bad = (lf[:, 0] < drawer_grasp[:, 0] - cfg.dist_x_offset) | (
            rf[:, 0] < drawer_grasp[:, 0] - cfg.dist_x_offset
        )
        reward = jnp.where(bad, -1.0, reward)

        finite = jnp.all(jnp.isfinite(phys.robot.q), axis=-1)
        done = opened | (progress >= cfg.episode_length) | ~finite
        reward = jnp.where(jnp.isfinite(reward), reward, 0.0)

        mid = CabinetState(
            physics=phys, targets=targets, progress=progress,
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
        return new_state, CabinetStepResult(
            obs=obs,
            reward=reward,
            done=done,
            info={
                "drawer_pos_mean": jnp.mean(s_draw),
                "opened_frac": jnp.mean(opened.astype(jnp.float32)),
            },
            teacher_obs=jnp.zeros((B, 0), obs.dtype),
        )


def make_franka_cabinet(num_envs=256, episode_length=500, **kw):
    return FrankaCabinetEnv(FrankaCabinetConfig(
        num_envs=num_envs, episode_length=episode_length, **kw
    ))

"""Factory nut-bolt tasks (reference tasks/factory/: factory_env_nut_bolt.py,
factory_task_nut_bolt_{pick,place,screw}.py, factory_control.py).

Franka + M16 nut and bolt (the reference's own meshes, baked to voxel
SDFs — its `<sdf resolution="256"/>` PhysX collision becomes our
point-vs-SDF narrowphase). Control is task-space impedance on the
fingertip midpoint (factory_control.py `compute_dof_torque` with the
task_space_impedance gains from FactoryControl*.yaml), 12 actions
(delta pose 6 + force 6; force half unused, matching the reference's
default do_force_ctrl=False).

Variants (cfg.task):
- "pick": reach the nut-grasp frame; keypoint reward between gripper and
  nut-grasp keypoint lines; success = nut lifted 3 bolt-head-heights
  (factory_task_nut_bolt_pick.py:187-204; the reference's scripted
  close-and-lift epilogue is replaced by a latched in-episode lift check
  so the whole episode stays one jitted program).
- "place": carry the (re-grasped) nut to the bolt tip; keypoint reward
  nut vs bolt-top frame.
- "screw": the nut rides a cylindrical joint on the bolt (engine
  RailSpec.spin); yaw rotation advances it down the thread via the M16
  pitch (2 mm/turn), the env couples theta -> axial travel. Success =
  nut reaches the thread bottom (factory_task_nut_bolt_screw.py).
- "gears": FactoryEnvGears scene — gear base + small/medium gears, 3
  bodies (factory_env_gears.py; the large gear's mesh is absent from the
  reference asset tree). The reference FactoryTaskGears reward is a
  scaffold (factory_task_gears.py:119-125 `_update_rew_buf: pass`), so
  this variant is scene/control/obs parity with zero task reward.
- "insertion": FactoryEnvInsertion scene — round 8 mm peg + hole from the
  desired_subassemblies list (factory_env_insertion.py,
  FactoryEnvInsertion.yaml:14). Reward likewise a reference scaffold.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import quat_mul, quat_rotate
from handarm_tpu.physics.contacts import StaticGeom
from handarm_tpu.physics.engine import (
    RailSpec,
    SimParams,
    build_scene,
    initial_state,
    step as engine_step,
)
from handarm_tpu.physics.dynamics import compute_dyn
from handarm_tpu.physics.kinematics import (
    body_velocities,
    forward_kinematics,
    site_poses,
)
from handarm_tpu.physics.model import compile_urdf
from handarm_tpu.physics.osc import eef_jacobian, osc_torques
from handarm_tpu.physics.shapes import stack_objects
from handarm_tpu.physics.solver import SolverParams
from handarm_tpu.robots.spherefit import make_generic_spheres

FRANKA_URDF = (
    "/root/reference/assets/urdf/franka_description/robots/"
    "franka_panda_gripper.urdf"
)
FACTORY_URDF_DIR = "/root/reference/assets/factory/urdf"
TABLE_HEIGHT = 0.4  # FactoryBase.yaml:41
# m16 geometry (assets/factory/yaml/factory_asset_info_nut_bolt.yaml)
BOLT_HEAD_HEIGHT = 0.02
BOLT_SHANK_LENGTH = 0.08
NUT_HEIGHT = 0.016
THREAD_PITCH = 0.002  # m per revolution
FRANKA_INIT_DOF = np.array(
    # FactoryTaskNutBoltPick.yaml:25 + open gripper
    [0.3413, -0.8011, -0.0670, -1.8299, 0.0266, 1.0185, 1.0927, 0.04, 0.04],
    np.float32,
)


def _body_z_half_extent(rec) -> float:
    """Height of the body origin above the mesh's bottom surface along body
    z: rotate the OBB into the body frame (|R[2,:]| . half_extents gives the
    half-height) and subtract the OBB center offset. An object spawned at
    z = table + this value rests exactly on the table."""
    from handarm_tpu.math.quat import quat_to_matrix

    R = np.asarray(quat_to_matrix(np.asarray(rec["obb_quat"], np.float32)))
    half = np.abs(R[2, :]) @ np.asarray(rec["size"], np.float64)
    return float(half - np.asarray(rec["obb_pos"])[2])


def _load_factory_mesh(name: str, mass: float):
    """Bake a factory mesh URDF into an SDF object row with steel mass."""
    from handarm_tpu.envs.objects import load_object

    rec = load_object(
        f"{FACTORY_URDF_DIR}/{name}.urdf",
        sdf_resolution=40,
        num_surface_points=96,
        friction=0.3,  # FactoryEnvNutBolt.yaml nut_bolt_friction
    )
    scale = mass / max(rec["mass"], 1e-9)
    rec["mass"] = mass
    rec["inertia_diag"] = np.asarray(rec["inertia_diag"]) * scale
    return rec


@dataclass(frozen=True)
class FactoryConfig:
    task: str = "pick"  # pick | place | screw
    num_envs: int = 128
    episode_length: int = 100  # FactoryTaskNutBoltPick.yaml max_episode_length
    dt: float = 1.0 / 60.0
    substeps: int = 2
    num_keypoints: int = 4
    keypoint_scale: float = 0.5
    keypoint_reward_scale: float = 1.0
    action_penalty_scale: float = 0.0
    success_bonus: float = 1.0
    # task-space impedance gains (FactoryControl.yaml task_space_impedance)
    task_prop_gain: tuple = (300.0, 300.0, 300.0, 50.0, 50.0, 50.0)
    pos_action_scale: float = 0.1
    rot_action_scale: float = 0.05
    nut_xy: tuple = (0.0, -0.3)
    nut_xy_noise: float = 0.1
    bolt_xy: tuple = (0.0, 0.0)
    bolt_xy_noise: float = 0.02


class FactoryState(NamedTuple):
    physics: object
    progress: jnp.ndarray
    actions: jnp.ndarray
    lifted: jnp.ndarray  # [B] pick-success latch
    theta: jnp.ndarray  # [B] unwrapped nut rotation (screw)
    prev_yaw: jnp.ndarray  # [B]
    finger_force: jnp.ndarray  # [B, 6] left/right fingertip contact force
    bolt_pos: jnp.ndarray  # [B, 3] per-env bolt base position (static objs)
    key: jnp.ndarray


class FactoryStepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict
    teacher_obs: jnp.ndarray


class FactoryNutBoltEnv:
    def __init__(self, cfg: FactoryConfig = FactoryConfig()):
        assert cfg.task in ("pick", "place", "screw", "gears", "insertion")
        self.cfg = cfg
        art = compile_urdf(FRANKA_URDF)
        self.art = art
        nv = art.nv

        if cfg.task == "gears":
            # FactoryEnvGears scene: gear base + small/medium gears — 3
            # objects total
            # (factory_env_gears.py; the medium gear is object 0 — the
            # reference task's grasp target). FactoryTaskGears's reward is a
            # scaffold in the reference (_update_rew_buf: pass,
            # factory_task_gears.py:119-121) — scene + control parity only.
            # note: factory_gear_large's .obj is absent from the reference
            # asset tree (only its .mtl shipped), so the scene holds the
            # two gears whose meshes exist + the base
            recs = [
                _load_factory_mesh("factory_gear_medium", mass=0.05),
                _load_factory_mesh("factory_gear_base_loose", mass=0.5),
                _load_factory_mesh("factory_gear_small", mass=0.03),
            ]
        elif cfg.task == "insertion":
            # FactoryEnvInsertion: plug (object 0) + socket (object 1) from
            # the desired_subassemblies list (FactoryEnvInsertion.yaml:14;
            # round_peg_hole_8mm_loose here). FactoryTaskInsertion's reward
            # is likewise a reference scaffold (factory_task_insertion.py).
            recs = [
                _load_factory_mesh("factory_round_peg_8mm_loose", mass=0.02),
                _load_factory_mesh("factory_round_hole_8mm", mass=0.5),
            ]
        else:
            recs = [
                _load_factory_mesh("factory_nut_m16_loose", mass=0.03),
                _load_factory_mesh("factory_bolt_m16_loose", mass=0.1),
            ]
        shapes = stack_objects(recs)
        self.K = len(recs)
        # spawn height of each object's com over the table = the body-frame
        # z half-extent of the rotated OBB (NOT size[2], which is the
        # half-extent along the OBB's own smallest-variance axis — for the
        # 8mm peg that is the 4mm radius while the true z half-length is
        # 25mm, so the peg would spawn interpenetrating the table and get
        # ejected by the contact solver; advisor r2 finding)
        self.spawn_h = [_body_z_half_extent(r) for r in recs]
        self.grasp_h = (
            NUT_HEIGHT if cfg.task in ("pick", "place", "screw")
            else 2.0 * self.spawn_h[0]
        )

        rails = None
        if cfg.task == "screw":
            # nut rides the bolt: cylindrical joint about world z at the
            # bolt axis (per-env bolt xy handled by zero bolt noise)
            axis = np.zeros((2, 3), np.float32)
            axis[0] = [0, 0, 1.0]
            origin = np.zeros((2, 3), np.float32)
            origin[0] = [cfg.bolt_xy[0], cfg.bolt_xy[1], 0.0]
            rails = RailSpec(
                axis=jnp.asarray(axis),
                origin=jnp.asarray(origin),
                quat=jnp.asarray(
                    np.tile(np.array([1, 0, 0, 0], np.float32), (2, 1))
                ),
                lo=jnp.asarray([TABLE_HEIGHT + BOLT_HEAD_HEIGHT, 0.0]),
                hi=jnp.asarray(
                    [TABLE_HEIGHT + BOLT_HEAD_HEIGHT + BOLT_SHANK_LENGTH, 0.0]
                ),
                damping=jnp.asarray([4.0, 0.0]),
                mask=jnp.asarray([1.0, 0.0]),
                spin=jnp.asarray([1.0, 0.0]),
            )

        geom = StaticGeom(
            table_lo=jnp.asarray([-0.4, -0.6]),
            table_hi=jnp.asarray([0.6, 0.6]),
            table_height=jnp.asarray(TABLE_HEIGHT),
            friction=jnp.asarray(0.3),
        )
        spheres = make_generic_spheres(FRANKA_URDF, art, spheres_per_link=3)
        kp = np.zeros(nv)
        kd = np.zeros(nv)
        kp[7:] = 800.0
        kd[7:] = 40.0
        self.scene = build_scene(
            art, shapes, spheres, geom,
            kp=kp, kd=kd,
            base_pos=(-0.45, 0.0, TABLE_HEIGHT),
            params=SimParams(
                dt=cfg.dt, substeps=cfg.substeps,
                # reference factory budget: 16 position iterations
                # (cfg/task/FactoryBase.yaml:25). The tight depenetration
                # cap matters for the mm-scale parts: with the default
                # 0.5 m/s a tipping 8mm peg ratchets Baumgarte bias into
                # ballistic bounces (advisor r2: physically-invalid scene)
                # 16 iterations = the reference factory budget
                # (cfg/task/FactoryBase.yaml:25). warm_start=0 in the
                # free-tumbling-parts scenes (gears/insertion): their
                # mm-scale parts relocate their contact sets every substep
                # while tipping, so re-applied stale impulses pump spin
                # (measured: a tipped 8mm peg spins to the angular-velocity
                # cap and bounces indefinitely with warm start on, settles
                # motionless with it off). The grasp-holding scenes
                # (pick/place/screw) keep warm start — the persistent
                # finger-nut contacts need the accumulated normal impulse
                # to hold the friction cone closed under gravity.
                solver=SolverParams(
                    iterations=16,
                    warm_start=(
                        0.0 if cfg.task in ("gears", "insertion") else 0.9
                    ),
                ),
                # mm-scale parts have tiny transverse inertias (a thin peg:
                # ~4e-6 kg m^2) so contact-impulse noise pumps spin that the
                # hand-arm-scale defaults (100 rad/s cap, 0.1/s damping)
                # never bleed off; these caps let tipped parts come to rest
                max_obj_angvel=20.0,
                obj_angular_damping=1.0,
                obj_linear_damping=0.2,
                robot_gravity=False,
            ),
            rails=rails,
        )
        self.q_lo = jnp.asarray(art.q_min, jnp.float32)
        self.q_hi = jnp.asarray(art.q_max, jnp.float32)
        self.hand_body = art.sites["panda_hand"].body
        self.grip_site = art.sites["panda_grip_site"]
        self.arm_mask = jnp.asarray([1.0] * 7 + [0.0] * 2)
        self.default_q = jnp.asarray(FRANKA_INIT_DOF)
        # keypoint line along local z (factory_task_nut_bolt_pick.py:95,
        # _get_keypoint_offsets: linspace(0,1)-0.5 on z * keypoint_scale)
        ks = np.zeros((cfg.num_keypoints, 3), np.float32)
        ks[:, 2] = (
            np.linspace(0.0, 1.0, cfg.num_keypoints) - 0.5
        ) * cfg.keypoint_scale * 0.1
        self.kp_offsets = jnp.asarray(ks)

        self.finger_bodies = np.array(
            [art.sites["panda_leftfinger_tip"].body,
             art.sites["panda_rightfinger_tip"].body]
        )
        # grip-site position at the initial dof pose (for spawning the nut
        # inside the closed gripper in the place task)
        fk0 = forward_kinematics(
            self.scene.model, self.default_q[None],
            self.scene.base_quat[None], self.scene.base_pos[None],
        )
        gq0, gp0 = site_poses(
            fk0, np.array([self.grip_site.body]),
            jnp.asarray(self.grip_site.pos)[None],
            jnp.asarray(self.grip_site.quat)[None],
            base_quat=self.scene.base_quat[None],
            base_pos=self.scene.base_pos[None],
        )
        self.grip_home = np.asarray(gp0[0, 0])

        self.num_actions = 12
        # gears/insertion observe like pick: eef state + object-0 grasp frame
        self.obs_mode = {"pick": "pick", "gears": "pick", "insertion": "pick",
                         "place": "place", "screw": "screw"}[cfg.task]
        self.num_obs = {"pick": 20, "place": 27, "screw": 32}[self.obs_mode]
        self.num_teacher_obs = 0
        self.obs_slices = {"obs": (0, self.num_obs)}

    # -- helpers -----------------------------------------------------------

    def _eef(self, phys):
        m = self.scene.model
        B = phys.robot.q.shape[0]
        bq = jnp.broadcast_to(self.scene.base_quat, (B, 4))
        bp = jnp.broadcast_to(self.scene.base_pos, (B, 3))
        fk = forward_kinematics(m, phys.robot.q, bq, bp)
        gq, gp = site_poses(
            fk, np.array([self.grip_site.body]),
            jnp.asarray(self.grip_site.pos)[None],
            jnp.asarray(self.grip_site.quat)[None],
            base_quat=bq, base_pos=bp,
        )
        bv = body_velocities(m, fk, phys.robot.qd)
        w = bv[:, self.hand_body, :3]
        v = bv[:, self.hand_body, 3:] + jnp.cross(w, gp[:, 0])
        return fk, gp[:, 0], gq[:, 0], v, w

    def _keypoints(self, pos, quat):
        return pos[:, None] + quat_rotate(quat[:, None], self.kp_offsets[None])

    def _nut_grasp_frame(self, phys):
        """Grasp frame centered above the nut (reference nut_grasp offsets:
        the gripper grasps the nut from above at its height)."""
        pos = phys.objects.pos[:, 0] + jnp.asarray([0.0, 0.0, self.grasp_h])
        return pos, phys.objects.quat[:, 0]

    # -- reset --------------------------------------------------------------

    def _fresh(self, key, B) -> FactoryState:
        cfg = self.cfg
        kn, kb, k_next = jax.random.split(key, 3)
        phys = initial_state(self.scene, B, q0=self.default_q[None])
        nut_xy = jnp.asarray(cfg.nut_xy) + cfg.nut_xy_noise * jax.random.uniform(
            kn, (B, 2), minval=-1.0, maxval=1.0
        )
        bolt_xy = jnp.asarray(cfg.bolt_xy) + cfg.bolt_xy_noise * jax.random.uniform(
            kb, (B, 2), minval=-1.0, maxval=1.0
        )
        if cfg.task == "screw":
            bolt_xy = jnp.broadcast_to(jnp.asarray(cfg.bolt_xy), (B, 2))
        bolt_z = (
            TABLE_HEIGHT + self.spawn_h[1]
            if cfg.task in ("gears", "insertion")
            else TABLE_HEIGHT + BOLT_HEAD_HEIGHT / 2 + BOLT_SHANK_LENGTH / 2
        )
        bolt_pos = jnp.concatenate(
            [bolt_xy, jnp.full((B, 1), bolt_z)], -1,
        )
        if cfg.task in ("pick", "gears", "insertion"):
            nut_pos = jnp.concatenate(
                [nut_xy, jnp.full((B, 1), TABLE_HEIGHT + self.spawn_h[0])], -1
            )
        elif cfg.task == "place":
            # nut starts inside the closed gripper (the reference scripts a
            # grasp during reset, factory_task_nut_bolt_place.py)
            nut_pos = jnp.broadcast_to(
                jnp.asarray(self.grip_home, jnp.float32), (B, 3)
            )
            q0 = self.default_q[None].at[0, 7:].set(0.011)
            phys = phys._replace(robot=phys.robot._replace(
                q=jnp.broadcast_to(q0, phys.robot.q.shape),
                targets=jnp.broadcast_to(
                    self.default_q[None].at[0, 7:].set(0.0),
                    phys.robot.targets.shape,
                ),
            ))
        else:  # screw: nut on top of the bolt thread
            nut_pos = jnp.concatenate(
                [bolt_xy, jnp.full(
                    (B, 1), TABLE_HEIGHT + BOLT_HEAD_HEIGHT + BOLT_SHANK_LENGTH
                )], -1,
            )
        cols = [nut_pos, bolt_pos]
        if cfg.task == "gears":
            # the small gear rests on the table beside the base
            # (factory_env_gears.py places the gears on the base plate)
            for k, dx in ((2, -0.08),):
                cols.append(jnp.concatenate(
                    [bolt_xy + jnp.asarray([dx, 0.0]),
                     jnp.full((B, 1), TABLE_HEIGHT + self.spawn_h[k])], -1,
                ))
        opos = jnp.stack(cols, axis=1)
        phys = phys._replace(objects=phys.objects._replace(pos=opos))
        return FactoryState(
            physics=phys,
            progress=jnp.zeros(B, jnp.int32),
            actions=jnp.zeros((B, self.num_actions)),
            lifted=jnp.zeros(B, bool),
            theta=jnp.zeros(B),
            prev_yaw=jnp.zeros(B),
            finger_force=jnp.zeros((B, 6)),
            bolt_pos=bolt_pos,
            key=k_next,
        )

    def reset(self, key):
        s = self._fresh(key, self.cfg.num_envs)
        return s, self._obs(s)

    # -- obs ------------------------------------------------------------------

    def _obs(self, s: FactoryState):
        phys = s.physics
        _, gp, gq, v, w = self._eef(phys)
        nut_pos, nut_quat = phys.objects.pos[:, 0], phys.objects.quat[:, 0]
        base = [gp, gq, v, w]
        if self.obs_mode == "pick":
            gpos, gquat = self._nut_grasp_frame(phys)
            parts = base + [gpos, gquat]
        elif self.obs_mode == "place":
            parts = base + [nut_pos, nut_quat,
                            s.bolt_pos, phys.objects.quat[:, 1]]
        else:
            olin = phys.objects.linvel[:, 0]
            oang = phys.objects.angvel[:, 0]
            # 32 = 13 + nut com state (13) + finger forces (6)
            # (factory_task_nut_bolt_screw.py:135-147, add_obs_finger_force)
            parts = base + [nut_pos, nut_quat, olin, oang, s.finger_force]
        return jnp.concatenate(parts, axis=-1)[:, : self.num_obs]

    # -- step -------------------------------------------------------------------

    def step(self, state: FactoryState, actions):
        cfg = self.cfg
        B = actions.shape[0]
        actions = jnp.clip(actions, -1.0, 1.0)
        key, k_reset = jax.random.split(state.key)

        phys = state.physics
        fk, gp, gq, v, w = self._eef(phys)
        dpose = jnp.concatenate(
            [actions[:, :3] * cfg.pos_action_scale,
             actions[:, 3:6] * cfg.rot_action_scale], -1,
        )
        dyn = compute_dyn(
            self.scene.model, fk, phys.robot.qd,
            jnp.zeros(3), self.scene.kp, self.scene.kd,
            cfg.dt / cfg.substeps,
        )
        J = eef_jacobian(self.scene.model, fk, self.hand_body, gp)
        J = J * self.arm_mask[None, None, :]
        tau_arm = osc_torques(
            dyn.Minv, J, dpose, jnp.concatenate([v, w], -1),
            phys.robot.q, phys.robot.qd, self.default_q,
            kp=float(cfg.task_prop_gain[0]), arm_mask=self.arm_mask,
        )
        tau_arm = jnp.clip(
            tau_arm * self.arm_mask[None],
            -jnp.asarray(self.art.effort_limit)[None],
            jnp.asarray(self.art.effort_limit)[None],
        )
        grip_open = actions[:, 6] >= 0.0 if self.cfg.task != "pick" else (
            state.progress < cfg.episode_length * 3 // 4
        )
        finger_t = jnp.where(
            grip_open[:, None], self.q_hi[None, 7:], self.q_lo[None, 7:]
        )
        targets = phys.robot.targets.at[:, 7:].set(finger_t)
        phys = phys._replace(
            robot=phys.robot._replace(targets=targets, tau_ext=tau_arm)
        )
        phys, info = engine_step(self.scene, phys)
        phys = phys._replace(robot=phys.robot._replace(tau_ext=None))
        finger_force = info.body_contact_force[:, self.finger_bodies].reshape(
            B, 6
        )

        # screw: couple nut yaw -> axial travel through the thread pitch
        theta, prev_yaw = state.theta, state.prev_yaw
        if cfg.task == "screw":
            q = phys.objects.quat[:, 0]
            yaw = 2.0 * jnp.arctan2(q[:, 3], q[:, 0])
            dyaw = jnp.arctan2(
                jnp.sin(yaw - prev_yaw), jnp.cos(yaw - prev_yaw)
            )
            theta = theta + dyaw
            prev_yaw = yaw
            z_top = TABLE_HEIGHT + BOLT_HEAD_HEIGHT + BOLT_SHANK_LENGTH
            # right-hand thread: clockwise (negative) rotation descends
            z = jnp.clip(
                z_top + THREAD_PITCH * theta / (2 * jnp.pi),
                TABLE_HEIGHT + BOLT_HEAD_HEIGHT, z_top,
            )
            opos = phys.objects.pos.at[:, 0, 2].set(z)
            phys = phys._replace(objects=phys.objects._replace(pos=opos))

        progress = state.progress + 1
        _, gp, gq, *_ = self._eef(phys)
        nut_pos = phys.objects.pos[:, 0]

        # keypoint reward (factory_task_nut_bolt_*.py _update_rew_buf)
        if cfg.task in ("pick", "gears", "insertion"):
            tgt_pos, tgt_quat = self._nut_grasp_frame(phys)
            kp_a = self._keypoints(gp, gq)
            kp_b = self._keypoints(tgt_pos, tgt_quat)
        elif cfg.task == "place":
            bolt_tip = state.bolt_pos + jnp.asarray(
                [0.0, 0.0, BOLT_SHANK_LENGTH / 2 + NUT_HEIGHT]
            )
            kp_a = self._keypoints(nut_pos, phys.objects.quat[:, 0])
            kp_b = self._keypoints(bolt_tip, phys.objects.quat[:, 1])
        else:
            bottom = state.bolt_pos.at[:, 2].set(
                TABLE_HEIGHT + BOLT_HEAD_HEIGHT
            )
            kp_a = self._keypoints(nut_pos, phys.objects.quat[:, 0])
            kp_b = self._keypoints(bottom, phys.objects.quat[:, 1])
        kp_dist = jnp.mean(jnp.linalg.norm(kp_a - kp_b, axis=-1), axis=-1)
        action_pen = jnp.linalg.norm(actions, axis=-1)
        reward = (
            -kp_dist * cfg.keypoint_reward_scale
            - action_pen * cfg.action_penalty_scale
        )

        # success criteria
        if cfg.task in ("gears", "insertion"):
            # reference FactoryTaskGears/FactoryTaskInsertion are reward
            # scaffolds (_update_rew_buf/_update_reset_buf: pass) — zero
            # task reward, timeout-only episodes
            reward = jnp.zeros_like(reward)
            success = jnp.zeros(B, bool)
            lifted = state.lifted
        elif cfg.task == "pick":
            lifted = state.lifted | (
                nut_pos[:, 2] > TABLE_HEIGHT + 3.0 * BOLT_HEAD_HEIGHT
            )
            success = lifted
        elif cfg.task == "place":
            bolt_tip = state.bolt_pos + jnp.asarray(
                [0.0, 0.0, BOLT_SHANK_LENGTH / 2 + NUT_HEIGHT]
            )
            success = jnp.linalg.norm(nut_pos - bolt_tip, axis=-1) < 0.02
            lifted = state.lifted
        else:
            success = nut_pos[:, 2] < TABLE_HEIGHT + BOLT_HEAD_HEIGHT + 0.005
            lifted = state.lifted
        reward = reward + success * cfg.success_bonus
        finite = jnp.all(jnp.isfinite(phys.robot.q), axis=-1) & jnp.all(
            jnp.isfinite(nut_pos), axis=-1
        )
        reward = jnp.where(jnp.isfinite(reward) & finite, reward, 0.0)
        done = (progress >= cfg.episode_length) | ~finite

        mid = FactoryState(
            physics=phys, progress=progress, actions=actions,
            lifted=lifted, theta=theta, prev_yaw=prev_yaw,
            finger_force=finger_force,
            bolt_pos=state.bolt_pos, key=key,
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
        return new_state, FactoryStepResult(
            obs=obs,
            reward=reward,
            done=done,
            info={"success_frac": jnp.mean(success.astype(jnp.float32)),
                  "kp_dist": jnp.mean(kp_dist)},
            teacher_obs=jnp.zeros((B, 0), obs.dtype),
        )


def make_factory(task="pick", num_envs=128, episode_length=100, **kw):
    return FactoryNutBoltEnv(FactoryConfig(
        task=task, num_envs=num_envs, episode_length=episode_length, **kw
    ))

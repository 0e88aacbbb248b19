"""AllegroKuka task family (DexPBT; reference tasks/allegro_kuka/*).

KUKA iiwa7 (7 DoF) + Allegro hand (16 DoF) lifts a cuboid off a narrow
table and brings its keypoints to a goal. Variants (reference
allegro_kuka_reorientation.py / _regrasping.py / _throw.py):

- "reorientation": goal = random pose + orientation inside the target
  volume; 4 corner keypoints (scaled by keypointScale) must match.
- "regrasping": goal = random position in the volume; single center
  keypoint; on success the object is re-dropped on the table and must
  be re-grasped.
- "throw": goal = a far bucket-mouth position beside/behind the table
  (the reference's physical bucket is replaced by the same keypoint
  success criterion at the bucket mouth).

TPU-native re-design notes:
- per-env cuboid variety (reference generate_cuboids.py builds ~dozens
  of URDF cuboids) is a fixed set of K object slots; each env's active
  slot is env_idx % K, inactive slots rest parked on the table edge.
- DexPBT's stateful shaping (closest-distance deltas, lifted flag,
  near-goal steps, consecutive successes: allegro_kuka_base.py:759-951)
  lives in the env state pytree; the tolerance curriculum
  (allegro_kuka_utils.py:86-116) updates device-side from the batch
  success EWMA instead of a host loop.
- reward = fingertip delta + lifting + lift bonus + keypoint delta +
  action penalties + success bonus (allegro_kuka_base.py:854-895).
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
from handarm_tpu.physics.shapes import make_box_object, stack_objects
from handarm_tpu.physics.solver import SolverParams
from handarm_tpu.robots.spherefit import make_generic_spheres

KUKA_ALLEGRO_URDF = (
    "/root/reference/assets/urdf/kuka_allegro_description/"
    "kuka_allegro_touch_sensor.urdf"
)
# allegro_kuka_base.py:284 pose v1
DEFAULT_KUKA = np.array([-1.571, 1.571, 0.0, 1.376, 0.0, 1.485, 2.358])
FINGERTIPS = ("index_link_3", "middle_link_3", "ring_link_3", "thumb_link_3")
FINGERTIP_OFFSETS = np.array(
    [[0.05, 0.005, 0], [0.05, 0.005, 0], [0.05, 0.005, 0], [0.06, 0.005, 0]],
    np.float32,
)
PALM_OFFSET = np.array([-0.00, -0.02, 0.16], np.float32)
ARM_BASE = np.array([0.0, 0.8, 0.0])
TABLE_CENTER = np.array([0.0, 0.0])
TABLE_HALF = np.array([0.475 / 2, 0.4 / 2])  # table_narrow.urdf box
TABLE_TOP = 0.38 + 0.15  # table pose z + half height
OBJECT_START = np.array([0.0, 0.0, 0.63])  # allegro_kuka_base.py:402-412
# target volume (allegro_kuka_base.py:252-254)
TVOL_ORIGIN = np.array([0.0, 0.05, 0.8])
TVOL_MIN = TVOL_ORIGIN + np.array([-0.4, -0.05, -0.12])
TVOL_MAX = TVOL_ORIGIN + np.array([0.4, 0.3, 0.25])


@dataclass(frozen=True)
class AllegroKukaConfig:
    variant: str = "reorientation"  # reorientation | regrasping | throw
    num_envs: int = 256
    episode_length: int = 600
    dt: float = 1.0 / 60.0
    substeps: int = 2
    # object slots: cuboid half-extents (objectBaseSize 0.05 cube + a big
    # cuboid + a stick, the reference's withSmallCuboids/BigCuboids/Sticks)
    object_halves: tuple = (
        (0.025, 0.025, 0.025),
        (0.0325, 0.0325, 0.0325),
        (0.075, 0.015, 0.015),
    )
    # reward scales (AllegroKuka.yaml:43-50)
    distance_delta_rew_scale: float = 50.0
    lifting_rew_scale: float = 20.0
    lifting_bonus: float = 300.0
    lifting_bonus_threshold: float = 0.15
    keypoint_rew_scale: float = 200.0
    kuka_actions_penalty_scale: float = 0.003
    allegro_actions_penalty_scale: float = 0.0003
    reach_goal_bonus: float = 1000.0
    keypoint_scale: float = 1.5
    success_tolerance: float = 0.075
    target_tolerance: float = 0.01
    tolerance_curriculum_increment: float = 0.9
    tolerance_curriculum_interval: int = 3000
    success_steps: int = 1
    max_consecutive_successes: int = 50
    fall_height: float = 0.1  # object_pos z below this = fell off the table
    # control (AllegroKuka.yaml:25-26)
    dof_speed_scale: float = 10.0
    act_moving_average: float = 1.0
    # reset noise (AllegroKuka.yaml:29-35)
    reset_position_noise: tuple = (0.1, 0.1, 0.02)
    reset_dof_pos_noise_arm: float = 0.1
    reset_dof_pos_noise_fingers: float = 0.1
    reset_dof_vel_noise: float = 0.5


class AKState(NamedTuple):
    physics: object
    targets: jnp.ndarray  # [B, 23] persistent dof targets
    progress: jnp.ndarray  # [B]
    actions: jnp.ndarray  # [B, 23]
    goal_pos: jnp.ndarray  # [B, 3]
    goal_quat: jnp.ndarray  # [B, 4]
    lifted: jnp.ndarray  # [B] bool
    obj_init_z: jnp.ndarray  # [B] object spawn height (for z_lift)
    closest_kp_dist: jnp.ndarray  # [B]
    closest_fingertip_dist: jnp.ndarray  # [B, 4] (-1 = uninitialized)
    furthest_hand_dist: jnp.ndarray  # [B]
    near_goal_steps: jnp.ndarray  # [B]
    successes: jnp.ndarray  # [B]
    success_ewma: jnp.ndarray  # [] batch mean of episode successes
    tolerance: jnp.ndarray  # [] current curriculum tolerance
    frames_since_curriculum: jnp.ndarray  # []
    last_reward: jnp.ndarray  # [B]
    key: jnp.ndarray


class AKStepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict
    teacher_obs: jnp.ndarray


class AllegroKukaEnv:
    def __init__(self, cfg: AllegroKukaConfig = AllegroKukaConfig()):
        assert cfg.variant in ("reorientation", "regrasping", "throw")
        self.cfg = cfg
        art = compile_urdf(KUKA_ALLEGRO_URDF)
        self.art = art
        nv = art.nv  # 23

        objs = [
            make_box_object(list(h), mass=0.3) for h in cfg.object_halves
        ]
        shapes = stack_objects(objs)
        self.K = len(objs)
        self.obj_halves = jnp.asarray(np.array(cfg.object_halves, np.float32))

        geom = StaticGeom(
            table_lo=jnp.asarray(TABLE_CENTER - TABLE_HALF),
            table_hi=jnp.asarray(TABLE_CENTER + TABLE_HALF),
            table_height=jnp.asarray(TABLE_TOP),
            friction=jnp.asarray(1.0),
        )
        spheres = make_generic_spheres(
            KUKA_ALLEGRO_URDF, art, spheres_per_link=2
        )
        # gains: kuka/allegro stiffness 40, damping 5 (AllegroKuka.yaml:61-68)
        kp = np.full(nv, 40.0)
        kd = np.full(nv, 5.0)
        self.scene = build_scene(
            art, shapes, spheres, geom,
            kp=kp, kd=kd,
            base_pos=tuple(ARM_BASE),
            base_quat=(1.0, 0.0, 0.0, 0.0),
            params=SimParams(
                dt=cfg.dt, substeps=cfg.substeps,
                solver=SolverParams(iterations=8),
                robot_gravity=False,
            ),
        )
        self.q_lo = jnp.asarray(art.q_min, jnp.float32)
        self.q_hi = jnp.asarray(art.q_max, jnp.float32)
        self.tip_bodies = np.array([art.sites[t].body for t in FINGERTIPS])
        self.tip_pos = jnp.stack(
            [
                jnp.asarray(art.sites[t].pos) + jnp.asarray(o)
                for t, o in zip(FINGERTIPS, FINGERTIP_OFFSETS)
            ]
        )
        self.tip_quat = jnp.stack(
            [jnp.asarray(art.sites[t].quat) for t in FINGERTIPS]
        )
        self.palm_site = art.sites["palm_link"]
        # default pose: kuka pose v1, allegro at zeros
        dq = np.zeros(nv, np.float32)
        dq[:7] = DEFAULT_KUKA
        self.default_q = jnp.asarray(
            np.clip(dq, art.q_min, art.q_max)
        )
        # keypoints (corner offsets * keypoint_scale * half extents;
        # single center point for regrasping/throw)
        if cfg.variant == "reorientation":
            self.kp_offsets = jnp.asarray(
                np.array(
                    [[1, 1, 1], [1, 1, -1], [-1, -1, 1], [-1, -1, -1]],
                    np.float32,
                )
            )
        else:
            self.kp_offsets = jnp.asarray(np.zeros((1, 3), np.float32))
        self.num_keypoints = int(self.kp_offsets.shape[0])

        self.num_actions = nv
        nk = self.num_keypoints
        # full_state layout (allegro_kuka_base.py:196-221)
        self.num_obs = (
            nv + nv + 3 + 10 + 10 + 12 + nk * 3 + nk * 3 + 3 + 1 + 1 + 2
            + 4 + 1
        )
        self.num_teacher_obs = 0
        self.obs_slices = {"obs": (0, self.num_obs)}

    # -- kinematic helpers -------------------------------------------------

    def _hand(self, phys):
        m = self.scene.model
        B = phys.robot.q.shape[0]
        bq = jnp.broadcast_to(self.scene.base_quat, (B, 4))
        bp = jnp.broadcast_to(self.scene.base_pos, (B, 3))
        fk = forward_kinematics(m, phys.robot.q, bq, bp)
        bodies = np.concatenate([self.tip_bodies, [self.palm_site.body]])
        pos = jnp.concatenate(
            [
                self.tip_pos,
                (jnp.asarray(self.palm_site.pos) + jnp.asarray(PALM_OFFSET))[
                    None
                ],
            ]
        )
        quat = jnp.concatenate(
            [self.tip_quat, jnp.asarray(self.palm_site.quat)[None]]
        )
        sq, sp = site_poses(fk, bodies, pos, quat, base_quat=bq, base_pos=bp)
        bv = body_velocities(m, fk, phys.robot.qd)
        nt = len(self.tip_bodies)  # 4 (single arm) or 8 (two arms)
        palm_w = bv[:, self.palm_site.body, :3]
        palm_v = bv[:, self.palm_site.body, 3:] + jnp.cross(
            palm_w, sp[:, nt]
        )
        return sp[:, :nt], sp[:, nt], sq[:, nt], palm_v, palm_w

    def _active(self, B):
        """Per-env active object slot (env_idx % K, static)."""
        return jnp.arange(B, dtype=jnp.int32) % self.K

    def _obj_state(self, phys, slot):
        B = slot.shape[0]
        idx = (jnp.arange(B), slot)
        return (
            phys.objects.pos[idx],
            phys.objects.quat[idx],
            phys.objects.linvel[idx],
            phys.objects.angvel[idx],
        )

    def _keypoints(self, pos, quat, slot):
        """World keypoints: corner offsets scaled by the slot's half
        extents * keypointScale (allegro_kuka_base.py:399,:73)."""
        half = self.obj_halves[slot]  # [B, 3]
        offs = (
            self.kp_offsets[None] * half[:, None] * self.cfg.keypoint_scale
        )  # [B, nk, 3]
        return pos[:, None] + quat_rotate(quat[:, None], offs)

    # -- resets ------------------------------------------------------------

    def _sample_goal(self, key, B):
        cfg = self.cfg
        kp, kq, kx = jax.random.split(key, 3)
        if cfg.variant == "throw":
            # bucket mouth beside/behind the table (allegro_kuka_throw.py:90-106)
            u = jax.random.uniform(kp, (B, 4))
            sign = jnp.where(u[:, 0] > 0.5, 1.0, -1.0)
            x = sign * (0.5 + 0.4 * u[:, 1])
            y = -1.0 + 1.7 * u[:, 2]
            z = u[:, 3] + 0.05
            goal_pos = jnp.stack([x, y, z], -1)
            goal_quat = jnp.broadcast_to(
                jnp.asarray([1.0, 0, 0, 0]), (B, 4)
            )
        else:
            u = jax.random.uniform(kp, (B, 3))
            goal_pos = jnp.asarray(TVOL_MIN) + u * jnp.asarray(
                TVOL_MAX - TVOL_MIN
            )
            if cfg.variant == "reorientation":
                v = jax.random.normal(kq, (B, 4))
                goal_quat = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
            else:
                goal_quat = jnp.broadcast_to(
                    jnp.asarray([1.0, 0, 0, 0]), (B, 4)
                )
        return goal_pos, goal_quat

    def _object_reset_pose(self, key, B, slot):
        cfg = self.cfg
        kp, kq = jax.random.split(key)
        noise = jax.random.uniform(
            kp, (B, 3), minval=-1.0, maxval=1.0
        ) * jnp.asarray(cfg.reset_position_noise)
        pos = jnp.asarray(OBJECT_START) + noise
        v = jax.random.normal(kq, (B, 4))
        quat = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        return pos, quat

    def _park_positions(self, B, slot):
        """All K slots parked in a row along the table's far edge; the
        active slot will be overwritten by the reset pose."""
        ks = jnp.arange(self.K, dtype=jnp.float32)
        px = -TABLE_HALF[0] + 0.08 + 0.16 * ks
        py = jnp.full((self.K,), TABLE_HALF[1] - 0.06)
        pz = TABLE_TOP + self.obj_halves[:, 2] + 0.002
        park = jnp.stack([px, py, pz], -1)  # [K, 3]
        return jnp.broadcast_to(park, (B, self.K, 3))

    def _fresh(self, key, B) -> AKState:
        cfg = self.cfg
        k1, k2, k3, k4, k_next = jax.random.split(key, 5)
        slot = self._active(B)
        # dofs: default + noise * uniform interval (allegro_kuka_base.py:1270-1285)
        u = jax.random.uniform(k1, (B, self.art.nv))
        delta = self.q_lo[None] + u * (self.q_hi - self.q_lo)[None]
        coeff = jnp.concatenate(
            [
                jnp.full(7, cfg.reset_dof_pos_noise_arm),
                jnp.full(16, cfg.reset_dof_pos_noise_fingers),
            ]
        )
        q0 = self.default_q[None] + coeff[None] * (
            delta - self.default_q[None]
        )
        q0 = jnp.clip(q0, self.q_lo[None], self.q_hi[None])
        phys = initial_state(self.scene, B, q0=q0)
        qd0 = cfg.reset_dof_vel_noise * jax.random.uniform(
            k2, (B, self.art.nv), minval=-1.0, maxval=1.0
        )
        opos = self._park_positions(B, slot)
        obj_pos, obj_quat = self._object_reset_pose(k3, B, slot)
        opos = opos.at[jnp.arange(B), slot].set(obj_pos)
        oquat = phys.objects.quat.at[jnp.arange(B), slot].set(obj_quat)
        phys = phys._replace(
            robot=phys.robot._replace(qd=qd0, targets=q0),
            objects=phys.objects._replace(pos=opos, quat=oquat),
        )
        goal_pos, goal_quat = self._sample_goal(k4, B)
        z = jnp.zeros(B)
        return AKState(
            physics=phys,
            targets=q0,
            progress=jnp.zeros(B, jnp.int32),
            actions=jnp.zeros((B, self.num_actions)),
            goal_pos=goal_pos,
            goal_quat=goal_quat,
            lifted=jnp.zeros(B, bool),
            obj_init_z=obj_pos[:, 2],
            closest_kp_dist=jnp.full(B, 1e6),
            closest_fingertip_dist=jnp.full((B, 4), -1.0),
            furthest_hand_dist=jnp.full(B, -1.0),
            near_goal_steps=jnp.zeros(B, jnp.int32),
            successes=jnp.zeros(B, jnp.int32),
            success_ewma=jnp.zeros(()),
            tolerance=jnp.asarray(cfg.success_tolerance),
            frames_since_curriculum=jnp.zeros((), jnp.int32),
            last_reward=z,
            key=k_next,
        )

    def reset(self, key):
        s = self._fresh(key, self.cfg.num_envs)
        return s, self._obs(s)

    # -- observation ---------------------------------------------------

    def _obs(self, s: AKState):
        cfg = self.cfg
        phys = s.physics
        B = phys.robot.q.shape[0]
        slot = self._active(B)
        tips, palm_p, palm_q, palm_v, palm_w = self._hand(phys)
        opos, oquat, olin, oang = self._obj_state(phys, slot)
        obj_kp = self._keypoints(opos, oquat, slot)
        goal_kp = self._keypoints(s.goal_pos, s.goal_quat, slot)
        kp_dist = jnp.linalg.norm(obj_kp - goal_kp, axis=-1)
        max_kp_dist = jnp.max(kp_dist, axis=-1)
        tip_rel = (tips - opos[:, None]).reshape(B, 12)
        half = self.obj_halves[slot]
        progress = s.progress.astype(jnp.float32)
        obs = jnp.concatenate(
            [
                phys.robot.q,
                phys.robot.qd,
                palm_p,
                palm_q, palm_v, palm_w,
                oquat, olin, oang,
                tip_rel,
                (obj_kp - goal_kp).reshape(B, -1),
                goal_kp.reshape(B, -1) - jnp.tile(opos, (1, self.num_keypoints)),
                half * 2.0,  # object scales (dims)
                max_kp_dist[:, None],
                s.lifted.astype(jnp.float32)[:, None],
                (progress / cfg.episode_length)[:, None],
                jnp.broadcast_to(s.tolerance, (B,))[:, None],
                s.closest_fingertip_dist,
                s.last_reward[:, None],
            ],
            axis=-1,
        )
        return jnp.clip(obs, -10.0, 10.0)

    # -- step ----------------------------------------------------------

    def step(self, state: AKState, actions):
        cfg = self.cfg
        actions = jnp.clip(actions, -1.0, 1.0)

        # control (allegro_kuka_base.py:1373-1399): arm relative targets,
        # hand absolute scaled targets with moving average
        arm_t = state.targets[:, :7] + cfg.dof_speed_scale * cfg.dt * actions[:, :7]
        hand_scaled = self.q_lo[7:][None] + 0.5 * (actions[:, 7:] + 1.0) * (
            self.q_hi[7:] - self.q_lo[7:]
        )[None]
        hand_t = (
            cfg.act_moving_average * hand_scaled
            + (1.0 - cfg.act_moving_average) * state.targets[:, 7:]
        )
        targets = jnp.clip(
            jnp.concatenate([arm_t, hand_t], -1),
            self.q_lo[None],
            self.q_hi[None],
        )
        return self._step_with_targets(state, actions, targets)

    def _step_with_targets(self, state: AKState, actions, targets):
        cfg = self.cfg
        B = actions.shape[0]
        key, k_goal, k_obj, k_reset = jax.random.split(state.key, 4)
        slot = self._active(B)
        phys = state.physics
        phys = phys._replace(robot=phys.robot._replace(targets=targets))
        phys, _ = engine_step(self.scene, phys)

        progress = state.progress + 1
        tips, palm_p, *_ = self._hand(phys)
        opos, oquat, _, _ = self._obj_state(phys, slot)

        # --- DexPBT reward (allegro_kuka_base.py:759-895) ---
        tip_dist = jnp.linalg.norm(tips - opos[:, None], axis=-1)  # [B, 4]
        cfd = jnp.where(
            state.closest_fingertip_dist < 0,
            tip_dist,
            state.closest_fingertip_dist,
        )
        fingertip_deltas = jnp.clip(cfd - tip_dist, 0, 10)
        closest_fingertip_dist = jnp.minimum(cfd, tip_dist)
        fingertip_delta_rew = jnp.sum(fingertip_deltas, -1) * (~state.lifted)

        z_lift = 0.05 + opos[:, 2] - state.obj_init_z
        lifting_rew = jnp.clip(z_lift, 0, 0.5)
        lifted = (z_lift > cfg.lifting_bonus_threshold) | state.lifted
        just_lifted = lifted & ~state.lifted
        lift_bonus_rew = cfg.lifting_bonus * just_lifted
        lifting_rew = lifting_rew * (~lifted)

        obj_kp = self._keypoints(opos, oquat, slot)
        goal_kp = self._keypoints(state.goal_pos, state.goal_quat, slot)
        kp_max_dist = jnp.max(
            jnp.linalg.norm(obj_kp - goal_kp, axis=-1), axis=-1
        )
        kp_deltas = jnp.clip(state.closest_kp_dist - kp_max_dist, 0, 100)
        closest_kp_dist = jnp.minimum(state.closest_kp_dist, kp_max_dist)
        keypoint_rew = kp_deltas * lifted

        qd = phys.robot.qd
        kuka_pen = jnp.sum(jnp.abs(qd[:, :7]), -1) * cfg.kuka_actions_penalty_scale
        allegro_pen = (
            jnp.sum(jnp.abs(qd[:, 7:]), -1) * cfg.allegro_actions_penalty_scale
        )

        near_goal = kp_max_dist <= state.tolerance * cfg.keypoint_scale
        near_goal_steps = state.near_goal_steps + near_goal
        is_success = near_goal_steps >= cfg.success_steps
        successes = state.successes + is_success
        bonus_rew = near_goal * (cfg.reach_goal_bonus / cfg.success_steps)

        reward = (
            cfg.distance_delta_rew_scale * fingertip_delta_rew
            + cfg.lifting_rew_scale * lifting_rew
            + lift_bonus_rew
            + cfg.keypoint_rew_scale * keypoint_rew
            - kuka_pen
            - allegro_pen
            + bonus_rew
        )
        reward = jnp.where(jnp.isfinite(reward), reward, 0.0)

        # --- goal-only resets on success ---
        new_goal_pos, new_goal_quat = self._sample_goal(k_goal, B)
        goal_pos = jnp.where(is_success[:, None], new_goal_pos, state.goal_pos)
        goal_quat = jnp.where(
            is_success[:, None], new_goal_quat, state.goal_quat
        )
        if cfg.variant in ("regrasping", "throw"):
            # object returns to the table on success (re-grasp cycle)
            rp, rq = self._object_reset_pose(k_obj, B, slot)
            oidx = (jnp.arange(B), slot)
            objs = phys.objects
            objs = objs._replace(
                pos=objs.pos.at[oidx].set(
                    jnp.where(is_success[:, None], rp, objs.pos[oidx])
                ),
                quat=objs.quat.at[oidx].set(
                    jnp.where(is_success[:, None], rq, objs.quat[oidx])
                ),
                linvel=objs.linvel.at[oidx].set(
                    jnp.where(
                        is_success[:, None], 0.0, objs.linvel[oidx]
                    )
                ),
                angvel=objs.angvel.at[oidx].set(
                    jnp.where(
                        is_success[:, None], 0.0, objs.angvel[oidx]
                    )
                ),
            )
            phys = phys._replace(objects=objs)
            lifted = jnp.where(is_success, False, lifted)
            obj_init_z = jnp.where(is_success, rp[:, 2], state.obj_init_z)
        else:
            obj_init_z = state.obj_init_z
        closest_kp_dist = jnp.where(is_success, 1e6, closest_kp_dist)
        closest_fingertip_dist = jnp.where(
            is_success[:, None], -1.0, closest_fingertip_dist
        )
        near_goal_steps = jnp.where(is_success, 0, near_goal_steps)
        # success resets the episode clock (allegro_kuka_base.py:844-846)
        progress = jnp.where(is_success, 0, progress)

        # --- full resets ---
        fell = opos[:, 2] < cfg.fall_height
        too_far = jnp.max(tip_dist, -1) > 1.5
        finite = jnp.all(jnp.isfinite(phys.robot.q), axis=-1)
        done = (
            fell
            | too_far
            | (progress >= cfg.episode_length)
            | (successes >= cfg.max_consecutive_successes)
            | ~finite
        )

        # --- tolerance curriculum (allegro_kuka_utils.py:86-116), device side:
        # the batch EWMA of episode-end successes stands in for
        # prev_episode_successes.mean()
        ended = done.astype(jnp.float32)
        n_end = jnp.maximum(jnp.sum(ended), 1.0)
        end_succ = jnp.sum(successes.astype(jnp.float32) * ended) / n_end
        alpha = 0.05 * jnp.clip(jnp.sum(ended) / B, 0.0, 1.0)
        success_ewma = (1 - alpha) * state.success_ewma + alpha * end_succ
        frames = state.frames_since_curriculum + 1
        do_update = (frames >= cfg.tolerance_curriculum_interval) & (
            success_ewma >= 3.0
        )
        tolerance = jnp.where(
            do_update,
            jnp.clip(
                state.tolerance * cfg.tolerance_curriculum_increment,
                cfg.target_tolerance,
                cfg.success_tolerance,
            ),
            state.tolerance,
        )
        frames = jnp.where(do_update, 0, frames)

        mid = AKState(
            physics=phys,
            targets=targets,
            progress=progress,
            actions=actions,
            goal_pos=goal_pos,
            goal_quat=goal_quat,
            lifted=lifted,
            obj_init_z=obj_init_z,
            closest_kp_dist=closest_kp_dist,
            closest_fingertip_dist=closest_fingertip_dist,
            furthest_hand_dist=state.furthest_hand_dist,
            near_goal_steps=near_goal_steps,
            successes=successes,
            success_ewma=success_ewma,
            tolerance=tolerance,
            frames_since_curriculum=frames,
            last_reward=reward,
            key=key,
        )
        fresh = self._fresh(k_reset, B)
        new_state = jax.tree_util.tree_map(
            lambda f, c: (
                jnp.where(done.reshape((B,) + (1,) * (c.ndim - 1)), f, c)
                if c.ndim and c.shape[0] == B
                else c
            ),
            fresh._replace(key=None, success_ewma=None, tolerance=None,
                           frames_since_curriculum=None),
            mid._replace(key=None, success_ewma=None, tolerance=None,
                         frames_since_curriculum=None),
        )._replace(
            key=key,
            success_ewma=success_ewma,
            tolerance=tolerance,
            frames_since_curriculum=frames,
        )
        obs = self._obs(new_state)
        obs = jnp.where(jnp.isfinite(obs), obs, 0.0)
        return new_state, AKStepResult(
            obs=obs,
            reward=reward,
            done=done,
            info={
                "successes_mean": jnp.mean(successes.astype(jnp.float32)),
                "success_ewma": success_ewma,
                "tolerance": tolerance,
                "lifted_frac": jnp.mean(lifted.astype(jnp.float32)),
            },
            teacher_obs=jnp.zeros((B, 0), obs.dtype),
        )


def make_allegro_kuka(variant="reorientation", num_envs=256,
                      episode_length=600, **kw):
    return AllegroKukaEnv(AllegroKukaConfig(
        variant=variant, num_envs=num_envs, episode_length=episode_length,
        **kw
    ))


# --- two-arms variant (reference allegro_kuka_two_arms*.py) -----------------

TWO_ARMS_URDF = "/root/repo/assets/gen/kuka_allegro_two_arms.urdf"


def _generate_two_arms_urdf() -> str:
    """Compose two kuka_allegro arms under one world root (the engine
    simulates one articulation per scene; the reference spawns two actors).
    Arms at x = ±armXOfs rotated ∓90° about z to face each other
    (allegro_kuka_two_arms.py:598-610). Mesh paths are rewritten absolute."""
    import os
    import re
    import xml.etree.ElementTree as ET

    if os.path.exists(TWO_ARMS_URDF):
        return TWO_ARMS_URDF
    tree = ET.parse(KUKA_ALLEGRO_URDF)
    src = tree.getroot()
    mesh_root = os.path.dirname(os.path.dirname(KUKA_ALLEGRO_URDF))

    robot = ET.Element("robot", name="kuka_allegro_two_arms")
    ET.SubElement(robot, "link", name="world_root")
    for a, (x_ofs, yaw) in enumerate(((-1.1, 1.5707963), (1.1, -1.5707963))):
        prefix = f"a{a}_"
        roots = set()
        children = set()
        for el in src:
            el2 = ET.fromstring(ET.tostring(el))
            if el2.tag not in ("link", "joint"):
                continue
            el2.set("name", prefix + el2.get("name"))
            for sub in el2.iter():
                if sub.tag in ("parent", "child") and sub.get("link"):
                    sub.set("link", prefix + sub.get("link"))
                    (children if sub.tag == "child" else roots).add(
                        sub.get("link")
                    )
                if sub.tag == "mesh" and sub.get("filename"):
                    fn = sub.get("filename")
                    if not os.path.isabs(fn):
                        sub.set(
                            "filename",
                            os.path.normpath(os.path.join(mesh_root, fn)),
                        )
            robot.append(el2)
        base_link = prefix + "iiwa7_base_link"
        j = ET.SubElement(robot, "joint", name=f"{prefix}mount", type="fixed")
        ET.SubElement(j, "parent", link="world_root")
        ET.SubElement(j, "child", link=base_link)
        ET.SubElement(j, "origin", xyz=f"{x_ofs} 0 0", rpy=f"0 0 {yaw}")
    os.makedirs(os.path.dirname(TWO_ARMS_URDF), exist_ok=True)
    ET.ElementTree(robot).write(TWO_ARMS_URDF)
    return TWO_ARMS_URDF


class AllegroKukaTwoArmsEnv(AllegroKukaEnv):
    """Two mirrored kuka+allegro arms manipulate one larger object
    (reference allegro_kuka_two_arms_reorientation/_regrasping.py). The
    DexPBT reward machinery is inherited; fingertip terms cover all 8
    fingers, actions are 46 (2 x 23)."""

    def __init__(self, cfg: AllegroKukaConfig = AllegroKukaConfig()):
        urdf = _generate_two_arms_urdf()
        art = compile_urdf(urdf)
        self.art = art
        self.cfg = cfg
        nv = art.nv  # 46

        objs = [make_box_object(list(h), mass=0.5)
                for h in cfg.object_halves]
        shapes = stack_objects(objs)
        self.K = len(objs)
        self.obj_halves = jnp.asarray(np.array(cfg.object_halves, np.float32))
        geom = StaticGeom(
            # table centered at origin (two_arms table_pose dy=0)
            table_lo=jnp.asarray([-TABLE_HALF[0], -TABLE_HALF[1]]),
            table_hi=jnp.asarray([TABLE_HALF[0], TABLE_HALF[1]]),
            table_height=jnp.asarray(TABLE_TOP),
            friction=jnp.asarray(1.0),
        )
        spheres = make_generic_spheres(urdf, art, spheres_per_link=2)
        kp = np.full(nv, 40.0)
        kd = np.full(nv, 5.0)
        self.scene = build_scene(
            art, shapes, spheres, geom,
            kp=kp, kd=kd,
            base_pos=(0.0, 0.0, 0.0),
            base_quat=(1.0, 0.0, 0.0, 0.0),
            params=SimParams(
                dt=cfg.dt, substeps=cfg.substeps,
                solver=SolverParams(iterations=8),
                robot_gravity=False,
            ),
        )
        self.q_lo = jnp.asarray(art.q_min, jnp.float32)
        self.q_hi = jnp.asarray(art.q_max, jnp.float32)
        tips = [f"a{a}_{t}" for a in (0, 1) for t in FINGERTIPS]
        self.tip_bodies = np.array([art.sites[t].body for t in tips])
        self.tip_pos = jnp.stack([
            jnp.asarray(art.sites[t].pos)
            + jnp.asarray(FINGERTIP_OFFSETS[i % 4])
            for i, t in enumerate(tips)
        ])
        self.tip_quat = jnp.stack(
            [jnp.asarray(art.sites[t].quat) for t in tips]
        )
        self.palm_site = art.sites["a0_palm_link"]
        dq = np.zeros(nv, np.float32)
        dq[:7] = DEFAULT_KUKA
        dq[23:30] = DEFAULT_KUKA
        self.default_q = jnp.asarray(np.clip(dq, art.q_min, art.q_max))
        if cfg.variant == "reorientation":
            self.kp_offsets = jnp.asarray(np.array(
                [[1, 1, 1], [1, 1, -1], [-1, -1, 1], [-1, -1, -1]], np.float32
            ))
        else:
            self.kp_offsets = jnp.asarray(np.zeros((1, 3), np.float32))
        self.num_keypoints = int(self.kp_offsets.shape[0])
        self.num_actions = nv
        nk = self.num_keypoints
        # full_state (two_arms:196-221 analog): 8 fingertips instead of 4
        self.num_obs = (
            nv + nv + 3 + 10 + 10 + 24 + nk * 3 + nk * 3 + 3 + 1 + 1 + 2
            + 8 + 1
        )
        self.num_teacher_obs = 0
        self.obs_slices = {"obs": (0, self.num_obs)}

    # object spawn: over the CENTER table (arms at ±x)
    def _object_reset_pose(self, key, B, slot):
        cfg = self.cfg
        kp_, kq = jax.random.split(key)
        noise = jax.random.uniform(
            kp_, (B, 3), minval=-1.0, maxval=1.0
        ) * jnp.asarray(cfg.reset_position_noise)
        pos = jnp.asarray([0.0, 0.0, TABLE_TOP + 0.25]) + noise
        v = jax.random.normal(kq, (B, 4))
        return pos, v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def _park_positions(self, B, slot):
        ks = jnp.arange(self.K, dtype=jnp.float32)
        px = -TABLE_HALF[0] + 0.08 + 0.16 * ks
        py = jnp.full((self.K,), TABLE_HALF[1] - 0.06)
        pz = TABLE_TOP + self.obj_halves[:, 2] + 0.002
        park = jnp.stack([px, py, pz], -1)
        return jnp.broadcast_to(park, (B, self.K, 3))

    def _fresh(self, key, B):
        cfg = self.cfg
        k1, k2, k3, k4, k_next = jax.random.split(key, 5)
        slot = self._active(B)
        u = jax.random.uniform(k1, (B, self.art.nv))
        delta = self.q_lo[None] + u * (self.q_hi - self.q_lo)[None]
        coeff = np.zeros(self.art.nv, np.float32)
        coeff[:7] = cfg.reset_dof_pos_noise_arm
        coeff[7:23] = cfg.reset_dof_pos_noise_fingers
        coeff[23:30] = cfg.reset_dof_pos_noise_arm
        coeff[30:] = cfg.reset_dof_pos_noise_fingers
        q0 = self.default_q[None] + jnp.asarray(coeff)[None] * (
            delta - self.default_q[None]
        )
        q0 = jnp.clip(q0, self.q_lo[None], self.q_hi[None])
        phys = initial_state(self.scene, B, q0=q0)
        qd0 = cfg.reset_dof_vel_noise * jax.random.uniform(
            k2, (B, self.art.nv), minval=-1.0, maxval=1.0
        )
        opos = self._park_positions(B, slot)
        obj_pos, obj_quat = self._object_reset_pose(k3, B, slot)
        opos = opos.at[jnp.arange(B), slot].set(obj_pos)
        oquat = phys.objects.quat.at[jnp.arange(B), slot].set(obj_quat)
        phys = phys._replace(
            robot=phys.robot._replace(qd=qd0, targets=q0),
            objects=phys.objects._replace(pos=opos, quat=oquat),
        )
        goal_pos, goal_quat = self._sample_goal(k4, B)
        # goal volume centered over the shared table
        goal_pos = goal_pos * jnp.asarray([1.0, 1.0, 1.0]) - jnp.asarray(
            [0.0, 0.05, 0.0]
        )
        z = jnp.zeros(B)
        return AKState(
            physics=phys, targets=q0,
            progress=jnp.zeros(B, jnp.int32),
            actions=jnp.zeros((B, self.num_actions)),
            goal_pos=goal_pos, goal_quat=goal_quat,
            lifted=jnp.zeros(B, bool),
            obj_init_z=obj_pos[:, 2],
            closest_kp_dist=jnp.full(B, 1e6),
            closest_fingertip_dist=jnp.full((B, 8), -1.0),
            furthest_hand_dist=jnp.full(B, -1.0),
            near_goal_steps=jnp.zeros(B, jnp.int32),
            successes=jnp.zeros(B, jnp.int32),
            success_ewma=jnp.zeros(()),
            tolerance=jnp.asarray(cfg.success_tolerance),
            frames_since_curriculum=jnp.zeros((), jnp.int32),
            last_reward=z, key=k_next,
        )

    def _obs(self, s):
        cfg = self.cfg
        phys = s.physics
        B = phys.robot.q.shape[0]
        slot = self._active(B)
        tips, palm_p, palm_q, palm_v, palm_w = self._hand(phys)
        opos, oquat, olin, oang = self._obj_state(phys, slot)
        obj_kp = self._keypoints(opos, oquat, slot)
        goal_kp = self._keypoints(s.goal_pos, s.goal_quat, slot)
        max_kp = jnp.max(jnp.linalg.norm(obj_kp - goal_kp, axis=-1), axis=-1)
        tip_rel = (tips - opos[:, None]).reshape(B, 24)
        half = self.obj_halves[slot]
        progress = s.progress.astype(jnp.float32)
        obs = jnp.concatenate([
            phys.robot.q, phys.robot.qd, palm_p, palm_q, palm_v, palm_w,
            oquat, olin, oang, tip_rel,
            (obj_kp - goal_kp).reshape(B, -1),
            goal_kp.reshape(B, -1) - jnp.tile(opos, (1, self.num_keypoints)),
            half * 2.0, max_kp[:, None],
            s.lifted.astype(jnp.float32)[:, None],
            (progress / cfg.episode_length)[:, None],
            jnp.broadcast_to(s.tolerance, (B,))[:, None],
            s.closest_fingertip_dist, s.last_reward[:, None],
        ], axis=-1)
        return jnp.clip(obs, -10.0, 10.0)

    def step(self, state, actions):
        # arm blocks: [0:7] arm0 rel, [7:23] hand0 abs, [23:30] arm1 rel,
        # [30:46] hand1 abs — reuse the base control law per block
        cfg = self.cfg
        B = actions.shape[0]
        actions = jnp.clip(actions, -1.0, 1.0)

        def mixed_targets(prev, act):
            t = prev
            for a0, h0 in ((0, 7), (23, 30)):
                arm = prev[:, a0:a0 + 7] + cfg.dof_speed_scale * cfg.dt * act[:, a0:a0 + 7]
                hand_scaled = self.q_lo[h0:h0 + 16][None] + 0.5 * (
                    act[:, h0:h0 + 16] + 1.0
                ) * (self.q_hi[h0:h0 + 16] - self.q_lo[h0:h0 + 16])[None]
                hand = (
                    cfg.act_moving_average * hand_scaled
                    + (1 - cfg.act_moving_average) * prev[:, h0:h0 + 16]
                )
                t = t.at[:, a0:a0 + 7].set(arm).at[:, h0:h0 + 16].set(hand)
            return jnp.clip(t, self.q_lo[None], self.q_hi[None])

        targets = mixed_targets(state.targets, actions)
        # delegate the rest of the step to the shared DexPBT machinery by
        # temporarily using the base class with precomputed targets
        return self._step_with_targets(state, actions, targets)


def make_allegro_kuka_two_arms(variant="reorientation", num_envs=256,
                               episode_length=600, **kw):
    cfg = AllegroKukaConfig(
        variant=variant, num_envs=num_envs, episode_length=episode_length,
        object_halves=((0.05, 0.05, 0.05), (0.0625, 0.0625, 0.0625),
                       (0.125, 0.025, 0.025)),
        **kw,
    )
    return AllegroKukaTwoArmsEnv(cfg)

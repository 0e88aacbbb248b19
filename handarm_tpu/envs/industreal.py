"""IndustReal insertion tasks (reference tasks/industreal/: env_pegs /
task_pegs_insert, env_gears / task_gears_insert, industreal_algo_utils.py).

Franka holds a plug (round peg / gear) and inserts it into a socket
(hole plate / gear shaft) fixed to the table. The paper's three
algorithmic pieces are ported TPU-natively:

- **SDF reward** (industreal_algo_utils.py:239-283): plug surface points
  transformed by the current pose, queried against the plug's own SDF
  placed at the GOAL pose; reward = -log(mean |penetration|). The
  reference loops over envs through warp meshes — here it is one batched
  trilinear gather over the already-baked voxel SDF.
- **SAPU** (:158-198): reward scaled by 1 - tanh(max interpenetration /
  thresh) between plug points and the socket SDF; deeply interpenetrating
  envs get zero reward weight (the reference masks them out of the
  policy update).
- **SBC** (:284-333): sampling-based curriculum on the plug's initial
  engagement depth, driven device-side by the batch success EWMA.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import (
    quat_conj,
    quat_mul,
    quat_rotate,
    quat_rotate_inv,
)
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
from handarm_tpu.physics.sdf import sample_sdf
from handarm_tpu.physics.shapes import stack_objects
from handarm_tpu.physics.solver import SolverParams
from handarm_tpu.robots.spherefit import make_generic_spheres

FRANKA_URDF = (
    "/root/reference/assets/urdf/franka_description/robots/"
    "franka_panda_gripper.urdf"
)
IR_URDF_DIR = "/root/reference/assets/industreal/urdf"
TABLE_HEIGHT = 0.4
# FrankX home pose (IndustRealTaskPegsInsert.yaml:26) + closed gripper
FRANKA_INIT_DOF = np.array(
    [-1.757, 0.840, 2.016, -2.092, -0.738, 1.626, 1.269, 0.009, 0.009],
    np.float32,
)
PEG_ASSETS = {
    "pegs": ("industreal_round_peg_8mm", "industreal_round_hole_8mm"),
    "gears": ("industreal_gear_medium", "industreal_gear_base"),
}


def _load_ir_mesh(name: str, mass: float, points: int = 96):
    from handarm_tpu.envs.objects import load_object

    rec = load_object(
        f"{IR_URDF_DIR}/{name}.urdf",
        sdf_resolution=40,
        num_surface_points=points,
        friction=0.5,
    )
    scale = mass / max(rec["mass"], 1e-9)
    rec["mass"] = mass
    rec["inertia_diag"] = np.asarray(rec["inertia_diag"]) * scale
    return rec


@dataclass(frozen=True)
class IndustRealConfig:
    task: str = "pegs"  # pegs | gears
    num_envs: int = 128
    episode_length: int = 128
    dt: float = 1.0 / 60.0
    substeps: int = 2
    num_keypoints: int = 4
    sdf_reward_scale: float = 10.0
    interpen_thresh: float = 0.001  # SAPU
    engagement_bonus: float = 10.0
    success_bonus: float = 0.0
    # SBC (IndustRealTaskPegsInsert.yaml:65-68)
    curriculum_success_thresh: float = 0.75
    curriculum_failure_thresh: float = 0.5
    curriculum_height_step: tuple = (-0.005, 0.003)
    curriculum_height_bound: tuple = (-0.01, 0.01)
    curriculum_interval: int = 128  # steps between SBC updates
    pos_action_scale: float = 0.02
    rot_action_scale: float = 0.05
    task_prop_gain: float = 300.0
    socket_xy: tuple = (0.5, 0.0)
    socket_xy_noise: float = 0.002
    # observation noise on the perceived socket position, resampled per
    # reset (IndustRealTaskPegsInsert.yaml:22 socket_pos_obs_noise). The
    # actor sees the noisy goal; the privileged teacher state carries the
    # true goal + the noise residual (asymmetric central value,
    # industreal_task_pegs_insert.py:315-345).
    socket_pos_obs_noise: tuple = (0.001, 0.001, 0.0)


class IRState(NamedTuple):
    physics: object
    progress: jnp.ndarray
    actions: jnp.ndarray
    socket_pos: jnp.ndarray  # [B, 3] socket base position
    weld_p: jnp.ndarray  # [B, 3] plug offset in the gripper frame
    weld_q: jnp.ndarray  # [B, 4]
    inserted: jnp.ndarray  # [B] success latch
    socket_obs_noise: jnp.ndarray  # [B, 3] per-episode perception error
    success_ewma: jnp.ndarray  # [] batch success EWMA (SBC driver)
    max_disp: jnp.ndarray  # [] SBC current max initial engagement
    steps_since_sbc: jnp.ndarray  # []
    key: jnp.ndarray


class IRStepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict
    teacher_obs: jnp.ndarray


class IndustRealEnv:
    def __init__(self, cfg: IndustRealConfig = IndustRealConfig()):
        assert cfg.task in PEG_ASSETS
        self.cfg = cfg
        art = compile_urdf(FRANKA_URDF)
        self.art = art
        nv = art.nv

        plug_name, socket_name = PEG_ASSETS[cfg.task]
        plug = _load_ir_mesh(plug_name, mass=0.02)
        socket = _load_ir_mesh(socket_name, mass=1.0)
        shapes = stack_objects([plug, socket])
        # OBB `size` is PCA-sorted; the meshes are z-up in their own frame,
        # so take vertical extents from the surface samples directly
        pz = np.asarray(plug["points"])[:, 2]
        sz = np.asarray(socket["points"])[:, 2]
        self.plug_half_height = float(pz.max())
        self.socket_height = float(sz.max() - sz.min())

        # socket pinned rigid (rail with zero travel): a static SDF obstacle
        axis = np.zeros((2, 3), np.float32)
        axis[1] = [0, 0, 1.0]
        origin = np.zeros((2, 3), np.float32)
        origin[1] = [cfg.socket_xy[0], cfg.socket_xy[1],
                     TABLE_HEIGHT + self.socket_height / 2]
        rails = RailSpec(
            axis=jnp.asarray(axis),
            origin=jnp.asarray(origin),
            quat=jnp.asarray(np.tile([1.0, 0, 0, 0], (2, 1)).astype(np.float32)),
            lo=jnp.zeros(2),
            hi=jnp.zeros(2),
            damping=jnp.zeros(2),
            mask=jnp.asarray([0.0, 1.0]),
        )
        geom = StaticGeom(
            table_lo=jnp.asarray([-0.2, -0.5]),
            table_hi=jnp.asarray([0.9, 0.5]),
            table_height=jnp.asarray(TABLE_HEIGHT),
            friction=jnp.asarray(0.5),
        )
        spheres = make_generic_spheres(FRANKA_URDF, art, spheres_per_link=3)
        kp = np.zeros(nv)
        kd = np.zeros(nv)
        kp[7:] = 800.0
        kd[7:] = 40.0
        # place the base so the FrankX-home gripper starts right on the
        # plug-at-socket pose (the reference scripts an IK move to this
        # pose during reset, industreal_base.py; solving IK per reset is
        # needless here since the socket position is the only target)
        from handarm_tpu.physics.kinematics import model_arrays

        m0 = model_arrays(art, jnp.float32)
        fk0 = forward_kinematics(
            m0, jnp.asarray(FRANKA_INIT_DOF)[None],
            jnp.asarray([[1.0, 0, 0, 0]]), jnp.zeros((1, 3)),
        )
        gs = art.sites["panda_grip_site"]
        _, gp0 = site_poses(
            fk0, np.array([gs.body]), jnp.asarray(gs.pos)[None],
            jnp.asarray(gs.quat)[None],
            base_quat=jnp.asarray([[1.0, 0, 0, 0]]),
            base_pos=jnp.zeros((1, 3)),
        )
        grip_local = np.asarray(gp0[0, 0])  # grip pose in base frame
        plug_top_z = (
            TABLE_HEIGHT + self.socket_height
            + 2.0 * self.plug_half_height - 0.01
        )
        base_pos = (
            cfg.socket_xy[0] - grip_local[0],
            cfg.socket_xy[1] - grip_local[1],
            plug_top_z - grip_local[2],
        )
        self.scene = build_scene(
            art, shapes, spheres, geom,
            kp=kp, kd=kd,
            base_pos=base_pos,
            params=SimParams(
                dt=cfg.dt, substeps=cfg.substeps,
                solver=SolverParams(iterations=8),
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
        self.socket_base = jnp.asarray(
            [cfg.socket_xy[0], cfg.socket_xy[1], TABLE_HEIGHT], jnp.float32
        )
        # goal pose of the plug: centered in the socket, bottom at table
        self.plug_goal_pos = jnp.asarray(
            [cfg.socket_xy[0], cfg.socket_xy[1],
             TABLE_HEIGHT + self.plug_half_height], jnp.float32,
        )

        self.num_actions = 6
        self.num_obs = 24
        self.num_teacher_obs = 47  # privileged central-value state
        self.obs_slices = {"obs": (0, self.num_obs)}

    # -- helpers ---------------------------------------------------------

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

    def _plug_points_world(self, pos, quat):
        """Plug surface sample points at a pose: [B, P, 3]."""
        pts = self.scene.shapes.points[0]  # [P, 3] body frame
        mask = self.scene.shapes.point_mask[0] > 0
        w = pos[:, None] + quat_rotate(quat[:, None], pts[None])
        return w, mask

    def _sdf_at(self, k_obj: int, obj_pos, obj_quat, pts_world):
        """SDF of object k (at pose) evaluated at world points [B, P]."""
        p_body = quat_rotate_inv(
            obj_quat[:, None], pts_world - obj_pos[:, None]
        )
        sh = self.scene.shapes
        return sample_sdf(
            sh.sdf_grid[k_obj], sh.sdf_lo[k_obj], sh.sdf_spacing[k_obj],
            p_body,
        )

    def sdf_reward(self, plug_pos, plug_quat):
        """IndustReal SDF reward (algo_utils.py:239-283), batched."""
        pts, mask = self._plug_points_world(plug_pos, plug_quat)
        B = plug_pos.shape[0]
        goal_pos = jnp.broadcast_to(self.plug_goal_pos, (B, 3))
        goal_quat = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (B, 4))
        d = self._sdf_at(0, goal_pos, goal_quat, pts)
        # distance of each point OUTSIDE the goal volume (the reference's
        # pysdf is positive-inside, so its `|where(d>0, 0, d)|` is exactly
        # max(d, 0) in our negative-inside convention): 0 when the plug
        # sits at the goal pose, grows with displacement
        out = jnp.maximum(d, 0.0)
        out = jnp.where(mask[None], out, 0.0)
        mean_out = jnp.sum(out, -1) / jnp.maximum(jnp.sum(mask), 1)
        return -jnp.log(jnp.maximum(mean_out, 1e-6))

    def sapu_scale(self, plug_pos, plug_quat, socket_pos, socket_quat):
        """SAPU reward weight (algo_utils.py:158-198), batched."""
        pts, mask = self._plug_points_world(plug_pos, plug_quat)
        d = self._sdf_at(1, socket_pos, socket_quat, pts)
        pen = jnp.where(mask[None], jnp.maximum(-d, 0.0), 0.0)
        max_pen = jnp.max(pen, axis=-1)
        low = max_pen <= self.cfg.interpen_thresh
        scale = 1.0 - jnp.tanh(max_pen / self.cfg.interpen_thresh)
        return jnp.where(low, scale, 0.0), max_pen

    # -- reset --------------------------------------------------------------

    def _fresh(self, key, B, max_disp=None) -> IRState:
        cfg = self.cfg
        ks, kd_, k_next, k_on = jax.random.split(key, 4)
        if max_disp is None:
            max_disp = jnp.asarray(cfg.curriculum_height_bound[1])
        socket_xy = jnp.asarray(cfg.socket_xy) + cfg.socket_xy_noise * (
            jax.random.uniform(ks, (B, 2), minval=-1.0, maxval=1.0)
        )
        socket_pos = jnp.concatenate(
            [socket_xy, jnp.full((B, 1), TABLE_HEIGHT)], -1
        )
        phys = initial_state(self.scene, B, q0=self.default_q[None])
        # SBC initial engagement: plug bottom at socket top + U(-disp, 0)
        # (positive max_disp = may start engaged)
        u = jax.random.uniform(kd_, (B,))
        disp = u * max_disp
        plug_z = (
            TABLE_HEIGHT + self.socket_height + self.plug_half_height - disp
        )
        plug_pos = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(cfg.socket_xy), (B, 2)),
             plug_z[:, None]], -1,
        )
        socket_center = socket_pos + jnp.asarray(
            [0.0, 0.0, self.socket_height / 2]
        )
        opos = jnp.stack([plug_pos, socket_center], axis=1)
        phys = phys._replace(objects=phys.objects._replace(pos=opos))
        # weld transform: plug pose relative to the gripper at reset (the
        # plug is pre-grasped; the reference holds it by scripted finger
        # force — a kinematic weld is the stable TPU analog, with contact
        # fidelity delegated to SAPU/SDF rewards per the IndustReal paper)
        _, gp, gq, _, _ = self._eef(phys)
        weld_p = quat_rotate_inv(gq, plug_pos - gp)
        weld_q = quat_mul(quat_conj(gq), phys.objects.quat[:, 0])
        return IRState(
            physics=phys,
            progress=jnp.zeros(B, jnp.int32),
            actions=jnp.zeros((B, self.num_actions)),
            socket_pos=socket_pos,
            weld_p=weld_p,
            weld_q=weld_q,
            inserted=jnp.zeros(B, bool),
            socket_obs_noise=(
                jnp.asarray(cfg.socket_pos_obs_noise)
                * jax.random.uniform(k_on, (B, 3), minval=-1.0, maxval=1.0)
            ),
            success_ewma=jnp.zeros(()),
            max_disp=jnp.asarray(max_disp),
            steps_since_sbc=jnp.zeros((), jnp.int32),
            key=k_next,
        )

    def reset(self, key):
        s = self._fresh(key, self.cfg.num_envs)
        k_prog = jax.random.fold_in(key, 31)
        s = s._replace(progress=jax.random.randint(
            k_prog, (self.cfg.num_envs,), 0, self.cfg.episode_length
        ))
        return s, self._obs(s)

    def _obs(self, s: IRState):
        phys = s.physics
        _, gp, gq, v, w = self._eef(phys)
        plug = phys.objects.pos[:, 0]
        goal = s.socket_pos + jnp.asarray(
            [0.0, 0.0, self.socket_height + self.plug_half_height]
        )
        # the actor perceives the goal through the per-episode socket
        # observation noise (industreal_task_pegs_insert.py:186-222)
        noisy_goal = goal + s.socket_obs_noise
        # 24 = arm q (7) + fingertip pose (7) + NOISY gripper goal pose (7)
        # + plug-(noisy)goal delta (3) (industreal_task_pegs_insert.py:289-310)
        return jnp.concatenate(
            [
                phys.robot.q[:, :7],
                gp, gq,
                noisy_goal, jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]),
                                             (gp.shape[0], 4)),
                noisy_goal - plug,
            ],
            axis=-1,
        )

    def _teacher_obs(self, s: IRState):
        """47-dim privileged state for the asymmetric central-value critic
        (industreal_task_pegs_insert.py:315-345, numStates 47): arm q/qd,
        fingertip pose + velocities, TRUE goal pose, plug-goal delta, plug
        pose, and the perception-noise residual."""
        phys = s.physics
        _, gp, gq, v, w = self._eef(phys)
        plug = phys.objects.pos[:, 0]
        plug_q = phys.objects.quat[:, 0]
        goal = s.socket_pos + jnp.asarray(
            [0.0, 0.0, self.socket_height + self.plug_half_height]
        )
        B = gp.shape[0]
        ident = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (B, 4))
        return jnp.concatenate(
            [
                phys.robot.q[:, :7],          # 7
                phys.robot.qd[:, :7],         # 7
                gp, gq,                       # 7
                v, w,                         # 6
                goal, ident,                  # 7 (true goal)
                goal - plug,                  # 3
                plug, plug_q,                 # 7
                s.socket_obs_noise,           # 3 (noisy - true residual)
            ],
            axis=-1,
        )

    def observe(self, state: IRState):
        """(obs, teacher_obs, obs_dict) without stepping — the learner's
        privileged-critic hook (same contract as HandArmEnv.observe)."""
        obs = self._obs(state)
        return obs, self._teacher_obs(state), {"obs": obs}

    # -- step -----------------------------------------------------------------

    def step(self, state: IRState, actions):
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
            kp=cfg.task_prop_gain, arm_mask=self.arm_mask,
        )
        tau_arm = jnp.clip(
            tau_arm * self.arm_mask[None],
            -jnp.asarray(self.art.effort_limit)[None],
            jnp.asarray(self.art.effort_limit)[None],
        )
        # gripper squeezes the plug throughout (pre-grasped)
        targets = phys.robot.targets.at[:, 7:].set(0.0)
        phys = phys._replace(
            robot=phys.robot._replace(targets=targets, tau_ext=tau_arm)
        )
        phys, _ = engine_step(self.scene, phys)
        phys = phys._replace(robot=phys.robot._replace(tau_ext=None))
        # kinematic weld: the plug follows the gripper
        _, gp2, gq2, v2, w2 = self._eef(phys)
        plug_pos = gp2 + quat_rotate(gq2, state.weld_p)
        plug_quat = quat_mul(gq2, state.weld_q)
        objs = phys.objects
        phys = phys._replace(objects=objs._replace(
            pos=objs.pos.at[:, 0].set(plug_pos),
            quat=objs.quat.at[:, 0].set(plug_quat),
            linvel=objs.linvel.at[:, 0].set(v2),
            angvel=objs.angvel.at[:, 0].set(w2),
        ))

        progress = state.progress + 1
        socket_center = phys.objects.pos[:, 1]
        socket_quat = phys.objects.quat[:, 1]

        # --- rewards ---
        sdf_r = self.sdf_reward(plug_pos, plug_quat)
        sapu, max_pen = self.sapu_scale(
            plug_pos, plug_quat, socket_center, socket_quat
        )
        curr_scale = (
            (cfg.curriculum_height_bound[1] - state.max_disp)
            / (cfg.curriculum_height_bound[1] - cfg.curriculum_height_bound[0])
            + 1.0
        )
        # engagement / insertion checks (algo_utils.py:364-421): the plug
        # tip below socket top and XY-centered
        goal = state.socket_pos + jnp.asarray(
            [0.0, 0.0, self.socket_height + self.plug_half_height]
        )
        xy_err = jnp.linalg.norm((plug_pos - goal)[:, :2], axis=-1)
        tip_z = plug_pos[:, 2] - self.plug_half_height
        engaged = (tip_z < state.socket_pos[:, 2] + self.socket_height) & (
            xy_err < 0.004
        )
        inserted = state.inserted | (
            engaged & (tip_z < state.socket_pos[:, 2] + 0.003)
        )
        reward = (
            sdf_r * cfg.sdf_reward_scale * curr_scale * sapu
            + engaged * cfg.engagement_bonus
            + inserted * cfg.success_bonus
        )
        finite = jnp.all(jnp.isfinite(phys.robot.q), axis=-1) & jnp.all(
            jnp.isfinite(plug_pos), axis=-1
        )
        reward = jnp.where(jnp.isfinite(reward) & finite, reward, 0.0)
        done = (progress >= cfg.episode_length) | ~finite

        # --- SBC update (device-side) ---
        ended = done.astype(jnp.float32)
        n_end = jnp.maximum(jnp.sum(ended), 1.0)
        succ = jnp.sum(inserted.astype(jnp.float32) * ended) / n_end
        alpha = 0.1 * jnp.clip(jnp.sum(ended) / B, 0.0, 1.0)
        ewma = (1 - alpha) * state.success_ewma + alpha * succ
        t_sbc = state.steps_since_sbc + 1
        do_sbc = t_sbc >= cfg.curriculum_interval
        up = ewma > cfg.curriculum_success_thresh
        dn = ewma < cfg.curriculum_failure_thresh
        new_disp = jnp.where(
            up, state.max_disp + cfg.curriculum_height_step[0],
            jnp.where(dn, state.max_disp + cfg.curriculum_height_step[1],
                      state.max_disp),
        )
        new_disp = jnp.clip(
            new_disp, cfg.curriculum_height_bound[0],
            cfg.curriculum_height_bound[1],
        )
        max_disp = jnp.where(do_sbc, new_disp, state.max_disp)
        t_sbc = jnp.where(do_sbc, 0, t_sbc)

        mid = IRState(
            physics=phys, progress=progress, actions=actions,
            socket_pos=state.socket_pos,
            weld_p=state.weld_p, weld_q=state.weld_q,
            inserted=inserted,
            socket_obs_noise=state.socket_obs_noise,
            success_ewma=ewma, max_disp=max_disp, steps_since_sbc=t_sbc,
            key=key,
        )
        fresh = self._fresh(k_reset, B, max_disp=max_disp)
        scalars = dict(success_ewma=None, max_disp=None, steps_since_sbc=None)
        new_state = jax.tree_util.tree_map(
            lambda f, c: (
                jnp.where(done.reshape((B,) + (1,) * (c.ndim - 1)), f, c)
                if c.ndim and c.shape[0] == B
                else c
            ),
            fresh._replace(key=None, **scalars),
            mid._replace(key=None, **scalars),
        )._replace(
            key=key, success_ewma=ewma, max_disp=max_disp,
            steps_since_sbc=t_sbc,
        )
        obs = self._obs(new_state)
        obs = jnp.where(jnp.isfinite(obs), obs, 0.0)
        teacher = self._teacher_obs(new_state)
        teacher = jnp.where(jnp.isfinite(teacher), teacher, 0.0)
        return new_state, IRStepResult(
            obs=obs,
            reward=reward,
            done=done,
            info={
                "success_ewma": ewma,
                "max_disp": max_disp,
                "sapu_mean": jnp.mean(sapu),
                "max_interpen": jnp.mean(max_pen),
                "inserted_frac": jnp.mean(inserted.astype(jnp.float32)),
            },
            teacher_obs=teacher,
        )


def make_industreal(task="pegs", num_envs=128, episode_length=128, **kw):
    return IndustRealEnv(IndustRealConfig(
        task=task, num_envs=num_envs, episode_length=episode_length, **kw
    ))

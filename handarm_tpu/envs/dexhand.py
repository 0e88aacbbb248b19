"""Dexterous-hand in-hand reorientation tasks (AllegroHand).

TPU-native re-implementation of the reference fixed-base dexterity task
isaacgymenvs/tasks/allegro_hand.py + cfg/task/AllegroHand.yaml: a floating
(fixed-base, gravity-free) hand holds a cube and reorients it to sampled
goal orientations; goals resample in place on success, the env resets when
the cube falls (goal_dist >= fall_dist) or on timeout.

Everything is one jitted step over [B]: physics (2 sim substep-steps per
30 Hz action), reward (allegro_hand.py compute_hand_reward port), goal
resampling, fused auto-reset, consecutive-success EWMA."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import (
    quat_conj,
    quat_from_axis_angle,
    quat_mul,
)
from handarm_tpu.physics.contacts import StaticGeom
from handarm_tpu.physics.engine import (
    ObjectState,
    PhysicsState,
    RobotState,
    SimParams,
    build_scene,
    initial_state,
    step as engine_step,
)
from handarm_tpu.physics.model import compile_urdf
from handarm_tpu.physics.shapes import make_box_object, stack_objects
from handarm_tpu.physics.solver import SolverParams
from handarm_tpu.robots.spherefit import make_generic_spheres

ALLEGRO_URDF = (
    "/root/reference/assets/urdf/kuka_allegro_description/"
    "allegro_touch_sensor.urdf"
)


@dataclass(frozen=True)
class DexHandConfig:
    num_envs: int = 256
    episode_length: int = 600
    control_freq_inv: int = 2  # 30 Hz policy on the 60 Hz sim
    obs_type: str = "full_state"  # full_no_vel | full | full_state
    # reward (AllegroHand.yaml env block)
    dist_reward_scale: float = -10.0
    rot_reward_scale: float = 1.0
    rot_eps: float = 0.1
    action_penalty_scale: float = -0.0002
    reach_goal_bonus: float = 250.0
    success_tolerance: float = 0.1
    fall_dist: float = 0.24
    fall_penalty: float = 0.0
    av_factor: float = 0.1
    # reset noise (yaml resetPositionNoise / resetDofPosRandomInterval)
    reset_position_noise: float = 0.01
    reset_dof_pos_interval: float = 0.2
    act_moving_average: float = 1.0
    vel_obs_scale: float = 0.2
    force_obs_scale: float = 10.0
    start_object_dy: float = -0.19
    start_object_dz: float = 0.06


class DexState(NamedTuple):
    physics: PhysicsState
    targets: jnp.ndarray  # [B, nv] position targets (persist across steps)
    progress: jnp.ndarray  # [B]
    goal_quat: jnp.ndarray  # [B, 4]
    actions: jnp.ndarray  # [B, na]
    successes: jnp.ndarray  # [B] goal hits this episode
    cons_successes: jnp.ndarray  # scalar EWMA
    key: jnp.ndarray


class DexStepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict
    teacher_obs: jnp.ndarray


def _rand_quat(key, B):
    """Reference randomize_rotation: rand0*pi about x then rand1*pi about y
    (allegro_hand.py:540-542)."""
    k0, k1 = jax.random.split(key)
    r0 = jax.random.uniform(k0, (B,), minval=-1.0, maxval=1.0) * np.pi
    r1 = jax.random.uniform(k1, (B,), minval=-1.0, maxval=1.0) * np.pi
    x = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (B, 3))
    y = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (B, 3))
    return quat_mul(quat_from_axis_angle(x, r0), quat_from_axis_angle(y, r1))


class AllegroHandEnv:
    """Reference parity: tasks/allegro_hand.py (16-dof Allegro + block)."""

    def __init__(self, cfg: DexHandConfig = DexHandConfig()):
        self.cfg = cfg
        art = compile_urdf(ALLEGRO_URDF)
        self.art = art
        nv = art.nv

        # hand pose: z=0.5, Ry(pi) * Rx(0.47pi) * Rz(0.25pi)
        # (allegro_hand.py:284-286; gym quat a*b applies b first)
        qy = quat_from_axis_angle(jnp.array([[0.0, 1.0, 0.0]]), jnp.array([np.pi]))[0]
        qx = quat_from_axis_angle(
            jnp.array([[1.0, 0.0, 0.0]]), jnp.array([0.47 * np.pi])
        )[0]
        qz = quat_from_axis_angle(
            jnp.array([[0.0, 0.0, 1.0]]), jnp.array([0.25 * np.pi])
        )[0]
        base_quat = quat_mul(qy, quat_mul(qx, qz))
        base_pos = (0.0, 0.0, 0.5)

        # block: 6.5 cm cube at density 400 (cube_multicolor_allegro.urdf)
        half = 0.0325
        cube = make_box_object([half] * 3, mass=400.0 * (2 * half) ** 3)
        shapes = stack_objects([cube])

        spheres = make_generic_spheres(ALLEGRO_URDF, art, spheres_per_link=4)
        geom = StaticGeom(
            table_lo=jnp.asarray([-10.0, -10.0]),
            table_hi=jnp.asarray([10.0, 10.0]),
            table_height=jnp.asarray(0.0),  # bare ground plane, no table
            friction=jnp.asarray(1.0),
        )
        # reference dof props: stiffness 3, damping 0.1, effort 0.5
        # (allegro_hand.py:263-269); hand gravity disabled (:229)
        self.scene = build_scene(
            art, shapes, spheres, geom,
            kp=np.full(nv, 3.0), kd=np.full(nv, 0.1),
            base_pos=base_pos,
            base_quat=tuple(np.asarray(base_quat)),
            params=SimParams(
                dt=1.0 / 60.0, substeps=2,
                solver=SolverParams(iterations=8, rolling_friction=0.002),
                robot_gravity=False,
            ),
        )
        # effort limit 0.5 overrides the URDF value (allegro_hand.py:264)
        self.scene = self.scene._replace(
            model=self.scene.model._replace(
                effort_limit=np.full((nv,), 0.5, np.float32)
            )
        )
        # reward/goal anchor: the goal marker sits at object start +
        # goal_displacement (-0.2, -0.06, 0.12) - 0.04 z (allegro_hand.py:
        # 300-307); goal_dist in the reward measures against THIS point
        self.goal_pos_const = jnp.asarray(
            [0.0 - 0.2, cfg.start_object_dy - 0.06,
             0.5 + cfg.start_object_dz + 0.08],
            jnp.float32,
        )

        self.q_lo = jnp.asarray(art.q_min, jnp.float32)
        self.q_hi = jnp.asarray(art.q_max, jnp.float32)
        self.q_default = jnp.clip(jnp.zeros(nv), self.q_lo, self.q_hi)
        self.obj_start = jnp.asarray(
            [0.0, cfg.start_object_dy, 0.5 + cfg.start_object_dz], jnp.float32
        )

        self.num_actions = nv
        self.num_obs = {"full_no_vel": 50, "full": 72, "full_state": 88}[
            cfg.obs_type
        ]
        self.num_teacher_obs = 0
        self.obs_slices = {"obs": (0, self.num_obs)}

    # -- helpers ----------------------------------------------------------

    def _scale(self, a):
        return self.q_lo + (a + 1.0) * 0.5 * (self.q_hi - self.q_lo)

    def _unscale(self, q):
        return 2.0 * (q - self.q_lo) / (self.q_hi - self.q_lo) - 1.0

    def _fresh_physics(self, key, B):
        k_dof, k_pos, k_rot = jax.random.split(key, 3)
        cfg = self.cfg
        nv = self.art.nv
        q0 = self.q_default[None] + cfg.reset_dof_pos_interval * (
            jax.random.uniform(k_dof, (B, nv), minval=-1.0, maxval=1.0)
        )
        q0 = jnp.clip(q0, self.q_lo, self.q_hi)
        pos = self.obj_start[None] + cfg.reset_position_noise * jax.random.normal(
            k_pos, (B, 3)
        )
        quat = _rand_quat(k_rot, B)
        phys = initial_state(
            self.scene, B,
            obj_pos0=jnp.broadcast_to(pos[:, None], (B, 1, 3)),
        )
        obj = phys.objects._replace(quat=quat[:, None])
        rob = phys.robot._replace(q=q0, targets=q0)
        return phys._replace(objects=obj, robot=rob), q0

    def _fresh(self, key, B) -> "DexState":
        k_phys, k_goal, k_next = jax.random.split(key, 3)
        phys, q0 = self._fresh_physics(k_phys, B)
        return DexState(
            physics=phys,
            targets=q0,
            progress=jnp.zeros(B, jnp.int32),
            goal_quat=_rand_quat(k_goal, B),
            actions=jnp.zeros((B, self.num_actions)),
            successes=jnp.zeros(B),
            cons_successes=jnp.zeros(()),
            key=k_next,
        )

    def reset(self, key):
        state = self._fresh(key, self.cfg.num_envs)
        return state, self._obs(state)

    # -- observation ------------------------------------------------------

    def _obs(self, s: DexState):
        cfg = self.cfg
        rob, obj = s.physics.robot, s.physics.objects
        q, qd = rob.q, rob.qd
        opos, oquat = obj.pos[:, 0], obj.quat[:, 0]
        olin, oang = obj.linvel[:, 0], obj.angvel[:, 0]
        goal = jnp.broadcast_to(self.goal_pos_const[None], opos.shape)
        quat_diff = quat_mul(oquat, quat_conj(s.goal_quat))
        uq = self._unscale(q)
        obj_pose = jnp.concatenate([opos, oquat], -1)
        goal_pose = jnp.concatenate([goal, s.goal_quat], -1)
        if cfg.obs_type == "full_no_vel":
            parts = [uq, obj_pose, goal_pose, quat_diff, s.actions]
        elif cfg.obs_type == "full":
            parts = [
                uq, cfg.vel_obs_scale * qd, obj_pose, olin,
                cfg.vel_obs_scale * oang, goal_pose, quat_diff, s.actions,
            ]
        else:  # full_state: + applied PD torque as the dof-force sensor
            tau = jnp.clip(
                self.scene.kp[None] * (s.targets - q)
                - self.scene.kd[None] * qd,
                -0.5, 0.5,
            )
            parts = [
                uq, cfg.vel_obs_scale * qd, cfg.force_obs_scale * tau,
                obj_pose, olin, cfg.vel_obs_scale * oang,
                goal_pose, quat_diff, s.actions,
            ]
        return jnp.clip(jnp.concatenate(parts, -1), -5.0, 5.0)

    # -- step -------------------------------------------------------------

    def step(self, state: DexState, actions):
        cfg = self.cfg
        B = actions.shape[0]
        actions = jnp.clip(actions, -1.0, 1.0)
        key, k_goal, k_reset = jax.random.split(state.key, 3)

        targets = (
            cfg.act_moving_average * self._scale(actions)
            + (1.0 - cfg.act_moving_average) * state.targets
        )
        targets = jnp.clip(targets, self.q_lo, self.q_hi)
        phys = state.physics._replace(
            robot=state.physics.robot._replace(targets=targets)
        )
        for _ in range(cfg.control_freq_inv):
            phys, info = engine_step(self.scene, phys)

        opos, oquat = phys.objects.pos[:, 0], phys.objects.quat[:, 0]
        progress = state.progress + 1

        # reward (allegro_hand.py compute_hand_reward)
        goal_dist = jnp.linalg.norm(opos - self.goal_pos_const[None], axis=-1)
        quat_diff = quat_mul(oquat, quat_conj(state.goal_quat))
        rot_dist = 2.0 * jnp.arcsin(
            jnp.clip(jnp.linalg.norm(quat_diff[:, 1:4], axis=-1), 0.0, 1.0)
        )
        reward = (
            goal_dist * cfg.dist_reward_scale
            + cfg.rot_reward_scale / (jnp.abs(rot_dist) + cfg.rot_eps)
            + cfg.action_penalty_scale * jnp.sum(actions**2, axis=-1)
        )
        goal_hit = jnp.abs(rot_dist) <= cfg.success_tolerance
        reward = jnp.where(goal_hit, reward + cfg.reach_goal_bonus, reward)
        fell = goal_dist >= cfg.fall_dist
        reward = jnp.where(fell, reward + cfg.fall_penalty, reward)

        successes = state.successes + goal_hit
        finite = (
            jnp.all(jnp.isfinite(phys.robot.q), axis=-1)
            & jnp.all(jnp.isfinite(opos), axis=-1)
        )
        done = fell | (progress >= cfg.episode_length) | ~finite
        reward = jnp.where(jnp.isfinite(reward), reward, 0.0)

        # consecutive-success EWMA (reference av_factor update)
        num_resets = jnp.sum(done)
        fin = jnp.sum(jnp.where(done, successes, 0.0))
        cons = jnp.where(
            num_resets > 0,
            cfg.av_factor * fin / jnp.maximum(num_resets, 1)
            + (1.0 - cfg.av_factor) * state.cons_successes,
            state.cons_successes,
        )

        # goal resample on success (in place, no env reset)
        new_goal = _rand_quat(k_goal, B)
        goal_quat = jnp.where(goal_hit[:, None], new_goal, state.goal_quat)

        mid = DexState(
            physics=phys,
            targets=targets,
            progress=progress,
            goal_quat=goal_quat,
            actions=actions,
            successes=successes,
            cons_successes=cons,
            key=key,
        )
        fresh = self._fresh(k_reset, B)
        new_state = jax.tree_util.tree_map(
            lambda f, c: (
                jnp.where(
                    done.reshape((B,) + (1,) * (c.ndim - 1)), f, c
                )
                if c.ndim and c.shape[0] == B
                else c
            ),
            fresh._replace(key=None, cons_successes=None),
            mid._replace(key=None, cons_successes=None),
        )._replace(key=key, cons_successes=cons)
        obs = self._obs(new_state)
        obs = jnp.where(jnp.isfinite(obs), obs, 0.0)
        return new_state, DexStepResult(
            obs=obs,
            reward=reward,
            done=done,
            info={
                "consecutive_successes": cons,
                "rot_dist_mean": jnp.mean(rot_dist),
                "goal_hits": jnp.sum(goal_hit),
            },
            teacher_obs=jnp.zeros((B, 0), obs.dtype),
        )


def make_allegro(num_envs=256, **kw) -> AllegroHandEnv:
    return AllegroHandEnv(DexHandConfig(num_envs=num_envs, **kw))


# ---------------------------------------------------------------------------
# ShadowHand (reference tasks/shadow_hand.py + cfg/task/ShadowHand.yaml)

SHADOW_MJCF = "/root/reference/assets/mjcf/open_ai_assets/hand/shadow_hand.xml"

_SHADOW_ACTUATED = [
    "robot0:WRJ1", "robot0:WRJ0",
    "robot0:FFJ3", "robot0:FFJ2", "robot0:FFJ1",
    "robot0:MFJ3", "robot0:MFJ2", "robot0:MFJ1",
    "robot0:RFJ3", "robot0:RFJ2", "robot0:RFJ1",
    "robot0:LFJ4", "robot0:LFJ3", "robot0:LFJ2", "robot0:LFJ1",
    "robot0:THJ4", "robot0:THJ3", "robot0:THJ2", "robot0:THJ1", "robot0:THJ0",
]
# distal J0 joints couple to their J1 neighbour through the mjcf fixed
# tendon (shared.xml T_FFJ1c etc.); IsaacGym drives them via the tendon,
# here they mimic the J1 position target
_SHADOW_COUPLED = {
    "robot0:FFJ0": "robot0:FFJ1",
    "robot0:MFJ0": "robot0:MFJ1",
    "robot0:RFJ0": "robot0:RFJ1",
    "robot0:LFJ0": "robot0:LFJ1",
}
_SHADOW_EFFORT = {
    "robot0:WRJ1": 4.785, "robot0:WRJ0": 2.175,
    "robot0:THJ4": 2.3722, "robot0:THJ3": 1.45,
    "robot0:THJ2": 0.99, "robot0:THJ1": 0.99, "robot0:THJ0": 0.81,
}

_SHADOW_FINGERTIPS = [
    "robot0:ffdistal", "robot0:mfdistal", "robot0:rfdistal",
    "robot0:lfdistal", "robot0:thdistal",
]


@dataclass(frozen=True)
class ShadowHandConfig(DexHandConfig):
    episode_length: int = 600
    control_freq_inv: int = 1  # 60 Hz (ShadowHand.yaml)
    start_object_dy: float = -0.39
    start_object_dz: float = 0.10


class ShadowHandEnv:
    """24-dof ShadowHand block reorientation (tasks/shadow_hand.py)."""

    def __init__(self, cfg: ShadowHandConfig = ShadowHandConfig()):
        from handarm_tpu.math.quat import quat_from_matrix
        from handarm_tpu.physics.model import compile_mjcf
        from handarm_tpu.physics.urdf import rpy_to_matrix

        self.cfg = cfg
        art, extras = compile_mjcf(SHADOW_MJCF)
        self.art = art
        nv = art.nv  # 24

        # IsaacGym drops the asset root body's worldbody transform (the
        # mjcf mount carries pos/euler); cancel it so the hand sits at
        # (0, 0, 0.5) with identity rotation like shadow_hand.py:305-307
        R_mount = rpy_to_matrix(np.array([1.5708, 0.0, 3.14159]))
        p_mount = np.array([1.0, 1.25, 0.15])
        R_scene = R_mount.T
        p_scene = np.array([0.0, 0.0, 0.5]) - R_scene @ p_mount
        base_quat = np.asarray(quat_from_matrix(jnp.asarray(R_scene)))

        # block: 5 cm cube at density 567 (urdf/objects/cube_multicolor.urdf)
        half = 0.025
        cube = make_box_object([half] * 3, mass=567.0 * (2 * half) ** 3)
        shapes = stack_objects([cube])

        # collision spheres from the mjcf geom proxies (contype>0 only)
        from handarm_tpu.math.quat import quat_to_matrix as _q2m
        from handarm_tpu.physics.contacts import RobotSpheres

        bodies, offs, rads, mus = [], [], [], []
        for bname, sph in extras.link_spheres.items():
            site = art.sites[bname]
            if site.body < 0:
                continue
            Rl = np.asarray(_q2m(jnp.asarray(site.quat)))
            mu = float(extras.geom_friction.get(bname, 1.0))
            for pos, r in sph:
                bodies.append(site.body)
                offs.append(Rl @ np.asarray(pos) + site.pos)
                rads.append(r)
                mus.append(mu)
        spheres = RobotSpheres(
            body=np.asarray(bodies, np.int32),
            offset=jnp.asarray(np.asarray(offs), jnp.float32),
            radius=jnp.asarray(np.asarray(rads), jnp.float32),
            friction=jnp.asarray(np.asarray(mus), jnp.float32),
        )

        geom = StaticGeom(
            table_lo=jnp.asarray([-10.0, -10.0]),
            table_hi=jnp.asarray([10.0, 10.0]),
            table_height=jnp.asarray(0.0),
            friction=jnp.asarray(1.0),
        )
        # PD gains from the mjcf position actuators (kp 5 wrists / 1
        # fingers, shared.xml:250-270), damping from the joint defaults
        names = art.joint_names
        kp = np.array([5.0 if "WRJ" in n else 1.0 for n in names])
        kd = np.array([0.5 if "WRJ" in n else 0.1 for n in names])
        effort = np.array(
            [
                _SHADOW_EFFORT.get(
                    n, 0.7245 if (n[-1] in "01" and "THJ" not in n) else 0.9
                )
                for n in names
            ],
            np.float32,
        )
        self.scene = build_scene(
            art, shapes, spheres, geom,
            kp=kp, kd=kd,
            base_pos=tuple(p_scene),
            base_quat=tuple(base_quat),
            params=SimParams(
                dt=1.0 / 60.0, substeps=2,
                solver=SolverParams(iterations=8, rolling_friction=0.002),
                robot_gravity=False,
            ),
        )
        self.scene = self.scene._replace(
            model=self.scene.model._replace(effort_limit=effort)
        )
        self.goal_pos_const = jnp.asarray(
            [0.0 - 0.2, cfg.start_object_dy - 0.06,
             0.5 + cfg.start_object_dz + 0.08],
            jnp.float32,
        )

        self.q_lo = jnp.asarray(art.q_min, jnp.float32)
        self.q_hi = jnp.asarray(art.q_max, jnp.float32)
        self.q_default = jnp.clip(jnp.zeros(nv), self.q_lo, self.q_hi)
        self.obj_start = jnp.asarray(
            [0.0, cfg.start_object_dy, 0.5 + cfg.start_object_dz], jnp.float32
        )

        name_to_idx = {n: i for i, n in enumerate(names)}
        self.actuated_idx = np.array(
            [name_to_idx[n] for n in _SHADOW_ACTUATED], np.int32
        )
        self.coupled_idx = np.array(
            [[name_to_idx[a], name_to_idx[b]] for a, b in _SHADOW_COUPLED.items()],
            np.int32,
        )
        self.fingertip_bodies = np.array(
            [art.sites[n].body for n in _SHADOW_FINGERTIPS], np.int32
        )

        self.num_actions = len(_SHADOW_ACTUATED)  # 20
        # obs_type "openai" = the asymmetric ShadowHandOpenAI_* variants:
        # the actor sees 42 dims (fingertip pos + object pos + goal-relative
        # quat + actions, shadow_hand.py:481-485) while the central-value
        # critic gets the full 211-dim state (asymmetric_observations,
        # shadow_hand.py:125-128, cfg/task/ShadowHandOpenAI_FF.yaml)
        if cfg.obs_type == "openai":
            self.num_obs = 42
            self.num_teacher_obs = 211
        else:
            self.num_obs = 211  # full_state (shadow_hand.py:462-520)
            self.num_teacher_obs = 0
        self.obs_slices = {"obs": (0, self.num_obs)}

    _scale = AllegroHandEnv._scale
    _unscale = AllegroHandEnv._unscale
    _fresh_physics = AllegroHandEnv._fresh_physics
    _fresh = AllegroHandEnv._fresh
    reset = AllegroHandEnv.reset

    def _targets_from_actions(self, a, prev):
        cfg = self.cfg
        nv = self.art.nv
        lo = self.q_lo[self.actuated_idx]
        hi = self.q_hi[self.actuated_idx]
        t_act = lo + (a + 1.0) * 0.5 * (hi - lo)
        targets = prev.at[:, self.actuated_idx].set(
            cfg.act_moving_average * t_act
            + (1.0 - cfg.act_moving_average) * prev[:, self.actuated_idx]
        )
        # tendon-coupled distal joints mimic their J1 neighbour
        targets = targets.at[:, self.coupled_idx[:, 0]].set(
            targets[:, self.coupled_idx[:, 1]]
        )
        return jnp.clip(targets, self.q_lo, self.q_hi)

    def _obs(self, s: DexState, info=None):
        if self.cfg.obs_type == "openai":
            return self._obs_openai(s, info)
        return self._obs_full_state(s, info)

    def _obs_openai(self, s: DexState, info=None):
        """42-dim fingertip observation (shadow_hand.py:481-485,
        compute_fingertip_observations)."""
        obj = s.physics.objects
        opos, oquat = obj.pos[:, 0], obj.quat[:, 0]
        B = opos.shape[0]
        quat_diff = quat_mul(oquat, quat_conj(s.goal_quat))
        ft_state, _ = self._fingertip_state(s, info)
        act_padded = (
            jnp.zeros((B, 20)) if s.actions.shape[-1] != 20 else s.actions
        )
        parts = [
            ft_state[..., :3].reshape(B, -1),  # 15 fingertip positions
            opos,                              # 3
            quat_diff,                         # 4
            act_padded,                        # 20
        ]
        return jnp.clip(jnp.concatenate(parts, -1), -5.0, 5.0)

    def _teacher_obs(self, s: DexState, info=None):
        """Privileged full state for the asymmetric central value."""
        return self._obs_full_state(s, info)

    def observe(self, state: DexState):
        """(obs, teacher_obs, obs_dict) without stepping (asymmetric-critic
        learner hook, same contract as HandArmEnv.observe)."""
        obs = self._obs(state)
        teacher = (
            self._teacher_obs(state)
            if self.num_teacher_obs
            else jnp.zeros((obs.shape[0], 0), obs.dtype)
        )
        return obs, teacher, {"obs": obs}

    def _obs_full_state(self, s: DexState, info=None, fingertips=None):
        cfg = self.cfg
        rob, obj = s.physics.robot, s.physics.objects
        q, qd = rob.q, rob.qd
        B = q.shape[0]
        opos, oquat = obj.pos[:, 0], obj.quat[:, 0]
        olin, oang = obj.linvel[:, 0], obj.angvel[:, 0]
        goal = jnp.broadcast_to(self.goal_pos_const[None], opos.shape)
        quat_diff = quat_mul(oquat, quat_conj(s.goal_quat))
        tau = jnp.clip(
            self.scene.kp[None] * (s.targets - q) - self.scene.kd[None] * qd,
            -jnp.asarray(self.scene.model.effort_limit)[None],
            jnp.asarray(self.scene.model.effort_limit)[None],
        )
        ft_state, ft_force = self._fingertip_state(s, info)
        act_padded = jnp.zeros((B, 20)) if s.actions.shape[-1] != 20 else s.actions
        parts = [
            self._unscale(q),                      # 24
            cfg.vel_obs_scale * qd,                # 24
            cfg.force_obs_scale * tau,             # 24
            jnp.concatenate([opos, oquat], -1),    # 7
            olin,                                  # 3
            cfg.vel_obs_scale * oang,              # 3
            jnp.concatenate([goal, s.goal_quat], -1),  # 7
            quat_diff,                             # 4
            ft_state.reshape(B, -1),               # 65
            ft_force.reshape(B, -1),               # 30
            act_padded,                            # 20
        ]
        return jnp.clip(jnp.concatenate(parts, -1), -5.0, 5.0)

    def _fingertip_state(self, s: DexState, info):
        """[B, 5, 13] pos/quat/linvel/angvel + [B, 5, 6] force-torque
        (force from accumulated contact impulses; torque ~ 0)."""
        from handarm_tpu.physics.kinematics import (
            body_velocities,
            forward_kinematics,
        )

        m = self.scene.model
        rob = s.physics.robot
        B = rob.q.shape[0]
        fk = forward_kinematics(
            m, rob.q, self.scene.base_quat[None], self.scene.base_pos[None]
        )
        bv = body_velocities(m, fk, rob.qd)  # [B, nb, 6] (ang, lin at origin)
        fb = self.fingertip_bodies
        pos = fk.body_pos[:, fb]
        quat = fk.body_quat[:, fb]
        w = bv[:, fb, :3]
        v = bv[:, fb, 3:] + jnp.cross(w, pos)
        state13 = jnp.concatenate(
            [pos, quat, v, self.cfg.vel_obs_scale * w], axis=-1
        )
        if info is not None:
            force = info.body_contact_force[:, fb]
        else:
            force = jnp.zeros((B, 5, 3))
        ft = jnp.concatenate([force, jnp.zeros_like(force)], axis=-1)
        return state13, self.cfg.force_obs_scale * ft

    def step(self, state: DexState, actions):
        cfg = self.cfg
        B = actions.shape[0]
        actions = jnp.clip(actions, -1.0, 1.0)
        key, k_goal, k_reset = jax.random.split(state.key, 3)

        targets = self._targets_from_actions(actions, state.targets)
        phys = state.physics._replace(
            robot=state.physics.robot._replace(targets=targets)
        )
        info = None
        for _ in range(cfg.control_freq_inv):
            phys, info = engine_step(self.scene, phys)

        opos, oquat = phys.objects.pos[:, 0], phys.objects.quat[:, 0]
        progress = state.progress + 1

        goal_dist = jnp.linalg.norm(opos - self.goal_pos_const[None], axis=-1)
        quat_diff = quat_mul(oquat, quat_conj(state.goal_quat))
        rot_dist = 2.0 * jnp.arcsin(
            jnp.clip(jnp.linalg.norm(quat_diff[:, 1:4], axis=-1), 0.0, 1.0)
        )
        reward = (
            goal_dist * cfg.dist_reward_scale
            + cfg.rot_reward_scale / (jnp.abs(rot_dist) + cfg.rot_eps)
            + cfg.action_penalty_scale * jnp.sum(actions**2, axis=-1)
        )
        goal_hit = jnp.abs(rot_dist) <= cfg.success_tolerance
        reward = jnp.where(goal_hit, reward + cfg.reach_goal_bonus, reward)
        fell = goal_dist >= cfg.fall_dist
        reward = jnp.where(fell, reward + cfg.fall_penalty, reward)

        successes = state.successes + goal_hit
        finite = (
            jnp.all(jnp.isfinite(phys.robot.q), axis=-1)
            & jnp.all(jnp.isfinite(opos), axis=-1)
        )
        done = fell | (progress >= cfg.episode_length) | ~finite
        reward = jnp.where(jnp.isfinite(reward), reward, 0.0)

        num_resets = jnp.sum(done)
        fin = jnp.sum(jnp.where(done, successes, 0.0))
        cons = jnp.where(
            num_resets > 0,
            cfg.av_factor * fin / jnp.maximum(num_resets, 1)
            + (1.0 - cfg.av_factor) * state.cons_successes,
            state.cons_successes,
        )

        new_goal = _rand_quat(k_goal, B)
        goal_quat = jnp.where(goal_hit[:, None], new_goal, state.goal_quat)

        mid = DexState(
            physics=phys, targets=targets, progress=progress,
            goal_quat=goal_quat, actions=actions, successes=successes,
            cons_successes=cons, key=key,
        )
        fresh = self._fresh(k_reset, B)
        new_state = jax.tree_util.tree_map(
            lambda f, c: (
                jnp.where(done.reshape((B,) + (1,) * (c.ndim - 1)), f, c)
                if c.ndim and c.shape[0] == B
                else c
            ),
            fresh._replace(key=None, cons_successes=None),
            mid._replace(key=None, cons_successes=None),
        )._replace(key=key, cons_successes=cons)
        obs = self._obs(new_state, info)
        obs = jnp.where(jnp.isfinite(obs), obs, 0.0)
        if self.num_teacher_obs:
            teacher = self._teacher_obs(new_state, info)
            teacher = jnp.where(jnp.isfinite(teacher), teacher, 0.0)
        else:
            teacher = jnp.zeros((B, 0), obs.dtype)
        return new_state, DexStepResult(
            obs=obs,
            reward=reward,
            done=done,
            info={
                "consecutive_successes": cons,
                "rot_dist_mean": jnp.mean(rot_dist),
                "goal_hits": jnp.sum(goal_hit),
            },
            teacher_obs=teacher,
        )


def make_shadow(num_envs=256, **kw) -> ShadowHandEnv:
    return ShadowHandEnv(ShadowHandConfig(num_envs=num_envs, **kw))

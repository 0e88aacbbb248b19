"""Locomotion task family: floating-base MJCF robots walking to a far
target over a ground plane (reference isaacgymenvs/tasks/ant.py and
humanoid.py, cfg/task/{Ant,Humanoid}.yaml).

TPU-first design: the whole step — effort actuation, contact-coupled
floating-base dynamics (physics/engine.py), observation assembly, reward,
and fused auto-reset — is one traced function over [B, ...] stacked envs.
The reference's per-env PhysX actors + force-sensor readbacks become pure
array slices of the engine's StepInfo.

Observation layout matches the reference exactly (ant.py:401-407,
humanoid.py obs_buf shapes) so policies and return scales are comparable:
  [z, vel_loc(3), angvel_loc(3)*avs, yaw, roll, angle_to_target,
   up_proj, heading_proj, dof_pos_scaled(n), dof_vel*dvs(n),
   (dof_force*cfs(n) — humanoid only), feet force-torque*cfs(6*F),
   actions(n)]
The feet "force-torque sensors" report the engine's net contact force per
foot body with zero torque components (the reference reads PhysX
force-torque sensor wrenches; torque is near-zero for point feet).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import quat_rotate, quat_rotate_inv
from handarm_tpu.physics import engine as engine_mod
from handarm_tpu.physics.contacts import RobotSpheres, StaticGeom
from handarm_tpu.physics.engine import (
    EnvOverrides,
    SimParams,
    build_scene,
    initial_state,
    step as engine_step,
)
from handarm_tpu.physics.model import compile_mjcf
from handarm_tpu.physics.shapes import stack_objects


@dataclass(frozen=True)
class LocomotionConfig:
    mjcf: str = "/root/reference/assets/mjcf/nv_ant.xml"
    num_envs: int = 512
    episode_length: int = 1000
    dt: float = 1.0 / 60.0
    substeps: int = 2
    power_scale: float = 1.0
    start_height: float = 0.44
    termination_height: float = 0.31
    heading_weight: float = 0.5
    up_weight: float = 0.1
    actions_cost: float = 0.005
    energy_cost: float = 0.05
    joints_at_limit_cost: float = 0.1
    death_cost: float = -2.0
    dof_vel_scale: float = 0.2
    contact_force_scale: float = 0.1
    angular_velocity_scale: float = 1.0
    alive_reward: float = 0.5
    reset_noise_q: float = 0.2
    reset_noise_qd: float = 0.1
    # force-sensor bodies (reference's create_force_sensor feet); exact
    # names — substring matching would catch the virtual links that the
    # mjcf importer inserts for multi-joint bodies
    sensor_bodies: tuple = (
        "front_left_foot", "front_right_foot",
        "left_back_foot", "right_back_foot",
    )
    include_dof_force: bool = False  # humanoid adds joint force obs
    graded_limit_cost: bool = False  # humanoid grades the at-limit cost
    target: tuple = (1000.0, 0.0, 0.0)
    ground_friction: float = 1.0


class LocoState(NamedTuple):
    physics: engine_mod.PhysicsState
    progress: jnp.ndarray  # [B] int32
    potentials: jnp.ndarray  # [B]
    actions: jnp.ndarray  # [B, n] last applied actions (observed)
    feet_force: jnp.ndarray  # [B, F, 3] last net contact force per foot
    key: jnp.ndarray


class LocoStepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict
    teacher_obs: jnp.ndarray = None
    obs_dict: dict = {}


def _euler_xyz(q):
    """wxyz quaternion -> (roll, pitch, yaw), extrinsic x-y-z (matches the
    reference's get_euler_xyz, torch_jit_utils.py)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def _norm_angle(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


class LocomotionEnv:
    """Engine-backed floating-base locomotion env (PPO contract:
    .reset/.step/.num_obs/.num_actions/.cfg.num_envs)."""

    def __init__(self, cfg: LocomotionConfig):
        self.cfg = cfg
        art, extras = compile_mjcf(cfg.mjcf)
        assert art.floating, f"{cfg.mjcf} has no freejoint"
        self.art = art
        nj = art.nv - 6  # actuated joint dofs

        # collision spheres from mjcf geoms; welded links (e.g. the
        # humanoid's head) resolve through their link frame on the owning
        # moving body (compile_model records one Site per link)
        from handarm_tpu.math.quat import quat_to_matrix as _q2m

        bodies, offs, rads, mus = [], [], [], []
        for bname, sph in extras.link_spheres.items():
            site = art.sites[bname]
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
        # ground plane only: park the table column far away
        geom = StaticGeom(
            table_lo=jnp.array([1e6, 1e6]),
            table_hi=jnp.array([1e6 + 1.0, 1e6 + 1.0]),
            table_height=jnp.asarray(0.0),
            friction=jnp.asarray(cfg.ground_friction),
        )
        self.scene = build_scene(
            art,
            stack_objects([]),
            spheres,
            geom,
            kp=jnp.zeros(art.nv),
            kd=jnp.zeros(art.nv),
            base_pos=np.array([0.0, 0.0, cfg.start_height]),
            params=SimParams(dt=cfg.dt, substeps=cfg.substeps),
        )
        # effort map: motor gear per actuated joint (ant.py:160-161, 283)
        gears = np.zeros(art.nv, np.float32)
        for i, jn in enumerate(art.joint_names):
            if jn in extras.motor_gears:
                gears[i] = extras.motor_gears[jn]
        self.gears = jnp.asarray(gears)
        ratio = gears[6:] / max(gears[6:].max(), 1e-9)
        self.motor_effort_ratio = jnp.asarray(ratio)

        self.feet_bodies = np.asarray(
            [art.body_names.index(n) for n in cfg.sensor_bodies], np.int32
        )
        F = len(self.feet_bodies)
        self.num_actions = nj
        self.num_obs = 12 + nj + nj + (nj if cfg.include_dof_force else 0) + 6 * F + nj
        self.num_teacher_obs = 0
        self.obs_slices = {"obs": (0, self.num_obs)}

        # initial joint pose: zeros clamped into limits (ant ankles start at
        # their 30deg lower bound, like the reference's initial_dof_pos)
        self.q_init = jnp.asarray(
            np.concatenate(
                [np.zeros(6), np.clip(0.0, art.q_min[6:], art.q_max[6:])]
            ),
            jnp.float32,
        )
        self.target = jnp.asarray(cfg.target, jnp.float32)
        self._jlo = jnp.asarray(art.q_min[6:], jnp.float32)
        self._jhi = jnp.asarray(art.q_max[6:], jnp.float32)

    # --- state construction ---------------------------------------------

    def _fresh(self, key, B):
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(key, 3)
        nj = self.num_actions
        dq = jax.random.uniform(
            k1, (B, nj), minval=-cfg.reset_noise_q, maxval=cfg.reset_noise_q
        )
        q = jnp.clip(self.q_init[None, 6:] + dq, self._jlo, self._jhi)
        qd = jax.random.uniform(
            k2,
            (B, self.art.nv),
            minval=-cfg.reset_noise_qd,
            maxval=cfg.reset_noise_qd,
        )
        phys = initial_state(self.scene, B)
        q_full = jnp.zeros((B, self.art.nv)).at[:, 6:].set(q)
        phys = phys._replace(
            robot=phys.robot._replace(
                q=q_full,
                qd=qd,
                targets=q_full,
                tau_ext=jnp.zeros((B, self.art.nv)),
            )
        )
        to_t = self.target[None, :2] - phys.robot.base_pos[:, :2]
        pot = -jnp.linalg.norm(to_t, axis=-1) / cfg.dt
        return LocoState(
            physics=phys,
            progress=jnp.zeros(B, jnp.int32),
            potentials=pot,
            actions=jnp.zeros((B, nj)),
            feet_force=jnp.zeros((B, len(self.feet_bodies), 3)),
            key=k3,
        )

    def reset(self, key):
        state = self._fresh(key, self.cfg.num_envs)
        return state, self._obs(state)

    # --- observation ------------------------------------------------------

    def _obs(self, s: LocoState):
        cfg = self.cfg
        rob = s.physics.robot
        p, quat = rob.base_pos, rob.base_quat
        w = rob.qd[:, 3:6]
        # origin-Plucker -> torso-point linear velocity
        v = rob.qd[:, 0:3] + jnp.cross(w, p)

        to_target = (self.target[None] - p).at[:, 2].set(0.0)
        tdir = to_target / (
            jnp.linalg.norm(to_target, axis=-1, keepdims=True) + 1e-8
        )
        # body axes in world frame
        ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), p.shape)
        ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), p.shape)
        heading_vec = quat_rotate(quat, ex)
        up_vec = quat_rotate(quat, ez)
        up_proj = up_vec[:, 2]
        heading_proj = jnp.sum(heading_vec * tdir, axis=-1)

        vel_loc = quat_rotate_inv(quat, v)
        angvel_loc = quat_rotate_inv(quat, w) * cfg.angular_velocity_scale
        roll, _, yaw = _euler_xyz(quat)
        walk_angle = jnp.arctan2(to_target[:, 1], to_target[:, 0])
        angle_to_target = _norm_angle(walk_angle - yaw)

        qj = rob.q[:, 6:]
        qdj = rob.qd[:, 6:]
        dof_pos_scaled = (2.0 * qj - self._jhi - self._jlo) / (
            self._jhi - self._jlo
        )
        parts = [
            p[:, 2:3],
            vel_loc,
            angvel_loc,
            _norm_angle(yaw)[:, None],
            _norm_angle(roll)[:, None],
            angle_to_target[:, None],
            up_proj[:, None],
            heading_proj[:, None],
            dof_pos_scaled,
            qdj * cfg.dof_vel_scale,
        ]
        if cfg.include_dof_force:
            tau = s.physics.robot.tau_ext[:, 6:]
            parts.append(tau * cfg.contact_force_scale)
        ft = jnp.concatenate(
            [s.feet_force, jnp.zeros_like(s.feet_force)], axis=-1
        )  # [B, F, 6] force + zero torque
        parts.append(ft.reshape(ft.shape[0], -1) * cfg.contact_force_scale)
        parts.append(s.actions)
        return jnp.concatenate(parts, axis=-1)

    # --- step ---------------------------------------------------------------

    def step(self, state: LocoState, actions):
        cfg = self.cfg
        B = actions.shape[0]
        actions = jnp.clip(actions, -1.0, 1.0)
        key, k_reset = jax.random.split(state.key)

        tau = jnp.zeros((B, self.art.nv)).at[:, 6:].set(
            actions * self.gears[None, 6:] * cfg.power_scale
        )
        phys = state.physics._replace(
            robot=state.physics.robot._replace(tau_ext=tau)
        )
        phys, info = engine_step(self.scene, phys)
        feet_force = info.body_contact_force[:, self.feet_bodies]

        progress = state.progress + 1
        p = phys.robot.base_pos
        to_t = (self.target[None] - p).at[:, 2].set(0.0)
        potentials = -jnp.linalg.norm(to_t, axis=-1) / cfg.dt
        progress_reward = potentials - state.potentials

        mid = LocoState(
            physics=phys,
            progress=progress,
            potentials=potentials,
            actions=actions,
            feet_force=feet_force,
            key=key,
        )
        obs = self._obs(mid)
        reward, terminated = self._reward(obs, actions, progress_reward)
        # failure recovery (PhysX-style): a non-finite env state (rare
        # contact/gyroscopic blowup under extreme flailing) terminates and
        # auto-resets that env instead of poisoning the batch with NaNs
        finite = (
            jnp.all(jnp.isfinite(phys.robot.q), axis=-1)
            & jnp.all(jnp.isfinite(phys.robot.qd), axis=-1)
            & jnp.all(jnp.isfinite(phys.robot.base_pos), axis=-1)
            & jnp.all(jnp.isfinite(phys.robot.base_quat), axis=-1)
        )
        done = terminated | (progress >= cfg.episode_length) | ~finite
        reward = jnp.where(jnp.isfinite(reward), reward, 0.0)
        obs = jnp.where(jnp.isfinite(obs), obs, 0.0)

        # fused auto-reset (key excluded: None subtrees are skipped)
        fresh = self._fresh(k_reset, B)
        new_state = jax.tree_util.tree_map(
            lambda f, c: jnp.where(
                done.reshape((B,) + (1,) * (c.ndim - 1)), f, c
            ),
            fresh._replace(key=None),
            mid._replace(key=None),
        )._replace(key=key)
        obs = jnp.where(done[:, None], self._obs(new_state), obs)
        return new_state, LocoStepResult(
            obs=obs,
            reward=reward,
            done=done,
            info={"progress_reward": jnp.mean(progress_reward)},
            teacher_obs=jnp.zeros((B, 0), obs.dtype),
        )

    def _reward(self, obs, actions, progress_reward):
        """compute_ant_reward / compute_humanoid_reward semantics
        (ant.py:326-372, humanoid.py:330-375)."""
        cfg = self.cfg
        nj = self.num_actions
        up_proj = obs[:, 10]
        heading_proj = obs[:, 11]
        dof_pos_scaled = obs[:, 12 : 12 + nj]
        dof_vel = obs[:, 12 + nj : 12 + 2 * nj] / max(cfg.dof_vel_scale, 1e-9)

        heading_reward = jnp.where(
            heading_proj > 0.8,
            cfg.heading_weight,
            cfg.heading_weight * heading_proj / 0.8,
        )
        up_reward = jnp.where(up_proj > 0.93, cfg.up_weight, 0.0)
        actions_cost = jnp.sum(actions**2, axis=-1)
        if cfg.graded_limit_cost:
            over = jnp.abs(dof_pos_scaled) > 0.98
            graded = (jnp.abs(dof_pos_scaled) - 0.98) / 0.02
            dof_at_limit = jnp.sum(
                over * cfg.joints_at_limit_cost * graded
                * self.motor_effort_ratio[None],
                axis=-1,
            )
            electricity = jnp.sum(
                jnp.abs(actions * dof_vel * cfg.dof_vel_scale)
                * self.motor_effort_ratio[None],
                axis=-1,
            )
        else:
            dof_at_limit = cfg.joints_at_limit_cost * jnp.sum(
                dof_pos_scaled > 0.99, axis=-1
            )
            electricity = jnp.sum(
                jnp.abs(actions * dof_vel * cfg.dof_vel_scale), axis=-1
            )

        total = (
            progress_reward
            + cfg.alive_reward
            + up_reward
            + heading_reward
            - cfg.actions_cost * actions_cost
            - cfg.energy_cost * electricity
            - dof_at_limit
        )
        fallen = obs[:, 0] < cfg.termination_height
        total = jnp.where(fallen, cfg.death_cost, total)
        return total, fallen


def make_ant(
    num_envs: int = 512, episode_length: int = 1000, **kw
) -> LocomotionEnv:
    """Reference Ant (cfg/task/Ant.yaml)."""
    return LocomotionEnv(
        LocomotionConfig(
            num_envs=num_envs,
            episode_length=episode_length,
            **{"mjcf": "/root/reference/assets/mjcf/nv_ant.xml", **kw},
        )
    )


def make_humanoid(
    num_envs: int = 512, episode_length: int = 1000, **kw
) -> LocomotionEnv:
    """Reference Humanoid (cfg/task/Humanoid.yaml: power 1.0, termination
    0.8, start 1.34, angular_velocity_scale 0.25, energy 0.05, dof force
    obs, graded limit cost weighted by motor gear ratios)."""
    return LocomotionEnv(
        LocomotionConfig(
            mjcf="/root/reference/assets/mjcf/nv_humanoid.xml",
            num_envs=num_envs,
            episode_length=episode_length,
            start_height=1.34,
            termination_height=0.8,
            up_weight=0.1,
            heading_weight=0.5,
            actions_cost=0.01,
            energy_cost=0.05,
            joints_at_limit_cost=0.25,
            death_cost=-1.0,
            dof_vel_scale=0.1,
            angular_velocity_scale=0.25,
            contact_force_scale=0.01,
            alive_reward=2.0,
            include_dof_force=True,
            graded_limit_cost=True,
            reset_noise_qd=0.1,
            sensor_bodies=("right_foot", "left_foot"),
            **kw,
        )
    )

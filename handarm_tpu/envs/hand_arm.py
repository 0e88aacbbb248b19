"""UR5+SIH multi-object manipulation environment — the fork's centerpiece,
rebuilt TPU-native.

Reference surface being re-implemented (see SURVEY.md §2.2-2.3):
- isaacgymenvs/tasks/hand_arm/base/configurable_vec_task.py — step cadence
- isaacgymenvs/tasks/hand_arm/base/ur5sih.py — robot, controllers, observables
- isaacgymenvs/tasks/hand_arm/env/multi_object.py — scene + object observables
- isaacgymenvs/tasks/hand_arm/task/multi_object_manipulation.py — rewards/resets

Everything — control, substeps, contacts, reward, termination, auto-reset,
observations, success metrics — is one pure function `step(state, actions)`
traced once under jit and shardable over a device mesh on the env axis.
Auto-reset is fused as a `where` against freshly sampled reset states
(objects spawn settled on the table; the reference's drop-initialized pose
pools arrive with the genesis module).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import (
    quat_from_axis_angle,
    quat_mul,
    quat_rotate,
    quat_rotate_inv,
)
from handarm_tpu.envs.adr import AdrConfig, AdrState, adr_step, init_adr_state
from handarm_tpu.envs.randomization import (
    DRConfig,
    DRState,
    apply_noise,
    init_dr_state,
    merge_on_reset,
    schedule_strength,
)
from handarm_tpu.envs.spec import Registry, obs_layout
from handarm_tpu.physics.contacts import StaticGeom
from handarm_tpu.physics.engine import (
    ObjectState,
    PhysicsState,
    RobotState,
    Scene,
    SimParams,
    StepInfo,
    build_scene,
    step as physics_step,
)
from handarm_tpu.physics.kinematics import forward_kinematics, site_poses
from handarm_tpu.physics.shapes import stack_objects
from handarm_tpu.robots import get_robot
from handarm_tpu.robots.ur5sih import SERVO_LOWER, SERVO_UPPER


@dataclass(frozen=True)
class HandArmConfig:
    robot: str = "ur5sih"  # ur5sih | stretch
    num_envs: int = 1024
    episode_length: int = 200
    control_freq_inv: int = 3  # 20 Hz policy on a 60 Hz sim
    dt: float = 1.0 / 60.0
    substeps: int = 2
    # MDP interface (names resolved against the registry)
    observations: tuple[str, ...] = (
        "ur5_joint_pos", "ur5_flange_pose", "sih_fingertip_pos",
        "sih_fingertip_quat", "sih_fingertip_linvel", "dof_position_targets",
        "object_pos", "object_bounding_box", "target_object_bounding_box",
        "sih_fingertip_to_target_object_pos", "target_object_to_goal_pos",
    )
    teacher_observations: tuple[str, ...] = ()
    actions: tuple[str, ...] = (
        "ur5_relative_joint_pos", "sih_smoothed_relative_servo_pos",
    )
    # task
    goal: str = "lift"  # lift | reposition | oriented_reposition | throw | repose
    goal_threshold: float = 0.05
    repose_threshold: float = 0.1  # rad (in-hand reorientation success)
    lifting_threshold: float = 0.05
    lift_goal_height_above_table: float = 0.3
    reward: dict = field(
        default_factory=lambda: {
            "reaching": 1.0, "lifting": 5.0, "goal": 50.0, "success": 50.0,
        }
    )
    # scene: either primitive objects (kind, size, mass) or a mesh dataset
    # (reference Ur5SihMultiObject.yaml objects block)
    # default single object: a 6x6x9 cm box, the size class of the
    # reference's YCB set (master-chef can 10x10 cm, soup can 6.6x10 cm) —
    # tall enough for the SIH claw's opposition plane to reach its faces
    objects: tuple = (("box", (0.03, 0.03, 0.045), 0.15),)  # (kind, half-extents, mass)
    object_dataset: tuple = ()  # e.g. (("ycb", ("015_peach", "005_*")),)
    num_objects: int = 0  # objects per env when using a dataset (0 = all)
    table_height: float = 0.5
    rolling_friction: float = 0.003  # [m] rolling-resistance arm
    # cuboid bin (reference utils/urdf.py generate_cuboid_bin_urdf +
    # env/multi_object.py:422-435): 4 wall AABBs centered on the drop area.
    # The no_bin extent in the reference is +/-0.25 x 0.2 high.
    use_bin: bool = False
    bin_center: tuple = ()  # xy; empty = drop_pos
    bin_half_extent: float = 0.15
    bin_wall_height: float = 0.10
    bin_wall_thickness: float = 0.01
    table_lo: tuple = (-0.5, -0.5)
    table_hi: tuple = (0.9, 1.1)
    workspace_lo: tuple = (-0.07, 0.33, 0.0)
    workspace_hi: tuple = (0.63, 0.83, 0.6)
    drop_pos: tuple = (0.28, 0.58, 1.5)
    drop_noise: tuple = (0.1, 0.1, 0.0)
    goal_pos: tuple = (0.28, 0.58, 0.8)
    goal_noise: tuple = (0.15, 0.15, 0.1)
    spawn_noise: tuple = (0.1, 0.1, 0.0)
    # control
    arm_action_scale: float = 1.0
    servo_smoothing_alpha: float = 0.8
    # solver
    solver_iterations: int = 8
    # "bf16" halves prep HBM traffic on TPU; effective masses / impulses
    # stay f32. Default on: stack/kick/friction suites pass and the r3a
    # lift policy evaluates at equal success (0.715 vs 0.672 f32).
    solver_prep_dtype: str = "bf16"
    # evaluate the heavy mass structure (compute_dyn + solver._prepare)
    # once per CONTROL step instead of once per sim step — the TGS
    # heavy/light split stretched over control_freq_inv*dt (engine.
    # HeavyPrep). Per-sim-step FK/contact gen/geometry refresh still run;
    # stability suites pass at this cadence (tests/test_engine.py
    # heavy-cadence probes). Default on: 281K -> 409K env-steps/s @ 8192.
    heavy_prep_per_control: bool = True
    # carry FK across the sim steps of one control step: exact FK (and the
    # contact set) is evaluated once by compute_heavy; sim step 1 consumes
    # it directly, steps 2..control_freq_inv use the first-order propagated
    # kinematics the previous step returns (engine.step carry_fk). Cuts the
    # sequential FK chain from 4x to 1x per control step; contacts from 4x
    # to 3x. Pose error O((qd*dt)^2) per step, re-anchored at 20 Hz.
    carry_fk: bool = True
    hand_only_collision: bool = True
    # randomization (object disturbance forces,
    # reference Ur5SihMultiObjectManipulation.yaml randomization_params;
    # off by default — enable for DR training runs)
    randomize: bool = False
    disturbance_probability: float = 0.2
    disturbance_magnitude: float = 15.0
    dr: DRConfig = field(default_factory=DRConfig)
    # DeXtreme-style adaptive DR (envs/adr.py); overrides the static DR
    # scales with per-env values drawn from ADAPTIVE ranges when enabled
    adr: AdrConfig = field(default_factory=AdrConfig)
    clip_observations: float = 100.0
    clip_actions: float = 1.0
    # sample reset targets proportional to per-object failure rate
    # (1 - success EWMA) instead of uniformly — concentrates experience
    # on the objects the policy has not mastered (see _sample_target)
    balanced_target_sampling: bool = False
    # synthetic pointclouds (reference Ur5SihMultiObject.yaml pointclouds)
    pointcloud_average_points: int = 100
    pointcloud_max_points: int = 128
    # genesis drop initialization (reference drop.num_steps / num_initial_poses)
    use_drop_init: bool = False
    num_initial_poses: int = 1
    drop_num_steps: int = 100
    # camera sensors (point-rasterized depth/segmentation; reference
    # Ur5SihMultiObject.yaml cameras block)
    cameras: tuple = ()  # tuple of envs.camera.CameraConfig


from handarm_tpu.robots.ur5sih_adapter import ControlState  # noqa: E402


class TaskState(NamedTuple):
    progress: jnp.ndarray  # [B] int32
    goal_pos: jnp.ndarray  # [B, 3]
    goal_quat: jnp.ndarray  # [B, 4] (oriented_reposition hand-orientation goal)
    target_obj: jnp.ndarray  # [B] int32
    goal_reached_before: jnp.ndarray  # [B] bool
    initial_obj_pos: jnp.ndarray  # [B, K, 3] positions at episode start
    key: jnp.ndarray  # PRNG key (uint32[2] or typed key), shared across batch
    total_steps: jnp.ndarray | None = None  # global step count (DR schedule)
    dr: DRState | None = None  # per-env frozen randomizations
    adr: AdrState | None = None  # adaptive-DR ranges/workers (envs/adr.py)


class Metrics(NamedTuple):
    """Success-rate EWMAs carried in device state and emitted via info —
    no host syncs (reference logs these from python:
    multi_object_manipulation.py:316-351)."""

    success_ewma: jnp.ndarray  # scalar
    per_object_ewma: jnp.ndarray  # [K]
    total_resets: jnp.ndarray  # scalar
    total_successes: jnp.ndarray  # scalar
    # stricter than the reference's latched criterion: goal condition must
    # HOLD at episode end (a flung object that peaked above the goal height
    # mid-episode doesn't count here)
    end_success_ewma: jnp.ndarray = jnp.zeros(())


class EnvState(NamedTuple):
    physics: PhysicsState
    control: Any  # robot-specific control pytree (adapter.init_control)
    task: TaskState
    metrics: Metrics


class StepResult(NamedTuple):
    obs: jnp.ndarray  # [B, obs_dim]
    teacher_obs: jnp.ndarray  # [B, teacher_obs_dim] (0-dim if unused)
    reward: jnp.ndarray  # [B]
    done: jnp.ndarray  # [B] bool
    info: dict
    obs_dict: dict = {}  # non-flat observables (pointclouds etc.) by key


# ---------------------------------------------------------------------------
# observation context: lazily computed, cached quantities shared by terms


class ObsContext:
    def __init__(
        self,
        env: "HandArmEnv",
        state: EnvState,
        info: StepInfo | None,
        obs_key: jnp.ndarray | None = None,
    ):
        self.env = env
        self.state = state
        self.info = info
        # rng for stochastic observables (pointcloud subsampling, obs noise)
        self.obs_key = (
            obs_key if obs_key is not None else jax.random.PRNGKey(0)
        )
        self._cache: dict[str, Any] = {}

    def _get(self, name, fn):
        if name not in self._cache:
            self._cache[name] = fn()
        return self._cache[name]

    @property
    def fk(self):
        return self._get(
            "fk",
            lambda: forward_kinematics(
                self.env.scene.model,
                self.state.physics.robot.q,
                self.env.scene.base_quat[None],
                self.env.scene.base_pos[None],
            ),
        )

    @property
    def fingertips(self):
        """(quat [B,5,4], pos [B,5,3])"""
        return self._get(
            "tips",
            lambda: site_poses(
                self.fk, *self.env.fingertip_sites,
                base_quat=jnp.broadcast_to(
                    self.env.scene.base_quat, (self.batch, 4)
                ),
                base_pos=jnp.broadcast_to(self.env.scene.base_pos, (self.batch, 3)),
            ),
        )

    @property
    def flange(self):
        return self._get(
            "flange",
            lambda: site_poses(
                self.fk, *self.env.flange_site,
                base_quat=jnp.broadcast_to(self.env.scene.base_quat, (self.batch, 4)),
                base_pos=jnp.broadcast_to(self.env.scene.base_pos, (self.batch, 3)),
            ),
        )

    @property
    def batch(self):
        return self.state.physics.robot.q.shape[0]

    @property
    def target_object_pos(self):
        t = self.state.task.target_obj
        return jnp.take_along_axis(
            self.state.physics.objects.pos, t[:, None, None], axis=1
        )[:, 0]

    @property
    def target_object_quat(self):
        t = self.state.task.target_obj
        return jnp.take_along_axis(
            self.state.physics.objects.quat, t[:, None, None], axis=1
        )[:, 0]

    def fingertip_vel(self):
        """(linvel [B,5,3], angvel [B,5,3]) of fingertip sites."""

        def compute():
            from handarm_tpu.physics.kinematics import body_velocities

            bv = body_velocities(
                self.env.scene.model, self.fk, self.state.physics.robot.qd
            )  # [B, nb, 6]
            body_idx = self.env.fingertip_sites[0]
            _, tip_pos = self.fingertips
            v = bv[:, body_idx]  # [B, 5, 6]
            ang = v[..., :3]
            lin = v[..., 3:] + jnp.cross(ang, tip_pos)
            return lin, ang

        return self._get("tipvel", compute)


# ---------------------------------------------------------------------------
# registry: the declarative observable/actionable catalog

REGISTRY = Registry()


@REGISTRY.observable("ur5_joint_pos", 6)
def _obs_ur5_joint_pos(ctx):
    return ctx.state.physics.robot.q[:, :6]


@REGISTRY.observable("ur5_joint_vel", 6)
def _obs_ur5_joint_vel(ctx):
    return ctx.state.physics.robot.qd[:, :6]


@REGISTRY.observable("ur5_joint_state", 12)
def _obs_ur5_joint_state(ctx):
    r = ctx.state.physics.robot
    return jnp.concatenate([r.q[:, :6], r.qd[:, :6]], axis=-1)


@REGISTRY.observable("ur5_flange_pose", 7)
def _obs_flange_pose(ctx):
    q, p = ctx.flange
    return jnp.concatenate([p[:, 0], q[:, 0]], axis=-1)


@REGISTRY.observable("sih_fingertip_pos", 15)
def _obs_tip_pos(ctx):
    return ctx.fingertips[1].reshape(ctx.batch, -1)


@REGISTRY.observable("sih_fingertip_quat", 20)
def _obs_tip_quat(ctx):
    return ctx.fingertips[0].reshape(ctx.batch, -1)


@REGISTRY.observable("sih_fingertip_linvel", 15)
def _obs_tip_linvel(ctx):
    return ctx.fingertip_vel()[0].reshape(ctx.batch, -1)


@REGISTRY.observable("sih_fingertip_angvel", 15)
def _obs_tip_angvel(ctx):
    return ctx.fingertip_vel()[1].reshape(ctx.batch, -1)


# dof_* and object observables are registered with env-dependent sizes at
# env build time (they depend on nv / K); see _register_dynamic_observables.


# --- actionables ------------------------------------------------------------


@REGISTRY.actionable("ur5_relative_joint_pos", 6)
def _act_arm_rel(env, control: ControlState, a):
    # dt-integrated relative joint target (reference ur5sih.py:397-408)
    new_target = control.arm_target + env.cfg.dt * env.cfg.arm_action_scale * a
    return control._replace(
        arm_target=jnp.clip(new_target, env.arm_limits[0], env.arm_limits[1])
    )


@REGISTRY.actionable("sih_absolute_servo_pos", 5)
def _act_servo_abs(env, control: ControlState, a):
    lo = jnp.asarray(SERVO_LOWER, a.dtype)
    hi = jnp.asarray(SERVO_UPPER, a.dtype)
    ticks = lo + (a * 0.5 + 0.5) * (hi - lo)
    return control._replace(servo_ticks=ticks)


@REGISTRY.actionable("sih_relative_servo_pos", 5)
def _act_servo_rel(env, control: ControlState, a):
    lo = jnp.asarray(SERVO_LOWER, a.dtype)
    hi = jnp.asarray(SERVO_UPPER, a.dtype)
    ticks = jnp.clip(control.servo_ticks + 100.0 * a, lo, hi)
    return control._replace(servo_ticks=ticks)


@REGISTRY.actionable("sih_smoothed_relative_servo_pos", 5)
def _act_servo_smooth(env, control: ControlState, a):
    # EMA-smoothed relative servo ticks (reference ur5sih.py:485-498)
    alpha = env.cfg.servo_smoothing_alpha
    smoothed = alpha * a + (1 - alpha) * control.sih_smoothed
    lo = jnp.asarray(SERVO_LOWER, a.dtype)
    hi = jnp.asarray(SERVO_UPPER, a.dtype)
    ticks = jnp.clip(control.servo_ticks + 100.0 * smoothed, lo, hi)
    return control._replace(servo_ticks=ticks, sih_smoothed=smoothed)


# ---------------------------------------------------------------------------


class HandArmEnv:
    """Vectorized UR5+SIH manipulation env. All public methods are pure and
    jittable; the instance holds only static configuration."""

    def __init__(self, cfg: HandArmConfig):
        self.cfg = cfg
        self.robot = get_robot(cfg.robot)
        art = self.robot.art
        self.art = art
        objs = []
        self.object_names: list[str] = []
        if cfg.object_dataset:
            from handarm_tpu.envs.objects import load_object, resolve_object_set

            dataset = {name: list(pats) for name, pats in cfg.object_dataset}
            resolved = resolve_object_set(dataset)
            if cfg.num_objects:
                resolved = resolved[: cfg.num_objects]
            for name, path in resolved:
                objs.append(load_object(path))
                self.object_names.append(name)
        for kind, size, mass in cfg.objects if not cfg.object_dataset else ():
            if kind == "box":
                from handarm_tpu.physics.shapes import make_box_object

                objs.append(make_box_object(list(size), mass))
            elif kind == "sphere":
                from handarm_tpu.physics.shapes import make_sphere_object

                objs.append(make_sphere_object(size[0], mass))
            else:
                raise NotImplementedError(kind)
            self.object_names.append(f"{kind}_{len(self.object_names)}")
        shapes = stack_objects(objs)
        spheres = self.robot.make_spheres(cfg.hand_only_collision)
        wall_lo, wall_hi = [], []
        if cfg.use_bin:
            cx, cy = cfg.bin_center if cfg.bin_center else cfg.drop_pos[:2]
            e, th = cfg.bin_half_extent, cfg.bin_wall_thickness
            z0, z1 = cfg.table_height, cfg.table_height + cfg.bin_wall_height
            walls = [
                ((cx - e - th, cy - e - th, z0), (cx - e, cy + e + th, z1)),
                ((cx + e, cy - e - th, z0), (cx + e + th, cy + e + th, z1)),
                ((cx - e - th, cy - e - th, z0), (cx + e + th, cy - e, z1)),
                ((cx - e - th, cy + e, z0), (cx + e + th, cy + e + th, z1)),
            ]
            wall_lo = [w[0] for w in walls]
            wall_hi = [w[1] for w in walls]
        geom = StaticGeom(
            table_lo=jnp.asarray(cfg.table_lo, jnp.float32),
            table_hi=jnp.asarray(cfg.table_hi, jnp.float32),
            table_height=jnp.asarray(cfg.table_height, jnp.float32),
            friction=jnp.asarray(1.0, jnp.float32),
            wall_lo=np.asarray(wall_lo, np.float32).reshape(-1, 3),
            wall_hi=np.asarray(wall_hi, np.float32).reshape(-1, 3),
        )
        from handarm_tpu.physics.solver import SolverParams

        bx, by = self.robot.base_xy
        yaw = self.robot.base_yaw
        self.scene: Scene = build_scene(
            art, shapes, spheres, geom,
            kp=self.robot.kp, kd=self.robot.kd,
            base_pos=(bx, by, cfg.table_height),
            base_quat=(float(np.cos(yaw / 2)), 0.0, 0.0,
                       float(np.sin(yaw / 2))),
            params=SimParams(
                dt=cfg.dt, substeps=cfg.substeps,
                solver=SolverParams(
                    iterations=cfg.solver_iterations,
                    # single-point contacts need explicit rolling
                    # resistance (PhysX's patch manifolds give it
                    # implicitly); without it a tapped sphere never stops
                    rolling_friction=cfg.rolling_friction,
                    prep_dtype=cfg.solver_prep_dtype,
                ),
                # reference disables gravity on the robot asset
                # (base/ur5sih.py:176, base/stretch.py:148): the 120/20 PD
                # gains are tuned for a gravity-free arm
                robot_gravity=False,
            ),
        )
        self.fingertip_sites = self._sites(self.robot.fingertip_site_names)
        self.flange_site = self._sites([self.robot.flange_site_name])
        self.arm_limits = (
            jnp.asarray(art.q_min[:6], jnp.float32),
            jnp.asarray(art.q_max[:6], jnp.float32),
        )
        self.cfg_num_objects = shapes.num_objects
        from handarm_tpu.physics.shapes import sphere_points

        rb, ro = self.robot.surface_cloud(cfg.pointcloud_max_points)
        self.robot_cloud_bodies = rb
        self.robot_cloud_offsets = jnp.asarray(ro, jnp.float32)
        self.goal_cloud_points = jnp.asarray(sphere_points(0.02, 16), jnp.float32)
        # static per-point RGB albedo for the color camera family, aligned
        # with _camera_scene_points' concatenation (robot gray, then each
        # object's baked texture colors / a palette fallback)
        P_obj = shapes.points.shape[1] if shapes.num_objects else 0
        palette = np.array(
            [[0.86, 0.37, 0.34], [0.35, 0.61, 0.84], [0.48, 0.77, 0.46],
             [0.91, 0.72, 0.32], [0.66, 0.49, 0.77], [0.55, 0.78, 0.78]]
        )
        rgb_parts = [np.full((len(ro), 3), 0.35)]
        for k, o in enumerate(objs):
            block = np.tile(palette[k % len(palette)], (P_obj, 1))
            pr = o.get("point_rgb") if isinstance(o, dict) else None
            if pr is not None:
                block[: len(pr)] = pr
            rgb_parts.append(block)
        self.scene_point_rgb = jnp.asarray(
            np.concatenate(rgb_parts, axis=0), jnp.float32
        )
        # per-env registry: a copy of the module-level static registry plus
        # this env's dynamic (K/nv-dependent) terms — two envs with different
        # object sets in one process never share/clobber entries
        self.registry = Registry()
        self.registry.observables.update(REGISTRY.observables)
        self.registry.actionables.update(REGISTRY.actionables)
        self._register_dynamic_observables()
        self.active_obs = self.registry.resolve_observables(list(cfg.observations))
        self.obs_slices, self.num_obs = obs_layout(
            self.active_obs, list(cfg.observations)
        )
        if cfg.teacher_observations:
            self.active_teacher_obs = self.registry.resolve_observables(
                list(cfg.teacher_observations)
            )
            self.teacher_obs_slices, self.num_teacher_obs = obs_layout(
                self.active_teacher_obs, list(cfg.teacher_observations)
            )
        else:
            self.active_teacher_obs = []
            self.teacher_obs_slices, self.num_teacher_obs = {}, 0
        actions = cfg.actions
        if cfg.robot != "ur5sih" and actions == HandArmConfig.__dataclass_fields__["actions"].default:
            actions = self.robot.default_actions
        self.active_actions = self.registry.resolve_actionables(list(actions))
        self.num_actions = sum(a.size for a in self.active_actions)
        self.reset_q = jnp.asarray(self.robot.reset_q, jnp.float32)
        self.initial_pool = None  # set by initialize_pool / first reset

    def initialize_pool(self, key) -> None:
        """Run the genesis drop-settle jit once and cache the pose pool
        (reference first-reset drop initialization, SURVEY.md §3.4)."""
        from handarm_tpu.envs.genesis import build_initial_pool

        # host-driven: genesis internally dispatches bounded jitted sim
        # bursts (one monolithic drop+settle program at fleet batch runs
        # minutes of unbroken device time and gets killed by the remote
        # TPU tunnel) and blocks on each, so failures surface here
        self.initial_pool = build_initial_pool(
            self, key,
            num_configurations=self.cfg.num_initial_poses,
            drop_steps=self.cfg.drop_num_steps,
        )
        jax.block_until_ready(self.initial_pool.pos)

    # --- helpers ------------------------------------------------------------

    def _sites(self, names):
        body, pos, quat = self.art.site_array(names)
        return body, jnp.asarray(pos, jnp.float32), jnp.asarray(quat, jnp.float32)

    def _register_dynamic_observables(self):
        K = self.cfg_num_objects
        nv = self.art.nv
        reg = self.registry

        reg.observables["dof_position_targets"] = _mk_obs(
            "dof_position_targets", nv,
            lambda ctx: ctx.state.physics.robot.targets,
        )
        reg.observables["dof_pos"] = _mk_obs(
            "dof_pos", nv, lambda ctx: ctx.state.physics.robot.q
        )
        reg.observables["dof_vel"] = _mk_obs(
            "dof_vel", nv, lambda ctx: ctx.state.physics.robot.qd
        )
        self.robot.register_observables(reg, self)

        reg.observables["object_pos"] = _mk_obs(
            "object_pos", 3 * K,
            lambda ctx: ctx.state.physics.objects.pos.reshape(ctx.batch, -1),
        )
        reg.observables["object_quat"] = _mk_obs(
            "object_quat", 4 * K,
            lambda ctx: ctx.state.physics.objects.quat.reshape(ctx.batch, -1),
        )
        reg.observables["object_linvel"] = _mk_obs(
            "object_linvel", 3 * K,
            lambda ctx: ctx.state.physics.objects.linvel.reshape(ctx.batch, -1),
        )
        reg.observables["object_angvel"] = _mk_obs(
            "object_angvel", 3 * K,
            lambda ctx: ctx.state.physics.objects.angvel.reshape(ctx.batch, -1),
        )
        reg.observables["object_mass"] = _mk_obs(
            "object_mass", K,
            lambda ctx: jnp.broadcast_to(
                ctx.env.scene.shapes.mass[None], (ctx.batch, K)
            ),
        )
        # static mass properties (reference env/multi_object.py:907-925:
        # object_com / object_inertia acquired post-init from gym props).
        # Object body frames here are COM-centered by construction, so the
        # local COM offset is identically zero.
        reg.observables["object_com"] = _mk_obs(
            "object_com", 3 * K,
            lambda ctx: jnp.zeros((ctx.batch, 3 * K)),
        )
        reg.observables["object_inertia"] = _mk_obs(
            "object_inertia", 9 * K,
            lambda ctx: jnp.broadcast_to(
                jax.vmap(jnp.diag)(
                    ctx.env.scene.shapes.inertia_diag
                ).reshape(-1)[None],
                (ctx.batch, 9 * K),
            ),
        )

        def _obb_world(pos, quat, shapes, idx=None):
            """World pose of the TRUE oriented bounding box: the body pose
            composed with the precomputed body-frame OBB pose (reference
            transforms the trimesh OBB per step, multi_object.py:743-772)."""
            from handarm_tpu.math.quat import quat_mul

            obb_p = shapes.obb_pos if idx is None else shapes.obb_pos[idx]
            obb_q = shapes.obb_quat if idx is None else shapes.obb_quat[idx]
            p = pos + quat_rotate(quat, jnp.broadcast_to(obb_p, pos.shape))
            q = quat_mul(quat, jnp.broadcast_to(obb_q, quat.shape))
            return p, q

        def bbox_all(ctx):
            obj = ctx.state.physics.objects
            shapes = ctx.env.scene.shapes
            p, q = _obb_world(obj.pos, obj.quat, shapes)
            ext = 2.0 * shapes.size  # full extents
            ext = jnp.broadcast_to(ext[None], (ctx.batch, K, 3))
            return jnp.concatenate([p, q, ext], axis=-1).reshape(ctx.batch, -1)

        reg.observables["object_bounding_box"] = _mk_obs(
            "object_bounding_box", 10 * K, bbox_all
        )

        def bbox_target(ctx):
            t = ctx.state.task.target_obj
            shapes = ctx.env.scene.shapes
            p, q = _obb_world(
                ctx.target_object_pos, ctx.target_object_quat, shapes, t
            )
            ext = 2.0 * shapes.size[t]
            return jnp.concatenate([p, q, ext], axis=-1)

        reg.observables["target_object_bounding_box"] = _mk_obs(
            "target_object_bounding_box", 10, bbox_target
        )
        reg.observables["target_object_pos"] = _mk_obs(
            "target_object_pos", 3, lambda ctx: ctx.target_object_pos
        )
        reg.observables["target_object_quat"] = _mk_obs(
            "target_object_quat", 4, lambda ctx: ctx.target_object_quat
        )
        reg.observables["goal_pos"] = _mk_obs(
            "goal_pos", 3, lambda ctx: ctx.state.task.goal_pos
        )
        reg.observables["goal_quat"] = _mk_obs(
            "goal_quat", 4, lambda ctx: ctx.state.task.goal_quat
        )

        def keypoints(ctx):
            """8 OBB-corner keypoints of the target object in world frame
            (keypoint observables/rewards a la AllegroKuka,
            allegro_kuka_base.py:814)."""
            corners = jnp.asarray(
                [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
                 for sz in (-1.0, 1.0)]
            )  # [8, 3]
            t = ctx.state.task.target_obj
            shapes = self.scene.shapes
            half = shapes.size[t]  # [B, 3]
            pts = shapes.obb_pos[t][:, None, :] + quat_rotate(
                shapes.obb_quat[t][:, None, :], corners[None] * half[:, None, :]
            )  # OBB corners in body frame
            world = quat_rotate(
                ctx.target_object_quat[:, None, :], pts
            ) + ctx.target_object_pos[:, None, :]
            return world.reshape(ctx.batch, -1)

        reg.observables["target_object_keypoints"] = _mk_obs(
            "target_object_keypoints", 24, keypoints
        )

        def goal_keypoints(ctx):
            corners = jnp.asarray(
                [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
                 for sz in (-1.0, 1.0)]
            )
            t = ctx.state.task.target_obj
            shapes = self.scene.shapes
            half = shapes.size[t]
            pts = shapes.obb_pos[t][:, None, :] + quat_rotate(
                shapes.obb_quat[t][:, None, :], corners[None] * half[:, None, :]
            )
            world = quat_rotate(
                ctx.state.task.goal_quat[:, None, :], pts
            ) + ctx.state.task.goal_pos[:, None, :]
            return world.reshape(ctx.batch, -1)

        reg.observables["goal_keypoints"] = _mk_obs(
            "goal_keypoints", 24, goal_keypoints
        )
        reg.observables["sih_fingertip_to_target_object_pos"] = _mk_obs(
            "sih_fingertip_to_target_object_pos", 15,
            lambda ctx: (
                ctx.target_object_pos[:, None, :] - ctx.fingertips[1]
            ).reshape(ctx.batch, -1),
        )
        reg.observables["target_object_to_goal_pos"] = _mk_obs(
            "target_object_to_goal_pos", 3,
            lambda ctx: ctx.state.task.goal_pos - ctx.target_object_pos,
        )
        self._register_pointcloud_observables()

    def _register_pointcloud_observables(self):
        """Synthetic pointcloud observables, routed into obs_dict under their
        own keys (reference observable_vec_task.py:183-203; cloud building
        mirrors multi_object.py:774-819 and ur5sih.py:347-374)."""
        from handarm_tpu.envs import pointcloud as pc

        K = self.cfg_num_objects
        P_out = self.cfg.pointcloud_max_points
        reg = self.registry

        def object_cloud(ctx, types=None):
            obj = ctx.state.physics.objects
            clouds = []
            for k in range(K):
                typ = pc.REGULAR if types is None else types
                c = pc.transform_cloud(
                    self.scene.shapes.points[k],
                    self.scene.shapes.point_mask[k],
                    obj.quat[:, k], obj.pos[:, k],
                    point_type=typ,
                )
                clouds.append(c)
            return pc.merge_clouds(*clouds)

        def obs_object_cloud(ctx):
            return pc.subsample_pad(object_cloud(ctx), ctx.obs_key, P_out)

        reg.observables["object_synthetic_pointcloud"] = _mk_obs(
            "object_synthetic_pointcloud", P_out * 4, obs_object_cloud,
            key="object_synthetic_pointcloud",
        )

        def obs_target_cloud(ctx):
            t = ctx.state.task.target_obj
            pts = self.scene.shapes.points[t]  # [B, P, 3]
            mask = self.scene.shapes.point_mask[t]
            c = pc.transform_cloud(
                pts, mask, ctx.target_object_quat, ctx.target_object_pos,
                point_type=pc.TARGET,
            )
            return pc.subsample_pad(c, ctx.obs_key, P_out)

        reg.observables["target_object_synthetic_pointcloud"] = _mk_obs(
            "target_object_synthetic_pointcloud", P_out * 4, obs_target_cloud,
            key="target_object_synthetic_pointcloud",
        )

        # InvervalSample-transformed variants (reference multi_object.py:
        # 310-330 registers interval=4 corrupters for intermittent sensing)
        reg.observables["target_object_interval_pos"] = _mk_obs(
            "target_object_interval_pos", 3,
            lambda ctx: pc.interval_sample(
                ctx.target_object_pos, ctx.state.task.progress, 4
            ),
        )

        def obs_target_cloud_interval(ctx):
            return pc.interval_sample(
                obs_target_cloud(ctx), ctx.state.task.progress, 4
            )

        reg.observables["target_object_synthetic_interval_pointcloud"] = _mk_obs(
            "target_object_synthetic_interval_pointcloud", P_out * 4,
            obs_target_cloud_interval,
            key="target_object_synthetic_interval_pointcloud",
        )

        def obs_robot_cloud(ctx):
            fk = ctx.fk
            pts_w = fk.body_pos[:, self.robot_cloud_bodies] + quat_rotate(
                fk.body_quat[:, self.robot_cloud_bodies],
                self.robot_cloud_offsets[None],
            )
            typ = jnp.full(pts_w.shape[:-1] + (1,), float(pc.REGULAR))
            cloud = jnp.concatenate([pts_w, typ], axis=-1)
            return pc.subsample_pad(cloud, ctx.obs_key, P_out)

        reg.observables["ur5sih_synthetic_pointcloud"] = _mk_obs(
            "ur5sih_synthetic_pointcloud", P_out * 4, obs_robot_cloud,
            key="ur5sih_synthetic_pointcloud",
        )

        def obs_goal_cloud(ctx):
            c = pc.transform_cloud(
                self.goal_cloud_points,
                jnp.ones(self.goal_cloud_points.shape[0]),
                jnp.broadcast_to(
                    jnp.asarray([1.0, 0, 0, 0]), (ctx.batch, 4)
                ),
                ctx.state.task.goal_pos,
                point_type=pc.GOAL,
            )
            return c

        reg.observables["goal_synthetic_pointcloud"] = _mk_obs(
            "goal_synthetic_pointcloud", 0, obs_goal_cloud,
            key="goal_synthetic_pointcloud",
        )

        def obs_scene_cloud(ctx):
            cloud = pc.merge_clouds(
                object_cloud(ctx), obs_goal_cloud(ctx)
            )
            return pc.subsample_pad(cloud, ctx.obs_key, P_out)

        reg.observables["scene_synthetic_pointcloud"] = _mk_obs(
            "scene_synthetic_pointcloud", P_out * 4, obs_scene_cloud,
            key="scene_synthetic_pointcloud",
        )
        for cam in self.cfg.cameras:
            self._register_camera_observables(cam)

    def _camera_scene_points(self, ctx):
        """Combined (points_world [B,P,3], seg [B,P], types [B,P]) for the
        rasterized cameras: robot cloud (seg 1) + object samples (seg 3+k,
        reference segmentation-id convention)."""

        def compute():
            from handarm_tpu.envs import pointcloud as pc

            fk = ctx.fk
            B = ctx.batch
            rob = fk.body_pos[:, self.robot_cloud_bodies] + quat_rotate(
                fk.body_quat[:, self.robot_cloud_bodies],
                self.robot_cloud_offsets[None],
            )
            parts = [rob]
            segs = [jnp.ones((B, rob.shape[1]))]
            types = [jnp.full((B, rob.shape[1]), float(pc.REGULAR))]
            obj = ctx.state.physics.objects
            t = ctx.state.task.target_obj
            for k in range(self.cfg_num_objects):
                pts = obj.pos[:, k, None] + quat_rotate(
                    obj.quat[:, k, None], self.scene.shapes.points[None, k]
                )
                m = self.scene.shapes.point_mask[k][None]
                parts.append(pts)
                segs.append((3.0 + k) * m * jnp.ones((B, pts.shape[1])))
                is_tgt = (t == k).astype(jnp.float32)[:, None]
                types.append(
                    (float(pc.REGULAR) + (float(pc.TARGET) - float(pc.REGULAR)) * is_tgt)
                    * m
                )
            return (
                jnp.concatenate(parts, axis=1),
                jnp.concatenate(segs, axis=1),
                jnp.concatenate(types, axis=1),
            )

        return ctx._get("camera_scene_points", compute)

    def _register_camera_observables(self, cam):
        from handarm_tpu.envs.camera import render_points, visible_pointcloud

        reg = self.registry
        P_out = self.cfg.pointcloud_max_points

        def get_render(ctx):
            def compute():
                pts, segs, _ = self._camera_scene_points(ctx)
                return render_points(cam, pts, segs.astype(jnp.int32), valid=segs)

            return ctx._get(f"render_{cam.name}", compute)

        reg.observables[f"{cam.name}_depth"] = _mk_obs(
            f"{cam.name}_depth", 0, lambda ctx: get_render(ctx).depth,
            key=f"{cam.name}_depth",
        )
        reg.observables[f"{cam.name}_segmentation"] = _mk_obs(
            f"{cam.name}_segmentation", 0,
            lambda ctx: get_render(ctx).segmentation,
            key=f"{cam.name}_segmentation",
        )

        def get_color(ctx):
            """Flat-shaded RGB image (reference ImageType.COLOR). Separate
            cached compute so depth/segmentation/pointcloud consumers don't
            pay for the color scatter when no color obs is requested."""

            def compute():
                pts, segs, _ = self._camera_scene_points(ctx)
                return render_points(
                    cam, pts, segs.astype(jnp.int32), valid=segs,
                    colors=self.scene_point_rgb,
                ).color

            return ctx._get(f"render_color_{cam.name}", compute)

        reg.observables[f"{cam.name}_color"] = _mk_obs(
            f"{cam.name}_color", 0, get_color, key=f"{cam.name}_color",
        )

        def cam_cloud(ctx):
            pts, _, types = self._camera_scene_points(ctx)
            return visible_pointcloud(
                get_render(ctx), pts, types, ctx.obs_key, P_out
            )

        reg.observables[f"{cam.name}_pointcloud"] = _mk_obs(
            f"{cam.name}_pointcloud", 0, cam_cloud,
            key=f"{cam.name}_pointcloud",
        )

        def cam_target_cloud(ctx):
            """Segmentation-masked target-object cloud (the reference's
            camera-segmented target pointcloud, multi_object.py:837-855)."""
            from handarm_tpu.envs import pointcloud as pc

            pts, segs, _ = self._camera_scene_points(ctx)
            r = get_render(ctx)
            t = ctx.state.task.target_obj.astype(jnp.float32)
            is_target = (segs == (3.0 + t[:, None])).astype(jnp.float32)
            types = float(pc.TARGET) * is_target
            return visible_pointcloud(r, pts, types, ctx.obs_key, P_out)

        reg.observables[f"{cam.name}_target_object_pointcloud"] = _mk_obs(
            f"{cam.name}_target_object_pointcloud", 0, cam_target_cloud,
            key=f"{cam.name}_target_object_pointcloud",
        )

    # --- reset --------------------------------------------------------------

    def _sample_object_poses(self, key, B):
        """Objects spawn resting on the table around the drop xy, separated
        along x to avoid initial interpenetration."""
        K = self.cfg_num_objects
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(key, 3)
        center = jnp.asarray(cfg.drop_pos, jnp.float32)[:2]
        noise = jax.random.uniform(
            k1, (B, K, 2), minval=-1.0, maxval=1.0
        ) * jnp.asarray(cfg.spawn_noise, jnp.float32)[:2]
        spread = (jnp.arange(K, dtype=jnp.float32) - (K - 1) / 2.0) * 0.12
        # per-env random slot order: without this, slot k always rests at
        # the k-th x offset and slot identity leaks through position (the
        # target observations become ignorable — see reset() genesis note)
        perm = jax.vmap(lambda kk: jax.random.permutation(kk, K))(
            jax.random.split(k3, B)
        )
        xy = center[None, None] + noise
        xy = xy.at[..., 0].add(spread[perm])
        rest_h = self._rest_heights()  # [K]
        z = jnp.broadcast_to(
            cfg.table_height + rest_h[None], (B, K)
        )
        pos = jnp.concatenate([xy, z[..., None]], axis=-1)
        yaw = jax.random.uniform(k2, (B, K), minval=-np.pi, maxval=np.pi)
        axis = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (B, K, 3))
        quat = quat_from_axis_angle(axis, yaw)
        return pos, quat

    def _rest_heights(self):
        """Height of each object's com above the surface when resting
        (meshes use a conservative bound; drop-init settles them exactly)."""
        from handarm_tpu.physics.shapes import BOX, SPHERE

        shp = self.scene.shapes
        h = []
        for k in range(self.cfg_num_objects):
            if shp.kind[k] == BOX:
                h.append(shp.size[k, 2])
            elif shp.kind[k] == SPHERE:
                h.append(shp.size[k, 0])
            else:
                h.append(shp.bound_radius[k])
        return jnp.stack(h)

    def _sample_goal(self, key, B):
        cfg = self.cfg
        base = jnp.asarray(cfg.goal_pos, jnp.float32)
        noise = jax.random.uniform(key, (B, 3), minval=-1.0, maxval=1.0) * jnp.asarray(
            cfg.goal_noise, jnp.float32
        )
        return base[None] + noise

    def _sample_target(self, ktgt, B, per_object_ewma=None):
        """Target-object sampling. Uniform by default; with
        balanced_target_sampling, sample proportional to per-object
        FAILURE rate (1 - success EWMA + floor) so hard objects get more
        experience instead of the batch gradient hiding in the easy one
        (round-3 multiobj collapse: obj0 0.96, obj1/2 ~3e-5 — the policy
        only ever practiced the peach once it paid off)."""
        K = self.cfg_num_objects
        if (
            per_object_ewma is None
            or not self.cfg.balanced_target_sampling
            or K <= 1
        ):
            return jax.random.randint(ktgt, (B,), 0, K).astype(jnp.int32)
        w = 1.0 - per_object_ewma + 0.15  # floor keeps mastered objects in play
        return jax.random.categorical(
            ktgt, jnp.log(w)[None, :].repeat(B, 0)
        ).astype(jnp.int32)

    def _fresh_state(self, key, B, per_object_ewma=None) -> EnvState:
        kobj, kgoal, ktgt, knext = jax.random.split(key, 4)
        if self.initial_pool is not None:
            # sample a stored drop-settled configuration per env
            # (reference multi_object_manipulation.py:73-91)
            n_cfg = self.initial_pool.pos.shape[0]
            idx = jax.random.randint(kobj, (B,), 0, n_cfg)
            envs = jnp.arange(B)
            pos = self.initial_pool.pos[idx, envs]
            quat = self.initial_pool.quat[idx, envs]
        else:
            pos, quat = self._sample_object_poses(kobj, B)
        K = self.cfg_num_objects
        physics = PhysicsState(
            robot=RobotState(
                q=jnp.broadcast_to(self.reset_q, (B, self.art.nv)),
                qd=jnp.zeros((B, self.art.nv), jnp.float32),
                targets=jnp.broadcast_to(self.reset_q, (B, self.art.nv)),
            ),
            objects=ObjectState(
                pos=pos, quat=quat,
                linvel=jnp.zeros((B, K, 3), jnp.float32),
                angvel=jnp.zeros((B, K, 3), jnp.float32),
            ),
            contact_impulse=jnp.zeros(
                (B, self.scene.slots.num_slots, 3), jnp.float32
            ),
        )
        control = self.robot.init_control(B)
        dr_state = (
            init_dr_state(
                self.cfg.dr, jax.random.fold_in(key, 7), B, K, self.art.nv,
                self.num_obs, self.num_actions,
            )
            if self.cfg.dr.enabled
            else None
        )
        adr_state = (
            init_adr_state(self.cfg.adr, jax.random.fold_in(key, 11), B)
            if self.cfg.adr.enabled
            else None
        )
        if self.cfg.goal in ("oriented_reposition", "repose"):
            # random hand-orientation goal from two uniform x/y rotations
            # (reference _get_random_quat, multi_object_manipulation.py:185-190)
            ku1, ku2 = jax.random.split(jax.random.fold_in(kgoal, 1))
            u = jax.random.uniform(ku1, (B, 2), minval=-1.0, maxval=1.0)
            qx = quat_from_axis_angle(
                jnp.broadcast_to(jnp.asarray([1.0, 0, 0]), (B, 3)),
                u[:, 0] * jnp.pi,
            )
            qy = quat_from_axis_angle(
                jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0]), (B, 3)),
                u[:, 1] * jnp.pi,
            )
            goal_quat = quat_mul(qx, qy)
        else:
            goal_quat = jnp.broadcast_to(
                jnp.asarray([1.0, 0, 0, 0], jnp.float32), (B, 4)
            )
        task = TaskState(
            progress=jnp.zeros(B, jnp.int32),
            goal_pos=self._sample_goal(kgoal, B),
            goal_quat=goal_quat,
            target_obj=self._sample_target(ktgt, B, per_object_ewma),
            goal_reached_before=jnp.zeros(B, bool),
            initial_obj_pos=pos,
            key=knext,
            total_steps=jnp.zeros((), jnp.int32),
            dr=dr_state,
            adr=adr_state,
        )
        metrics = Metrics(
            success_ewma=jnp.zeros(()),
            per_object_ewma=jnp.zeros(K),
            total_resets=jnp.zeros(()),
            total_successes=jnp.zeros(()),
        )
        return EnvState(physics=physics, control=control, task=task, metrics=metrics)

    def ensure_initial_pool(self, under_trace: bool = False) -> None:
        """Build the genesis drop-settle pool if this env needs one and it
        doesn't exist yet. Genesis is HOST-DRIVEN (bounded jitted sim
        bursts + python early-exit — one monolithic drop+settle program at
        fleet batch is minutes of unbroken device time and gets killed by
        the remote TPU tunnel), so it cannot run inside a jit trace:
        callers that jit reset() must call this first (ppo/distill init do).

        The pool key is derived from num_envs only, NOT the training seed —
        by design: the pool is a fixed dataset of drop-settled pile
        configurations (analogous to the reference settling its piles once
        at sim start), and seed-to-seed variation enters through the reset
        keys that SELECT from the pool each episode. Keeping the pool
        seed-invariant also lets repeated runs share the multi-minute
        settle cost via identical device programs."""
        import os

        if (
            not self.cfg.use_drop_init
            or self.initial_pool is not None
            or os.environ.get("HANDARM_DISABLE_GENESIS") == "1"
        ):
            return
        if under_trace:
            raise RuntimeError(
                "HandArmEnv.reset was jitted before the genesis pool was "
                "built; call env.ensure_initial_pool() before jax.jit(reset)"
            )
        import time

        t0 = time.perf_counter()
        self.initialize_pool(jax.random.PRNGKey(23 + self.cfg.num_envs))
        print(
            f"[genesis] drop-settled {self.cfg.num_initial_poses} pose "
            f"configuration(s) for {self.cfg.num_envs} envs in "
            f"{time.perf_counter() - t0:.1f}s",
            flush=True,
        )

    def reset(self, key) -> tuple[EnvState, jnp.ndarray]:
        # Genesis drop-init wiring: dataset (mesh-object) envs settle their
        # object piles once here, BEFORE the first step() trace, so both the
        # initial state and the fused auto-reset gather from drop-settled
        # pools instead of the analytic spawn (reference first-reset drop
        # init, multi_object_manipulation.py:93-156). Without this the
        # objects rest at fixed per-slot x offsets and slot identity leaks
        # through position — a policy can ignore the target observations
        # entirely and still clear 1/num_objects success by always grasping
        # the easiest object's spot (observed: round-3 plateau at 0.32).
        # HANDARM_DISABLE_GENESIS=1 is the test-suite escape hatch (the
        # drop-settle is expensive on the CPU test platform).
        self.ensure_initial_pool(under_trace=isinstance(key, jax.core.Tracer))
        state = self._fresh_state(key, self.cfg.num_envs)
        # stagger the initial episode clocks: with a common start, all envs
        # time out in LOCKSTEP forever (the whole fleet resets on the same
        # step), which synchronizes the state distribution across the batch
        # and starves PPO of early-episode data between reset waves
        k_prog = jax.random.fold_in(key, 17)
        prog0 = jax.random.randint(
            k_prog, (self.cfg.num_envs,), 0, self.cfg.episode_length
        )
        state = state._replace(task=state.task._replace(progress=prog0))
        ctx = ObsContext(self, state, None)
        return state, self._compute_obs(ctx, self.active_obs, self.cfg.observations)

    def observe(self, state: EnvState):
        """Recompute (obs, teacher_obs, obs_dict) for a state without
        stepping (used by learners needing privileged obs at t=0)."""
        ctx = ObsContext(self, state, None, obs_key=jax.random.fold_in(state.task.key, 3))
        obs, obs_dict = self._compute_obs(
            ctx, self.active_obs, self.cfg.observations, with_dict=True
        )
        teacher = (
            self._compute_obs(
                ctx, self.active_teacher_obs, self.cfg.teacher_observations
            )
            if self.active_teacher_obs
            else jnp.zeros((ctx.batch, 0), obs.dtype)
        )
        return obs, teacher, obs_dict

    # --- step ---------------------------------------------------------------

    def step(self, state: EnvState, actions: jnp.ndarray) -> tuple[EnvState, StepResult]:
        cfg = self.cfg
        B = actions.shape[0]
        actions = jnp.clip(actions, -cfg.clip_actions, cfg.clip_actions)
        key, k_dist, k_reset, k_act_noise = jax.random.split(state.task.key, 4)

        dr_strength = None
        if cfg.dr.enabled:
            dr_strength = schedule_strength(cfg.dr, state.task.total_steps)
            actions = jnp.clip(
                apply_noise(
                    cfg.dr.action_noise, k_act_noise, actions,
                    state.task.dr.act_corr, dr_strength,
                ),
                -cfg.clip_actions, cfg.clip_actions,
            )

        # 1. actionables -> control state -> PD targets
        control = state.control
        off = 0
        for act in self.active_actions:
            control = act.apply(self, control, actions[:, off : off + act.size])
            off += act.size
        targets = self.robot.compute_targets(
            self, control, state.physics.robot.q
        )
        physics = state.physics._replace(
            robot=state.physics.robot._replace(targets=targets)
        )

        # 1b. domain randomization: random object disturbance impulses
        # (reference randomization_params.object_disturbance)
        if cfg.randomize and cfg.disturbance_probability > 0:
            kd1, kd2 = jax.random.split(k_dist)
            K = self.cfg_num_objects
            hit = (
                jax.random.uniform(kd1, (B, K, 1)) < cfg.disturbance_probability
            )
            # mass-proportional force F = u * m * magnitude applied for one
            # sim step (reference hand_arm_old/task/multi_object_manipulation
            # .py:45-62): dv = u * magnitude * dt, uniform direction
            u = jax.random.normal(kd2, (B, K, 3))
            u = u / jnp.maximum(
                jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-9
            )
            dv = u * cfg.disturbance_magnitude * cfg.dt
            physics = physics._replace(
                objects=physics.objects._replace(
                    linvel=physics.objects.linvel + jnp.where(hit, dv, 0.0)
                )
            )

        # 2. physics: control_freq_inv outer steps fused in one scan
        from handarm_tpu.physics.engine import EnvOverrides

        ovr = EnvOverrides()
        if cfg.dr.enabled:
            drs = state.task.dr
            gravity = None
            if cfg.dr.gravity_noise > 0:
                gravity = jnp.broadcast_to(
                    self.scene.gravity, (B, 3)
                ).at[:, 2].add(drs.gravity_z)
            ovr = EnvOverrides(
                gain_scale=drs.gain_scale,
                gravity=gravity,
                mass_scale=drs.mass_scale,
                friction_scale=drs.friction_scale,
            )
        if cfg.adr.enabled:
            # ADR values override the static DR scales (canonical order:
            # mass_scale, friction_scale, gain_scale, gravity_z)
            v = state.task.adr.values
            K_ = self.cfg_num_objects
            ovr = EnvOverrides(
                gain_scale=jnp.broadcast_to(
                    v[:, 2:3], (B, self.art.nv)
                ),
                gravity=jnp.broadcast_to(self.scene.gravity, (B, 3))
                .at[:, 2].add(v[:, 3]),
                mass_scale=jnp.broadcast_to(v[:, 0:1], (B, K_)),
                friction_scale=v[:, 1],
            )

        if cfg.heavy_prep_per_control:
            from handarm_tpu.physics.engine import compute_heavy

            heavy = compute_heavy(self.scene, physics, ovr)

            if cfg.carry_fk and not self.art.floating:
                # sim step 1 reuses compute_heavy's exact FK + contact set
                # (bit-identical — same q); steps 2..N ride the propagated
                # FK the previous step returns, so the sequential FK chain
                # runs once per control step instead of 4x
                physics, info_last, fk = physics_step(
                    self.scene, physics, ovr, heavy=heavy,
                    fk0=heavy.fk0, contacts0=heavy.contacts0, carry_fk=True,
                )
                if cfg.control_freq_inv > 1:
                    def body(carry, _):
                        s, fk = carry
                        s, info, fk = physics_step(
                            self.scene, s, ovr, heavy=heavy, fk0=fk,
                            carry_fk=True,
                        )
                        return (s, fk), info

                    (physics, fk), infos = jax.lax.scan(
                        body, (physics, fk), None,
                        length=cfg.control_freq_inv - 1,
                    )
                    info_last = jax.tree.map(lambda x: x[-1], infos)
            else:
                def body(s, _):
                    return physics_step(self.scene, s, ovr, heavy=heavy)

                physics, infos = jax.lax.scan(
                    body, physics, None, length=cfg.control_freq_inv
                )
                info_last = jax.tree.map(lambda x: x[-1], infos)
        else:

            def body(s, _):
                return physics_step(self.scene, s, ovr)

            physics, infos = jax.lax.scan(
                body, physics, None, length=cfg.control_freq_inv
            )
            info_last = jax.tree.map(lambda x: x[-1], infos)

        progress = state.task.progress + 1
        task = state.task._replace(
            progress=progress, key=key,
            total_steps=state.task.total_steps + 1,
        )
        state2 = state._replace(physics=physics, task=task)

        # 3. reward + termination on the post-physics state
        ctx = ObsContext(self, state2, info_last)
        reward, goal_reached, reward_terms = self._compute_reward(ctx)
        goal_reached_before = state2.task.goal_reached_before | goal_reached
        # finite guard: an env whose physics went non-finite (rare tail
        # events at fleet batch sizes) resets immediately and contributes
        # zero reward — one bad env must not poison the learner batch
        # (reference relies on PhysX never returning NaN; we guard instead)
        finite = (
            jnp.all(jnp.isfinite(physics.robot.q), axis=-1)
            & jnp.all(jnp.isfinite(physics.robot.qd), axis=-1)
            & jnp.all(
                jnp.isfinite(physics.objects.pos.reshape(B, -1)), axis=-1
            )
            & jnp.all(
                jnp.isfinite(physics.objects.quat.reshape(B, -1)), axis=-1
            )
            & jnp.all(
                jnp.isfinite(physics.objects.linvel.reshape(B, -1)), axis=-1
            )
            & jnp.all(
                jnp.isfinite(physics.objects.angvel.reshape(B, -1)), axis=-1
            )
            & jnp.all(
                jnp.isfinite(physics.contact_impulse.reshape(B, -1)), axis=-1
            )
        )
        reward = jnp.where(finite & jnp.isfinite(reward), reward, 0.0)
        goal_reached = goal_reached & finite
        done = (progress >= cfg.episode_length) | ~finite
        task = task._replace(goal_reached_before=goal_reached_before)

        # 4. success-rate EWMA metrics (device-side)
        metrics = self._update_metrics(
            state.metrics, done, goal_reached_before, task.target_obj,
            goal_reached_now=goal_reached,
        )

        # 5. fused auto-reset
        fresh = self._fresh_state(
            k_reset, B, per_object_ewma=metrics.per_object_ewma
        )
        merged = jax.tree.map(
            lambda new, old: _where_done(done, new, old),
            fresh._replace(metrics=metrics, task=fresh.task._replace(key=key)),
            EnvState(physics=physics, control=control, task=task, metrics=metrics),
        )
        # metrics/key are global (not per-env): keep the non-reset versions
        merged = merged._replace(
            metrics=metrics, task=merged.task._replace(key=key)
        )
        if cfg.adr.enabled:
            # ADR transition is computed on the PRE-reset episode outcomes
            # and replaces the merged state's adr wholesale (its range/queue
            # fields are global, not per-env — the where-merge above must
            # not touch them)
            key, k_adr = jax.random.split(key)
            adr_new = adr_step(
                cfg.adr, state.task.adr, done,
                goal_reached_before.astype(jnp.float32), k_adr,
            )
            merged = merged._replace(
                task=merged.task._replace(adr=adr_new, key=key)
            )

        # 6. observations on the post-reset state
        key, k_obs = jax.random.split(key)
        merged = merged._replace(task=merged.task._replace(key=key))
        ctx_out = ObsContext(self, merged, info_last, obs_key=k_obs)
        obs, obs_dict = self._compute_obs(
            ctx_out, self.active_obs, self.cfg.observations, with_dict=True
        )
        if cfg.dr.enabled:
            key, k_obs_noise = jax.random.split(key)
            merged = merged._replace(task=merged.task._replace(key=key))
            obs = jnp.clip(
                apply_noise(
                    cfg.dr.observation_noise, k_obs_noise, obs,
                    merged.task.dr.obs_corr, dr_strength,
                ),
                -cfg.clip_observations, cfg.clip_observations,
            )
        teacher_obs = (
            self._compute_obs(
                ctx_out, self.active_teacher_obs, self.cfg.teacher_observations
            )
            if self.active_teacher_obs
            else jnp.zeros((B, 0), obs.dtype)
        )
        # hard contract: the env never emits non-finite observations. Even
        # with the per-env finite guard above, obs terms sourced from the
        # PRE-reset step info (contact forces) or from un-guarded leaves can
        # leak a NaN from a blown-up env into the learner, where the critic
        # value poisons GAE for the whole horizon (root cause of the
        # lift_r2d NaN rows — see tests/test_nan_containment.py).
        obs = jnp.where(jnp.isfinite(obs), obs, 0.0)
        teacher_obs = jnp.where(jnp.isfinite(teacher_obs), teacher_obs, 0.0)
        result = StepResult(
            obs=obs,
            teacher_obs=teacher_obs,
            reward=reward,
            done=done,
            obs_dict=obs_dict,
            info=dict(
                success_rate_ewma=metrics.success_ewma,
                end_success_rate_ewma=metrics.end_success_ewma,
                per_object_success_ewma=metrics.per_object_ewma,
                max_penetration=info_last.max_penetration,
                **reward_terms,
            ),
        )
        return merged, result

    # --- internals ----------------------------------------------------------

    def _compute_obs(self, ctx, active, requested, with_dict: bool = False):
        outs = {}
        obs_dict = {}
        for o in active:
            v = o.fn(ctx)
            if o.key == "obs":
                outs[o.name] = v
            else:
                obs_dict[o.key] = v
        parts = [outs[name] for name in requested if self.registry.observables[name].key == "obs"]
        obs = jnp.concatenate(parts, axis=-1) if parts else jnp.zeros((ctx.batch, 0))
        obs = jnp.clip(obs, -self.cfg.clip_observations, self.cfg.clip_observations)
        return (obs, obs_dict) if with_dict else obs

    def _compute_reward(self, ctx: ObsContext):
        cfg = self.cfg
        B = ctx.batch
        tip_pos = ctx.fingertips[1]  # [B, 5, 3]
        tgt_pos = ctx.target_object_pos
        goal_pos = ctx.state.task.goal_pos

        # object/goal distance per goal mode
        if cfg.goal == "lift":
            goal_height = cfg.table_height + cfg.lift_goal_height_above_table
            object_goal_distance = jnp.maximum(goal_height - tgt_pos[:, 2], 0.0)
            goal_reached = tgt_pos[:, 2] > goal_height
        elif cfg.goal in ("reposition", "oriented_reposition"):
            object_goal_distance = jnp.linalg.norm(tgt_pos - goal_pos, axis=-1)
            if cfg.goal == "oriented_reposition":
                # hand-orientation term (reference multi_object_manipulation.py
                # :359-363: 0.1 * eef rotational distance added to the metric)
                from handarm_tpu.math.quat import quat_diff_rad

                eef_quat = ctx.flange[0][:, 0]
                rot_dist = quat_diff_rad(ctx.state.task.goal_quat, eef_quat)
                object_goal_distance = object_goal_distance + 0.1 * rot_dist
            goal_reached = object_goal_distance < cfg.goal_threshold
        elif cfg.goal == "throw":
            object_goal_distance = jnp.linalg.norm(tgt_pos - goal_pos, axis=-1)
            goal_reached = object_goal_distance < cfg.goal_threshold
        elif cfg.goal == "repose":
            # in-hand reorientation: match the target object's orientation
            # to the goal quaternion (ShadowHand/AllegroKuka-style)
            from handarm_tpu.math.quat import quat_diff_rad

            object_goal_distance = quat_diff_rad(
                ctx.state.task.goal_quat, ctx.target_object_quat
            )
            goal_reached = object_goal_distance < cfg.repose_threshold
        else:
            raise NotImplementedError(cfg.goal)

        # lifting progress vs episode-initial height
        t = ctx.state.task.target_obj
        init_pos = jnp.take_along_axis(
            ctx.state.task.initial_obj_pos, t[:, None, None], axis=1
        )[:, 0]
        delta_z = (tgt_pos - init_pos)[:, 2]
        lifted = delta_z > cfg.lifting_threshold

        reward = jnp.zeros(B)
        terms = {}
        for term, scale in cfg.reward.items():
            if term == "reaching":
                d = jnp.linalg.norm(tip_pos - tgt_pos[:, None, :], axis=-1)
                if cfg.robot == "ur5sih":
                    d = d.at[:, 0].multiply(4.0)  # thumb required for SIH grasps
                r = scale * jnp.exp(-3.0 * jnp.sum(d, axis=-1))
            elif term == "lifting":
                delta_h = (
                    jnp.clip(
                        cfg.lifting_threshold - delta_z, 0.0, cfg.lifting_threshold
                    )
                    / cfg.lifting_threshold
                )
                r = scale * (jnp.exp(-3.0 * delta_h) - jnp.exp(-3.0))
            elif term == "goal":
                gate = 1.0 if cfg.goal == "repose" else lifted
                r = scale * gate * jnp.exp(-5.0 * object_goal_distance)
            elif term == "success":
                r = scale * goal_reached
            elif term == "object_velocity_penalty":
                v = jnp.sum(
                    jnp.linalg.norm(ctx.state.physics.objects.linvel, axis=-1),
                    axis=-1,
                )
                r = -scale * jnp.clip(
                    jnp.where(v > 0.25, jnp.exp(v - 0.25) - 1.0, 0.0), 0.0, 10.0
                )
            elif term == "dof_velocity_penalty":
                v = jnp.abs(ctx.state.physics.robot.qd[:, :6]).max(axis=-1)
                r = -scale * jnp.clip(
                    jnp.where(v > 0.5, jnp.exp(v - 0.5) - 1.0, 0.0), 0.0, 10.0
                )
            elif term == "collision_penalty":
                f = jnp.linalg.norm(ctx.info.body_contact_force, axis=-1).max(-1)
                r = -scale * jnp.clip(
                    jnp.where(f > 1.0, jnp.exp(f - 1.0) - 1.0, 0.0), 0.0, 1.0
                )
            else:
                raise ValueError(f"unknown reward term {term}")
            reward = reward + r
            terms[f"reward_terms/{term}"] = jnp.mean(r)
        return reward, goal_reached, terms

    def _update_metrics(
        self, metrics: Metrics, done, goal_reached_before, target_obj,
        goal_reached_now=None,
    ):
        K = self.cfg_num_objects
        B = done.shape[0]
        num_resets = jnp.sum(done)
        num_succ = jnp.sum(done & goal_reached_before)
        cur = num_succ / jnp.maximum(num_resets, 1)
        alpha = 0.2 * num_resets / B
        ewma = jnp.where(
            num_resets > 0,
            alpha * cur + (1 - alpha) * metrics.success_ewma,
            metrics.success_ewma,
        )
        if goal_reached_now is None:
            goal_reached_now = goal_reached_before
        end_cur = jnp.sum(done & goal_reached_now) / jnp.maximum(num_resets, 1)
        end_ewma = jnp.where(
            num_resets > 0,
            alpha * end_cur + (1 - alpha) * metrics.end_success_ewma,
            metrics.end_success_ewma,
        )
        onehot = jax.nn.one_hot(target_obj, K)
        resets_k = jnp.sum(onehot * done[:, None], axis=0)
        succ_k = jnp.sum(onehot * (done & goal_reached_before)[:, None], axis=0)
        cur_k = succ_k / jnp.maximum(resets_k, 1)
        alpha_k = 0.2 * resets_k / B * K
        ewma_k = jnp.where(
            resets_k > 0,
            alpha_k * cur_k + (1 - alpha_k) * metrics.per_object_ewma,
            metrics.per_object_ewma,
        )
        return Metrics(
            success_ewma=ewma,
            per_object_ewma=ewma_k,
            total_resets=metrics.total_resets + num_resets,
            total_successes=metrics.total_successes + num_succ,
            end_success_ewma=end_ewma,
        )


def _mk_obs(name, size, fn, key="obs"):
    from handarm_tpu.envs.spec import Observable

    return Observable(name, size, fn, key)


def _where_done(done, new, old):
    """Per-env where; leaves without a leading env axis pass through old."""
    if new.ndim == 0 or new.shape[0] != done.shape[0]:
        return old
    d = done.reshape(done.shape + (1,) * (new.ndim - 1))
    return jnp.where(d, new, old)

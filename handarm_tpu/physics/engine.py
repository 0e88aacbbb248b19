"""The lockstep physics engine: one jittable `step` over stacked env state.

TPU-native replacement for the reference's gym.simulate loop
(isaacgymenvs/tasks/base/vec_task.py:409-412: control_freq_inv x simulate,
each 60 Hz step internally 2 PhysX substeps). Here the whole cadence —
substeps, contact solve, integration — is one traced function; reward/obs/
reset fuse into the same XLA program at the env layer.

State layout is [B, ...] stacked envs throughout; sharding the leading axis
over a device mesh (see handarm_tpu.parallel) scales this to pods.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.physics.contacts import (
    Contacts,
    ContactSlots,
    RobotSpheres,
    StaticGeom,
    generate_contacts,
    make_contact_slots,
)
from handarm_tpu.physics.dynamics import (
    compute_dyn,
    free_body_integrate,
    gyroscopic_delta,
    stable_pd_torque,
)
from handarm_tpu.physics.kinematics import (
    ModelArrays,
    forward_kinematics,
    model_arrays,
)
from handarm_tpu.physics.model import Articulation
from handarm_tpu.physics.shapes import ObjectShapes
from handarm_tpu.physics.solver import SolverParams, solve_contacts


class SimParams(NamedTuple):
    dt: float = 1.0 / 60.0  # outer sim step (reference Ur5SihBase.yaml sim.dt)
    substeps: int = 2
    solver: SolverParams = SolverParams()
    joint_limit_margin: float = 0.0
    # safety clamps (PhysX maxLinearVelocity/maxAngularVelocity analog):
    # keep lockstep envs finite even under pathological randomization
    max_obj_linvel: float = 20.0
    max_obj_angvel: float = 100.0
    # floating-base caps (PhysX rigid-body maxLinearVelocity /
    # maxAngularVelocity analogs), applied to the base's physical point
    # velocity / angular velocity, not the origin-Plücker coordinates
    max_base_linvel: float = 20.0
    max_base_angvel: float = 64.0
    # per-substep velocity damping (PhysX linear/angular damping analog);
    # also bleeds off energy injected by deep-penetration resolution
    obj_linear_damping: float = 0.03
    obj_angular_damping: float = 0.1
    # gravity on the robot articulation (PhysX asset_options.disable_gravity
    # analog — the reference disables it for UR5-SIH and Stretch,
    # base/ur5sih.py:176, base/stretch.py:148, so the weak reference PD
    # gains hold pose without sagging). Floating-base locomotion keeps it.
    robot_gravity: bool = True
    # contact-generation cadence under shared_prep. False (default) is the
    # PhysX TGS idiom: narrowphase once per sim step, substeps advance the
    # stored penetration from post-solve relative normal velocity at frozen
    # anchors — this removes all per-substep SDF queries (the multi-object
    # hot spot). True regenerates contacts every substep (more accurate
    # geometry refresh; used by tight physics tests).
    substep_contacts: bool = False


class RobotState(NamedTuple):
    q: jnp.ndarray  # [B, nv]
    qd: jnp.ndarray  # [B, nv]; floating base: qd[:, 0:3] = linear velocity
    # at the world origin (origin Plücker), qd[:, 3:6] = world angular vel
    targets: jnp.ndarray  # [B, nv] PD position targets
    # floating-base pose (None for fixed-base articulations)
    base_pos: jnp.ndarray | None = None  # [B, 3]
    base_quat: jnp.ndarray | None = None  # [B, 4] wxyz
    # extra generalized torque (effort-mode actuation, e.g. mjcf motors;
    # None = pure PD). Applied on top of the stable-PD torque.
    tau_ext: jnp.ndarray | None = None  # [B, nv]


class ObjectState(NamedTuple):
    pos: jnp.ndarray  # [B, K, 3]
    quat: jnp.ndarray  # [B, K, 4] wxyz
    linvel: jnp.ndarray  # [B, K, 3]
    angvel: jnp.ndarray  # [B, K, 3]


class PhysicsState(NamedTuple):
    robot: RobotState
    objects: ObjectState
    contact_impulse: jnp.ndarray  # [B, C, 3] last substep's impulses,
    # WORLD frame (warm-start cache; slots are statically identified and
    # the solver reprojects onto the fresh contact basis on reapply)


class EnvOverrides(NamedTuple):
    """Optional per-env physical-parameter overrides (domain randomization;
    replaces the reference's per-actor property mutation loops,
    vec_task.py:770-874). All default to None = scene values."""

    gain_scale: jnp.ndarray | None = None  # [B, nv] multiplies kp & kd
    gravity: jnp.ndarray | None = None  # [B, 3]
    mass_scale: jnp.ndarray | None = None  # [B, K] object mass multiplier
    friction_scale: jnp.ndarray | None = None  # [B] contact friction mult


class StepInfo(NamedTuple):
    """Per-step diagnostics produced inside the same jit."""

    body_contact_force: jnp.ndarray  # [B, nb, 3] net contact force on robot bodies
    obj_contact_force: jnp.ndarray  # [B, K, 3]
    max_penetration: jnp.ndarray  # [B]


class RailSpec(NamedTuple):
    """Prismatic constraint on selected objects (TPU-native 1-DoF joints).

    Replaces articulated drawers/doors (e.g. the sektion cabinet's
    drawer_top_joint, reference assets/.../sektion_cabinet_2.urdf:439-446):
    the object participates in the contact solve as a free body, then its
    pose/velocity are post-projected onto the rail line each substep
    (a post-stabilized prismatic joint — branch-free, static shapes)."""

    axis: jnp.ndarray  # [K, 3] unit slide axis, world frame
    origin: jnp.ndarray  # [K, 3] world position at s = 0
    quat: jnp.ndarray  # [K, 4] fixed orientation (wxyz)
    lo: jnp.ndarray  # [K] joint lower limit (m)
    hi: jnp.ndarray  # [K] joint upper limit (m)
    damping: jnp.ndarray  # [K] per-second viscous decay rate (1/s)
    mask: jnp.ndarray  # [K] 1.0 = rail-constrained, 0.0 = free
    # spin mode (cylindrical joint, world-z axis only): the object keeps
    # its rotation ABOUT the rail axis (yaw) and its axial translation;
    # everything else is projected out. Used for nut-on-bolt screw motion
    # (factory_task_nut_bolt_screw) where the env couples yaw -> axial
    # travel through the thread pitch. None = all rails are prismatic.
    spin: jnp.ndarray | None = None  # [K] 1.0 = cylindrical, 0.0 = fixed-quat


class Scene(NamedTuple):
    """Static scene description: the robot articulation + K free objects on a
    table. Everything here is trace-time constant."""

    model: ModelArrays
    shapes: ObjectShapes
    spheres: RobotSpheres
    geom: StaticGeom
    slots: ContactSlots
    kp: jnp.ndarray  # [nv]
    kd: jnp.ndarray  # [nv]
    gravity: jnp.ndarray  # [3]
    base_pos: jnp.ndarray  # [3]
    base_quat: jnp.ndarray  # [4]
    params: SimParams
    # static one-hot scatter maps for contact-force aggregation
    slot_to_body: jnp.ndarray  # [C, nb]
    slot_to_obj: jnp.ndarray  # [C, K]
    rails: RailSpec | None = None  # optional prismatic-constrained objects


def build_scene(
    art: Articulation,
    shapes: ObjectShapes,
    spheres: RobotSpheres,
    geom: StaticGeom,
    kp,
    kd,
    base_pos=(0.0, 0.0, 0.0),
    base_quat=(1.0, 0.0, 0.0, 0.0),
    params: SimParams = SimParams(),
    rails: RailSpec | None = None,
    dtype=jnp.float32,
) -> Scene:
    m = model_arrays(art, dtype)
    slots = make_contact_slots(
        shapes, spheres, static_friction=1.0, num_walls=geom.num_walls
    )
    C = slots.num_slots
    nb, K = art.nb, shapes.num_objects
    s2b = np.zeros((C, nb), dtype=np.float32)
    s2o = np.zeros((C, max(K, 1)), dtype=np.float32)
    for c in range(C):
        if slots.robot_body[c] >= 0:
            s2b[c, slots.robot_body[c]] = 1.0
        if slots.obj_a[c] >= 0:
            s2o[c, slots.obj_a[c]] = 1.0
        if slots.obj_b[c] >= 0:
            s2o[c, slots.obj_b[c]] -= 1.0  # equal and opposite
    return Scene(
        model=m,
        shapes=shapes,
        spheres=spheres,
        geom=geom,
        slots=slots,
        kp=jnp.asarray(kp, dtype),
        kd=jnp.asarray(kd, dtype),
        gravity=jnp.asarray([0.0, 0.0, -9.81], dtype),
        base_pos=jnp.asarray(base_pos, dtype),
        base_quat=jnp.asarray(base_quat, dtype),
        params=params,
        slot_to_body=jnp.asarray(s2b),
        slot_to_obj=jnp.asarray(s2o),
        rails=rails,
    )


def _propagate_fk(m, body_quat, body_pos, screw, qd, h):
    """First-order rigid propagation of body poses + world joint screws by
    the current body twists — replaces the sequential FK chain inside the
    substep loop (the chain runs once per step in `step`). Floating-base
    dofs keep their constant world screws; joint screws are regenerated
    from their body's propagated pose."""
    from handarm_tpu.math.quat import quat_integrate, quat_rotate
    from handarm_tpu.physics.model import PRISMATIC, REVOLUTE

    sv = screw * qd[..., None]
    bv = jnp.einsum("nj,bja->bna", m.ancestor_mask, sv)  # [B, nb, 6]
    w, v0 = bv[..., :3], bv[..., 3:]
    new_pos = body_pos + h * (v0 + jnp.cross(w, body_pos))
    new_quat = quat_integrate(body_quat, w, h)
    dof_body = m.dof_body if m.dof_body is not None else np.arange(m.nv)
    dq = new_quat[:, dof_body]  # [B, nv, 4]
    dp = new_pos[:, dof_body]  # [B, nv, 3]
    axis_w = quat_rotate(dq, jnp.broadcast_to(m.axis, dp.shape))
    rev = jnp.concatenate([axis_w, jnp.cross(dp, axis_w)], axis=-1)
    pri = jnp.concatenate([jnp.zeros_like(axis_w), axis_w], axis=-1)
    jt = np.asarray(m.joint_type)
    is_rev = jnp.asarray((jt == REVOLUTE).astype(np.float32))[None, :, None]
    is_pri = jnp.asarray((jt == PRISMATIC).astype(np.float32))[None, :, None]
    is_free = 1.0 - is_rev - is_pri
    return new_quat, new_pos, rev * is_rev + pri * is_pri + screw * is_free


def _clamp_base_velocity(m, qd, base_pos, p: SimParams):
    """Clamp the floating base's physical velocities (see SimParams). The
    origin-Plücker linear dofs can be legitimately large far from the world
    origin (v_o = v_p - w x p), so clamp (v_point, w) and map back."""
    if not m.floating:
        return qd
    w = qd[:, 3:6]
    v_b = qd[:, 0:3] + jnp.cross(w, base_pos)
    w_c = jnp.clip(w, -p.max_base_angvel, p.max_base_angvel)
    v_c = jnp.clip(v_b, -p.max_base_linvel, p.max_base_linvel)
    v_o = v_c - jnp.cross(w_c, base_pos)
    return jnp.concatenate([v_o, w_c, qd[:, 6:]], axis=-1)


def _cap_contact_gain(v_out, v_free, w_out, w_free, shapes, p: SolverParams):
    """Bound the kinetic energy a contact solve can inject (see
    SolverParams.max_contact_gain). Per object: |v_out| <= |v_free| + cap;
    |w_out| <= |w_free| + cap / bound_radius."""
    cap = p.max_contact_gain
    sv = jnp.linalg.norm(v_out, axis=-1)  # [B, K]
    allow_v = jnp.linalg.norm(v_free, axis=-1) + cap
    v_scale = jnp.minimum(1.0, allow_v / jnp.maximum(sv, 1e-9))
    sw = jnp.linalg.norm(w_out, axis=-1)
    allow_w = jnp.linalg.norm(w_free, axis=-1) + cap / jnp.maximum(
        shapes.bound_radius, 1e-3
    )
    w_scale = jnp.minimum(1.0, allow_w / jnp.maximum(sw, 1e-9))
    return v_out * v_scale[..., None], w_out * w_scale[..., None]


def _apply_rails(scene: Scene, opos, oquat, olv, oav, h):
    """Post-projection of rail-constrained objects (see RailSpec)."""
    r = scene.rails
    m_rail = r.mask[None, :, None] > 0  # [1, K, 1]
    s = jnp.einsum("bki,ki->bk", opos - r.origin[None], r.axis)
    at_lo, at_hi = s <= r.lo[None], s >= r.hi[None]
    s = jnp.clip(s, r.lo[None], r.hi[None])
    pos_rail = r.origin[None] + s[..., None] * r.axis[None]
    v_ax = jnp.einsum("bki,ki->bk", olv, r.axis)
    v_ax = jnp.where(at_lo, jnp.maximum(v_ax, 0.0), v_ax)
    v_ax = jnp.where(at_hi, jnp.minimum(v_ax, 0.0), v_ax)
    v_ax = v_ax * jnp.maximum(0.0, 1.0 - h * r.damping[None])
    olv = jnp.where(m_rail, v_ax[..., None] * r.axis[None], olv)
    opos = jnp.where(m_rail, pos_rail, opos)
    if r.spin is None:
        oav = jnp.where(m_rail, 0.0, oav)
        oquat = jnp.where(m_rail, r.quat[None], oquat)
    else:
        m_spin = (r.spin[None, :, None] > 0) & m_rail
        # cylindrical: keep the angular component about the rail axis
        w_ax = jnp.einsum("bki,ki->bk", oav, r.axis)
        w_ax = w_ax * jnp.maximum(0.0, 1.0 - h * r.damping[None])
        oav_spin = w_ax[..., None] * r.axis[None]
        oav = jnp.where(m_spin, oav_spin, jnp.where(m_rail, 0.0, oav))
        # quat projected to its rotation about the (world-z) rail axis
        qw, qz = oquat[..., 0], oquat[..., 3]
        inv = jax.lax.rsqrt(qw * qw + qz * qz + 1e-12)
        q_yaw = jnp.stack(
            [qw * inv, jnp.zeros_like(qw), jnp.zeros_like(qw), qz * inv],
            axis=-1,
        )
        oquat = jnp.where(m_spin, q_yaw, jnp.where(m_rail, r.quat[None], oquat))
    return opos, oquat, olv, oav


def substep(scene: Scene, state: PhysicsState, ovr: EnvOverrides = EnvOverrides()):
    m = scene.model
    p = scene.params
    h = p.dt / p.substeps
    rob = state.robot
    q, qd, targets = rob.q, rob.qd, rob.targets
    opos, oquat, olin, oang = state.objects
    B = q.shape[0]

    kp, kd = scene.kp, scene.kd
    if ovr.gain_scale is not None:
        kp = kp[None] * ovr.gain_scale
        kd = kd[None] * ovr.gain_scale
    gravity = scene.gravity if ovr.gravity is None else ovr.gravity

    if m.floating:
        base_quat, base_pos = rob.base_quat, rob.base_pos
    else:
        base_quat, base_pos = scene.base_quat[None], scene.base_pos[None]
    fk = forward_kinematics(m, q, base_quat, base_pos)
    g_rob = gravity if p.robot_gravity else jnp.zeros_like(gravity)
    dyn = compute_dyn(m, fk, qd, g_rob, kp, kd, h)
    tau = stable_pd_torque(q, qd, targets, kp, kd, h, m.effort_limit)
    if rob.tau_ext is not None:
        tau = tau + rob.tau_ext
    qd_free = qd + h * dyn.solve(tau - dyn.bias)

    g_obj = gravity if gravity.ndim == 1 else gravity[:, None, :]
    damp_l = 1.0 - h * p.obj_linear_damping
    damp_a = 1.0 - h * p.obj_angular_damping
    olin_free = olin * damp_l + h * g_obj
    oang_free = oang * damp_a + gyroscopic_delta(oquat, scene.shapes.inertia_diag, oang, h)

    contacts = generate_contacts(
        scene.slots, scene.shapes, scene.spheres, scene.geom,
        opos, oquat, fk.body_quat, fk.body_pos,
    )
    out = solve_contacts(
        m, fk, dyn.Minv, scene.slots, contacts, scene.shapes,
        opos, oquat, qd_free, olin_free, oang_free, h, p.solver,
        warm_lam=state.contact_impulse,
        mass_scale=ovr.mass_scale,
        friction_scale=ovr.friction_scale,
    )

    # integrate
    qd_new = jnp.clip(out.qd, -m.velocity_limit, m.velocity_limit)
    if m.floating:
        qd_new = _clamp_base_velocity(m, qd_new, base_pos, p)
    q_new = q + h * qd_new
    # hard joint limits: clamp position, kill outward velocity
    low, high = m.q_min + p.joint_limit_margin, m.q_max - p.joint_limit_margin
    below, above = q_new < low, q_new > high
    q_new = jnp.clip(q_new, low, high)
    qd_new = jnp.where(below, jnp.maximum(qd_new, 0.0), qd_new)
    qd_new = jnp.where(above, jnp.minimum(qd_new, 0.0), qd_new)

    if m.floating:
        # base pose integrates from the origin-Plücker base velocity:
        # the base point at world position p moves at v_o + w x p
        from handarm_tpu.math.quat import quat_integrate

        v_o, w = qd_new[:, 0:3], qd_new[:, 3:6]
        base_pos_new = base_pos + h * (v_o + jnp.cross(w, base_pos))
        base_quat_new = quat_integrate(base_quat, w, h)
        q_new = q_new.at[:, :6].set(0.0)  # base freedoms live in the pose
    else:
        base_pos_new, base_quat_new = rob.base_pos, rob.base_quat

    olv, oav = _cap_contact_gain(
        out.obj_linvel, olin_free, out.obj_angvel, oang_free,
        scene.shapes, p.solver,
    )
    olv = jnp.clip(olv, -p.max_obj_linvel, p.max_obj_linvel)
    oav = jnp.clip(oav, -p.max_obj_angvel, p.max_obj_angvel)
    if p.solver.rolling_friction > 0.0 and scene.shapes.num_objects:
        oav = _rolling_resistance(
            oav, out.impulse, contacts.normal, scene.slot_to_obj,
            scene.shapes.inertia_diag, p.solver.rolling_friction,
        )
    opos_new, oquat_new = free_body_integrate(opos, oquat, olv, oav, h)
    if scene.rails is not None:
        opos_new, oquat_new, olv, oav = _apply_rails(
            scene, opos_new, oquat_new, olv, oav, h
        )

    # contact force diagnostics from accumulated world-frame impulses
    f_slot = out.impulse / h  # [B, C, 3]
    body_f = jnp.einsum("bci,cn->bni", f_slot, scene.slot_to_body)
    obj_f = jnp.einsum("bci,ck->bki", -f_slot, scene.slot_to_obj)
    info = StepInfo(
        body_contact_force=body_f,
        obj_contact_force=obj_f,
        max_penetration=jnp.max(jnp.maximum(contacts.depth, 0.0), axis=-1, initial=0.0),
    )

    new_state = PhysicsState(
        robot=RobotState(
            q=q_new, qd=qd_new, targets=targets,
            base_pos=base_pos_new, base_quat=base_quat_new,
            tau_ext=rob.tau_ext,
        ),
        objects=ObjectState(pos=opos_new, quat=oquat_new, linvel=olv, angvel=oav),
        contact_impulse=out.impulse,
    )
    return new_state, info


def _rolling_resistance(
    oav: jnp.ndarray,  # [B, K, 3]
    impulse: jnp.ndarray,  # [B, C, 3] world contact impulses
    normal: jnp.ndarray,  # [B, C, 3]
    slot_to_obj: jnp.ndarray,  # [C, K] signed incidence
    inertia_diag: jnp.ndarray,  # [K, 3]
    mu_roll: float,
) -> jnp.ndarray:
    """Isotropic rolling/torsional resistance (PhysX contact-patch analog).

    Each object's angular speed is reduced by at most
    mu_roll * (total normal impulse) / I_max — contact-supported objects
    stop rolling/spinning; free flyers are untouched (zero impulse)."""
    lam_n = jnp.maximum(jnp.einsum("bci,bci->bc", impulse, normal), 0.0)
    ln_obj = jnp.einsum("bc,ck->bk", lam_n, jnp.abs(slot_to_obj))  # [B, K]
    inv_imax = 1.0 / jnp.max(inertia_diag, axis=-1)  # [K]
    cap = mu_roll * ln_obj * inv_imax[None]  # [B, K] max |dω|
    w_mag = jnp.linalg.norm(oav, axis=-1)
    scale = jnp.maximum(0.0, 1.0 - cap / jnp.maximum(w_mag, 1e-9))
    return oav * scale[..., None]


class HeavyPrep(NamedTuple):
    """Step-start mass structure reusable across SEVERAL sim steps: the
    PD-augmented dynamics (Mtilde/Minv/bias) and the solver's heavy prep
    (effective masses, world inverse inertias, coupling maps). Extends the
    TGS heavy/light split one level up: heavy once per CONTROL step,
    per-sim-step work reduces to FK + contact gen + refresh_prep. The
    approximation matches the per-substep one (frozen d_eff against moving
    geometry), stretched over control_freq_inv * dt instead of dt."""

    dyn: Any
    prep: Any
    bias_acc: jnp.ndarray
    # the FK + contact set evaluated at control-step start: the FIRST sim
    # step of the control step can consume these directly instead of
    # recomputing them (they are bit-identical — same q, same poses)
    fk0: Any = None
    contacts0: Any = None


def compute_heavy(
    scene: Scene, state: PhysicsState, ovr: EnvOverrides = EnvOverrides()
) -> HeavyPrep:
    """Evaluate the heavy step-start quantities once, for reuse by
    `step(..., heavy=...)` over the next few sim steps."""
    from handarm_tpu.physics.solver import _prepare

    m, p = scene.model, scene.params
    h = p.dt / p.substeps
    rob = state.robot
    kp, kd = scene.kp, scene.kd
    if ovr.gain_scale is not None:
        kp = kp[None] * ovr.gain_scale
        kd = kd[None] * ovr.gain_scale
    gravity = scene.gravity if ovr.gravity is None else ovr.gravity
    if m.floating:
        base_quat0, base_pos0 = rob.base_quat, rob.base_pos
    else:
        base_quat0, base_pos0 = scene.base_quat[None], scene.base_pos[None]
    fk0 = forward_kinematics(m, rob.q, base_quat0, base_pos0)
    g_rob = gravity if p.robot_gravity else jnp.zeros_like(gravity)
    dyn = compute_dyn(m, fk0, rob.qd, g_rob, kp, kd, h)
    opos, oquat = state.objects.pos, state.objects.quat
    contacts0 = generate_contacts(
        scene.slots, scene.shapes, scene.spheres, scene.geom,
        opos, oquat, fk0.body_quat, fk0.body_pos,
    )
    prep0 = _prepare(
        m, fk0, dyn.Minv, scene.slots, contacts0, scene.shapes,
        opos, oquat, h, p.solver,
        mass_scale=ovr.mass_scale, friction_scale=ovr.friction_scale,
    )
    return HeavyPrep(dyn=dyn, prep=prep0, bias_acc=dyn.solve(dyn.bias),
                     fk0=fk0, contacts0=contacts0)


def step(
    scene: Scene,
    state: PhysicsState,
    ovr: EnvOverrides = EnvOverrides(),
    shared_prep: bool = True,
    heavy: HeavyPrep | None = None,
    fk0=None,
    contacts0=None,
    carry_fk: bool = False,
):
    """One outer sim step (dt) = `substeps` contact-resolved substeps.

    shared_prep=True (default) evaluates FK, dynamics, contact generation
    and the solver prep ONCE at the start of the step and substeps against
    them — the PhysX TGS idiom (contacts/Jacobians per step, impulses per
    substep) — roughly halving per-step cost. shared_prep=False re-evaluates
    everything each substep (the more accurate path used by tight physics
    tests). Passing `heavy` (from `compute_heavy`) reuses a previous step's
    mass structure: this step then only runs FK + contact generation +
    the light geometry refresh before the substep loop.

    FK-carry (heavy path, fixed base): `fk0` supplies this step's start-
    of-step kinematics (either the exact FK from compute_heavy, or the
    propagated FK returned by the previous step), skipping the sequential
    FK chain entirely; `contacts0` likewise supplies a precomputed contact
    set (only valid when fk0 is compute_heavy's exact FK — same q).
    `carry_fk=True` returns (state, info, fk_next) where fk_next is the
    first-order propagation of fk0 by this step's realized joint motion —
    feed it to the next sim step of the SAME control step. Error is
    O((qd*dt)^2) per step and re-anchored by exact FK every control step."""
    if not shared_prep:
        assert not carry_fk, "carry_fk requires shared_prep"

        def body(s, _):
            return substep(scene, s, ovr)

        state, infos = jax.lax.scan(
            body, state, None, length=scene.params.substeps
        )
        info = jax.tree.map(lambda x: x[-1], infos)
        return state, info

    from handarm_tpu.physics.solver import _prepare, refresh_prep, solve_prepared

    m = scene.model
    p = scene.params
    h = p.dt / p.substeps
    rob = state.robot
    q, qd, targets = rob.q, rob.qd, rob.targets
    opos, oquat, olin, oang = state.objects

    kp, kd = scene.kp, scene.kd
    if ovr.gain_scale is not None:
        kp = kp[None] * ovr.gain_scale
        kd = kd[None] * ovr.gain_scale
    gravity = scene.gravity if ovr.gravity is None else ovr.gravity
    g_obj = gravity if gravity.ndim == 1 else gravity[:, None, :]

    # heavy, once per step: dynamics + contact mass structure — or reused
    # from a caller-provided HeavyPrep (then only geometry refreshes here)
    if m.floating:
        base_quat0, base_pos0 = rob.base_quat, rob.base_pos
    else:
        base_quat0, base_pos0 = scene.base_quat[None], scene.base_pos[None]
    if fk0 is None:
        fk0 = forward_kinematics(m, q, base_quat0, base_pos0)
    if contacts0 is None:
        contacts0 = generate_contacts(
            scene.slots, scene.shapes, scene.spheres, scene.geom,
            opos, oquat, fk0.body_quat, fk0.body_pos,
        )
    if heavy is not None:
        dyn = heavy.dyn
        bias_acc = heavy.bias_acc
        prep0 = refresh_prep(
            heavy.prep, fk0, contacts0, scene.slots, opos, h, p.solver,
            friction_scale=ovr.friction_scale,
        )
    else:
        g_rob = gravity if p.robot_gravity else jnp.zeros_like(gravity)
        dyn = compute_dyn(m, fk0, qd, g_rob, kp, kd, h)
        prep0 = _prepare(
            m, fk0, dyn.Minv, scene.slots, contacts0, scene.shapes,
            opos, oquat, h, p.solver,
            mass_scale=ovr.mass_scale, friction_scale=ovr.friction_scale,
        )
        bias_acc = dyn.solve(dyn.bias)

    if not p.substep_contacts:
        anchored = _step_anchored(
            scene, state, ovr, fk0, dyn, contacts0, prep0, bias_acc,
            kp, kd, g_obj,
        )
        if not carry_fk:
            return anchored
        assert not m.floating, "carry_fk supports fixed-base models only"
        out_state, info = anchored
        # propagate by the REALIZED joint displacement (exact q integral)
        qd_eff = (out_state.robot.q - q) / p.dt
        bq2, bp2, screw2 = _propagate_fk(
            m, fk0.body_quat, fk0.body_pos, fk0.screw, qd_eff, p.dt
        )
        from handarm_tpu.physics.kinematics import FK

        return out_state, info, FK(body_quat=bq2, body_pos=bp2, screw=screw2)

    def sub(carry, it):
        q, qd, opos, oquat, olin, oang, lam, bq, bp, screw = carry
        # light, per substep: fresh geometry against frozen mass terms.
        # Body poses/screws are first-order-propagated from body twists
        # instead of re-running the sequential FK chain (error O((qd*h)^2)
        # ~ 1e-4 rad at h = 1/120 — far below contact tolerances).
        from handarm_tpu.physics.kinematics import FK

        fk = FK(body_quat=bq, body_pos=bp, screw=screw)
        contacts = generate_contacts(
            scene.slots, scene.shapes, scene.spheres, scene.geom,
            opos, oquat, fk.body_quat, fk.body_pos,
        )
        prep = refresh_prep(
            prep0, fk, contacts, scene.slots, opos, h, p.solver,
            friction_scale=ovr.friction_scale,
        )
        tau = stable_pd_torque(q, qd, targets, kp, kd, h, m.effort_limit)
        if rob.tau_ext is not None:
            tau = tau + rob.tau_ext
        qd_free = qd - h * bias_acc + h * dyn.solve(tau)
        olin_free = olin * (1.0 - h * p.obj_linear_damping) + h * g_obj
        oang_free = oang * (1.0 - h * p.obj_angular_damping) + gyroscopic_delta(oquat, scene.shapes.inertia_diag, oang, h)
        out = solve_prepared(prep, qd_free, olin_free, oang_free, p.solver, lam)
        qd_new = jnp.clip(out.qd, -m.velocity_limit, m.velocity_limit)
        if m.floating:
            qd_new = _clamp_base_velocity(m, qd_new, bp[:, 0], p)
        q_new = q + h * qd_new
        low, high = m.q_min + p.joint_limit_margin, m.q_max - p.joint_limit_margin
        below, above = q_new < low, q_new > high
        q_new = jnp.clip(q_new, low, high)
        qd_new = jnp.where(below, jnp.maximum(qd_new, 0.0), qd_new)
        qd_new = jnp.where(above, jnp.minimum(qd_new, 0.0), qd_new)
        olv, oav = _cap_contact_gain(
            out.obj_linvel, olin_free, out.obj_angvel, oang_free,
            scene.shapes, p.solver,
        )
        olv = jnp.clip(olv, -p.max_obj_linvel, p.max_obj_linvel)
        oav = jnp.clip(oav, -p.max_obj_angvel, p.max_obj_angvel)
        if p.solver.rolling_friction > 0.0 and scene.shapes.num_objects:
            oav = _rolling_resistance(
                oav, out.impulse, contacts.normal, scene.slot_to_obj,
                scene.shapes.inertia_diag, p.solver.rolling_friction,
            )
        opos_new, oquat_new = free_body_integrate(opos, oquat, olv, oav, h)
        if scene.rails is not None:
            opos_new, oquat_new, olv, oav = _apply_rails(
                scene, opos_new, oquat_new, olv, oav, h
            )
        bq_new, bp_new, screw_new = _propagate_fk(m, bq, bp, screw, qd_new, h)
        return (
            q_new, qd_new, opos_new, oquat_new, olv, oav,
            out.impulse, bq_new, bp_new, screw_new,
        ), (contacts.normal, jnp.maximum(contacts.depth, 0.0))

    carry = (
        q, qd, opos, oquat, olin, oang, state.contact_impulse,
        fk0.body_quat, fk0.body_pos, fk0.screw,
    )
    (q, qd, opos, oquat, olin, oang, lam, bq_f, bp_f, screw_f), (normals, depths) = jax.lax.scan(
        sub, carry, None, length=p.substeps
    )

    if m.floating:
        # the propagated pose of body 0 IS the integrated base pose (the
        # twist propagation in _propagate_fk is exactly the base integrator)
        base_pos_f, base_quat_f = bp_f[:, 0], bq_f[:, 0]
        q = q.at[:, :6].set(0.0)
    else:
        base_pos_f, base_quat_f = rob.base_pos, rob.base_quat

    f_slot = lam / h  # world-frame impulses
    info = StepInfo(
        body_contact_force=jnp.einsum("bci,cn->bni", f_slot, scene.slot_to_body),
        obj_contact_force=jnp.einsum("bci,ck->bki", -f_slot, scene.slot_to_obj),
        max_penetration=jnp.max(depths[-1], axis=-1, initial=0.0),
    )
    new_state = PhysicsState(
        robot=RobotState(
            q=q, qd=qd, targets=targets,
            base_pos=base_pos_f, base_quat=base_quat_f, tau_ext=rob.tau_ext,
        ),
        objects=ObjectState(pos=opos, quat=oquat, linvel=olin, angvel=oang),
        contact_impulse=lam,
    )
    if carry_fk:
        from handarm_tpu.physics.kinematics import FK

        # the substep loop already propagated poses/screws to step end
        return new_state, info, FK(body_quat=bq_f, body_pos=bp_f,
                                   screw=screw_f)
    return new_state, info


def _step_anchored(scene, state, ovr, fk0, dyn, contacts0, prep0, bias_acc,
                   kp, kd, g_obj):
    """Substep loop with the contact set frozen at step start (PhysX TGS
    narrowphase cadence). Penetration depths advance from the post-solve
    relative normal velocity at the anchors; normals, tangent bases,
    friction, activity masks and effective masses stay from `prep0`. No
    SDF queries or FK propagation inside the substep loop."""
    from handarm_tpu.math.quat import quat_integrate
    from handarm_tpu.physics.solver import (
        _carry_split, _rel_velocity, solve_prepared)

    m = scene.model
    p = scene.params
    h = p.dt / p.substeps
    rob = state.robot
    targets = rob.targets
    q, qd = rob.q, rob.qd
    opos, oquat, olin, oang = state.objects
    if m.floating:
        bpos0, bquat0 = rob.base_pos, rob.base_quat
    else:
        bpos0 = jnp.broadcast_to(scene.base_pos[None], (q.shape[0], 3))
        bquat0 = jnp.broadcast_to(scene.base_quat[None], (q.shape[0], 4))
    B, C = contacts0.depth.shape

    from handarm_tpu.physics.solver import _use_pallas_sweeps

    if (
        jax.default_backend() == "tpu"
        and p.solver.mode == "jacobi"
        and p.solver.jacobi_impl == "soa"
        and p.solver.restitution == 0.0
        and _use_pallas_sweeps(p.solver, B, C)
    ):
        return _step_anchored_fused(
            scene, state, ovr, fk0, dyn, contacts0, prep0, bias_acc,
            kp, kd, g_obj,
        )

    # thread prep/normals through the scan carry 2D-flattened — see
    # solver._carry_split for the TPU layout hazard this avoids. Small
    # scenes stay closed over (remat-into-body fuses and is faster there).
    from handarm_tpu.physics.solver import CARRY_THREAD_MIN_SLOTS

    if C >= CARRY_THREAD_MIN_SLOTS:
        prep_leaves0, rebuild_prep = _carry_split(prep0)
    else:
        prep_leaves0, rebuild_prep = (), lambda _: prep0
    n0_flat0 = contacts0.normal.reshape(B, C * 3)

    def sub(carry, it):
        (q, qd, opos, oquat, olin, oang, lam, depth, bpos, bquat,
         prep_leaves, n0_flat) = carry
        prep0 = rebuild_prep(prep_leaves)
        n0 = n0_flat.reshape(B, C, 3)
        bias = jnp.where(
            depth >= 0.0,
            jnp.minimum(
                p.solver.baumgarte / h
                * jnp.maximum(depth - p.solver.slop, 0.0),
                p.solver.max_depenetration_vel,
            ),
            depth / h,
        )
        prep = prep0._replace(bias=bias)
        tau = stable_pd_torque(q, qd, targets, kp, kd, h, m.effort_limit)
        if rob.tau_ext is not None:
            tau = tau + rob.tau_ext
        qd_free = qd - h * bias_acc + h * dyn.solve(tau)
        olin_free = olin * (1.0 - h * p.obj_linear_damping) + h * g_obj
        oang_free = oang * (1.0 - h * p.obj_angular_damping) + gyroscopic_delta(
            oquat, scene.shapes.inertia_diag, oang, h
        )
        out = solve_prepared(prep, qd_free, olin_free, oang_free, p.solver, lam)
        qd_new = jnp.clip(out.qd, -m.velocity_limit, m.velocity_limit)
        if m.floating:
            qd_new = _clamp_base_velocity(m, qd_new, bpos, p)
        q_new = q + h * qd_new
        low = m.q_min + p.joint_limit_margin
        high = m.q_max - p.joint_limit_margin
        below, above = q_new < low, q_new > high
        q_new = jnp.clip(q_new, low, high)
        qd_new = jnp.where(below, jnp.maximum(qd_new, 0.0), qd_new)
        qd_new = jnp.where(above, jnp.minimum(qd_new, 0.0), qd_new)
        olv, oav = _cap_contact_gain(
            out.obj_linvel, olin_free, out.obj_angvel, oang_free,
            scene.shapes, p.solver,
        )
        olv = jnp.clip(olv, -p.max_obj_linvel, p.max_obj_linvel)
        oav = jnp.clip(oav, -p.max_obj_angvel, p.max_obj_angvel)
        if p.solver.rolling_friction > 0.0 and scene.shapes.num_objects:
            oav = _rolling_resistance(
                oav, out.impulse, n0, scene.slot_to_obj,
                scene.shapes.inertia_diag, p.solver.rolling_friction,
            )
        opos_new, oquat_new = free_body_integrate(opos, oquat, olv, oav, h)
        if scene.rails is not None:
            opos_new, oquat_new, olv, oav = _apply_rails(
                scene, opos_new, oquat_new, olv, oav, h
            )
        # TGS anchor advance: separating motion along the frozen normal
        # reduces penetration (vrel = A side minus B side)
        vrel = _rel_velocity(prep, qd_new, olv, oav)
        depth_new = depth - h * jnp.sum(vrel * n0, axis=-1)
        if m.floating:
            v_o, w = qd_new[:, 0:3], qd_new[:, 3:6]
            bpos_new = bpos + h * (v_o + jnp.cross(w, bpos))
            bquat_new = quat_integrate(bquat, w, h)
            q_new = q_new.at[:, :6].set(0.0)
        else:
            bpos_new, bquat_new = bpos, bquat
        return (
            q_new, qd_new, opos_new, oquat_new, olv, oav,
            out.impulse, depth_new, bpos_new, bquat_new,
            prep_leaves, n0_flat,
        ), None

    carry = (
        q, qd, opos, oquat, olin, oang, state.contact_impulse,
        contacts0.depth, bpos0, bquat0, prep_leaves0, n0_flat0,
    )
    (q, qd, opos, oquat, olin, oang, lam, depth, bpos_f, bquat_f, _, _), _ = (
        jax.lax.scan(sub, carry, None, length=p.substeps)
    )

    f_slot = lam / h
    info = StepInfo(
        body_contact_force=jnp.einsum(
            "bci,cn->bni", f_slot, scene.slot_to_body),
        obj_contact_force=jnp.einsum(
            "bci,ck->bki", -f_slot, scene.slot_to_obj),
        max_penetration=jnp.max(
            jnp.maximum(depth, 0.0), axis=-1, initial=0.0),
    )
    if m.floating:
        base_pos_f, base_quat_f = bpos_f, bquat_f
    else:
        base_pos_f, base_quat_f = rob.base_pos, rob.base_quat
    new_state = PhysicsState(
        robot=RobotState(
            q=q, qd=qd, targets=targets,
            base_pos=base_pos_f, base_quat=base_quat_f, tau_ext=rob.tau_ext,
        ),
        objects=ObjectState(pos=opos, quat=oquat, linvel=olin, angvel=oang),
        contact_impulse=lam,
    )
    return new_state, info


def _step_anchored_fused(scene, state, ovr, fk0, dyn, contacts0, prep0,
                         bias_acc, kp, kd, g_obj):
    """TPU fast path of `_step_anchored`: one `anchored_pack` per sim step
    feeds the fused sweep kernel every substep with warm-start apply and
    the post-solve normal velocity computed IN-kernel.

    vs the generic path this removes, per substep: the AoS->SoA plane
    conversion + restack, the XLA warm-start `_apply_soa` pass, and the
    world impulse reconstruction/reprojection round trip (the basis is
    frozen across anchored substeps, so world->basis is the identity) —
    measured together ~4 ms of the 10.4 ms solve call at 8192x372. The
    TGS depth advance stays in XLA against the packed planes
    (solver.anchored_vn) because it must see the post-clamp velocities;
    semantics match the generic path bit-for-bit (pinned by
    tests/test_contact_sweep.py::test_anchored_fused_matches_generic)."""
    from handarm_tpu.math.quat import quat_integrate
    from handarm_tpu.physics.solver import (
        anchored_impulse_world, anchored_pack, anchored_vn, solve_anchored)

    m = scene.model
    p = scene.params
    h = p.dt / p.substeps
    rob = state.robot
    targets = rob.targets
    q, qd = rob.q, rob.qd
    opos, oquat, olin, oang = state.objects
    if m.floating:
        bpos0, bquat0 = rob.base_pos, rob.base_quat
    else:
        bpos0 = jnp.broadcast_to(scene.base_pos[None], (q.shape[0], 3))
        bquat0 = jnp.broadcast_to(scene.base_quat[None], (q.shape[0], 4))

    arrays0, signs = anchored_pack(prep0)
    # previous sim step's world impulses -> this step's (frozen) basis
    lam_w0 = state.contact_impulse
    lam3_0 = tuple(
        jnp.einsum("bci,bci->bc", lam_w0, prep0.basis[:, :, d])
        for d in range(3)
    )

    def sub(carry, it):
        (q, qd, opos, oquat, olin, oang, l0, l1, l2, depth, bpos, bquat,
         arrays) = carry
        bias = jnp.where(
            depth >= 0.0,
            jnp.minimum(
                p.solver.baumgarte / h
                * jnp.maximum(depth - p.solver.slop, 0.0),
                p.solver.max_depenetration_vel,
            ),
            depth / h,
        )
        tau = stable_pd_torque(q, qd, targets, kp, kd, h, m.effort_limit)
        if rob.tau_ext is not None:
            tau = tau + rob.tau_ext
        qd_free = qd - h * bias_acc + h * dyn.solve(tau)
        olin_free = olin * (1.0 - h * p.obj_linear_damping) + h * g_obj
        oang_free = oang * (1.0 - h * p.obj_angular_damping) + gyroscopic_delta(
            oquat, scene.shapes.inertia_diag, oang, h
        )
        qd_s, olv, oav, lam3, _ = solve_anchored(
            arrays, signs, bias, qd_free, olin_free, oang_free,
            (l0, l1, l2), p.solver,
        )
        qd_new = jnp.clip(qd_s, -m.velocity_limit, m.velocity_limit)
        if m.floating:
            qd_new = _clamp_base_velocity(m, qd_new, bpos, p)
        q_new = q + h * qd_new
        low = m.q_min + p.joint_limit_margin
        high = m.q_max - p.joint_limit_margin
        below, above = q_new < low, q_new > high
        q_new = jnp.clip(q_new, low, high)
        qd_new = jnp.where(below, jnp.maximum(qd_new, 0.0), qd_new)
        qd_new = jnp.where(above, jnp.minimum(qd_new, 0.0), qd_new)
        olv, oav = _cap_contact_gain(
            olv, olin_free, oav, oang_free, scene.shapes, p.solver,
        )
        olv = jnp.clip(olv, -p.max_obj_linvel, p.max_obj_linvel)
        oav = jnp.clip(oav, -p.max_obj_angvel, p.max_obj_angvel)
        if p.solver.rolling_friction > 0.0 and scene.shapes.num_objects:
            from handarm_tpu.ops.contact_sweep import _BASE

            n0 = jnp.stack([arrays[0][i] for i in _BASE["n"]], axis=-1)
            oav = _rolling_resistance(
                oav, anchored_impulse_world(arrays, lam3), n0,
                scene.slot_to_obj, scene.shapes.inertia_diag,
                p.solver.rolling_friction,
            )
        opos_new, oquat_new = free_body_integrate(opos, oquat, olv, oav, h)
        if scene.rails is not None:
            opos_new, oquat_new, olv, oav = _apply_rails(
                scene, opos_new, oquat_new, olv, oav, h
            )
        # TGS depth advance from the POST-clamp velocities (solver.
        # anchored_vn docstring: grasp contacts ride joint-limit-clamped
        # fingers; the kernel's pre-clamp vn loses 10 points of policy
        # success)
        depth_new = depth - h * anchored_vn(arrays, signs, qd_new, olv, oav)
        if m.floating:
            v_o, w = qd_new[:, 0:3], qd_new[:, 3:6]
            bpos_new = bpos + h * (v_o + jnp.cross(w, bpos))
            bquat_new = quat_integrate(bquat, w, h)
            q_new = q_new.at[:, :6].set(0.0)
        else:
            bpos_new, bquat_new = bpos, bquat
        return (
            q_new, qd_new, opos_new, oquat_new, olv, oav,
            lam3[0], lam3[1], lam3[2], depth_new, bpos_new, bquat_new,
            arrays,
        ), None

    carry = (
        q, qd, opos, oquat, olin, oang, lam3_0[0], lam3_0[1], lam3_0[2],
        contacts0.depth, bpos0, bquat0, arrays0,
    )
    (q, qd, opos, oquat, olin, oang, l0, l1, l2, depth, bpos_f, bquat_f,
     arrays_f), _ = jax.lax.scan(sub, carry, None, length=p.substeps)

    lam = anchored_impulse_world(arrays_f, (l0, l1, l2))
    f_slot = lam / h
    info = StepInfo(
        body_contact_force=jnp.einsum(
            "bci,cn->bni", f_slot, scene.slot_to_body),
        obj_contact_force=jnp.einsum(
            "bci,ck->bki", -f_slot, scene.slot_to_obj),
        max_penetration=jnp.max(
            jnp.maximum(depth, 0.0), axis=-1, initial=0.0),
    )
    if m.floating:
        base_pos_f, base_quat_f = bpos_f, bquat_f
    else:
        base_pos_f, base_quat_f = rob.base_pos, rob.base_quat
    new_state = PhysicsState(
        robot=RobotState(
            q=q, qd=qd, targets=targets,
            base_pos=base_pos_f, base_quat=base_quat_f, tau_ext=rob.tau_ext,
        ),
        objects=ObjectState(pos=opos, quat=oquat, linvel=olin, angvel=oang),
        contact_impulse=lam,
    )
    return new_state, info


def initial_state(
    scene: Scene,
    B: int,
    q0: jnp.ndarray | None = None,
    obj_pos0: jnp.ndarray | None = None,
    obj_quat0: jnp.ndarray | None = None,
    base_pos0: jnp.ndarray | None = None,
    base_quat0: jnp.ndarray | None = None,
    dtype=jnp.float32,
) -> PhysicsState:
    nv = scene.model.nv
    K = scene.shapes.num_objects
    if scene.model.floating:
        bp0 = (
            jnp.broadcast_to(scene.base_pos, (B, 3)).astype(dtype)
            if base_pos0 is None
            else jnp.broadcast_to(base_pos0, (B, 3)).astype(dtype)
        )
        bq0 = (
            jnp.broadcast_to(scene.base_quat, (B, 4)).astype(dtype)
            if base_quat0 is None
            else jnp.broadcast_to(base_quat0, (B, 4)).astype(dtype)
        )
    else:
        bp0 = bq0 = None
    q = jnp.zeros((B, nv), dtype) if q0 is None else jnp.broadcast_to(q0, (B, nv)).astype(dtype)
    opos = (
        jnp.zeros((B, K, 3), dtype)
        if obj_pos0 is None
        else jnp.broadcast_to(obj_pos0, (B, K, 3)).astype(dtype)
    )
    oquat = (
        jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0], dtype), (B, K, 4))
        if obj_quat0 is None
        else jnp.broadcast_to(obj_quat0, (B, K, 4)).astype(dtype)
    )
    return PhysicsState(
        robot=RobotState(
            q=q, qd=jnp.zeros((B, nv), dtype), targets=q,
            base_pos=bp0, base_quat=bq0,
        ),
        objects=ObjectState(
            pos=opos,
            quat=oquat,
            linvel=jnp.zeros((B, K, 3), dtype),
            angvel=jnp.zeros((B, K, 3), dtype),
        ),
        contact_impulse=jnp.zeros((B, scene.slots.num_slots, 3), dtype),
    )

"""Batched contact solver: vectorized relaxed-Jacobi (default) or
sequential-impulse Gauss-Seidel.

TPU-native replacement for PhysX's GPU TGS constraint solver (the reference
budgets it at 8 position + 0 velocity iterations, isaacgymenvs/cfg/task/
Ur5SihBase.yaml sim block). Two modes:

- "jacobi": every sweep updates ALL contact slots simultaneously with an
  under-relaxation factor — each sweep is a handful of batched einsums over
  [B, C, ...], the scan body is tiny (fast XLA compile, MXU-friendly), and
  the sequential depth is just `iterations`. Object scatter/gather uses
  static one-hot maps (slot participants are compile-time constants).
- "gs": classic sequential impulses, one slot at a time (statically
  unrolled) — the PhysX-faithful reference implementation used for solver
  cross-checks; sequential depth iterations*C makes it slower to compile
  and run.

Both operate on the PD-augmented robot inertia (same Mtilde as free
dynamics — consistent implicit PD) and closed-form rigid-body inverse
inertia for objects. Friction is a Coulomb-disk projection on accumulated
impulses; positional correction is Baumgarte bias capped by a max
depenetration velocity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import skew
from handarm_tpu.physics.contacts import Contacts, ContactSlots
from handarm_tpu.physics.dynamics import free_body_inv_inertia_world
from handarm_tpu.physics.kinematics import FK, ModelArrays, point_jacobian
from handarm_tpu.physics.shapes import ObjectShapes


class SolverParams(NamedTuple):
    iterations: int = 8  # with mass splitting + warm start this matches the
    # reference's 8-iteration TGS budget; stacks are drift-free at 8
    baumgarte: float = 0.3
    slop: float = 0.001
    warm_start: float = 0.9  # fraction of last substep's impulses reapplied
    max_depenetration_vel: float = 0.5
    # energy guard (PhysX maxDepenetrationVelocity semantics, applied to
    # the OUTPUT): a contact solve may not leave an object faster than it
    # arrived plus this budget [m/s]. Near-antiparallel contact normals
    # (a finger-wedge squeeze) geometrically amplify the per-contact bias
    # cap into 10-20 m/s "watermelon-seed" ejections without this.
    max_contact_gain: float = 1.0
    activation_margin: float = 0.0
    restitution: float = 0.0  # Newtonian bounce: target separating velocity
    # = -restitution * pre-solve approach velocity (for impacts faster than
    # restitution_threshold; PhysX bounceThreshold analog)
    restitution_threshold: float = 0.2
    mode: str = "jacobi"  # "jacobi" (vectorized, default) | "gs" (sequential)
    # jacobi data plane: "soa" keeps every per-slot quantity as a [B, C]
    # plane (clean TPU tiles, couplings as 2D one-hot GEMMs); "aos" is the
    # original [B, C, 3]-tensor formulation kept for cross-checks
    jacobi_impl: str = "soa"
    # rolling resistance coefficient [m]: angular-impulse budget per unit of
    # normal impulse (PhysX's contact-patch manifold gives an implicit
    # rolling resistance that a single-point contact lacks — without this a
    # tapped sphere rolls forever). 0 disables.
    rolling_friction: float = 0.0
    relaxation: float = 1.0  # jacobi sweep gain (scaled by mass splitting)
    # mass splitting: each slot's impulse step is divided by the number of
    # active slots sharing its most-contended participant — parallel Jacobi
    # is then an averaged projection and cannot diverge however many
    # co-aligned contacts push one body (deep-penetration pile-ups)
    speculative_margin: float = 0.02  # activate contacts within this gap
    # dtype for the heavy prep intermediates (generalized-unit-impulse
    # chain): "bf16" halves their HBM traffic on TPU; effective masses /
    # biases / impulses stay f32 either way
    prep_dtype: str = "f32"


class SolverOut(NamedTuple):
    qd: jnp.ndarray  # [B, nv]
    obj_linvel: jnp.ndarray  # [B, K, 3]
    obj_angvel: jnp.ndarray  # [B, K, 3]
    impulse: jnp.ndarray  # [B, C, 3] accumulated impulses, WORLD frame


def _group_onehot(slots) -> np.ndarray:
    """Static slot -> contact-group one-hot [C, G]. A group = slots with the
    same (robot body, obj_a, obj_b) participant signature — e.g. all sample
    points of object k resting on the table, or the two point-vs-SDF
    directions of an object pair (merged, since their impulses co-load the
    same pair)."""
    keys = {}
    gid = []
    for c in range(slots.num_slots):
        a, b = int(slots.obj_a[c]), int(slots.obj_b[c])
        pair = (min(a, b), max(a, b))  # merge both directions of a pair
        key = (int(slots.robot_body[c]), pair)
        gid.append(keys.setdefault(key, len(keys)))
    onehot = np.zeros((slots.num_slots, len(keys)), np.float32)
    onehot[np.arange(slots.num_slots), gid] = 1.0
    return onehot


def _obj_incidence(slots, num_objects: int):
    """Static (group_obj [G, K], slot_obj_a [C, K], slot_obj_b [C, K])
    incidence for the across-group level of mass splitting."""
    onehot = _group_onehot(slots)
    C, G = onehot.shape
    K = max(num_objects, 1)
    slot_a = np.zeros((C, K), np.float32)
    slot_b = np.zeros((C, K), np.float32)
    for c in range(C):
        if slots.obj_a[c] >= 0:
            slot_a[c, slots.obj_a[c]] = 1.0
        if slots.obj_b[c] >= 0:
            slot_b[c, slots.obj_b[c]] = 1.0
    group_obj = (onehot.T @ (slot_a + slot_b) > 0).astype(np.float32)  # [G, K]
    return group_obj, slot_a, slot_b


def _mass_split(active, group_onehot, group_obj=None, slot_obj=None,
                robot_mask=None):
    """Two-level mass splitting for the parallel sweep.

    Level 1 — within-group: divide by the active-slot count of each slot's
    contact group (same (robot body, pair) signature — e.g. the sample
    points of an object resting on the table). Makes co-aligned constraint
    bundles an averaged projection, where naive Jacobi diverges.

    Level 2 — across groups per object: divide by the number of DISTINCT
    active groups touching each slot's object participants. Opposing
    constraint systems on one light body (thumb + finger groups squeezing a
    0.1 kg box) have Jacobi spectral radius ~1 and blow a resting object to
    the 20 m/s clamp within one step without this; averaging across groups
    restores the convergent averaged-projection property. Sparse impacts
    (a fingertip hitting a table-resting box: 2 groups) keep 1/2-steps, so
    impacts still resolve within a substep."""
    counts = jnp.einsum("bc,cg->bg", active, group_onehot)
    counts_c = jnp.einsum("bg,cg->bc", counts, group_onehot)
    split = 1.0 / jnp.maximum(counts_c, 1.0)
    if group_obj is not None:
        slot_obj_a, slot_obj_b = slot_obj
        g_active = (counts > 0.0).astype(active.dtype)  # [B, G]
        groups_on_obj = jnp.einsum("bg,gk->bk", g_active, group_obj)  # [B, K]
        # per-slot factor: worst (max) group count over the slot's two
        # object participants (sum would over-damp object-object contacts
        # to the point of breaking stacking impacts). A third level across
        # robot-contact groups was tried and REVERTED: the apparent
        # robot-side Jacobi divergence motivating it was the axon
        # _tangent_basis miscompile (see _tangent_basis), and splitting
        # across feet/finger groups softened contacts enough to break
        # locomotion learning.
        fa = jnp.einsum("bk,ck->bc", groups_on_obj, slot_obj_a)
        fb = jnp.einsum("bk,ck->bc", groups_on_obj, slot_obj_b)
        factor = jnp.maximum(fa, fb)
        split = split / jnp.maximum(factor, 1.0)
    return split


def _tangent_basis(n: jnp.ndarray):
    """Robust orthonormal tangents for unit normals n: [..., 3].

    Normalization uses rsqrt(sum(t^2) + eps), NOT
    `t / max(linalg.norm(t), 1e-9)`: the axon TPU backend miscompiles the
    norm+max+divide pattern in large fused programs (observed: norm -> 0
    for unit tangents, so the 1e-9 floor turned the basis into 1e9 rows
    and d_eff into ~1e19, exploding the contact solve on TPU only)."""
    ax = jnp.where(
        jnp.abs(n[..., 0:1]) < 0.9,
        jnp.array([1.0, 0.0, 0.0], n.dtype),
        jnp.array([0.0, 1.0, 0.0], n.dtype),
    )
    t1 = jnp.cross(n, ax)
    t1 = t1 * jax.lax.rsqrt(jnp.sum(t1 * t1, axis=-1, keepdims=True) + 1e-18)
    t2 = jnp.cross(n, t1)
    return t1, t2


class _Prep(NamedTuple):
    """Precomputed solver quantities.

    Split into heavy terms evaluated once per sim step (Minv, effective
    masses d_eff, object inverse inertias) and light geometry refreshed per
    substep via `refresh_prep` (contact points/normals/depths, bias, screws)
    — the TGS idiom: mass/Jacobian structure per step, anchors per substep.

    The sweep phase is designed to be HBM-light: instead of re-reading the
    per-slot Jacobians (O(B*C*3*nv) — hundreds of MB at fleet batch sizes)
    every sweep, it works from body twists (robot side: masked screw matmul
    + static gathers) and generalized impulses (static slot->dof masks +
    one explicit Mtilde^-1 matmul). Per-sweep traffic is O(B*C*6)."""

    active: jnp.ndarray  # [B, C]
    basis: jnp.ndarray  # [B, C, 3(dir), 3(xyz)]
    inv_d: jnp.ndarray  # [B, C, 3] masked inverse effective mass per direction
    split: jnp.ndarray  # [B, C] mass-splitting factor (1/max participant count)
    bias: jnp.ndarray  # [B, C]
    mu: jnp.ndarray  # [B, C] (zeroed while not yet touching)
    pos: jnp.ndarray  # [B, C, 3] contact points
    screw: jnp.ndarray  # [B, nv, 6] world joint screws
    ancestor_mask: jnp.ndarray  # [nb, nv]
    Minv: jnp.ndarray  # [B, nv, nv] explicit PD-augmented inverse inertia
    anc_slot: jnp.ndarray  # [C, nv] static: dof u moves slot c's robot body
    body_idx: np.ndarray  # [C] static robot body per slot (0 if none)
    robot_mask: jnp.ndarray  # [C] 1.0 where slot touches the robot
    group_onehot: jnp.ndarray  # [C, G] static contact-group membership
    group_obj: jnp.ndarray  # [G, K] static: group g touches object k
    slot_obj: tuple  # ([C, K], [C, K]) static one-hots per side (a, b)
    has_robot: np.ndarray  # [C] bool (static)
    sides: dict  # side -> (kidx [C], r [B,C,3], Iinv_c [B,C,3,3], invm [C], mask [C], sign, onehot [C,K])
    d_eff: jnp.ndarray | None = None  # [B, C, 3] unmasked effective mass
    J: jnp.ndarray | None = None  # [B, C, 3, nv] (gs mode only)
    MinvJT: jnp.ndarray | None = None  # [B, C, nv, 3] (gs mode only)


def _prepare(
    m, fk, Minv, slots, contacts, shapes, obj_pos, obj_quat, h, params,
    mass_scale=None, friction_scale=None,
):
    B, C = contacts.depth.shape
    K = shapes.num_objects
    nv = m.nv
    dtype = contacts.depth.dtype

    # speculative activation (PhysX contact-offset analog): slots within the
    # margin participate; non-penetrating ones get a gap-closing bias that
    # lets them approach at exactly gap/h — no tunneling at impact speed.
    active = (contacts.depth > -params.speculative_margin).astype(dtype)

    has_robot = slots.robot_body >= 0
    body_idx_np = np.where(has_robot, slots.robot_body, 0)
    anc_slot = jnp.asarray(
        np.asarray(m.ancestor_mask)[body_idx_np]
        * has_robot[:, None].astype(np.float32)
    ).astype(dtype)  # [C, nv]
    robot_mask = jnp.asarray(has_robot, dtype)

    n = contacts.normal
    t1, t2 = _tangent_basis(n)
    basis = jnp.stack([n, t1, t2], axis=2)  # [B, C, 3(dir), 3]

    J = MinvJT = None
    pd = jnp.bfloat16 if params.prep_dtype == "bf16" else dtype
    # jacobi_impl='pallas' forces the kernel; 'soa' auto-upgrades on TPU at
    # fleet B*C. Measured on v5e at B=8192/C=127 the VPU kernel's serial
    # y-chain loses to XLA's batched micro-GEMM (4.7 vs 3.8 ms), so small
    # scenes keep the XLA path — but at B*C >= 2^21 (multiobj: 8192 envs x
    # 372 slots) the XLA chain FAULTS the TPU worker during execution
    # (reproduced: every jacobi/prep-dtype variant of the XLA path crashes
    # at 8192x372 while the VMEM-resident kernel runs clean; 4096x372 and
    # 8192x240 are fine — see docs/performance.md r4 notes), and its
    # micro-GEMM cost scales with C anyway.
    use_deff_kernel = params.mode != "gs" and (
        params.jacobi_impl == "pallas"
        or (
            params.jacobi_impl == "soa"
            and jax.default_backend() == "tpu"
            and B * C >= 2**21
        )
    )
    if has_robot.any() and use_deff_kernel:
        # fused VMEM-resident effective-mass kernel: no [B, C, nv, 3]
        # intermediates in HBM (ops/prep_deff.py; ~3.8 -> <1 ms/sim-step
        # at fleet batch)
        from handarm_tpu.ops.prep_deff import robot_deff

        screws6 = jnp.moveaxis(fk.screw, -1, 0)  # [6, B, nv]
        pos3 = jnp.moveaxis(contacts.pos, -1, 0)  # [3, B, C]
        basis9 = jnp.moveaxis(basis, (2, 3), (0, 1)).reshape(
            9, B, C
        )  # (d, xyz) major
        d_robot = jnp.moveaxis(
            robot_deff(
                screws6, pos3, basis9, anc_slot,
                Minv.reshape(B, nv * nv),
                interpret=jax.default_backend() != "tpu",
            ),
            0, -1,
        )  # [B, C, 3]
    elif has_robot.any():
        # robot contribution to the per-direction effective masses:
        #   d_eff[c, d] = v_d^T Minv v_d with v_d[u] = anc * screw_u . (p x w_d, w_d)
        # Computed directly — the full 3x3 Delassus blocks D/DB that an
        # earlier version built cost ~25 ms/step at fleet batch because
        # XLA lowers the tiny per-slot 3x3 contractions as micro-GEMMs;
        # the jacobi sweep only ever reads the DIAGONAL. v reduces to a
        # pure cross-product broadcast:
        #   screw . (p x w, w) = (screw_ang x p + screw_lin) . w
        #
        # CHUNKED over C: the [B, chunk, nv, 3] intermediates are the
        # peak-HBM term of the whole step (at B=8192, C=372, nv~30 the
        # unchunked chain is >1 GB per tensor with several live at once —
        # enough to crash the 16 GB chip during multiobj genesis). A
        # sequential lax.map over <=128-slot chunks caps the working set
        # at a C-independent size for the same total FLOPs.
        sa = fk.screw[..., :3]  # [B, nv, 3] angular part
        sl = fk.screw[..., 3:]
        CHUNK = min(128, C)
        n_ch = -(-C // CHUNK)
        C_pad = n_ch * CHUNK
        pos_p = jnp.pad(contacts.pos, ((0, 0), (0, C_pad - C), (0, 0)))
        anc_p = jnp.pad(anc_slot, ((0, C_pad - C), (0, 0)))
        basis_p = jnp.pad(
            basis, ((0, 0), (0, C_pad - C), (0, 0), (0, 0))
        )
        pos_cs = jnp.moveaxis(
            pos_p.reshape(B, n_ch, CHUNK, 3), 1, 0
        )  # [n_ch, B, CHUNK, 3]
        anc_cs = anc_p.reshape(n_ch, CHUNK, nv)
        basis_cs = jnp.moveaxis(
            basis_p.reshape(B, n_ch, CHUNK, 3, 3), 1, 0
        )
        Minv_pd = Minv.astype(pd)

        def _chunk_deff(args):
            pos_c, anc_c, basis_c = args
            arm = (
                jnp.cross(sa[:, None], pos_c[:, :, None]) + sl[:, None]
            ) * anc_c[None, :, :, None]  # [B, CHUNK, nv, 3]
            # v[b,c,u,d] = arm . w_d (mul-sum; einsum would micro-GEMM)
            v = jnp.sum(
                arm[:, :, :, None, :].astype(pd)
                * basis_c[:, :, None, :, :].astype(pd),
                axis=-1,
            )  # [B, CHUNK, nv, 3(dir)]
            # the one real GEMM: [B, nv, nv] @ [B, nv, CHUNK*3]
            Minv_v = jnp.einsum("buv,bcvd->bcud", Minv_pd, v)
            return jnp.sum(v * Minv_v, axis=2).astype(dtype)  # [B, CHUNK, 3]

        if n_ch == 1:
            d_robot = _chunk_deff((pos_cs[0], anc_cs[0], basis_cs[0]))[:, :C]
        else:
            d_robot = jnp.moveaxis(
                jax.lax.map(_chunk_deff, (pos_cs, anc_cs, basis_cs)), 0, 1
            ).reshape(B, C_pad, 3)[:, :C]
        if params.mode == "gs":
            body_idx = jnp.broadcast_to(jnp.asarray(body_idx_np), (B, C))
            J = point_jacobian(m, fk, body_idx, contacts.pos)
            J = J * robot_mask[None, :, None, None]
            # gs sweeps need Minv J^T columns in the cartesian frame
            f_unit = jnp.concatenate(
                [skew(contacts.pos),
                 jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, C, 3, 3))],
                axis=-2,
            )
            Bc = jnp.einsum("bua,bcai->bcui", fk.screw, f_unit) * anc_slot[
                None, :, :, None
            ]
            MinvJT = jnp.einsum("buv,bcvi->bcui", Minv, Bc)
    else:
        d_robot = jnp.zeros((B, C, 3), dtype)
        if params.mode == "gs":
            J = jnp.zeros((B, C, 3, nv), dtype)
            MinvJT = jnp.zeros((B, C, nv, 3), dtype)

    if K:
        Iinv_w = free_body_inv_inertia_world(obj_quat, shapes.inertia_diag)

    d_eff_obj_acc = jnp.zeros((B, C, 3), dtype)
    sides = {}
    for side, idx_arr, sign in (("a", slots.obj_a, 1.0), ("b", slots.obj_b, -1.0)):
        has = idx_arr >= 0
        if K == 0 or not has.any():
            sides[side] = None
            continue
        kidx = np.where(has, idx_arr, 0)
        r = contacts.pos - obj_pos[:, kidx]
        Iinv_c = Iinv_w[:, kidx]
        invm_c = jnp.broadcast_to(shapes.inv_mass[kidx], (B, C))
        if mass_scale is not None:
            ms = mass_scale[:, kidx]  # [B, C]
            invm_c = invm_c / ms
            Iinv_c = Iinv_c / ms[..., None, None]
        mask = jnp.asarray(has, dtype)
        # object contribution per direction:
        #   w_d^T (1/m I + rx^T Iinv rx) w_d = 1/m + (r x w_d)^T Iinv (r x w_d)
        cr = jnp.cross(r[:, :, None, :], basis)  # [B, C, 3(dir), 3]
        Icr = jnp.sum(
            Iinv_c[:, :, None, :, :] * cr[:, :, :, None, :], axis=-1
        )  # [B, C, 3(dir), 3] = Iinv @ cr per direction
        d_obj = invm_c[..., None] + jnp.sum(cr * Icr, axis=-1)  # [B, C, 3]
        d_eff_obj_acc = d_eff_obj_acc + d_obj * mask[None, :, None]
        onehot = np.zeros((C, K), np.float32)
        onehot[np.arange(C)[has], idx_arr[has]] = 1.0
        sides[side] = (
            kidx, r, Iinv_c, invm_c, mask, sign, jnp.asarray(onehot, dtype)
        )

    d_eff = jnp.maximum(d_robot + d_eff_obj_acc, 1e-8)
    inv_d = active[..., None] / d_eff

    bias = jnp.where(
        contacts.depth >= 0.0,
        jnp.minimum(
            params.baumgarte / h * jnp.maximum(contacts.depth - params.slop, 0.0),
            params.max_depenetration_vel,
        ),
        contacts.depth / h,  # negative: may approach at most gap/h
    )
    # friction applies to every active slot: the cone |f_t| <= mu*lam_n
    # already zeroes it when no normal impulse flows. Gating on depth > 0
    # was a bug — a SETTLED object rests at depth ~ 0 and lost all
    # friction, so resting/marginal contacts slid freely.
    mu = jnp.asarray(slots.friction, dtype)[None] * jnp.ones_like(contacts.depth)
    if friction_scale is not None:
        mu = mu * friction_scale[:, None]
    group_onehot = jnp.asarray(_group_onehot(slots), dtype)
    go_np, sa_np, sb_np = _obj_incidence(slots, K)
    group_obj = jnp.asarray(go_np, dtype)
    slot_obj = (jnp.asarray(sa_np, dtype), jnp.asarray(sb_np, dtype))
    split = _mass_split(active, group_onehot, group_obj, slot_obj,
                        robot_mask=robot_mask)
    return _Prep(
        active=active, basis=basis, inv_d=inv_d, bias=bias, mu=mu,
        split=split,
        pos=contacts.pos, screw=fk.screw, ancestor_mask=m.ancestor_mask,
        Minv=Minv, anc_slot=anc_slot, body_idx=body_idx_np,
        robot_mask=robot_mask, group_onehot=group_onehot,
        group_obj=group_obj, slot_obj=slot_obj,
        has_robot=has_robot, sides=sides,
        d_eff=d_eff, J=J, MinvJT=MinvJT,
    )


def refresh_prep(
    prep: _Prep,
    fk,
    contacts: Contacts,
    slots: ContactSlots,
    obj_pos: jnp.ndarray,
    h: float,
    params: SolverParams,
    friction_scale=None,
) -> _Prep:
    """Per-substep geometry refresh against frozen mass terms: new contact
    points/normals/depths (and the biases/masks derived from them), fresh
    joint screws and object lever arms; d_eff / Minv / inverse inertias stay
    from the step-start prep."""
    dtype = contacts.depth.dtype
    active = (contacts.depth > -params.speculative_margin).astype(dtype)
    n = contacts.normal
    t1, t2 = _tangent_basis(n)
    basis = jnp.stack([n, t1, t2], axis=2)
    inv_d = active[..., None] / prep.d_eff
    bias = jnp.where(
        contacts.depth >= 0.0,
        jnp.minimum(
            params.baumgarte / h * jnp.maximum(contacts.depth - params.slop, 0.0),
            params.max_depenetration_vel,
        ),
        contacts.depth / h,
    )
    mu = jnp.asarray(slots.friction, dtype)[None] * jnp.ones_like(contacts.depth)
    if friction_scale is not None:
        mu = mu * friction_scale[:, None]
    sides = {}
    for side, sd in prep.sides.items():
        if sd is None:
            sides[side] = None
            continue
        kidx, _, Iinv_c, invm_c, mask, sign, onehot = sd
        r = contacts.pos - obj_pos[:, kidx]
        sides[side] = (kidx, r, Iinv_c, invm_c, mask, sign, onehot)
    split = _mass_split(active, prep.group_onehot, prep.group_obj,
                        prep.slot_obj, robot_mask=prep.robot_mask)
    return prep._replace(
        active=active, basis=basis, inv_d=inv_d, bias=bias, mu=mu,
        split=split, pos=contacts.pos, screw=fk.screw, sides=sides,
    )


def _rel_velocity(prep: _Prep, qd, lv, av):
    """World relative velocity at every slot (A side minus B side): [B,C,3].

    Robot side from body twists: bv = anc-masked sum of screw*qd, then a
    static per-slot body gather — O(B*(nv^2 + C*6)) instead of O(B*C*3*nv)."""
    sv = prep.screw * qd[..., None]  # [B, nv, 6]
    bv = jnp.einsum("nj,bja->bna", prep.ancestor_mask, sv)  # [B, nb, 6]
    bvc = bv[:, prep.body_idx]  # [B, C, 6], static gather
    v = (
        bvc[..., 3:] + jnp.cross(bvc[..., :3], prep.pos)
    ) * prep.robot_mask[None, :, None]
    for side in ("a", "b"):
        sd = prep.sides[side]
        if sd is None:
            continue
        kidx, r, _, _, mask, sign, _ = sd
        v_pt = lv[:, kidx] + jnp.cross(av[:, kidx], r)
        v = v + sign * v_pt * mask[None, :, None]
    return v


def _apply_impulses(prep: _Prep, qd, lv, av, dP):
    """Apply world impulses dP [B, C, 3] (+ to robot/objA, - to objB).

    Robot side via generalized impulses: g_u = screw_u . sum_c anc[c,u] *
    (p_c x dP_c, dP_c), then qd += Minv g."""
    f = jnp.concatenate([jnp.cross(prep.pos, dP), dP], axis=-1)  # [B, C, 6]
    W = jnp.einsum("cu,bca->bua", prep.anc_slot, f)  # [B, nv, 6]
    gi = jnp.einsum("bua,bua->bu", prep.screw, W)
    qd = qd + jnp.einsum("buv,bv->bu", prep.Minv, gi)
    for side in ("a", "b"):
        sd = prep.sides[side]
        if sd is None:
            continue
        kidx, r, Iinv_c, invm_c, mask, sign, onehot = sd
        dPm = dP * mask[None, :, None]
        lv = lv + sign * jnp.einsum(
            "bci,ck->bki", dPm * invm_c[..., None], onehot
        )
        dw = jnp.einsum("bcij,bcj->bci", Iinv_c, jnp.cross(r, dPm))
        av = av + sign * jnp.einsum("bci,ck->bki", dw, onehot)
    return qd, lv, av


def _project(prep: _Prep, lam, v):
    """One projected update of accumulated impulses given slot velocities v.

    Returns the projected new lambda (before relaxation)."""
    vn = jnp.einsum("bci,bci->bc", v, prep.basis[:, :, 0])
    vt1 = jnp.einsum("bci,bci->bc", v, prep.basis[:, :, 1])
    vt2 = jnp.einsum("bci,bci->bc", v, prep.basis[:, :, 2])
    new_n = jnp.maximum(lam[..., 0] + (prep.bias - vn) * prep.inv_d[..., 0], 0.0)
    ft1 = lam[..., 1] - vt1 * prep.inv_d[..., 1]
    ft2 = lam[..., 2] - vt2 * prep.inv_d[..., 2]
    fmag = jnp.sqrt(ft1 * ft1 + ft2 * ft2)
    fmax = prep.mu * new_n
    scale = jnp.where(fmag > fmax, fmax / jnp.maximum(fmag, 1e-9), 1.0)
    return jnp.stack([new_n, ft1 * scale, ft2 * scale], axis=-1)


# contact-slot count above which solver invariants are threaded through
# scan carries instead of closed over. Small scenes (lift: C=80) are FASTER
# closed over: XLA fuses the cheap prep producers straight into the sweep
# body and never materializes the [B, C, ...] tensors at all. Large scenes
# (multi-object: C=372) are the opposite: rematerializing SDF-fed prep
# every sweep costs ~5 ms/sweep, so the tensors must be pinned in the carry.
CARRY_THREAD_MIN_SLOTS = 160


def _carry_split(prep: _Prep):
    """Partition prep into (2D-flattened device-array leaves, rebuild fn).

    TPU layout hazard: when prep is produced inside the same jit as the
    sweep loop (the whole-env-step graph), XLA assigns tile-padded layouts
    to >2D tensors that live across the loop boundary — e.g.
    f32[B, C, 3, 3] gets {3,2,1,0:T(4,128)}, padding the (3, 3) minor to
    (4, 128), a ~42x physical blowup re-read every sweep (measured 4.8
    ms/sweep vs 0.7 ms at multi-object scale, B=1024 C=372). Flattening
    every leaf to [dim0, -1] before the scan keeps the minor dimension
    large and the layout compact; the body reshapes back (a free
    view inside fusions). Static leaves (numpy index arrays, python
    scalars) stay closed over so static indexing survives."""
    leaves, treedef = jax.tree_util.tree_flatten(prep)
    is_dyn = [isinstance(x, jax.Array) for x in leaves]
    shapes = [x.shape if d else None for x, d in zip(leaves, is_dyn)]
    dyn = tuple(
        x.reshape(x.shape[0], -1) if x.ndim > 2 else x
        for x, d in zip(leaves, is_dyn) if d
    )

    def rebuild(dyn_leaves):
        it = iter(dyn_leaves)
        merged = [
            next(it).reshape(s) if d else x
            for x, d, s in zip(leaves, is_dyn, shapes)
        ]
        return jax.tree_util.tree_unflatten(treedef, merged)

    return dyn, rebuild


def _solve_jacobi(prep: _Prep, qd, lv, av, lam0, params: SolverParams):
    omega = params.relaxation
    C = prep.active.shape[1]
    if C >= CARRY_THREAD_MIN_SLOTS:
        dyn_leaves, rebuild = _carry_split(prep)
    else:
        dyn_leaves, rebuild = (), lambda _: prep

    def sweep(carry, _):
        qd, lv, av, lam, leaves = carry
        pr = rebuild(leaves)
        v = _rel_velocity(pr, qd, lv, av)
        lam_new = _project(pr, lam, v)
        dlam = (
            omega * (lam_new - lam)
            * (pr.active * pr.split)[..., None]
        )
        lam = lam + dlam
        dP = jnp.einsum("bcd,bcdi->bci", dlam, pr.basis)
        qd, lv, av = _apply_impulses(pr, qd, lv, av, dP)
        return (qd, lv, av, lam, leaves), None

    (qd, lv, av, lam, _), _ = jax.lax.scan(
        sweep, (qd, lv, av, lam0, dyn_leaves), None, length=params.iterations
    )
    return qd, lv, av, lam


def _solve_gs(prep: _Prep, qd, lv, av, lam0, params: SolverParams):
    """Sequential impulses with a scan over slots (gathered per-slot data).

    Object participation uses one-hot rows so the scan body stays static."""
    C = prep.active.shape[1]

    def slot_update(carry, c):
        qd, lv, av, lam = carry
        basis_c = prep.basis[:, c]  # [B, 3, 3]
        Jc = prep.J[:, c]
        v = jnp.einsum("biv,bv->bi", Jc, qd)
        for side in ("a", "b"):
            sd = prep.sides[side]
            if sd is None:
                continue
            kidx, r, _, _, mask, sign, onehot = sd
            kvec = onehot[c]  # [K] one-hot (zero row if no participant)
            lv_c = jnp.einsum("bki,k->bi", lv, kvec)
            av_c = jnp.einsum("bki,k->bi", av, kvec)
            v = v + sign * (lv_c + jnp.cross(av_c, r[:, c])) * mask[c]
        vn = jnp.einsum("bi,bi->b", v, basis_c[:, 0])
        vt1 = jnp.einsum("bi,bi->b", v, basis_c[:, 1])
        vt2 = jnp.einsum("bi,bi->b", v, basis_c[:, 2])
        lam_c = lam[:, c]
        new_n = jnp.maximum(
            lam_c[:, 0] + (prep.bias[:, c] - vn) * prep.inv_d[:, c, 0], 0.0
        )
        ft1 = lam_c[:, 1] - vt1 * prep.inv_d[:, c, 1]
        ft2 = lam_c[:, 2] - vt2 * prep.inv_d[:, c, 2]
        fmag = jnp.sqrt(ft1 * ft1 + ft2 * ft2)
        fmax = prep.mu[:, c] * new_n
        scale = jnp.where(fmag > fmax, fmax / jnp.maximum(fmag, 1e-9), 1.0)
        new_lam = jnp.stack([new_n, ft1 * scale, ft2 * scale], axis=-1)
        dlam = (new_lam - lam_c) * prep.active[:, c][:, None]
        lam = lam.at[:, c].add(dlam)
        dP = jnp.einsum("bd,bdi->bi", dlam, basis_c)
        qd = qd + jnp.einsum("bvi,bi->bv", prep.MinvJT[:, c], dP)
        for side in ("a", "b"):
            sd = prep.sides[side]
            if sd is None:
                continue
            kidx, r, Iinv_c, invm_c, mask, sign, onehot = sd
            kvec = onehot[c]
            dPm = dP * mask[c]
            lv = lv + sign * jnp.einsum(
                "bi,k->bki", dPm * invm_c[:, c][:, None], kvec
            )
            dw = jnp.einsum("bij,bj->bi", Iinv_c[:, c], jnp.cross(r[:, c], dPm))
            av = av + sign * jnp.einsum("bi,k->bki", dw, kvec)
        return (qd, lv, av, lam), None

    def sweep(carry, _):
        return jax.lax.scan(slot_update, carry, jnp.arange(C)), None

    def sweep_body(carry, _):
        (carry, _), _ = sweep(carry, None)
        return carry, None

    carry = (qd, lv, av, lam0)
    carry, _ = jax.lax.scan(sweep_body, carry, None, length=params.iterations)
    return carry


# --- structure-of-arrays jacobi engine ---------------------------------------
#
# The AoS sweep operates on [B, C, 3] / [B, C, 3, 3] tensors whose tiny
# minor dimensions tile-pad badly on TPU (a (3, 3) minor pads to (4, 128))
# and whose contractions lower to micro-GEMMs. The SoA engine keeps every
# per-slot quantity as a separate [B, C] plane (clean (8, 128) tiles, pure
# VPU elementwise) and expresses every slot<->body/object coupling as a
# single well-shaped 2D GEMM against a static matrix:
#   robot gather/scatter:  [B, nv] @ [nv, C]  /  [B, C] @ [C, nv]
#   object gather/scatter: [B, K] @ [K, C]    /  [B, C] @ [C, K]
# Measured at B=8192, C=372: 7.7 ms/sweep (AoS) -> see bench history.


class _SoASide(NamedTuple):
    sign: float
    onehot: jnp.ndarray  # [C, K] scatter map (zero rows = not participating)
    onehotT: jnp.ndarray  # [K, C] gather map
    r: tuple  # 3 x [B, C] lever arm components
    Iinv: tuple  # 6 x [B, C] symmetric world inverse inertia (xx,xy,xz,yy,yz,zz)
    invm: jnp.ndarray  # [B, C]


class _SoA(NamedTuple):
    n: tuple  # 3 x [B, C]
    t1: tuple
    t2: tuple
    pos: tuple  # 3 x [B, C]
    bias: jnp.ndarray  # [B, C]
    mu: jnp.ndarray
    inv_d: tuple  # 3 x [B, C] per direction (already active-masked)
    gate: jnp.ndarray  # [B, C] active * mass-split
    screw: tuple  # 6 x [B, nv] (ang x,y,z, lin x,y,z)
    anc_slotT: jnp.ndarray  # [nv, C] dof -> slot coupling (robot-masked)
    anc_slot: jnp.ndarray  # [C, nv]
    # Minv flattened to [B, nv*nv] (u-major): f32[B, nv, nv] tile-pads its
    # (nv, nv) minor to (24, 128) on TPU — a ~10x physical blowup re-read
    # EVERY sweep by the generalized-impulse apply. The 2D plane is compact;
    # the matvec becomes elementwise-mul + one static-fold GEMM.
    Minv2: jnp.ndarray  # [B, nv*nv]
    fold: jnp.ndarray  # [nv*nv, nv] static: fold[u*nv+v, u] = 1
    sides: tuple  # of _SoASide


def _soa_from_prep(prep: _Prep) -> _SoA:
    def comps(x):  # [B, C, 3] -> 3 x [B, C]
        return (x[..., 0], x[..., 1], x[..., 2])

    sides = []
    for key in ("a", "b"):
        sd = prep.sides.get(key)
        if sd is None:
            continue
        kidx, r, Iinv_c, invm_c, mask, sign, onehot = sd
        # sign must stay a STATIC Python float (the pallas kernel bakes it
        # in); prep.sides' sign leaf becomes a tracer whenever _Prep
        # crosses a jit boundary, so derive it from the side name instead
        sides.append(_SoASide(
            sign=(1.0 if key == "a" else -1.0), onehot=onehot,
            onehotT=onehot.T,
            r=comps(r),
            Iinv=(Iinv_c[..., 0, 0], Iinv_c[..., 0, 1], Iinv_c[..., 0, 2],
                  Iinv_c[..., 1, 1], Iinv_c[..., 1, 2], Iinv_c[..., 2, 2]),
            invm=invm_c,
        ))
    B, nv = prep.Minv.shape[:2]
    fold = np.zeros((nv * nv, nv), np.float32)
    fold[np.arange(nv * nv), np.arange(nv * nv) // nv] = 1.0
    return _SoA(
        n=comps(prep.basis[:, :, 0]),
        t1=comps(prep.basis[:, :, 1]),
        t2=comps(prep.basis[:, :, 2]),
        pos=comps(prep.pos),
        bias=prep.bias,
        mu=prep.mu,
        inv_d=comps(prep.inv_d),
        gate=prep.active * prep.split,
        screw=(prep.screw[..., 0], prep.screw[..., 1], prep.screw[..., 2],
               prep.screw[..., 3], prep.screw[..., 4], prep.screw[..., 5]),
        anc_slotT=prep.anc_slot.T,
        anc_slot=prep.anc_slot,
        sides=tuple(sides),
        Minv2=prep.Minv.reshape(B, nv * nv),
        fold=jnp.asarray(fold, prep.Minv.dtype),
    )


def _relv_soa(s: _SoA, qd, lvc, avc):
    """Relative velocity components at every slot (A minus B): 3 x [B, C].

    lvc/avc: object linear/angular velocities as 3 x [B, K] components."""
    # robot side: slot point velocity via dof->slot coupling; the chain
    # ancestor-mask + body gather collapses into anc_slot (constant)
    b = [(s.screw[a] * qd) @ s.anc_slotT for a in range(6)]  # 6 x [B, C]
    wx, wy, wz, lx, ly, lz = b
    px, py, pz = s.pos
    vx = lx + wy * pz - wz * py
    vy = ly + wz * px - wx * pz
    vz = lz + wx * py - wy * px
    for sd in s.sides:
        ox = [lvc[i] @ sd.onehotT for i in range(3)]
        aw = [avc[i] @ sd.onehotT for i in range(3)]
        rx, ry, rz = sd.r
        vx = vx + sd.sign * (ox[0] + aw[1] * rz - aw[2] * ry)
        vy = vy + sd.sign * (ox[1] + aw[2] * rx - aw[0] * rz)
        vz = vz + sd.sign * (ox[2] + aw[0] * ry - aw[1] * rx)
    return vx, vy, vz


def _project_soa(s: _SoA, lam, v):
    """Projected impulse update. lam: 3 x [B, C] (n, t1, t2); v: 3 x [B, C]."""
    vx, vy, vz = v
    vn = vx * s.n[0] + vy * s.n[1] + vz * s.n[2]
    vt1 = vx * s.t1[0] + vy * s.t1[1] + vz * s.t1[2]
    vt2 = vx * s.t2[0] + vy * s.t2[1] + vz * s.t2[2]
    new_n = jnp.maximum(lam[0] + (s.bias - vn) * s.inv_d[0], 0.0)
    ft1 = lam[1] - vt1 * s.inv_d[1]
    ft2 = lam[2] - vt2 * s.inv_d[2]
    fmag = jnp.sqrt(ft1 * ft1 + ft2 * ft2)
    fmax = s.mu * new_n
    scale = jnp.where(fmag > fmax, fmax / jnp.maximum(fmag, 1e-9), 1.0)
    return new_n, ft1 * scale, ft2 * scale


def _apply_soa(s: _SoA, qd, lvc, avc, dP):
    """Apply world impulse components dP: 3 x [B, C]."""
    dPx, dPy, dPz = dP
    px, py, pz = s.pos
    # robot: generalized impulse gi_u = sa_u . (p x dP) + sl_u . dP, with
    # the slot sum folded into one [B, C] @ [C, nv] GEMM per component
    mx = py * dPz - pz * dPy
    my = pz * dPx - px * dPz
    mz = px * dPy - py * dPx
    T = [c @ s.anc_slot for c in (mx, my, mz, dPx, dPy, dPz)]  # 6 x [B, nv]
    gi = (s.screw[0] * T[0] + s.screw[1] * T[1] + s.screw[2] * T[2]
          + s.screw[3] * T[3] + s.screw[4] * T[4] + s.screw[5] * T[5])
    nv = qd.shape[-1]
    if jax.default_backend() == "tpu":
        # Minv @ gi from the flat [B, nv*nv] plane: elementwise * tiled gi,
        # folded back per row by a static 0/1 GEMM — keeps the compact
        # layout (f32[B,nv,nv] tile-pads its minor dims ~10x on TPU and is
        # re-read every sweep; see _SoA.Minv2)
        qd = qd + (s.Minv2 * jnp.tile(gi, (1, nv))) @ s.fold
    else:
        # CPU/GPU have no tile-padding problem; the dense batched matvec
        # is both faster and keeps sweep numerics bit-identical with the
        # pre-flattening path (learning tests are trajectory-sensitive)
        Minv = s.Minv2.reshape(qd.shape[0], nv, nv)
        qd = qd + jnp.sum(Minv * gi[:, None, :], axis=-1)
    for sd in s.sides:
        lvc = tuple(
            lvc[i] + sd.sign * ((d * sd.invm) @ sd.onehot)
            for i, d in enumerate((dPx, dPy, dPz))
        )
        rx, ry, rz = sd.r
        tx = ry * dPz - rz * dPy
        ty = rz * dPx - rx * dPz
        tz = rx * dPy - ry * dPx
        ixx, ixy, ixz, iyy, iyz, izz = sd.Iinv
        dwx = ixx * tx + ixy * ty + ixz * tz
        dwy = ixy * tx + iyy * ty + iyz * tz
        dwz = ixz * tx + iyz * ty + izz * tz
        avc = tuple(
            avc[i] + sd.sign * (dw @ sd.onehot)
            for i, dw in enumerate((dwx, dwy, dwz))
        )
    return qd, lvc, avc


def _use_pallas_sweeps(params: SolverParams, B: int, C: int) -> bool:
    if params.jacobi_impl == "pallas_off":
        return False
    if params.jacobi_impl not in ("soa", "pallas"):
        return False
    if params.jacobi_impl == "soa" and jax.default_backend() != "tpu":
        return False
    from handarm_tpu.ops.contact_sweep import _pick_tile, _NBASE, _NSIDE

    return _pick_tile(B, C, _NBASE + 2 * _NSIDE) > 0


def _pallas_sweeps(s: _SoA, qd, lvc, avc, lam, params: SolverParams):
    """Dispatch the fused VMEM-resident sweep kernel (ops/contact_sweep.py).

    jacobi_impl: "soa" auto-upgrades to the kernel on TPU; "pallas" forces
    it (interpreted off-TPU, for tests); "pallas_off" pins the scan path."""
    from handarm_tpu.ops.contact_sweep import fused_jacobi_sweeps

    plane_list = (
        list(s.n) + list(s.t1) + list(s.t2) + list(s.pos)
        + [s.mu] + list(s.inv_d) + [s.gate]
    )
    side_onehots = []
    signs = []
    for sd in s.sides:
        plane_list += list(sd.r) + list(sd.Iinv) + [sd.invm]
        side_onehots.append((sd.onehot, sd.onehotT))
        signs.append(sd.sign)
    B = s.bias.shape[0]
    K = s.sides[0].onehot.shape[1] if s.sides else 1
    obj = (
        jnp.stack(list(lvc) + list(avc))
        if s.sides
        else jnp.zeros((6, B, K), qd.dtype)
    )
    qd_o, obj_o, lam_o = fused_jacobi_sweeps(
        planes=jnp.stack(plane_list),
        bias=s.bias,
        screws=jnp.stack(list(s.screw)),
        qd=qd,
        minv2=s.Minv2,
        obj=obj,
        lam0=jnp.stack(list(lam)),
        ancT=s.anc_slotT,
        anc=s.anc_slot,
        fold=s.fold,
        side_onehots=side_onehots,
        signs=tuple(signs),
        iterations=params.iterations,
        omega=params.relaxation,
        interpret=jax.default_backend() != "tpu",
    )
    if s.sides:
        lvc = (obj_o[0], obj_o[1], obj_o[2])
        avc = (obj_o[3], obj_o[4], obj_o[5])
    return qd_o, lvc, avc, (lam_o[0], lam_o[1], lam_o[2])


def anchored_pack(prep: _Prep):
    """Build the fused-sweep kernel's inputs ONCE per sim step.

    The anchored substep loop (engine._step_anchored fast path) re-solves
    against a frozen contact set every substep; without this pack the
    AoS->SoA conversion (~38 [B, C]-plane transposes, >400 MB at multiobj
    scale) and the plane re-stack ran per SUBSTEP inside the XLA graph —
    measured at 8192x372 it cost more than the 16 in-kernel sweeps it fed.
    Returns (arrays, signs): `arrays` is a flat tuple of device arrays that
    threads through the substep scan carry unchanged; `signs` is static."""
    s = _soa_from_prep(prep)
    plane_list = (
        list(s.n) + list(s.t1) + list(s.t2) + list(s.pos)
        + [s.mu] + list(s.inv_d) + [s.gate]
    )
    side_onehots = []
    signs = []
    for sd in s.sides:
        plane_list += list(sd.r) + list(sd.Iinv) + [sd.invm]
        side_onehots.append((sd.onehot, sd.onehotT))
        signs.append(sd.sign)
    arrays = (
        jnp.stack(plane_list), jnp.stack(list(s.screw)), s.Minv2,
        s.anc_slotT, s.anc_slot, s.fold, prep.active, tuple(side_onehots),
    )
    return arrays, tuple(signs)


def solve_anchored(arrays, signs, bias, qd, lv, av, warm_lam3,
                   params: SolverParams, emit_vn: bool = False):
    """Fused-kernel solve against a prebuilt anchored_pack.

    warm_lam3: previous substep's accumulated impulses in BASIS components
    (3 x [B, C]) or None. The contact basis is frozen across anchored
    substeps, so the world-frame round trip solve_prepared does (project
    world impulse onto the current basis) is the identity here; the cone
    re-clip happens in cheap XLA elementwise ops and the re-APPLY (the
    expensive coupling matmuls) happens inside the kernel (apply_warm).
    Returns (qd, lv [B,K,3], av, lam3, vn [B,C]) with vn the post-solve
    normal relative velocity for the TGS depth advance."""
    from handarm_tpu.ops.contact_sweep import _BASE, fused_jacobi_sweeps

    planes, screws, minv2, ancT, anc, fold, active, side_onehots = arrays
    B, C = bias.shape
    mu = planes[_BASE["mu"]]
    if side_onehots:
        K = side_onehots[0][0].shape[1]
        obj = jnp.stack([lv[..., 0], lv[..., 1], lv[..., 2],
                         av[..., 0], av[..., 1], av[..., 2]])
    else:
        K = 1
        obj = jnp.zeros((6, B, K), qd.dtype)
    if warm_lam3 is None or params.warm_start <= 0.0:
        lam0 = jnp.zeros((3, B, C), qd.dtype)
        apply_warm = False
    else:
        ln = jnp.maximum(warm_lam3[0], 0.0)
        lt1, lt2 = warm_lam3[1], warm_lam3[2]
        fmag = jnp.sqrt(lt1 * lt1 + lt2 * lt2)
        fmax = mu * ln
        sc = jnp.where(fmag > fmax, fmax / jnp.maximum(fmag, 1e-9), 1.0)
        w = params.warm_start * active
        lam0 = jnp.stack([w * ln, w * lt1 * sc, w * lt2 * sc])
        apply_warm = True
    out = fused_jacobi_sweeps(
        planes=planes, bias=bias, screws=screws, qd=qd, minv2=minv2,
        obj=obj, lam0=lam0, ancT=ancT, anc=anc, fold=fold,
        side_onehots=list(side_onehots), signs=signs,
        iterations=params.iterations, omega=params.relaxation,
        interpret=jax.default_backend() != "tpu",
        apply_warm=apply_warm, emit_vn=emit_vn,
    )
    if emit_vn:
        qd_o, obj_o, lam_o, vn = out
    else:
        qd_o, obj_o, lam_o = out
        vn = None
    if side_onehots:
        lv_o = jnp.stack([obj_o[0], obj_o[1], obj_o[2]], axis=-1)
        av_o = jnp.stack([obj_o[3], obj_o[4], obj_o[5]], axis=-1)
    else:
        lv_o, av_o = lv, av
    return qd_o, lv_o, av_o, (lam_o[0], lam_o[1], lam_o[2]), vn


def anchored_vn(arrays, signs, qd, lv, av):
    """Post-clamp normal relative velocity [B, C] from a prebuilt pack.

    The kernel's emit_vn output is evaluated BEFORE the engine's velocity
    clamps; grasp contacts sit exactly on joint-limit-clamped fingers, so
    the TGS depth advance must see the CLAMPED velocities (measured: the
    pre-clamp shortcut cost the r3 lift policy 10 points of success).
    Cost: one sweep-equivalent of coupling GEMMs per substep."""
    from handarm_tpu.ops.contact_sweep import _BASE

    from handarm_tpu.ops.contact_sweep import _NBASE, _NSIDE

    planes, screws, _, ancT, _, _, _, side_onehots = arrays
    b = [(screws[a] * qd) @ ancT for a in range(6)]
    wx, wy, wz, lx, ly, lz = b
    px, py, pz = (planes[i] for i in _BASE["pos"])
    vx = lx + wy * pz - wz * py
    vy = ly + wz * px - wx * pz
    vz = lz + wx * py - wy * px
    for s_i, (oh, ohT) in enumerate(side_onehots):
        sg = signs[s_i]
        base = _NBASE + s_i * _NSIDE  # r planes lead each side block
        rx, ry, rz = planes[base], planes[base + 1], planes[base + 2]
        ox = [lv[..., i] @ ohT for i in range(3)]
        aw = [av[..., i] @ ohT for i in range(3)]
        vx = vx + sg * (ox[0] + aw[1] * rz - aw[2] * ry)
        vy = vy + sg * (ox[1] + aw[2] * rx - aw[0] * rz)
        vz = vz + sg * (ox[2] + aw[0] * ry - aw[1] * rx)
    nx, ny, nz = (planes[i] for i in _BASE["n"])
    return vx * nx + vy * ny + vz * nz


def anchored_impulse_world(arrays, lam3):
    """World-frame impulse [B, C, 3] from basis components (elementwise)."""
    from handarm_tpu.ops.contact_sweep import _BASE

    planes = arrays[0]
    n = [planes[i] for i in _BASE["n"]]
    t1 = [planes[i] for i in _BASE["t1"]]
    t2 = [planes[i] for i in _BASE["t2"]]
    return jnp.stack(
        [lam3[0] * n[i] + lam3[1] * t1[i] + lam3[2] * t2[i]
         for i in range(3)],
        axis=-1,
    )


def _solve_jacobi_soa(prep: _Prep, qd, lv, av, params: SolverParams,
                      warm_lam=None):
    """SoA jacobi solve incl. restitution + warm start. Returns
    (qd, lv, av, impulse_world [B, C, 3])."""
    s = _soa_from_prep(prep)
    B, C = s.bias.shape
    omega = params.relaxation
    lvc = (lv[..., 0], lv[..., 1], lv[..., 2])
    avc = (av[..., 0], av[..., 1], av[..., 2])

    if params.restitution > 0.0:
        vx, vy, vz = _relv_soa(s, qd, lvc, avc)
        vn0 = vx * s.n[0] + vy * s.n[1] + vz * s.n[2]
        bounce = params.restitution * jnp.where(
            vn0 < -params.restitution_threshold, -vn0, 0.0
        )
        s = s._replace(bias=jnp.maximum(s.bias, bounce))

    if warm_lam is None or params.warm_start <= 0.0:
        zero = jnp.zeros((B, C), qd.dtype)
        lam = (zero, zero, zero)
    else:
        wx, wy, wz = warm_lam[..., 0], warm_lam[..., 1], warm_lam[..., 2]
        ln = jnp.maximum(wx * s.n[0] + wy * s.n[1] + wz * s.n[2], 0.0)
        lt1 = wx * s.t1[0] + wy * s.t1[1] + wz * s.t1[2]
        lt2 = wx * s.t2[0] + wy * s.t2[1] + wz * s.t2[2]
        fmag = jnp.sqrt(lt1 * lt1 + lt2 * lt2)
        fmax = s.mu * ln
        sc = jnp.where(fmag > fmax, fmax / jnp.maximum(fmag, 1e-9), 1.0)
        act = prep.active
        lam = (params.warm_start * ln * act,
               params.warm_start * lt1 * sc * act,
               params.warm_start * lt2 * sc * act)
        dP0 = tuple(
            lam[0] * s.n[i] + lam[1] * s.t1[i] + lam[2] * s.t2[i]
            for i in range(3)
        )
        qd, lvc, avc = _apply_soa(s, qd, lvc, avc, dP0)

    if _use_pallas_sweeps(params, B, C):
        qd, lvc, avc, lam = _pallas_sweeps(s, qd, lvc, avc, lam, params)
        impulse = jnp.stack(
            [lam[0] * s.n[i] + lam[1] * s.t1[i] + lam[2] * s.t2[i]
             for i in range(3)],
            axis=-1,
        )
        return qd, jnp.stack(lvc, axis=-1), jnp.stack(avc, axis=-1), impulse

    # everything in the carry is 2D — immune to the scan-boundary layout
    # padding that motivated _carry_split for the AoS path
    leaves, treedef = jax.tree_util.tree_flatten(s)
    is_dyn = [isinstance(x, jax.Array) for x in leaves]
    dyn = tuple(x for x, d in zip(leaves, is_dyn) if d)

    def rebuild(dl):
        it = iter(dl)
        return jax.tree_util.tree_unflatten(
            treedef, [next(it) if d else x for x, d in zip(leaves, is_dyn)]
        )

    def sweep(carry, _):
        qd, lvc, avc, lam, dl = carry
        ss = rebuild(dl)
        v = _relv_soa(ss, qd, lvc, avc)
        new = _project_soa(ss, lam, v)
        dlam = tuple(omega * (new[i] - lam[i]) * ss.gate for i in range(3))
        lam = tuple(lam[i] + dlam[i] for i in range(3))
        dP = tuple(
            dlam[0] * ss.n[i] + dlam[1] * ss.t1[i] + dlam[2] * ss.t2[i]
            for i in range(3)
        )
        qd, lvc, avc = _apply_soa(ss, qd, lvc, avc, dP)
        return (qd, lvc, avc, lam, dl), None

    (qd, lvc, avc, lam, _), _ = jax.lax.scan(
        sweep, (qd, lvc, avc, lam, dyn), None, length=params.iterations
    )
    impulse = jnp.stack(
        [lam[0] * s.n[i] + lam[1] * s.t1[i] + lam[2] * s.t2[i]
         for i in range(3)],
        axis=-1,
    )
    lv = jnp.stack(lvc, axis=-1)
    av = jnp.stack(avc, axis=-1)
    return qd, lv, av, impulse


def solve_prepared(
    prep: _Prep,
    qd: jnp.ndarray,
    obj_linvel: jnp.ndarray,
    obj_angvel: jnp.ndarray,
    params: SolverParams,
    warm_lam: jnp.ndarray | None = None,
) -> SolverOut:
    """Run the impulse iterations against a precomputed _Prep. Sharing one
    prep across a sim step's substeps is the TGS idiom (PhysX evaluates
    contacts/Jacobians once per step and substeps against them)."""
    B, C = prep.active.shape
    if params.mode == "jacobi" and params.jacobi_impl == "soa":
        qd, lv, av, impulse_w = _solve_jacobi_soa(
            prep, qd, obj_linvel, obj_angvel, params, warm_lam
        )
        return SolverOut(qd=qd, obj_linvel=lv, obj_angvel=av,
                         impulse=impulse_w)
    if params.restitution > 0.0:
        # restitution bias from the PRE-solve (and pre-warm-start) approach
        # speed: impacts faster than the threshold rebound at e*|vn|; the
        # normal constraint then drives vn toward max(baumgarte, e*|vn0|).
        v0 = _rel_velocity(prep, qd, obj_linvel, obj_angvel)
        vn0 = jnp.einsum("bci,bci->bc", v0, prep.basis[:, :, 0])
        bounce = params.restitution * jnp.where(
            vn0 < -params.restitution_threshold, -vn0, 0.0
        )
        prep = prep._replace(bias=jnp.maximum(prep.bias, bounce))
    if warm_lam is None or params.warm_start <= 0.0:
        lam0 = jnp.zeros((B, C, 3), qd.dtype)
    else:
        # warm start: re-apply a fraction of last substep's impulses up
        # front; iterations then solve for the (small) correction.
        # warm_lam is a WORLD-frame impulse vector: it must be projected
        # onto the CURRENT contact basis (and re-clipped to the friction
        # cone) before reapplication. Reapplying cached (n,t1,t2)
        # components in a rotated basis pumps energy into any rotating
        # grasped object (observed: a pinched box spinning up to 20 rad/s
        # and ejecting) — PhysX likewise caches per-pair impulses and
        # reprojects them each step.
        ln = jnp.maximum(
            jnp.einsum("bci,bci->bc", warm_lam, prep.basis[:, :, 0]), 0.0
        )
        lt1 = jnp.einsum("bci,bci->bc", warm_lam, prep.basis[:, :, 1])
        lt2 = jnp.einsum("bci,bci->bc", warm_lam, prep.basis[:, :, 2])
        fmag = jnp.sqrt(lt1 * lt1 + lt2 * lt2)
        fmax = prep.mu * ln
        scale = jnp.where(fmag > fmax, fmax / jnp.maximum(fmag, 1e-9), 1.0)
        lam0 = (
            params.warm_start
            * jnp.stack([ln, lt1 * scale, lt2 * scale], axis=-1)
            * prep.active[..., None]
        )
        dP0 = jnp.einsum("bcd,bcdi->bci", lam0, prep.basis)
        qd, obj_linvel, obj_angvel = _apply_impulses(
            prep, qd, obj_linvel, obj_angvel, dP0
        )
    if params.mode == "jacobi":
        qd, lv, av, lam = _solve_jacobi(
            prep, qd, obj_linvel, obj_angvel, lam0, params
        )
    elif params.mode == "gs":
        qd, lv, av, lam = _solve_gs(
            prep, qd, obj_linvel, obj_angvel, lam0, params
        )
    else:
        raise ValueError(params.mode)
    # impulse is returned in the WORLD frame (warm-start cache + force
    # diagnostics both want the frame-independent vector)
    impulse_w = jnp.einsum("bcd,bcdi->bci", lam, prep.basis)
    return SolverOut(qd=qd, obj_linvel=lv, obj_angvel=av, impulse=impulse_w)


def solve_contacts(
    m: ModelArrays,
    fk: FK,
    Minv: jnp.ndarray,
    slots: ContactSlots,
    contacts: Contacts,
    shapes: ObjectShapes,
    obj_pos: jnp.ndarray,
    obj_quat: jnp.ndarray,
    qd: jnp.ndarray,
    obj_linvel: jnp.ndarray,
    obj_angvel: jnp.ndarray,
    h: float,
    params: SolverParams = SolverParams(),
    warm_lam: jnp.ndarray | None = None,  # [B, C, 3] last substep's impulses
    mass_scale: jnp.ndarray | None = None,  # [B, K] DR mass multiplier
    friction_scale: jnp.ndarray | None = None,  # [B] DR friction multiplier
) -> SolverOut:
    prep = _prepare(
        m, fk, Minv, slots, contacts, shapes, obj_pos, obj_quat, h, params,
        mass_scale=mass_scale, friction_scale=friction_scale,
    )
    return solve_prepared(prep, qd, obj_linvel, obj_angvel, params, warm_lam)

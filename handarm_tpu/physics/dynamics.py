"""Batched articulated rigid-body dynamics (world-frame, reduced coordinates).

TPU-native core replacing the PhysX GPU articulation solver that the
reference drives through gym.simulate (reference: isaacgymenvs/tasks/base/
vec_task.py:409-412). Formulation:

- Mass matrix via composite-rigid-body over world-frame spatial inertias:
  M[u, v] = s_u^T I^c_{deeper(u,v)} s_v — two batched einsums, MXU-friendly.
- Bias torques via world-frame RNEA with the gravity-as-base-acceleration
  trick: one root->leaf sweep (unrolled, nv static) + one masked matmul.
- Actuation is *stable PD* (implicit in gains): the PD stiffness/damping are
  folded into the inertia (M + h*Kd + h^2*Kp), making arbitrary gains
  unconditionally stable — the TPU-friendly analog of PhysX's implicit joint
  drives (reference DOF_MODE_POS + prop/deriv gains, ur5sih.py:108-121).

Free 6-DoF bodies (objects) are kept in maximal coordinates with explicit
gyroscopic torque; see `free_body_*`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import quat_integrate
from handarm_tpu.math.spatial import (
    motion_cross,
    force_cross,
    rotate_inertia,
    spatial_inertia_at_origin,
)
from handarm_tpu.physics.kinematics import FK, ModelArrays


class Dyn(NamedTuple):
    """Per-substep dynamics quantities (batch-leading)."""

    Mtilde: jnp.ndarray  # [B, nv, nv] PD-augmented mass matrix
    Minv: jnp.ndarray  # [B, nv, nv] its explicit inverse (Pallas on TPU)
    bias: jnp.ndarray  # [B, nv] C(q, qd) + g(q)

    def solve(self, b: jnp.ndarray) -> jnp.ndarray:
        """Mtilde^-1 @ b for b: [B, nv] or [B, nv, k]."""
        if b.ndim == 2:
            return jnp.einsum("bij,bj->bi", self.Minv, b)
        return jnp.einsum("bij,bjk->bik", self.Minv, b)


def world_spatial_inertias(m: ModelArrays, fk: FK) -> jnp.ndarray:
    """[B, nb, 6, 6] spatial inertia of each moving body at the world origin."""
    com_w = fk.body_pos + jnp.einsum(
        "bnij,nj->bni",
        _quat_mats(fk.body_quat),
        m.com,
    )
    I_w = rotate_inertia(fk.body_quat, m.inertia)
    return spatial_inertia_at_origin(
        jnp.broadcast_to(m.mass, com_w.shape[:-1]), com_w, I_w
    )


def _quat_mats(q):
    from handarm_tpu.math.quat import quat_to_matrix

    return quat_to_matrix(q)


def body_coms_world(m: ModelArrays, fk: FK) -> jnp.ndarray:
    """[B, nb, 3] world COM position of each moving body."""
    from handarm_tpu.math.quat import quat_rotate

    return fk.body_pos + quat_rotate(fk.body_quat, m.com[None])


def mass_matrix_com(
    m: ModelArrays, fk: FK, com_w: jnp.ndarray
) -> jnp.ndarray:
    """CRBA as an exact Gram product, COM-referenced — the TPU-native form.

    For unit velocity of dof u, body n's COM moves at e_un = s_lin_u +
    s_ang_u x c_n and rotates at s_ang_u, so the kinetic-energy metric is
      M[u, v] = sum_n anc[n,u] anc[n,v] (m_n e_un.e_vn + w_u^T I_n w_v).
    With L_n L_n^T = I_n (body-frame COM inertia, precomputed), stacking
      G[u, (n,:)] = anc[n,u] [sqrt(m_n) e_un, L_n^T R_n^T s_ang_u]
    gives M = G G^T: symmetric and PSD by construction, one batched matmul,
    and no [B, nb, 6, 6] spatial-inertia tensors (whose 6x6 trailing dims
    tile-pad catastrophically on TPU). Subtree intersection in a tree is
    subtree(deeper) for comparable dofs and empty otherwise, so the double
    ancestor mask reproduces the classic composite-rigid-body values exactly
    (including the shared-body floating-base dofs, with no symmetrization
    bookkeeping).
    """
    from handarm_tpu.math.quat import quat_rotate_inv

    B, nv = fk.screw.shape[:2]
    nb = com_w.shape[1]
    s_ang = fk.screw[..., :3]  # [B, nv, 3]
    s_lin = fk.screw[..., 3:]
    # COM velocity per (dof u, body n): [B, nv, nb, 3]
    e = s_lin[:, :, None, :] + jnp.cross(
        s_ang[:, :, None, :], com_w[:, None, :, :]
    )
    # rotational part: L_n^T (R_n^T s_ang_u)
    w_body = quat_rotate_inv(fk.body_quat[:, None], s_ang[:, :, None])
    hhat = jnp.einsum("nji,bunj->buni", m.inertia_chol, w_body)
    mask = m.ancestor_mask.T  # [nv, nb]: mask[u, n] = dof u moves body n
    sqm = jnp.sqrt(m.mass)
    G = jnp.concatenate([e * sqm[:, None], hhat], axis=-1)
    G = (G * mask[None, :, :, None]).reshape(B, nv, nb * 6)
    return jnp.einsum("buk,bvk->buv", G, G)


def _apply_inertia_com(m: ModelArrays, fk: FK, com_w, mot: jnp.ndarray):
    """I_n x for origin-Plücker motion x = (w, v): returns force (n_O, f)
    using only 3-vector algebra: v_com = v + w x c; f = m v_com;
    n_O = R I_b R^T w + c x f."""
    from handarm_tpu.math.quat import quat_rotate, quat_rotate_inv

    w, v = mot[..., :3], mot[..., 3:]
    v_com = v + jnp.cross(w, com_w)
    f = m.mass[:, None] * v_com
    Iw = quat_rotate(
        fk.body_quat,
        jnp.einsum("nij,bnj->bni", m.inertia, quat_rotate_inv(fk.body_quat, w)),
    )
    n_O = Iw + jnp.cross(com_w, f)
    return jnp.concatenate([n_O, f], axis=-1)


def bias_forces_com(
    m: ModelArrays,
    fk: FK,
    qd: jnp.ndarray,
    gravity: jnp.ndarray,
    com_w: jnp.ndarray,
    body_vel: jnp.ndarray,
) -> jnp.ndarray:
    """COM-referenced bias torques (same values as `bias_forces`, no
    [B, nb, 6, 6] tensors).

    The root->leaf velocity-product recursion a_b = a_parent + g_b with
    g_b = (v_b x s_b) qd_b is a pure prefix sum along each ancestor chain:
    a_b = a0 + sum_{c ancestor-or-self of b} g_c. All g_c are independent,
    so the whole sweep collapses to one masked matmul over the static
    body-ancestor matrix — no sequential chain, no per-body dispatch (the
    old python loop emitted nb tiny dependent ops that XLA could not
    overlap; ~17 serialized VPU launches per call)."""
    B = qd.shape[0]
    a0 = jnp.concatenate(
        [jnp.zeros((B, 3), qd.dtype), jnp.broadcast_to(-gravity, (B, 3))],
        axis=-1,
    )
    nb = m.nb or m.nv
    dof_body = m.dof_body if m.dof_body is not None else np.arange(m.nv)
    start = 6 if m.floating else 0
    # g[:, b] for each jointed body; zero for a floating base's body 0
    # (its velocity-product term v x v = 0)
    g = jnp.zeros((B, nb, 6), qd.dtype)
    body_of_dof = np.asarray(dof_body[start:])  # [nv-start]
    s = fk.screw[:, start:]  # [B, nv-start, 6]
    v_at = body_vel[:, body_of_dof]  # [B, nv-start, 6]
    g_dofs = motion_cross(v_at, s) * qd[:, start:, None]
    g = g.at[:, body_of_dof].add(g_dofs)
    # body_anc[n, b] = 1 iff body b is ancestor-or-self of body n: reuse
    # ancestor_mask ([nb, nv], dof u moves body n) through each body's
    # driving dof
    body_anc = np.zeros((nb, nb), np.float32)
    body_anc[:, 0] = 1.0 if m.floating else 0.0
    for b in range(nb):
        if m.floating and b == 0:
            continue
        i = int(np.nonzero(np.asarray(dof_body[start:]) == b)[0][0]) + start
        body_anc[:, b] = np.asarray(m.ancestor_mask)[:, i]
    avp = a0[:, None, :] + jnp.einsum(
        "nm,Bma->Bna", jnp.asarray(body_anc), g
    )  # [B, nb, 6]

    Iv = _apply_inertia_com(m, fk, com_w, body_vel)
    f = _apply_inertia_com(m, fk, com_w, avp) + force_cross(body_vel, Iv)
    fc = jnp.einsum("nu,bni->bui", m.ancestor_mask, f)
    return jnp.einsum("bui,bui->bu", fk.screw, fc)


def mass_matrix(m: ModelArrays, fk: FK, I_spatial: jnp.ndarray) -> jnp.ndarray:
    """CRBA in world coordinates.

    Composite inertia of dof v's subtree: Ic_v = sum_n anc[n, v] I_n.
    M[u, v] = s_u^T Ic_max(u,v) s_v, masked to connected pairs.
    """
    # Ic[b, v] = sum over bodies n that dof v moves (n in subtree of v)
    Ic = jnp.einsum("nv,bnij->bvij", m.ancestor_mask, I_spatial)
    f = jnp.einsum("bvij,bvj->bvi", Ic, fk.screw)  # [B, nv, 6]
    Mraw = jnp.einsum("bui,bvi->buv", fk.screw, f)
    # keep entry (u, v) iff u is an ancestor-or-self dof of v, upper-
    # triangularized (see model_arrays.dof_keep) so pairs of dofs sharing
    # a body (floating base) are counted once by the symmetrization
    keep = (
        m.dof_keep
        if m.dof_keep is not None
        else m.ancestor_mask.T  # legacy fixed-base mask
    )
    upper = Mraw * keep
    diag = jnp.einsum("buu->bu", upper)
    return upper + jnp.swapaxes(upper, -1, -2) - jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(diag)


def bias_forces(
    m: ModelArrays,
    fk: FK,
    qd: jnp.ndarray,
    gravity: jnp.ndarray,
    I_spatial: jnp.ndarray,
    body_vel: jnp.ndarray,
) -> jnp.ndarray:
    """C(q, qd) + g(q): generalized bias torques. [B, nv].

    Root->leaf sweep for velocity-product accelerations with the base given
    acceleration -g (gravity trick), then f_n = I_n a_n + v_n x* I_n v_n and
    tau_u = s_u^T sum_{n in subtree(u)} f_n.
    """
    B = qd.shape[0]
    a0 = jnp.concatenate(
        [jnp.zeros((B, 3), qd.dtype), jnp.broadcast_to(-gravity, (B, 3))], axis=-1
    )
    nb = m.nb or m.nv
    body_parent = m.body_parent if m.body_parent is not None else m.parent
    dof_body = m.dof_body if m.dof_body is not None else np.arange(m.nv)
    # dofs driving each body from its parent (1 per joint body; 6 for a
    # floating base, whose velocity-product term v x (sum s_j qd_j) =
    # v x v = 0 — a free body has constant spatial velocity in world
    # Plücker coordinates, gyroscopics enter via the v x* I v force below)
    start = 6 if m.floating else 0
    avp = []
    for b in range(nb):
        p = int(body_parent[b])
        a_par = a0 if p < 0 else avp[p]
        if m.floating and b == 0:
            avp.append(a_par)
            continue
        # the single dof driving body b
        i = int(np.nonzero(dof_body[start:] == b)[0][0]) + start
        s_i = fk.screw[:, i]
        # barrier: see forward_kinematics — prevents exponential recompute
        # of the acceleration chain under XLA:CPU fusion
        avp.append(
            jax.lax.optimization_barrier(
                a_par + motion_cross(body_vel[:, b], s_i) * qd[:, i : i + 1]
            )
        )
    avp = jnp.stack(avp, axis=1)  # [B, nb, 6]

    Iv = jnp.einsum("bnij,bnj->bni", I_spatial, body_vel)
    f = jnp.einsum("bnij,bnj->bni", I_spatial, avp) + force_cross(body_vel, Iv)
    fc = jnp.einsum("nu,bni->bui", m.ancestor_mask, f)  # subtree force sums
    return jnp.einsum("bui,bui->bu", fk.screw, fc)


def pd_augmented_mass(
    m: ModelArrays,
    M: jnp.ndarray,
    kp: jnp.ndarray,
    kd: jnp.ndarray,
    h: float,
) -> jnp.ndarray:
    """Mtilde = M + diag(armature + h*(kd + joint_damping) + h^2*kp).

    kp/kd may be [nv] (shared) or [B, nv] (per-env DR gain scaling)."""
    d = m.armature + h * (kd + m.joint_damping) + (h * h) * kp
    return M + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(
        jnp.broadcast_to(d, M.shape[:-1])
    )


def stable_pd_torque(
    q: jnp.ndarray,
    qd: jnp.ndarray,
    q_target: jnp.ndarray,
    kp: jnp.ndarray,
    kd: jnp.ndarray,
    h: float,
    effort_limit: jnp.ndarray,
) -> jnp.ndarray:
    """Explicit part of the stable-PD control torque (Tan et al. 2011).

    tau = kp*(q_target - q - h*qd) - kd*qd, with the implicit Jacobian
    folded into Mtilde by `pd_augmented_mass`. Clamped to effort limits.
    """
    tau = kp * (q_target - q - h * qd) - kd * qd
    return jnp.clip(tau, -effort_limit, effort_limit)


def compute_dyn(
    m: ModelArrays,
    fk: FK,
    qd: jnp.ndarray,
    gravity: jnp.ndarray,
    kp: jnp.ndarray,
    kd: jnp.ndarray,
    h: float,
) -> Dyn:
    from handarm_tpu.physics.kinematics import body_velocities

    from handarm_tpu.ops.spd_inverse import spd_inverse

    com_w = body_coms_world(m, fk)
    body_vel = body_velocities(m, fk, qd)
    M = mass_matrix_com(m, fk, com_w)
    Mt = pd_augmented_mass(m, M, kp, kd, h)
    Minv = spd_inverse(Mt)
    bias = bias_forces_com(m, fk, qd, gravity, com_w, body_vel)
    return Dyn(Mtilde=Mt, Minv=Minv, bias=bias)


def chol_solve(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve Mtilde x = b given its cholesky factor. b: [B, nv] or [B, nv, k]."""
    squeeze = b.ndim == chol.ndim - 1
    if squeeze:
        b = b[..., None]
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol, -1, -2), y, lower=False
    )
    return x[..., 0] if squeeze else x


# --- free rigid bodies (objects), maximal coordinates ------------------------


def free_body_inv_inertia_world(quat: jnp.ndarray, inertia_body_diag: jnp.ndarray):
    """World-frame inverse rotational inertia. quat: [..., 4],
    inertia_body_diag: [..., 3] principal moments. Returns [..., 3, 3]."""
    from handarm_tpu.math.quat import quat_to_matrix

    R = quat_to_matrix(quat)
    inv = 1.0 / jnp.maximum(inertia_body_diag, 1e-12)
    return jnp.einsum("...ij,...j,...kj->...ik", R, inv, R)


def free_body_integrate(
    pos: jnp.ndarray,
    quat: jnp.ndarray,
    linvel: jnp.ndarray,
    angvel: jnp.ndarray,
    h: float,
):
    """Semi-implicit position update for free bodies (velocities already
    include gravity + impulses)."""
    return pos + h * linvel, quat_integrate(quat, angvel, h)


def gyroscopic_delta(
    quat: jnp.ndarray, inertia_body_diag: jnp.ndarray, angvel: jnp.ndarray, h: float
) -> jnp.ndarray:
    """Implicit gyroscopic angular-velocity increment (one Newton step on
    the body-frame backward-Euler residual f(w2) = I w2 + h w2 x (I w2)
    - I w1 — the standard solid-body trick). Explicit integration of
    dw = -h I^-1 (w x I w) diverges for high-aspect-ratio bodies (a thin
    peg's transverse/axial inertia ratio is ~26: at |w| ~ 20 rad/s and
    h = 1/120 the explicit update is outside its stability region and
    pumps spin until the velocity caps); the implicit form is
    unconditionally stable and strictly energy-dissipative."""
    from handarm_tpu.math.quat import quat_rotate, quat_rotate_inv

    w1 = quat_rotate_inv(quat, angvel)  # body frame [..., 3]
    I = jnp.maximum(inertia_body_diag, 1e-12)
    Iw = I * w1
    f = h * jnp.cross(w1, Iw)  # residual at w2 = w1

    def skew(v):
        z = jnp.zeros_like(v[..., 0])
        return jnp.stack(
            [
                jnp.stack([z, -v[..., 2], v[..., 1]], -1),
                jnp.stack([v[..., 2], z, -v[..., 0]], -1),
                jnp.stack([-v[..., 1], v[..., 0], z], -1),
            ],
            -2,
        )

    # Jacobian J = diag(I) + h (skew(w1) diag(I) - skew(I w1))
    J = (
        jnp.eye(3) * I[..., None, :]
        + h * (skew(w1) * I[..., None, :] - skew(Iw))
    )
    # closed-form 3x3 solve via adjugate (batched; avoids linalg.solve's
    # LU path in the hot loop)
    c0 = jnp.cross(J[..., :, 1], J[..., :, 2], axis=-1)
    c1 = jnp.cross(J[..., :, 2], J[..., :, 0], axis=-1)
    c2 = jnp.cross(J[..., :, 0], J[..., :, 1], axis=-1)
    det = jnp.sum(J[..., :, 0] * c0, axis=-1, keepdims=True)
    adjT_f = jnp.stack(
        [
            jnp.sum(c0 * f, axis=-1),
            jnp.sum(c1 * f, axis=-1),
            jnp.sum(c2 * f, axis=-1),
        ],
        -1,
    )
    dw_b = -adjT_f / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    return quat_rotate(quat, dw_b)

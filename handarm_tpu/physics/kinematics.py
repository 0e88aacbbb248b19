"""Batched forward kinematics for compiled articulations.

All functions broadcast over a leading batch (env) dimension and unroll the
(static, small) kinematic tree as straight-line XLA code — the idiomatic TPU
replacement for PhysX's articulation sweep (reference consumes it via
gym.acquire_rigid_body_state_tensor, isaacgymenvs/tasks/hand_arm/base/
observable_vec_task.py:123-181).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import (
    quat_from_axis_angle,
    quat_mul,
    quat_rotate,
)
from handarm_tpu.physics.model import PRISMATIC, REVOLUTE, Articulation


class ModelArrays(NamedTuple):
    """Device-resident view of an Articulation (unbatched constants)."""

    tree_pos: jnp.ndarray  # [nv, 3]
    tree_quat: jnp.ndarray  # [nv, 4]
    axis: jnp.ndarray  # [nv, 3]
    mass: jnp.ndarray  # [nv]
    com: jnp.ndarray  # [nv, 3]
    inertia: jnp.ndarray  # [nv, 3, 3]
    q_min: jnp.ndarray
    q_max: jnp.ndarray
    effort_limit: jnp.ndarray
    velocity_limit: jnp.ndarray
    joint_damping: jnp.ndarray
    armature: jnp.ndarray
    # static topology, kept as numpy so python loops unroll
    parent: np.ndarray
    joint_type: np.ndarray
    ancestor_mask: jnp.ndarray  # [nb, nv]
    nv: int
    # floating-base topology (fixed base: nb == nv, dof_body == arange,
    # body_parent == parent, floating == False)
    nb: int = 0
    floating: bool = False
    dof_body: np.ndarray | None = None  # [nv] body each dof drives
    body_parent: np.ndarray | None = None  # [nb] parent body (-1 = world)
    dof_keep: jnp.ndarray | None = None  # [nv, nv] mass-matrix upper mask
    # [nb, 3, 3] square root of the body-frame COM inertia (I = L L^T),
    # precomputed host-side; lets dynamics form the mass matrix as a Gram
    # product without materializing [B, nb, 6, 6] spatial inertias
    inertia_chol: jnp.ndarray | None = None


def model_arrays(art: Articulation, dtype=jnp.float32) -> ModelArrays:
    f = lambda x: jnp.asarray(x, dtype=dtype)
    nv = art.nv
    dof_body = (
        art.dof_body if art.dof_body is not None else np.arange(nv, dtype=np.int32)
    )
    body_parent = (
        art.body_parent if art.body_parent is not None else art.parent
    )
    # keep[u, v] = 1 iff dof u is an ancestor-or-self of dof v, upper-
    # triangularized (dof order is topological) so the CRBA symmetrization
    # counts each off-diagonal pair once even when several dofs share a
    # body (the 6 floating-base dofs)
    anc_np = np.asarray(art.ancestor_mask)
    keep_np = anc_np[dof_body].T * np.triu(np.ones((nv, nv)))
    # symmetric square root of each body's COM inertia via eigh (robust to
    # degenerate point-mass links, where a Cholesky would NaN)
    I_np = np.asarray(art.inertia, dtype=np.float64)
    w, V = np.linalg.eigh(0.5 * (I_np + np.swapaxes(I_np, -1, -2)))
    chol_np = V * np.sqrt(np.maximum(w, 0.0))[..., None, :]
    return ModelArrays(
        tree_pos=f(art.tree_pos),
        tree_quat=f(art.tree_quat),
        axis=f(art.axis),
        mass=f(art.mass),
        com=f(art.com),
        inertia=f(art.inertia),
        q_min=f(art.q_min),
        q_max=f(art.q_max),
        effort_limit=f(art.effort_limit),
        velocity_limit=f(art.velocity_limit),
        joint_damping=f(art.joint_damping),
        armature=f(art.armature),
        parent=art.parent,
        joint_type=art.joint_type,
        ancestor_mask=f(art.ancestor_mask),
        nv=nv,
        nb=art.nb,
        floating=art.floating,
        dof_body=dof_body,
        body_parent=body_parent,
        dof_keep=f(keep_np),
        inertia_chol=f(chol_np),
    )


class FK(NamedTuple):
    """World-frame kinematics for every moving body; batch-leading shapes."""

    body_quat: jnp.ndarray  # [B, nb, 4]
    body_pos: jnp.ndarray  # [B, nb, 3]
    screw: jnp.ndarray  # [B, nv, 6] world Plücker joint screws (ang, lin)


def forward_kinematics(
    m: ModelArrays,
    q: jnp.ndarray,
    base_quat: jnp.ndarray | None = None,
    base_pos: jnp.ndarray | None = None,
) -> FK:
    """q: [B, nv]. base pose: [B?, 4]/[B?, 3] — the world pose of the fixed
    base frame, or (floating) the world pose of the base body itself."""
    B = q.shape[0]
    if base_quat is None:
        base_quat = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0], q.dtype), (B, 4))
    else:
        base_quat = jnp.broadcast_to(base_quat, (B, 4))
    if base_pos is None:
        base_pos = jnp.zeros((B, 3), q.dtype)
    else:
        base_pos = jnp.broadcast_to(base_pos, (B, 3))

    nb = m.nb or m.nv
    quats: list = [None] * nb
    poss: list = [None] * nb
    screws: list = [None] * m.nv
    start = 0
    if m.floating:
        # base body pose comes straight from state; the 6 base dofs have
        # constant world screws: translations (0, e_i) + rotations about
        # axes through the world origin (e_i, 0) — a basis of se(3) fixed
        # in the parent (world) frame, so CRBA/RNEA treat them as ordinary
        # joints (see model.py compile_model docstring)
        quats[0], poss[0] = base_quat, base_pos
        z = jnp.zeros((B, 3), q.dtype)
        for k in range(3):
            e_k = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype)[k], (B, 3))
            screws[k] = jnp.concatenate([z, e_k], axis=-1)
            screws[3 + k] = jnp.concatenate([e_k, z], axis=-1)
        start = 6

    dof_body = m.dof_body if m.dof_body is not None else np.arange(m.nv)
    body_parent = m.body_parent if m.body_parent is not None else m.parent
    for i in range(start, m.nv):
        b = int(dof_body[i])
        p = int(body_parent[b])
        pq = base_quat if p < 0 else quats[p]
        pp = base_pos if p < 0 else poss[p]
        # parent frame -> joint child frame at q=0
        jq = quat_mul(pq, jnp.broadcast_to(m.tree_quat[i], (B, 4)))
        jp = pp + quat_rotate(pq, jnp.broadcast_to(m.tree_pos[i], (B, 3)))
        axis_b = jnp.broadcast_to(m.axis[i], (B, 3))
        if m.joint_type[i] == REVOLUTE:
            bq = quat_mul(jq, quat_from_axis_angle(axis_b, q[:, i]))
            bp = jp
            a_w = quat_rotate(bq, axis_b)
            screws[i] = jnp.concatenate([a_w, jnp.cross(bp, a_w)], axis=-1)
        elif m.joint_type[i] == PRISMATIC:
            bq = jq
            a_w = quat_rotate(bq, axis_b)
            bp = jp + a_w * q[:, i : i + 1]
            screws[i] = jnp.concatenate([jnp.zeros_like(a_w), a_w], axis=-1)
        else:
            raise NotImplementedError
        # materialize each joint's pose: without this barrier XLA:CPU's
        # fusion duplicates the upstream quaternion chain per consumer,
        # giving exponential recompute along the kinematic chain
        bq, bp = jax.lax.optimization_barrier((bq, bp))
        quats[b] = bq
        poss[b] = bp

    return FK(
        body_quat=jnp.stack(quats, axis=1),
        body_pos=jnp.stack(poss, axis=1),
        screw=jnp.stack(screws, axis=1),
    )


def body_velocities(m: ModelArrays, fk: FK, qd: jnp.ndarray) -> jnp.ndarray:
    """Spatial velocities per moving body in origin Plücker coords: [B, nb, 6].

    v_i = sum_{j ancestor-of i} s_j * qd_j  — one masked matmul.
    """
    sv = fk.screw * qd[..., None]  # [B, nv, 6]
    return jnp.einsum("nj,bja->bna", m.ancestor_mask, sv)


def site_poses(
    fk: FK,
    site_body: np.ndarray,
    site_pos: jnp.ndarray,
    site_quat: jnp.ndarray,
    base_quat: jnp.ndarray | None = None,
    base_pos: jnp.ndarray | None = None,
):
    """World poses of named sites. site_body: [S] int (may be -1 for base).

    Returns (quat [B, S, 4], pos [B, S, 3]).
    """
    B = fk.body_pos.shape[0]
    if base_quat is None:
        base_quat = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0], fk.body_pos.dtype), (B, 4))
    if base_pos is None:
        base_pos = jnp.zeros((B, 3), fk.body_pos.dtype)
    # gather parent body poses (base pose for body == -1)
    bq = jnp.concatenate([fk.body_quat, base_quat[:, None]], axis=1)
    bp = jnp.concatenate([fk.body_pos, base_pos[:, None]], axis=1)
    idx = jnp.asarray(np.where(site_body < 0, fk.body_pos.shape[1], site_body))
    pq = bq[:, idx]  # [B, S, 4]
    pp = bp[:, idx]
    wq = quat_mul(pq, site_quat[None])
    wp = pp + quat_rotate(pq, site_pos[None])
    return wq, wp


def point_jacobian(
    m: ModelArrays, fk: FK, body_idx: jnp.ndarray, point_world: jnp.ndarray
) -> jnp.ndarray:
    """Translational Jacobian of world points attached to moving bodies.

    body_idx: [B, C] int (which moving body each point rides on),
    point_world: [B, C, 3]. Returns J: [B, C, 3, nv] with
    J[..., u] = anc[body, u] * (s_lin_u + s_ang_u x p).
    """
    s_ang = fk.screw[..., :3]  # [B, nv, 3]
    s_lin = fk.screw[..., 3:]
    # [B, C, nv, 3]
    vel = s_lin[:, None] + jnp.cross(
        s_ang[:, None], point_world[:, :, None, :]
    )
    mask = m.ancestor_mask[body_idx]  # [B, C, nv]
    return jnp.swapaxes(vel * mask[..., None], -1, -2)  # [B, C, 3, nv]

"""Operational Space Control (Khatib 1987) on the engine's dynamics.

The task-space impedance core shared by FrankaCubeStack's osc mode
(reference franka_cube_stack.py:601-627) and the Factory controllers
(factory_control.py task-space impedance): joint torques realizing a
desired 6D end-effector acceleration through the task-space inertia
Lambda = (J M^-1 J^T)^-1, with null-space posture servoing projected
through (I - J^T Jbar^T)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def eef_jacobian(m, fk, body_idx: int, p_eef: jnp.ndarray) -> jnp.ndarray:
    """Spatial 6D Jacobian of a point on a body: [B, 6, nv] with rows
    (linear; angular). J_lin[:, u] = s_lin + s_ang x p, J_rot = s_ang,
    masked to the body's ancestor dofs."""
    anc = jnp.asarray(np.asarray(m.ancestor_mask)[body_idx])  # [nv]
    s_ang = fk.screw[..., :3]  # [B, nv, 3]
    s_lin = fk.screw[..., 3:]
    J_lin = s_lin + jnp.cross(s_ang, p_eef[:, None, :])
    J = jnp.concatenate([J_lin, s_ang], axis=-1)  # [B, nv, 6]
    return (J * anc[None, :, None]).transpose(0, 2, 1)


def osc_torques(
    Minv: jnp.ndarray,  # [B, nv, nv]
    J: jnp.ndarray,  # [B, 6, nv] (arm columns live; others zero)
    dpose: jnp.ndarray,  # [B, 6] desired twist error (kp-side)
    eef_vel: jnp.ndarray,  # [B, 6]
    q: jnp.ndarray,
    qd: jnp.ndarray,
    q_default: jnp.ndarray,  # [nv]
    kp: float = 150.0,
    kp_null: float = 10.0,
    arm_mask: jnp.ndarray | None = None,  # [nv] 1 for arm dofs
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Reference _compute_osc_torques, vectorized: tau = J^T Lambda
    (kp dpose - kd eef_vel) + (I - J^T Jbar^T) M u_null."""
    kd = 2.0 * np.sqrt(kp)
    kd_null = 2.0 * np.sqrt(kp_null)
    B, _, nv = J.shape
    m_eef_inv = jnp.einsum("bij,bjk,blk->bil", J, Minv, J)  # [B, 6, 6]
    m_eef = jnp.linalg.inv(m_eef_inv + eps * jnp.eye(6))
    u = jnp.einsum(
        "bji,bjk,bk->bi", J, m_eef, kp * dpose - kd * eef_vel
    )  # [B, nv]

    # null-space posture torque, wrapped to [-pi, pi)
    q_err = jnp.mod(q_default[None] - q + jnp.pi, 2 * jnp.pi) - jnp.pi
    u_null = kd_null * -qd + kp_null * q_err
    if arm_mask is not None:
        u_null = u_null * arm_mask[None]
    # M u_null then project: (I - J^T (Lambda J Minv)) — note M u_null is
    # computed through the same Minv to avoid materializing M
    Mu = jnp.linalg.solve(Minv, u_null[..., None])[..., 0]
    j_eef_inv = jnp.einsum("bij,bjk,bkl->bil", m_eef, J, Minv)  # [B,6,nv]
    proj = Mu - jnp.einsum("bji,bjk,bk->bi", J, j_eef_inv, Mu)
    return u + proj

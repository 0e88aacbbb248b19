"""Batched quaternion / SO(3) / SE(3) math in jnp.

TPU-native replacement for the reference's torch quaternion surface
(reference: isaacgymenvs/utils/torch_jit_utils.py:37-656). All functions are
pure, broadcast over arbitrary leading batch dims, and are safe under jit/vmap.

Convention: quaternions are stored **wxyz** (scalar first), unit norm,
representing rotations acting on column vectors: R(q) v = q * [0,v] * conj(q).
(The reference / IsaacGym uses xyzw; conversion helpers are provided at the
bottom for observation-layout parity.)
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity(shape=()) -> jnp.ndarray:
    """Identity quaternion broadcast to `shape + (4,)`."""
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def safe_norm(x: jnp.ndarray, axis=-1, keepdims: bool = False,
              eps: float = 1e-20) -> jnp.ndarray:
    """sqrt(sum(x^2) + eps) — use instead of jnp.linalg.norm in jitted hot
    paths: the axon TPU backend miscompiles linalg.norm inside large fused
    programs (returns 0 for unit vectors; see physics/solver._tangent_basis).
    """
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def safe_normalize(x: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """x/|x| with an eps floor, via rsqrt (axon-safe; see safe_norm)."""
    import jax

    return x * jax.lax.rsqrt(
        jnp.sum(x * x, axis=-1, keepdims=True) + eps * eps
    )


def quat_norm(q: jnp.ndarray) -> jnp.ndarray:
    return safe_norm(q, keepdims=True)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    return safe_normalize(q, eps)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b (compose rotations: first b, then a)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q. Broadcasts over leading dims."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    # v' = v + 2w (u x v) + 2 u x (u x v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conj(q), v)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """axis: (..., 3) unit vectors; angle: (...)."""
    half = 0.5 * angle[..., None]
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def quat_to_axis_angle(q: jnp.ndarray, eps: float = 1e-8):
    """Returns (axis, angle) with angle in [0, pi]."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    sin_half = safe_norm(q[..., 1:4])
    angle = 2.0 * jnp.arctan2(sin_half, q[..., 0])
    axis = q[..., 1:4] / jnp.maximum(sin_half[..., None], eps)
    return axis, angle


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (..., 3, 3) rotation matrices."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) wxyz. Branch-free Shepperd's method."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    # Four candidate quaternions (unnormalized), one per dominant component.
    qw = jnp.stack([1.0 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1)
    trace = m00 + m11 + m22
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    scores = jnp.stack([trace, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    return quat_normalize(q)


def quat_from_euler_zyx(roll, pitch, yaw) -> jnp.ndarray:
    """Intrinsic xyz / extrinsic ZYX (rpy as in URDF) -> quaternion."""
    hr, hp, hy = 0.5 * roll, 0.5 * pitch, 0.5 * yaw
    cr, sr = jnp.cos(hr), jnp.sin(hr)
    cp, sp = jnp.cos(hp), jnp.sin(hp)
    cy, sy = jnp.cos(hy), jnp.sin(hy)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def quat_diff_rad(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Angular distance between rotations (radians)."""
    d = quat_mul(a, quat_conj(b))
    return quat_to_axis_angle(d)[1]


def quat_slerp(a: jnp.ndarray, b: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical interpolation, safe near aligned quats."""
    dot = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(dot < 0, -b, b)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-5
    w_a = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w_b = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return quat_normalize(w_a * a + w_b * b)


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate unit quaternion by world-frame angular velocity omega for dt.

    Exponential-map step: q' = exp(0.5*omega*dt) * q, renormalized.
    """
    half = 0.5 * dt
    w = omega * half
    angle = safe_norm(w, keepdims=True)
    # sinc-based for stability near zero.
    small = angle < 1e-8
    k = jnp.where(small, 1.0 - angle * angle / 6.0, jnp.sin(angle) / jnp.where(small, 1.0, angle))
    dq = jnp.concatenate([jnp.cos(angle), k * w], axis=-1)
    return quat_normalize(quat_mul(dq, q))


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrices."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


# --- SE(3) transforms: (quat wxyz, pos) pairs -------------------------------

def transform_apply(q, p, v):
    """Apply SE(3) transform (q, p) to points v."""
    return quat_rotate(q, v) + p


def transform_compose(q1, p1, q2, p2):
    """Compose: result maps x -> (q1,p1) applied to (q2,p2) applied to x."""
    return quat_mul(q1, q2), quat_rotate(q1, p2) + p1


def transform_inv(q, p):
    qi = quat_conj(q)
    return qi, -quat_rotate(qi, p)


# --- xyzw interop (reference layout parity) ---------------------------------

def wxyz_to_xyzw(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


def xyzw_to_wxyz(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([q[..., 3:4], q[..., 0:3]], axis=-1)

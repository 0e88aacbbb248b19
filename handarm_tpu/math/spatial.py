"""Spatial (6D) vector algebra in world-frame Plücker coordinates.

Featherstone-style spatial vectors stored as (..., 6) arrays with the
**angular part first**: motion m = (omega, v_O), force f = (n_O, f).
All quantities are expressed in world Plücker coordinates *at the world
origin*; recursions therefore need no frame changes, only cross products.

This is the foundation for the batched articulated dynamics in
handarm_tpu.physics.dynamics (replaces the closed-source PhysX articulation
layer driven by the reference via gymapi; see SURVEY.md §2.9).
"""

from __future__ import annotations

import jax.numpy as jnp

from handarm_tpu.math.quat import quat_to_matrix, skew


def motion_cross(m1: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
    """Spatial cross product of motion vectors: m1 x m2."""
    w1, v1 = m1[..., :3], m1[..., 3:]
    w2, v2 = m2[..., :3], m2[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w1, w2), jnp.cross(w1, v2) + jnp.cross(v1, w2)], axis=-1
    )


def force_cross(m: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial cross product motion x* force: m x* f."""
    w, v = m[..., :3], m[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(v, fl), jnp.cross(w, fl)], axis=-1
    )


def spatial_inertia_at_origin(
    mass: jnp.ndarray, com_world: jnp.ndarray, inertia_world: jnp.ndarray
) -> jnp.ndarray:
    """6x6 spatial inertia in world Plücker coordinates at the origin.

    mass: (...,), com_world: (..., 3) world com position,
    inertia_world: (..., 3, 3) rotational inertia about the com in world axes.
    Returns (..., 6, 6):  [[I_c + m cx cx^T, m cx], [m cx^T, m 1]].
    """
    cx = skew(com_world)
    m = mass[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3), cx.shape)
    top_left = inertia_world + m * cx @ jnp.swapaxes(cx, -1, -2)
    top_right = m * cx
    bottom_left = m * jnp.swapaxes(cx, -1, -2)
    bottom_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def rotate_inertia(q: jnp.ndarray, inertia_body: jnp.ndarray) -> jnp.ndarray:
    """Rotate a body-frame 3x3 inertia tensor into world axes: R I R^T."""
    R = quat_to_matrix(q)
    return R @ inertia_body @ jnp.swapaxes(R, -1, -2)


def revolute_screw(axis_world: jnp.ndarray, point_world: jnp.ndarray) -> jnp.ndarray:
    """World Plücker screw of a revolute joint: s = (a, p x a)."""
    return jnp.concatenate(
        [axis_world, jnp.cross(point_world, axis_world)], axis=-1
    )


def prismatic_screw(axis_world: jnp.ndarray) -> jnp.ndarray:
    """World Plücker screw of a prismatic joint: s = (0, a)."""
    return jnp.concatenate([jnp.zeros_like(axis_world), axis_world], axis=-1)


def point_velocity(motion: jnp.ndarray, point_world: jnp.ndarray) -> jnp.ndarray:
    """Linear velocity of the body-fixed point at `point_world` given the
    body's spatial motion (in origin Plücker coordinates)."""
    w, v0 = motion[..., :3], motion[..., 3:]
    return v0 + jnp.cross(w, point_world)

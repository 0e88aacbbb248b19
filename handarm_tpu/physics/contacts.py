"""Vectorized contact generation into fixed-size masked buffers.

TPU-native replacement for PhysX's GPU narrowphase (the reference configures
it via sim params — 8M contact pairs, isaacgymenvs/tasks/hand_arm/base/
ur5sih.py:129-157 — but the engine itself is closed source). Design: every
potential contact pair occupies a *statically assigned slot*; per-step
generation only fills (normal, pos, depth) and an active mask. No dynamic
shapes, no compaction — the masked-buffer idiom that keeps everything jit-
and vmap-compatible in SPMD lockstep.

Slot layout for a scene with K objects, P sample points/object and S robot
spheres:
  [0,               K*P)                 object sample point  vs table/ground
  [K*P,             K*P + S)             robot sphere         vs table/ground
  [K*P + S,         K*P + S + S*K)       robot sphere         vs object SDF
  [K*P + S + S*K,   ... + K*(K-1) * Q)   object point subset  vs object SDF
                                         (both directions per pair — a point
                                         sampler one way misses small-inside-
                                         large overlaps)
  (+ with walls)    ... + K*P, ... + S   object points / robot spheres vs the
                                         nearest wall AABB (bin walls)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import quat_rotate, quat_rotate_inv
from handarm_tpu.physics.shapes import ObjectShapes, object_sdf


class StaticGeom(NamedTuple):
    """Static environment collision: a table box (top face + column test)
    standing on a ground plane at z = 0, plus optional wall AABBs (bin
    walls / safety walls — reference builds these as procedural URDF boxes,
    tasks/hand_arm/utils/urdf.py:1-216 and env/multi_object.py:504-555)."""

    table_lo: jnp.ndarray  # [2] xy lower corner
    table_hi: jnp.ndarray  # [2] xy upper corner
    table_height: jnp.ndarray  # scalar
    friction: jnp.ndarray  # scalar
    wall_lo: np.ndarray = np.zeros((0, 3), np.float32)  # [W, 3] AABB corners
    wall_hi: np.ndarray = np.zeros((0, 3), np.float32)  # [W, 3]
    # optional heightfield terrain (replaces table+plane when set; see
    # physics/terrain.py — the reference converts heightfields to trimeshes
    # for PhysX, here contacts sample the field bilinearly)
    hf_height: jnp.ndarray | None = None  # [R, C] meters
    hf_cell: float = 0.1  # meters per pixel
    hf_origin: jnp.ndarray | None = None  # [2] world xy of pixel (0, 0)

    @property
    def num_walls(self) -> int:
        return int(np.asarray(self.wall_lo).shape[0])


class RobotSpheres(NamedTuple):
    """Sphere proxies attached to robot moving bodies (static layout)."""

    body: np.ndarray  # [S] int moving-body index (static)
    offset: jnp.ndarray  # [S, 3] center in body frame
    radius: jnp.ndarray  # [S]
    friction: jnp.ndarray  # [S]


class ContactSlots(NamedTuple):
    """Static slot metadata (numpy; identical across envs)."""

    robot_body: np.ndarray  # [C] moving-body index or -1
    obj_a: np.ndarray  # [C] object index receiving +normal impulse, or -1
    obj_b: np.ndarray  # [C] object index receiving -normal impulse, or -1
    friction: np.ndarray  # [C] pair friction coefficient
    num_slots: int


class Contacts(NamedTuple):
    """Per-step contact buffer (batched). Normal points from the B side
    toward the A side (A = robot sphere or obj_a); depth > 0 = penetrating."""

    normal: jnp.ndarray  # [B, C, 3]
    pos: jnp.ndarray  # [B, C, 3] world contact point
    depth: jnp.ndarray  # [B, C]


def make_contact_slots(
    shapes: ObjectShapes,
    spheres: RobotSpheres,
    static_friction: float = 1.0,
    obj_pair_points: int = 8,
    num_walls: int = 0,
) -> ContactSlots:
    K = shapes.num_objects
    P = shapes.points_per_object
    S = spheres.body.shape[0]
    Q = min(obj_pair_points, P)
    robot_body, obj_a, obj_b, fric = [], [], [], []
    fr_obj = np.asarray(shapes.friction)
    fr_sph = np.asarray(spheres.friction)
    # object points vs static
    for k in range(K):
        for _ in range(P):
            robot_body.append(-1)
            obj_a.append(k)
            obj_b.append(-1)
            fric.append(np.sqrt(fr_obj[k] * static_friction))
    # robot spheres vs static
    for s in range(S):
        robot_body.append(int(spheres.body[s]))
        obj_a.append(-1)
        obj_b.append(-1)
        fric.append(np.sqrt(fr_sph[s] * static_friction))
    # robot spheres vs objects
    for s in range(S):
        for k in range(K):
            robot_body.append(int(spheres.body[s]))
            obj_a.append(-1)
            obj_b.append(k)
            fric.append(np.sqrt(fr_sph[s] * fr_obj[k]))
    # object pairs: Q sample points of ka against SDF of kb, both directions
    for ka in range(K):
        for kb in range(K):
            if ka == kb:
                continue
            for _ in range(Q):
                robot_body.append(-1)
                obj_a.append(ka)
                obj_b.append(kb)
                fric.append(np.sqrt(fr_obj[ka] * fr_obj[kb]))
    if num_walls > 0:
        # object points vs nearest wall
        for k in range(K):
            for _ in range(P):
                robot_body.append(-1)
                obj_a.append(k)
                obj_b.append(-1)
                fric.append(np.sqrt(fr_obj[k] * static_friction))
        # robot spheres vs nearest wall
        for s in range(S):
            robot_body.append(int(spheres.body[s]))
            obj_a.append(-1)
            obj_b.append(-1)
            fric.append(np.sqrt(fr_sph[s] * static_friction))
    return ContactSlots(
        robot_body=np.array(robot_body, dtype=np.int32),
        obj_a=np.array(obj_a, dtype=np.int32),
        obj_b=np.array(obj_b, dtype=np.int32),
        friction=np.array(fric, dtype=np.float32),
        num_slots=len(fric),
    )


def _heightfield_surface(geom: StaticGeom, p: jnp.ndarray):
    """Signed distance / normal against the bilinear heightfield surface.

    4-tap gather per query point (only robot spheres + object samples
    query it, so the gather footprint stays small)."""
    H = geom.hf_height  # [R, C]
    R, Cc = H.shape
    u = (p[..., 0] - geom.hf_origin[0]) / geom.hf_cell
    v = (p[..., 1] - geom.hf_origin[1]) / geom.hf_cell
    u = jnp.clip(u, 0.0, R - 1.001)
    v = jnp.clip(v, 0.0, Cc - 1.001)
    i0 = jnp.floor(u).astype(jnp.int32)
    j0 = jnp.floor(v).astype(jnp.int32)
    fu, fv = u - i0, v - j0
    flat = H.reshape(-1)
    idx = i0 * Cc + j0
    h00 = flat[idx]
    h10 = flat[idx + Cc]
    h01 = flat[idx + 1]
    h11 = flat[idx + Cc + 1]
    h = (
        h00 * (1 - fu) * (1 - fv)
        + h10 * fu * (1 - fv)
        + h01 * (1 - fu) * fv
        + h11 * fu * fv
    )
    dhdx = ((h10 - h00) * (1 - fv) + (h11 - h01) * fv) / geom.hf_cell
    dhdy = ((h01 - h00) * (1 - fu) + (h11 - h10) * fu) / geom.hf_cell
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(h)], axis=-1)
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    dist = (p[..., 2] - h) * n[..., 2]  # vertical gap projected on normal
    return dist, n


def _static_surface(geom: StaticGeom, p: jnp.ndarray):
    """Signed distance of points to the static environment (table box top or
    ground plane, or the heightfield terrain), with upward normal.
    p: [..., 3] -> (dist, normal)."""
    if geom.hf_height is not None:
        return _heightfield_surface(geom, p)
    xy = p[..., :2]
    in_col = jnp.all((xy >= geom.table_lo) & (xy <= geom.table_hi), axis=-1)
    surf_z = jnp.where(in_col, geom.table_height, 0.0)
    dist = p[..., 2] - surf_z
    n = jnp.zeros_like(p).at[..., 2].set(1.0)
    return dist, n


def _one_wall_surface(lo, hi, p):
    """Signed distance + outward normal to a single AABB, gather-free."""
    q = jnp.clip(p, lo, hi)
    d_vec = p - q
    # axon-safe norm/normalize (see math.quat.safe_norm)
    d_sq = jnp.sum(d_vec * d_vec, axis=-1)
    dist_out = jnp.sqrt(d_sq + 1e-20)
    outside = d_sq > 1e-18
    n_out = d_vec * jax.lax.rsqrt(d_sq[..., None] + 1e-18)
    # inside: minimum push-out axis, selected with where-chains (argmin /
    # take_along_axis lower to slow TPU gathers in this hot path)
    push_lo = p - lo
    push_hi = hi - p
    push = jnp.minimum(push_lo, push_hi)  # [..., 3]
    n_in = jnp.zeros_like(p).at[..., 0].set(
        jnp.where(push_lo[..., 0] <= push_hi[..., 0], -1.0, 1.0)
    )
    best = push[..., 0]
    for a in (1, 2):
        closer = push[..., a] < best
        na = jnp.where(push_lo[..., a] <= push_hi[..., a], -1.0, 1.0)
        cand = jnp.zeros_like(p).at[..., a].set(na)
        n_in = jnp.where(closer[..., None], cand, n_in)
        best = jnp.minimum(best, push[..., a])
    dist = jnp.where(outside, dist_out, -best)
    n = jnp.where(outside[..., None], n_out, n_in)
    return dist, n


def _wall_surface(geom: StaticGeom, p: jnp.ndarray):
    """Signed distance of points to the NEAREST wall AABB with outward
    normal. p: [..., 3] -> (dist, normal). Requires num_walls > 0.
    Statically unrolled min-combine over walls (W is small)."""
    lo = np.asarray(geom.wall_lo)
    hi = np.asarray(geom.wall_hi)
    dist, n = _one_wall_surface(
        jnp.asarray(lo[0], p.dtype), jnp.asarray(hi[0], p.dtype), p
    )
    for w in range(1, lo.shape[0]):
        dw, nw = _one_wall_surface(
            jnp.asarray(lo[w], p.dtype), jnp.asarray(hi[w], p.dtype), p
        )
        closer = dw < dist
        dist = jnp.where(closer, dw, dist)
        n = jnp.where(closer[..., None], nw, n)
    return dist, n


def generate_contacts(
    slots: ContactSlots,
    shapes: ObjectShapes,
    spheres: RobotSpheres,
    geom: StaticGeom,
    obj_pos: jnp.ndarray,  # [B, K, 3]
    obj_quat: jnp.ndarray,  # [B, K, 4]
    body_quat: jnp.ndarray,  # [B, nb, 4]
    body_pos: jnp.ndarray,  # [B, nb, 3]
    margin: float = 0.0,
    obj_pair_points: int = 8,
) -> Contacts:
    """Fill the contact buffer. Depth <= -margin slots are left to the solver
    to mask out (depth is reported exactly; activity = depth > -margin)."""
    B, K, _ = obj_pos.shape
    P = shapes.points_per_object
    S = spheres.body.shape[0]
    Q = min(obj_pair_points, P)
    normals, poss, depths = [], [], []

    # --- object sample points vs static surface: [B, K, P]
    pts_w = obj_pos[:, :, None, :] + quat_rotate(
        obj_quat[:, :, None, :], shapes.points[None]
    )  # [B, K, P, 3]
    dist, n = _static_surface(geom, pts_w)
    # mask padded points by pushing them far away
    dist = jnp.where(shapes.point_mask[None] > 0, dist, 1e6)
    pen = shapes.point_radius[None] - dist
    normals.append(n.reshape(B, K * P, 3))
    poss.append((pts_w - n * dist[..., None]).reshape(B, K * P, 3))
    depths.append(pen.reshape(B, K * P))

    # --- robot spheres vs static surface: [B, S]
    centers = body_pos[:, spheres.body] + quat_rotate(
        body_quat[:, spheres.body], spheres.offset[None]
    )  # [B, S, 3]
    dist_s, n_s = _static_surface(geom, centers)
    pen = spheres.radius[None] - dist_s
    cp = centers - n_s * dist_s[..., None]
    normals.append(n_s)
    poss.append(cp)
    depths.append(pen)

    # --- robot spheres vs each object's SDF: [B, S, K] -> slots s-major
    per_obj_n, per_obj_d, per_obj_p = [], [], []
    for k in range(K):
        c_body = quat_rotate_inv(
            obj_quat[:, k : k + 1, :], centers - obj_pos[:, k : k + 1, :]
        )  # [B, S, 3]
        d_k, g_k = object_sdf(shapes, k, c_body)
        n_w = quat_rotate(obj_quat[:, k : k + 1, :], g_k)  # outward from object
        pen_k = spheres.radius[None] - d_k
        cp_k = centers - n_w * d_k[..., None]
        per_obj_n.append(n_w)
        per_obj_d.append(pen_k)
        per_obj_p.append(cp_k)
    if K:
        n_so = jnp.stack(per_obj_n, axis=2).reshape(B, S * K, 3)
        d_so = jnp.stack(per_obj_d, axis=2).reshape(B, S * K)
        p_so = jnp.stack(per_obj_p, axis=2).reshape(B, S * K, 3)
        normals.append(n_so)
        poss.append(p_so)
        depths.append(d_so)

    # --- object-object: Q points of ka vs SDF of kb, both directions
    for ka in range(K):
        for kb in range(K):
            if ka == kb:
                continue
            pts_a_w = pts_w[:, ka, :Q]  # [B, Q, 3] (first Q sample points)
            p_in_b = quat_rotate_inv(
                obj_quat[:, kb : kb + 1, :], pts_a_w - obj_pos[:, kb : kb + 1, :]
            )
            d_ab, g_ab = object_sdf(shapes, kb, p_in_b)
            d_ab = jnp.where(shapes.point_mask[ka, :Q][None] > 0, d_ab, 1e6)
            n_w = quat_rotate(obj_quat[:, kb : kb + 1, :], g_ab)
            normals.append(n_w)
            poss.append(pts_a_w)
            depths.append(shapes.point_radius[ka, :Q][None] - d_ab)

    if geom.num_walls > 0:
        # --- object sample points vs nearest wall: [B, K, P]
        dist_w, n_w = _wall_surface(geom, pts_w)
        dist_w = jnp.where(shapes.point_mask[None] > 0, dist_w, 1e6)
        pen_w = shapes.point_radius[None] - dist_w
        normals.append(n_w.reshape(B, K * P, 3))
        poss.append((pts_w - n_w * dist_w[..., None]).reshape(B, K * P, 3))
        depths.append(pen_w.reshape(B, K * P))
        # --- robot spheres vs nearest wall: [B, S]
        dist_sw, n_sw = _wall_surface(geom, centers)
        normals.append(n_sw)
        poss.append(centers - n_sw * dist_sw[..., None])
        depths.append(spheres.radius[None] - dist_sw)

    return Contacts(
        normal=jnp.concatenate(normals, axis=1),
        pos=jnp.concatenate(poss, axis=1),
        depth=jnp.concatenate(depths, axis=1),
    )

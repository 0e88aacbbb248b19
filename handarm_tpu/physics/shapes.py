"""Collision geometry descriptions for the TPU engine.

Replaces PhysX convex/mesh collision assets (reference loads meshes +
V-HACD decompositions via gym.load_asset, isaacgymenvs/tasks/hand_arm/env/
multi_object.py:26-109). TPU-native strategy:

- Robot links carry *sphere proxies* (fit offline from URDF collision
  meshes) — sphere-vs-X tests are branch-free and vectorize perfectly.
- Objects are rigid bodies with (a) a set of surface/corner sample points,
  (b) an analytic SDF (box / sphere / capsule) or a precomputed voxel SDF
  grid, and (c) a bounding sphere. Contact generation is point-vs-SDF both
  ways — the fixed-size masked-buffer idiom the reference itself uses for
  pointclouds (multi_object.py:782-806).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# object shape type codes
BOX, SPHERE, CYLINDER, MESH_SDF = 0, 1, 2, 3


class ObjectShapes(NamedTuple):
    """Static per-scene description of the K free objects (unbatched)."""

    kind: np.ndarray  # [K] int, shape type codes (static)
    size: jnp.ndarray  # [K, 3] box half-extents / (radius,0,0) / (radius, half-len, 0)
    points: jnp.ndarray  # [K, P, 3] contact sample points, body frame
    point_mask: jnp.ndarray  # [K, P] 1.0 = valid sample
    point_radius: jnp.ndarray  # [K, P] inflation radius per sample (sphere
    # objects use a single center point with radius r; boxes use corners
    # with radius 0)
    bound_radius: jnp.ndarray  # [K]
    mass: jnp.ndarray  # [K]
    inv_mass: jnp.ndarray  # [K]
    inertia_diag: jnp.ndarray  # [K, 3] principal moments (body frame)
    friction: jnp.ndarray  # [K]
    # voxel SDF grids for MESH_SDF objects (shared resolution); zeros if unused
    sdf_grid: jnp.ndarray | None = None  # [K, R, R, R]
    sdf_lo: jnp.ndarray | None = None  # [K, 3] grid lower corner (body frame)
    sdf_spacing: jnp.ndarray | None = None  # [K] voxel edge length
    sdf_field: jnp.ndarray | None = None  # [K, R, R, R, 4] distance+unit grad
    # (combined so one trilinear gather yields distance AND normal)
    # oriented bounding box in BODY frame (identity/zero for primitives whose
    # frame is the box frame; mesh objects carry the PCA OBB pose so the
    # bounding-box observable reports the true box — reference precomputes
    # the OBB with trimesh and transforms it per step, multi_object.py:743)
    obb_pos: jnp.ndarray | None = None  # [K, 3]
    obb_quat: jnp.ndarray | None = None  # [K, 4] wxyz body->obb
    # matmul-layout SDF tables for the Pallas one-hot-gather kernel
    # (ops/sdf_gather.py): bf16 hi + bf16 residual, [K, R*4, R*R]
    sdf_table_hi: jnp.ndarray | None = None
    sdf_table_lo: jnp.ndarray | None = None

    @property
    def num_objects(self) -> int:
        return int(self.kind.shape[0])

    @property
    def points_per_object(self) -> int:
        return int(self.points.shape[1])


def box_points(half_extents: np.ndarray, n_per_edge: int = 0) -> np.ndarray:
    """8 corners (+ optional edge midpoints) of a box, body frame."""
    h = np.asarray(half_extents)
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        dtype=np.float64,
    )
    pts = [corners * h]
    if n_per_edge:
        face_centers = np.concatenate([np.eye(3), -np.eye(3)]) * h
        pts.append(face_centers)
    return np.concatenate(pts, axis=0)


def sphere_points(radius: float, n: int = 12) -> np.ndarray:
    """Fibonacci sphere samples (plus poles) for point-vs-plane contacts."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    pts = np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)],
        axis=-1,
    )
    return pts * radius


def box_inertia_diag(mass: float, half_extents: np.ndarray) -> np.ndarray:
    h = np.asarray(half_extents)
    fx, fy, fz = (2 * h) ** 2
    return mass / 12.0 * np.array([fy + fz, fx + fz, fx + fy])


def sphere_inertia_diag(mass: float, radius: float) -> np.ndarray:
    return np.full(3, 0.4 * mass * radius**2)


def make_box_object(
    half_extents, mass: float, friction: float = 1.0, pad_points_to: int | None = None
):
    """Convenience constructor for one box object's shape row (numpy)."""
    pts = box_points(half_extents, n_per_edge=1)
    return dict(
        kind=BOX,
        size=np.asarray(half_extents, dtype=np.float64),
        points=pts,
        bound_radius=float(np.linalg.norm(half_extents)),
        mass=mass,
        inertia_diag=box_inertia_diag(mass, half_extents),
        friction=friction,
    )


def make_compound_box_object(
    parts: list[tuple],
    mass: float,
    friction: float = 1.0,
    sdf_resolution: int = 32,
    margin: float = 0.03,
):
    """One rigid body made of several boxes (union), as a baked voxel SDF.

    Replaces PhysX convex-decomposition compounds (e.g. the sektion
    cabinet drawer's 7 collision hulls, reference
    assets/.../sektion_cabinet_2.urdf drawer_top link) with an analytic
    union-of-boxes SDF sampled onto the engine's voxel grid. `parts` is a
    list of (center [3], half_extents [3]) in the body frame; mass and
    inertia use uniform density over the total part volume (parallel-axis)."""
    parts = [(np.asarray(c, np.float64), np.asarray(h, np.float64)) for c, h in parts]
    vols = np.array([8.0 * h.prod() for _, h in parts])
    dens = mass / max(vols.sum(), 1e-12)

    lo = np.min([c - h for c, h in parts], axis=0) - margin
    hi = np.max([c + h for c, h in parts], axis=0) + margin
    spacing = float((hi - lo).max() / (sdf_resolution - 1))
    axes = [lo[i] + spacing * np.arange(sdf_resolution) for i in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    p = np.stack([gx, gy, gz], axis=-1)  # [R,R,R,3]

    def box_sdf(p, c, h):
        q = np.abs(p - c) - h
        out = np.maximum(q, 0.0)
        return np.linalg.norm(out, axis=-1) + np.minimum(q.max(axis=-1), 0.0)

    grid = np.min([box_sdf(p, c, h) for c, h in parts], axis=0).astype(np.float32)

    pts, rad = [], []
    for c, h in parts:
        pts.append(box_points(h, n_per_edge=1) + c)
    pts = np.concatenate(pts, axis=0)
    # drop samples interior to the union (corners swallowed by another part)
    d = np.min([box_sdf(pts, c, h) for c, h in parts], axis=0)
    pts = pts[d > -1e-6]

    inertia = np.zeros(3)
    com = sum(dens * v * c for (c, _), v in zip(parts, vols)) / mass
    for (c, h), v in zip(parts, vols):
        m = dens * v
        i_local = box_inertia_diag(m, h)
        r = c - com
        r2 = (r**2).sum()
        inertia += i_local + m * (r2 - r**2)
    # NOTE: body frame origin stays at the construction origin (not the
    # com); compound parts are expected to be roughly com-centered by the
    # caller. The engine treats the frame origin as the com.
    bound = float(np.linalg.norm(np.maximum(np.abs(lo), np.abs(hi))))
    return dict(
        kind=MESH_SDF,
        size=(hi - lo) / 2.0,
        obb_pos=(hi + lo) / 2.0,
        obb_quat=np.array([1.0, 0.0, 0.0, 0.0]),
        points=pts,
        point_radius=np.zeros(len(pts)),
        bound_radius=bound,
        mass=float(mass),
        inertia_diag=np.clip(inertia, 1e-7, None),
        friction=friction,
        sdf_grid=grid,
        sdf_lo=lo.astype(np.float32),
        sdf_spacing=spacing,
    )


def make_sphere_object(radius: float, mass: float, friction: float = 1.0):
    return dict(
        kind=SPHERE,
        size=np.array([radius, 0.0, 0.0]),
        points=np.zeros((1, 3)),
        point_radius=np.array([radius]),
        bound_radius=radius,
        mass=mass,
        inertia_diag=sphere_inertia_diag(mass, radius),
        friction=friction,
    )


def stack_objects(objs: list[dict], dtype=jnp.float32) -> ObjectShapes:
    """Stack per-object dicts (from make_*_object or the mesh pipeline) into
    an ObjectShapes pytree with zero-padded point sets. An empty list yields
    a K=0 scene (robot-only, e.g. locomotion tasks)."""
    if not objs:
        z = lambda *s: jnp.zeros(s, dtype)
        return ObjectShapes(
            kind=np.zeros((0,), np.int32), size=z(0, 3),
            points=z(0, 1, 3), point_mask=z(0, 1), point_radius=z(0, 1),
            bound_radius=z(0), mass=z(0), inv_mass=z(0),
            inertia_diag=z(0, 3), friction=z(0),
            obb_pos=z(0, 3), obb_quat=z(0, 4),
        )
    K = len(objs)
    P = max(o["points"].shape[0] for o in objs)
    points = np.zeros((K, P, 3))
    mask = np.zeros((K, P))
    radius = np.zeros((K, P))
    for k, o in enumerate(objs):
        n = o["points"].shape[0]
        points[k, :n] = o["points"]
        mask[k, :n] = 1.0
        radius[k, :n] = o.get("point_radius", np.zeros(n))
    f = lambda x: jnp.asarray(x, dtype=dtype)
    mass = np.array([o["mass"] for o in objs])
    sdf_grid = sdf_lo = sdf_spacing = sdf_field = None
    sdf_table_hi = sdf_table_lo = None
    if any(o["kind"] == MESH_SDF for o in objs):
        from handarm_tpu.ops.sdf_gather import pack_sdf_tables
        from handarm_tpu.physics.sdf import bake_grad_grid

        res = max(
            o["sdf_grid"].shape[0] for o in objs if o["kind"] == MESH_SDF
        )
        grids = np.zeros((K, res, res, res), np.float32)
        fields = np.zeros((K, res, res, res, 4), np.float32)
        los = np.zeros((K, 3), np.float32)
        spacings = np.ones(K, np.float32)
        for k, o in enumerate(objs):
            if o["kind"] != MESH_SDF:
                continue
            g = o["sdf_grid"]
            assert g.shape[0] == res, "mixed SDF resolutions not supported"
            grids[k] = g
            fields[k, ..., 0] = g
            fields[k, ..., 1:] = bake_grad_grid(g, float(o["sdf_spacing"]))
            los[k] = o["sdf_lo"]
            spacings[k] = o["sdf_spacing"]
        sdf_grid, sdf_lo, sdf_spacing = f(grids), f(los), f(spacings)
        sdf_field = f(fields)
        packed = [pack_sdf_tables(fields[k]) for k in range(K)]
        sdf_table_hi = jnp.asarray(np.stack([np.asarray(t[0]) for t in packed]))
        sdf_table_lo = jnp.asarray(np.stack([np.asarray(t[1]) for t in packed]))
    return ObjectShapes(
        kind=np.array([o["kind"] for o in objs], dtype=np.int32),
        size=f(np.stack([o["size"] for o in objs])),
        points=f(points),
        point_mask=f(mask),
        point_radius=f(radius),
        bound_radius=f(np.array([o["bound_radius"] for o in objs])),
        mass=f(mass),
        inv_mass=f(1.0 / np.maximum(mass, 1e-9)),
        inertia_diag=f(np.stack([o["inertia_diag"] for o in objs])),
        friction=f(np.array([o["friction"] for o in objs])),
        obb_pos=f(np.stack([o.get("obb_pos", np.zeros(3)) for o in objs])),
        obb_quat=f(np.stack(
            [o.get("obb_quat", np.array([1.0, 0, 0, 0])) for o in objs]
        )),
        sdf_grid=sdf_grid,
        sdf_lo=sdf_lo,
        sdf_spacing=sdf_spacing,
        sdf_field=sdf_field,
        sdf_table_hi=sdf_table_hi,
        sdf_table_lo=sdf_table_lo,
    )


# --- analytic signed distance functions (body frame) ------------------------


def sdf_box(p: jnp.ndarray, half: jnp.ndarray):
    """SDF and (sub)gradient of an axis-aligned box at the origin.

    p: [..., 3]; half: [..., 3]. Returns (dist [...], normal [..., 3])
    with normal = outward gradient (unit)."""
    q = jnp.abs(p) - half
    outside = jnp.maximum(q, 0.0)
    d_out = jnp.linalg.norm(outside, axis=-1)
    d_in = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    dist = d_out + d_in
    # gradient: outside — direction to closest point; inside — axis of max q
    sign = jnp.sign(p)
    g_out = sign * outside / jnp.maximum(d_out[..., None], 1e-9)
    max_axis = jnp.argmax(q, axis=-1)
    g_in = sign * jax_one_hot(max_axis, 3, p.dtype)
    normal = jnp.where((d_out > 0)[..., None], g_out, g_in)
    return dist, normal


def sdf_sphere(p: jnp.ndarray, radius: jnp.ndarray):
    d = jnp.linalg.norm(p, axis=-1)
    normal = p / jnp.maximum(d[..., None], 1e-9)
    return d - radius, normal


def sdf_cylinder(p: jnp.ndarray, radius: jnp.ndarray, half_len: jnp.ndarray):
    """Capped cylinder along z."""
    r = jnp.linalg.norm(p[..., :2], axis=-1)
    dr = r - radius
    dz = jnp.abs(p[..., 2]) - half_len
    outside = jnp.sqrt(jnp.maximum(dr, 0) ** 2 + jnp.maximum(dz, 0) ** 2)
    inside = jnp.minimum(jnp.maximum(dr, dz), 0.0)
    dist = outside + inside
    radial = jnp.concatenate(
        [p[..., :2] / jnp.maximum(r[..., None], 1e-9), jnp.zeros_like(p[..., 2:])],
        axis=-1,
    )
    axial = jnp.concatenate(
        [jnp.zeros_like(p[..., :2]), jnp.sign(p[..., 2:])], axis=-1
    )
    use_radial = (dr > dz)[..., None]
    normal = jnp.where(use_radial, radial, axial)
    return dist, normal


def jax_one_hot(idx, n, dtype):
    import jax.nn

    return jax.nn.one_hot(idx, n, dtype=dtype)


import jax  # noqa: E402


def object_sdf(shapes: ObjectShapes, k_static: int, p_body: jnp.ndarray):
    """SDF of object k (static python int) at body-frame points p: [..., 3].

    Uses the static `kind` to pick the analytic branch at trace time —
    no runtime switches in the hot path."""
    kind = int(shapes.kind[k_static])
    if kind == BOX:
        return sdf_box(p_body, shapes.size[k_static])
    if kind == SPHERE:
        return sdf_sphere(p_body, shapes.size[k_static, 0])
    if kind == CYLINDER:
        return sdf_cylinder(p_body, shapes.size[k_static, 0], shapes.size[k_static, 1])
    if kind == MESH_SDF:
        R = shapes.sdf_field.shape[1]
        if shapes.sdf_table_hi is not None and jax.default_backend() != "cpu":
            # TPU: one-hot matmul kernel — the XLA voxel gather runs at
            # ~70 ns/query and dominates multi-object contact generation
            from handarm_tpu.ops.sdf_gather import sdf_sample_pallas

            out = sdf_sample_pallas(
                shapes.sdf_table_hi[k_static],
                shapes.sdf_table_lo[k_static],
                shapes.sdf_lo[k_static],
                shapes.sdf_spacing[k_static],
                p_body,
                R=R,
            )
            d, g = out[..., 0], out[..., 1:4]
            g = g * jax.lax.rsqrt(jnp.sum(g * g, axis=-1, keepdims=True) + 1e-18)
            return d, g
        from handarm_tpu.physics.sdf import sample_sdf_channels

        out = sample_sdf_channels(
            shapes.sdf_field[k_static],
            shapes.sdf_lo[k_static],
            shapes.sdf_spacing[k_static],
            p_body,
        )
        d, g = out[..., 0], out[..., 1:4]
        g = g * jax.lax.rsqrt(jnp.sum(g * g, axis=-1, keepdims=True) + 1e-18)
        # out-of-grid excess so far points still see increasing distance
        u_raw = (p_body - shapes.sdf_lo[k_static]) / shapes.sdf_spacing[k_static]
        excess = jnp.linalg.norm(
            jnp.maximum(jnp.abs(u_raw - (R - 1) / 2) - (R - 1) / 2, 0.0),
            axis=-1,
        )
        return d + excess * shapes.sdf_spacing[k_static], g
    raise NotImplementedError(f"shape kind {kind}")

"""Generic sphere-proxy fitting for robot collision geometry.

Robot-agnostic version of the UR5-SIH fitter (robots/ur5sih.py
ur5sih_collision_spheres): every link's collision geometry (mesh / box /
sphere / cylinder) is sampled to points and covered with k fitted spheres.
Used by the dexterous-hand tasks (Allegro/Shadow) where the reference gets
convex collision directly from PhysX asset loading (e.g. allegro_hand.py:
225-237)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from handarm_tpu.physics.contacts import RobotSpheres
from handarm_tpu.utils.mesh import load_mesh
from handarm_tpu.physics.urdf import parse_urdf


def _quat_to_mat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _fit_spheres(pts: np.ndarray, n: int, padding: float = 0.002):
    """k-means-ish cluster + min enclosing sphere per cluster."""
    n = min(n, len(pts))
    rng = np.random.default_rng(3)
    ctr = pts[rng.choice(len(pts), n, replace=False)]
    for _ in range(12):
        d = np.linalg.norm(pts[:, None] - ctr[None], axis=-1)
        lab = d.argmin(1)
        for k in range(n):
            sel = pts[lab == k]
            if len(sel):
                ctr[k] = sel.mean(0)
    d = np.linalg.norm(pts[:, None] - ctr[None], axis=-1)
    lab = d.argmin(1)
    rad = np.array(
        [
            d[lab == k, k].max() + padding if (lab == k).any() else padding
            for k in range(n)
        ]
    )
    return ctr, rad


def generic_collision_spheres(
    urdf_path: str,
    art,
    spheres_per_link: int = 3,
    surface_samples: int = 300,
) -> tuple:
    """Fit sphere proxies for every link with collision geometry.

    Returns numpy (body_idx [S], centers [S, 3] body-frame, radii [S])."""
    urdf = parse_urdf(urdf_path)
    bodies, centers, radii = [], [], []
    for link_name, link in urdf.links.items():
        site = art.sites.get(link_name)
        if site is None or site.body < 0 or not link.collisions:
            continue
        pts_all = []
        for col in link.collisions:
            g = col.geometry
            if g.kind == "mesh":
                try:
                    mesh = load_mesh(g.mesh_path, g.mesh_scale)
                except FileNotFoundError:
                    continue
                pts = mesh.sample_surface(surface_samples)
            elif g.kind == "box":
                from handarm_tpu.physics.shapes import box_points

                pts = box_points(np.asarray(g.size) / 2)
            elif g.kind == "sphere":
                bodies.append(site.body)
                Rq = _quat_to_mat(site.quat)
                centers.append(Rq @ col.origin_pos + site.pos)
                radii.append(g.radius)
                continue
            elif g.kind == "cylinder":
                ang = np.linspace(0, 2 * np.pi, 12, endpoint=False)
                ring = np.stack(
                    [np.cos(ang) * g.radius, np.sin(ang) * g.radius], -1
                )
                zs = np.linspace(-g.length / 2, g.length / 2, 4)
                pts = np.concatenate(
                    [np.concatenate([ring, np.full((12, 1), z)], -1) for z in zs]
                )
            else:
                continue
            pts = pts @ col.origin_rot.T + col.origin_pos
            Rq = _quat_to_mat(site.quat)
            pts = pts @ Rq.T + site.pos
            pts_all.append(pts)
        if not pts_all:
            continue
        pts = np.concatenate(pts_all)
        ctr, rad = _fit_spheres(pts, spheres_per_link)
        for c, r in zip(ctr, rad):
            bodies.append(site.body)
            centers.append(c)
            radii.append(r)
    return (
        np.array(bodies, dtype=np.int32),
        np.stack(centers),
        np.array(radii),
    )


def make_generic_spheres(
    urdf_path: str, art, friction: float = 1.0, spheres_per_link: int = 3
) -> RobotSpheres:
    bodies, centers, radii = generic_collision_spheres(
        urdf_path, art, spheres_per_link
    )
    return RobotSpheres(
        body=bodies,
        offset=jnp.asarray(centers, jnp.float32),
        radius=jnp.asarray(radii, jnp.float32),
        friction=jnp.asarray(np.full(len(radii), friction), jnp.float32),
    )

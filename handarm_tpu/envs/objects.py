"""Object-set pipeline: YCB/EGAD/ContactDB URDF+mesh -> TPU shape records.

Replaces the reference's ObjectAsset (V-HACD convex decomposition + trimesh
surface sampling, isaacgymenvs/tasks/hand_arm/env/multi_object.py:26-109):
meshes become voxel SDF grids + masked surface sample sets baked once on the
host and cached to disk. Dataset resolution supports the reference's glob
syntax over object-set directories (multi_object.py:438-475).
"""

from __future__ import annotations

import fnmatch
import hashlib
import os

import numpy as np

from handarm_tpu.physics.shapes import MESH_SDF
from handarm_tpu.physics.urdf import parse_urdf
from handarm_tpu.utils.mesh import Mesh, load_mesh

OBJECT_SET_ROOT = os.environ.get(
    "HANDARM_OBJECT_ROOT",
    "/root/reference/assets/hand_arm/object_sets/urdf",
)
CACHE_DIR = os.environ.get("HANDARM_SDF_CACHE", "/root/repo/.sdf_cache")


def resolve_object_set(dataset: dict[str, list[str]]) -> list[tuple[str, str]]:
    """dataset: e.g. {"ycb": ["005_tomato_soup_can", "0*_box"], "egad": []}.

    Returns [(set_name/object_name, urdf_path)] with glob patterns expanded
    against the urdf directory (reference multi_object.py:438-475)."""
    out = []
    for set_name, patterns in dataset.items():
        if not patterns:
            continue
        set_dir = os.path.join(OBJECT_SET_ROOT, set_name)
        if not os.path.isdir(set_dir):
            raise FileNotFoundError(set_dir)
        available = sorted(
            f[:-5] for f in os.listdir(set_dir) if f.endswith(".urdf")
        )
        for pat in patterns:
            matches = fnmatch.filter(available, pat)
            if not matches:
                raise KeyError(f"no object matches {set_name}/{pat}")
            for name in matches:
                out.append((f"{set_name}/{name}", os.path.join(set_dir, name + ".urdf")))
    # dedupe, keep order
    seen = set()
    uniq = []
    for name, path in out:
        if name not in seen:
            seen.add(name)
            uniq.append((name, path))
    return uniq


def load_object(
    urdf_path: str,
    sdf_resolution: int = 32,
    num_surface_points: int = 64,
    friction: float = 1.0,
    cache: bool = True,
) -> dict:
    """Build one mesh object's shape record (numpy dict for stack_objects).

    Caches the baked SDF + samples on disk keyed by path/params."""
    key = hashlib.sha1(
        f"{urdf_path}:{sdf_resolution}:{num_surface_points}:v4".encode()
    ).hexdigest()[:16]
    cache_path = os.path.join(CACHE_DIR, key + ".npz")
    if cache and os.path.exists(cache_path):
        d = np.load(cache_path)
        return {k: (d[k] if d[k].shape else d[k].item()) for k in d.files}

    urdf = parse_urdf(urdf_path)
    link = urdf.links[urdf.root_link]
    col = link.collisions[0]
    mesh = load_mesh(col.geometry.mesh_path, col.geometry.mesh_scale)
    # apply collision origin transform
    if not np.allclose(col.origin_rot, np.eye(3)) or np.any(col.origin_pos):
        mesh = Mesh(mesh.vertices @ col.origin_rot.T + col.origin_pos, mesh.faces)

    mass = link.mass
    inertia = link.inertia
    com = link.com
    if mass <= 0:
        from handarm_tpu.utils.mesh import hull_mass_properties

        mass, com, inertia = hull_mass_properties(mesh.vertices, density=250.0)
    inertia_diag = np.clip(np.diag(inertia), 1e-7, None)

    # re-center geometry on the com: the engine's free-body state tracks the
    # com, so the object's body frame == com frame (obs report com position;
    # the reference reports the URDF root frame — identical for the YCB
    # 'centered' models whose origin is the centroid)
    mesh = Mesh(mesh.vertices - com, mesh.faces)

    from handarm_tpu.physics.sdf import bake_sdf

    grid, lo, spacing = bake_sdf(mesh, resolution=sdf_resolution)
    pts, face_idx, bary = mesh.sample_surface_ex(
        num_surface_points, np.random.default_rng(1)
    )
    # per-sample RGB albedo from the visual mesh's texture (YCB textured.obj
    # + .mtl map_Kd) for the color camera family (reference ImageType.COLOR,
    # tasks/hand_arm/utils/camera.py:17-40). Gray fallback when untextured.
    rgb = None
    if col.geometry.mesh_path.lower().endswith(".obj") and os.path.exists(
        col.geometry.mesh_path
    ):
        from handarm_tpu.utils.mesh import load_obj_uv, sample_texture_colors

        try:
            _, uv, face_uv, tex_path, kd = load_obj_uv(col.geometry.mesh_path)
            # face_idx indexes the sampled mesh's triangles; only valid if
            # the uv loader produced the identical triangulation
            if len(face_uv) == len(mesh.faces):
                rgb = sample_texture_colors(uv, face_uv, face_idx, bary,
                                            tex_path, kd)
        except Exception:
            rgb = None
    if rgb is None:
        rgb = np.full((num_surface_points, 3), 0.5)
    bound = float(np.linalg.norm(mesh.vertices, axis=-1).max())

    c_obb, R_obb, half_obb = mesh.oriented_bounding_box()
    from handarm_tpu.physics.model import _mat_to_quat

    rec = dict(
        kind=MESH_SDF,
        size=np.asarray(half_obb, dtype=np.float64),  # OBB half-extents
        obb_pos=np.asarray(c_obb, dtype=np.float64),  # OBB pose in body frame
        obb_quat=_mat_to_quat(np.asarray(R_obb)),
        points=pts,
        point_rgb=rgb,
        point_radius=np.zeros(len(pts)),
        bound_radius=bound,
        mass=float(mass),
        inertia_diag=inertia_diag,
        friction=friction,
        sdf_grid=grid,
        sdf_lo=lo,
        sdf_spacing=float(spacing),
    )
    if cache:
        os.makedirs(CACHE_DIR, exist_ok=True)
        np.savez_compressed(cache_path, **rec)
    return rec

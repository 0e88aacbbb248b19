"""Host-side mesh loading + processing (numpy only; replaces trimesh/urdfpy).

Used at model-build time for: robot collision sphere fitting, object surface
sampling for synthetic pointclouds (reference: isaacgymenvs/tasks/hand_arm/
env/multi_object.py:45-109), OBB computation, inertia estimation, and voxel
SDF baking. Nothing here runs in the hot path.
"""

from __future__ import annotations

import os
import struct

import numpy as np


class Mesh:
    def __init__(self, vertices: np.ndarray, faces: np.ndarray):
        self.vertices = np.asarray(vertices, dtype=np.float64)
        self.faces = np.asarray(faces, dtype=np.int64)

    # --- derived quantities -------------------------------------------------

    def face_areas(self) -> np.ndarray:
        v = self.vertices
        f = self.faces
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        return 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)

    def area(self) -> float:
        return float(self.face_areas().sum())

    def sample_surface(self, n: int, rng: np.random.Generator | None = None) -> np.ndarray:
        """Area-weighted uniform surface samples (the reference's pointcloud
        sampling mode 'area', multi_object.py:774-806)."""
        return self.sample_surface_ex(n, rng)[0]

    def sample_surface_ex(
        self, n: int, rng: np.random.Generator | None = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Like sample_surface but also returns (face_idx [n], bary [n, 3])
        so per-face attributes (texture uv -> RGB) can be interpolated at the
        sample points. Consumes the rng identically to sample_surface."""
        rng = rng or np.random.default_rng(0)
        areas = self.face_areas()
        probs = areas / max(areas.sum(), 1e-12)
        idx = rng.choice(len(self.faces), size=n, p=probs)
        f = self.faces[idx]
        v = self.vertices
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        r1, r2 = rng.random((2, n, 1))
        s = np.sqrt(r1)
        wa, wb, wc = (1 - s), s * (1 - r2), s * r2
        pts = a * wa + b * wb + c * wc
        bary = np.concatenate([wa, wb, wc], axis=-1)
        return pts, idx, bary

    def bounding_box(self):
        return self.vertices.min(0), self.vertices.max(0)

    def oriented_bounding_box(self):
        """PCA OBB: returns (center [3], rotation [3,3] cols=axes, half_extents [3])."""
        pts = self.vertices
        mean = pts.mean(0)
        cov = np.cov((pts - mean).T)
        w, V = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1]
        R = V[:, order]
        if np.linalg.det(R) < 0:
            R[:, 2] *= -1
        local = (pts - mean) @ R
        lo, hi = local.min(0), local.max(0)
        center = mean + R @ ((lo + hi) / 2)
        return center, R, (hi - lo) / 2

    def volume_and_com(self):
        """Signed-tetrahedron volume integral (assumes closed mesh)."""
        v = self.vertices
        f = self.faces
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        cross = np.cross(b, c)
        vol6 = np.einsum("ij,ij->i", a, cross)
        volume = vol6.sum() / 6.0
        centroid = ((a + b + c) / 4 * vol6[:, None]).sum(0) / max(vol6.sum(), 1e-12)
        return abs(volume), centroid

    def scaled(self, s) -> "Mesh":
        return Mesh(self.vertices * np.asarray(s), self.faces)


def load_obj(path: str) -> Mesh:
    verts, faces = [], []
    with open(path, "r", errors="ignore") as fh:
        for line in fh:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    i = tok.split("/")[0]
                    idx.append(int(i) - 1 if int(i) > 0 else len(verts) + int(i))
                for k in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return Mesh(np.array(verts), np.array(faces))


def load_stl(path: str) -> Mesh:
    with open(path, "rb") as fh:
        head = fh.read(80)
        rest = fh.read()
    if head[:5].lower() == b"solid" and b"facet" in rest[:500]:
        return _load_stl_ascii(path)
    (n_tri,) = struct.unpack("<I", rest[:4])
    data = np.frombuffer(rest[4 : 4 + n_tri * 50], dtype=np.uint8).reshape(n_tri, 50)
    tri = data[:, 12:48].copy().view("<f4").reshape(n_tri, 3, 3).astype(np.float64)
    verts = tri.reshape(-1, 3)
    # weld duplicates
    uniq, inv = np.unique(np.round(verts, 7), axis=0, return_inverse=True)
    faces = inv.reshape(-1, 3)
    return Mesh(uniq, faces)


def _load_stl_ascii(path: str) -> Mesh:
    verts = []
    with open(path, "r", errors="ignore") as fh:
        for line in fh:
            t = line.split()
            if t and t[0] == "vertex":
                verts.append([float(t[1]), float(t[2]), float(t[3])])
    verts = np.array(verts)
    uniq, inv = np.unique(np.round(verts, 7), axis=0, return_inverse=True)
    return Mesh(uniq, inv.reshape(-1, 3))


def merge_meshes(meshes: list[Mesh]) -> Mesh:
    verts, faces, off = [], [], 0
    for m in meshes:
        verts.append(m.vertices)
        faces.append(m.faces + off)
        off += len(m.vertices)
    return Mesh(np.concatenate(verts), np.concatenate(faces))


def load_obj_uv(path: str):
    """Parse an OBJ keeping texture coordinates: returns (Mesh, uv [T, 2],
    face_uv [F, 3] int64, texture_png_path | None, kd_color | None).

    Triangulation (fan) and face order match load_obj exactly, so face
    indices from Mesh.sample_surface_ex on the returned mesh index face_uv
    directly. texture path comes from the .mtl's map_Kd; kd_color from its
    Kd line (fallback albedo when there is no texture map)."""
    verts, uvs, faces, face_uv = [], [], [], []
    mtl_name = None
    with open(path, "r", errors="ignore") as fh:
        for line in fh:
            if line.startswith("v "):
                p = line.split()
                verts.append([float(p[1]), float(p[2]), float(p[3])])
            elif line.startswith("vt "):
                p = line.split()
                uvs.append([float(p[1]), float(p[2])])
            elif line.startswith("mtllib "):
                mtl_name = line.split(None, 1)[1].strip()
            elif line.startswith("f "):
                vi, ti = [], []
                for tok in line.split()[1:]:
                    parts = tok.split("/")
                    i = int(parts[0])
                    vi.append(i - 1 if i > 0 else len(verts) + i)
                    if len(parts) > 1 and parts[1]:
                        t = int(parts[1])
                        ti.append(t - 1 if t > 0 else len(uvs) + t)
                    else:
                        ti.append(0)
                for k in range(1, len(vi) - 1):
                    faces.append([vi[0], vi[k], vi[k + 1]])
                    face_uv.append([ti[0], ti[k], ti[k + 1]])
    tex_path, kd = None, None
    mtl_path = os.path.join(os.path.dirname(path), mtl_name or "")
    if mtl_name and os.path.exists(mtl_path):
        with open(mtl_path, "r", errors="ignore") as fh:
            for line in fh:
                t = line.split()
                if not t:
                    continue
                if t[0] == "map_Kd":
                    cand = os.path.normpath(
                        os.path.join(os.path.dirname(mtl_path), t[1])
                    )
                    if os.path.exists(cand):
                        tex_path = cand
                elif t[0] == "Kd" and len(t) >= 4:
                    kd = np.array([float(t[1]), float(t[2]), float(t[3])])
    uv = np.asarray(uvs, np.float64) if uvs else np.zeros((1, 2))
    return (
        Mesh(np.array(verts), np.array(faces)),
        uv,
        np.asarray(face_uv, np.int64) if face_uv else np.zeros((0, 3), np.int64),
        tex_path,
        kd,
    )


def sample_texture_colors(
    uv: np.ndarray,
    face_uv: np.ndarray,
    face_idx: np.ndarray,
    bary: np.ndarray,
    texture_path: str | None,
    kd_color: np.ndarray | None = None,
) -> np.ndarray | None:
    """RGB in [0,1] for surface samples given (face_idx, bary) from
    Mesh.sample_surface_ex. Bilinear-samples the texture png at the
    barycentric-interpolated uv; falls back to the material's flat Kd
    color; returns None when neither exists."""
    if texture_path is None:
        if kd_color is not None:
            return np.broadcast_to(kd_color, (len(face_idx), 3)).copy()
        return None
    from PIL import Image

    img = np.asarray(Image.open(texture_path).convert("RGB"), np.float32) / 255.0
    H, W = img.shape[:2]
    fuv = uv[face_uv[face_idx]]  # [n, 3, 2]
    p = (bary[:, :, None] * fuv).sum(1)  # [n, 2] interpolated uv
    # OBJ uv origin is bottom-left; image rows are top-down
    x = np.clip(p[:, 0] % 1.0, 0.0, 1.0) * (W - 1)
    y = (1.0 - np.clip(p[:, 1] % 1.0, 0.0, 1.0)) * (H - 1)
    x0, y0 = np.floor(x).astype(int), np.floor(y).astype(int)
    x1, y1 = np.minimum(x0 + 1, W - 1), np.minimum(y0 + 1, H - 1)
    fx, fy = (x - x0)[:, None], (y - y0)[:, None]
    c = (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x1] * fx * (1 - fy)
        + img[y1, x0] * (1 - fx) * fy
        + img[y1, x1] * fx * fy
    )
    return c.astype(np.float64)


def load_mesh(path: str, scale=None) -> Mesh:
    if not os.path.exists(path):
        # asset snapshots sometimes lack large visual meshes; fall back to the
        # sibling collision/ STL set with the same stem (e.g. palm -> palm_*.stl)
        import glob

        stem = os.path.splitext(os.path.basename(path))[0]
        coll_dir = os.path.join(os.path.dirname(path), "..", "collision")
        cands = sorted(glob.glob(os.path.join(coll_dir, stem + "*.stl")))
        if cands:
            m = merge_meshes([load_mesh(c) for c in cands])
            if scale is not None and not np.allclose(scale, 1.0):
                m = m.scaled(scale)
            return m
        raise FileNotFoundError(path)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        m = load_obj(path)
    elif ext == ".stl":
        m = load_stl(path)
    else:
        raise ValueError(f"unsupported mesh format {ext}")
    if scale is not None and not np.allclose(scale, 1.0):
        m = m.scaled(scale)
    return m


def hull_mass_properties(points: np.ndarray, density: float):
    """Mass, com and inertia (about com) of the uniform-density convex hull
    of a point set. Used to auto-derive missing URDF inertials the way PhysX
    does from collision shapes (links like the SIH fingers ship without
    <inertial> blocks)."""
    from scipy.spatial import ConvexHull

    hull = ConvexHull(np.asarray(points, dtype=np.float64))
    verts = hull.points
    # tetrahedra (origin, a, b, c) over hull triangles
    a = verts[hull.simplices[:, 0]]
    b = verts[hull.simplices[:, 1]]
    c = verts[hull.simplices[:, 2]]
    # ensure outward orientation w.r.t. hull centroid
    centroid0 = verts[np.unique(hull.simplices)].mean(0)
    n = np.cross(b - a, c - a)
    flip = np.einsum("ij,ij->i", n, a - centroid0) < 0
    b2 = np.where(flip[:, None], c, b)
    c2 = np.where(flip[:, None], b, c)
    b, c = b2, c2
    vol6 = np.einsum("ij,ij->i", a, np.cross(b, c))
    volume = vol6.sum() / 6.0
    com = ((a + b + c) / 4 * vol6[:, None]).sum(0) / max(vol6.sum(), 1e-12)
    # inertia via canonical tetra integrals (relative to origin), then shift
    I = np.zeros((3, 3))
    for av, bv, cv, v6 in zip(a, b, c, vol6):
        V = np.stack([av, bv, cv])
        Cq = (V.T @ V + V.sum(0)[:, None] * V.sum(0)[None, :]) / 20.0 * (v6 / 6.0)
        I += np.trace(Cq) * np.eye(3) - Cq
    mass = density * volume
    I = I * density
    # shift to com
    I -= mass * ((com @ com) * np.eye(3) - np.outer(com, com))
    return mass, com, I


def fit_spheres(
    points: np.ndarray, n_spheres: int, padding: float = 0.0, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Cover a point set with n spheres via k-means: returns (centers [n,3],
    radii [n]). The sphere proxies approximate link collision meshes for the
    TPU narrowphase (PhysX used the raw convex meshes)."""
    rng = np.random.default_rng(seed)
    pts = np.asarray(points)
    n_spheres = min(n_spheres, len(pts))
    centers = pts[rng.choice(len(pts), n_spheres, replace=False)]
    for _ in range(20):
        d = np.linalg.norm(pts[:, None] - centers[None], axis=-1)
        assign = d.argmin(1)
        for k in range(n_spheres):
            sel = pts[assign == k]
            if len(sel):
                centers[k] = sel.mean(0)
    d = np.linalg.norm(pts[:, None] - centers[None], axis=-1)
    assign = d.argmin(1)
    radii = np.array(
        [
            d[assign == k, k].max() + padding if (assign == k).any() else padding
            for k in range(n_spheres)
        ]
    )
    return centers, radii

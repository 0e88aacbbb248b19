"""From-scratch binary FBX motion importer (host-side, numpy only).

Replaces the reference's Autodesk-FBX-SDK ingestion path
(isaacgymenvs/tasks/amp/poselib/poselib/skeleton/backend/fbx/
fbx_read_wrapper.py + fbx_backend.py): raw .fbx mocap clips (e.g. the
CMU exports shipped at tasks/amp/poselib/data/*.fbx) become
SkeletonMotion-style dicts consumable by learn/motion_lib.MotionLib and
learn/retarget.retarget_motion — so new motions can enter the AMP
pipeline without the closed-source SDK.

Scope: the skeleton-animation subset of FBX 7.x binary files —
 * node record tree (32-bit records for version < 7500, 64-bit after),
   typed properties incl. zlib-compressed arrays;
 * Objects/Model ("LimbNode"/"Root"/"Null") local TRS + PreRotation +
   RotationOrder from Properties70;
 * Objects/AnimationCurve (KeyTime in 1/46186158000 s ticks,
   KeyValueFloat) wired through AnimationCurveNode via OP/OO
   Connections;
 * per-frame resampling at the stack's fps with linear interpolation
   (mocap exports are densely keyed; curve tangents are ignored).

Not supported (and not needed for mocap ingestion): geometry, skin
deformers, materials, takes with multiple stacks (the first stack wins).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_KTIME_PER_S = 46186158000  # FBX KTime ticks per second (SDK constant)
_MAGIC = b"Kaydara FBX Binary  \x00\x1a\x00"


# --------------------------------------------------------------------------
# low-level record parsing
# --------------------------------------------------------------------------


class FbxNode:
    __slots__ = ("name", "props", "children")

    def __init__(self, name, props, children):
        self.name = name
        self.props = props
        self.children = children

    def find(self, name):
        for c in self.children:
            if c.name == name:
                return c
        return None

    def find_all(self, name):
        return [c for c in self.children if c.name == name]


def _read_prop(buf, off):
    t = buf[off:off + 1]
    off += 1
    if t == b"Y":
        return struct.unpack_from("<h", buf, off)[0], off + 2
    if t == b"C":
        return bool(buf[off]), off + 1
    if t == b"I":
        return struct.unpack_from("<i", buf, off)[0], off + 4
    if t == b"F":
        return struct.unpack_from("<f", buf, off)[0], off + 4
    if t == b"D":
        return struct.unpack_from("<d", buf, off)[0], off + 8
    if t == b"L":
        return struct.unpack_from("<q", buf, off)[0], off + 8
    if t in (b"f", b"d", b"l", b"i", b"b"):
        n, enc, clen = struct.unpack_from("<III", buf, off)
        off += 12
        dt = {b"f": "<f4", b"d": "<f8", b"l": "<i8", b"i": "<i4",
              b"b": "<i1"}[t]
        if enc == 1:
            raw = zlib.decompress(buf[off:off + clen])
            off += clen
        else:
            nbytes = n * np.dtype(dt).itemsize
            raw = bytes(buf[off:off + nbytes])
            off += nbytes
        return np.frombuffer(raw, dtype=dt, count=n), off
    if t in (b"S", b"R"):
        n = struct.unpack_from("<I", buf, off)[0]
        off += 4
        raw = bytes(buf[off:off + n])
        off += n
        return (raw.decode("utf-8", "replace") if t == b"S" else raw), off
    raise ValueError(f"unknown FBX property type {t!r} at {off}")


def _read_node(buf, off, wide):
    """One node record; returns (FbxNode | None, next_offset)."""
    if wide:
        end, n_props, _plen = struct.unpack_from("<QQQ", buf, off)
        off += 24
    else:
        end, n_props, _plen = struct.unpack_from("<III", buf, off)
        off += 12
    name_len = buf[off]
    off += 1
    if end == 0 and n_props == 0 and name_len == 0:
        return None, off  # null sentinel terminating a sibling list
    name = bytes(buf[off:off + name_len]).decode("utf-8", "replace")
    off += name_len
    props = []
    for _ in range(n_props):
        p, off = _read_prop(buf, off)
        props.append(p)
    children = []
    while off < end:
        child, off = _read_node(buf, off, wide)
        if child is None:
            break
        children.append(child)
    return FbxNode(name, props, children), end


def parse_fbx(path: str) -> tuple[FbxNode, int]:
    """Binary .fbx -> (root node, version)."""
    with open(path, "rb") as f:
        buf = memoryview(f.read())
    if bytes(buf[:23]) != _MAGIC:
        raise ValueError(f"{path}: not a binary FBX file")
    version = struct.unpack_from("<I", buf, 23)[0]
    wide = version >= 7500
    off = 27
    top = []
    while off < len(buf):
        node, off = _read_node(buf, off, wide)
        if node is None:
            break
        top.append(node)
    return FbxNode("", [], top), version


# --------------------------------------------------------------------------
# scene extraction
# --------------------------------------------------------------------------


def _props70(node):
    """Properties70 child -> {prop_name: value tuple or scalar}."""
    out = {}
    p70 = node.find("Properties70")
    if p70 is None:
        return out
    for p in p70.children:  # each child is a "P" record
        vals = p.props
        name = vals[0]
        data = vals[4:]
        out[name] = data[0] if len(data) == 1 else tuple(data)
    return out


def _euler_to_quat_xyz(e_deg, order=0):
    """FBX Euler angles (degrees) -> quaternion wxyz.

    order: FBX eRotationOrder enum. Mocap exports overwhelmingly use 0
    (XYZ: rotate about X first, then Y, then Z in the static parent
    frame => R = Rz @ Ry @ Rx). Other orders permute the composition.
    """
    r = np.deg2rad(np.asarray(e_deg, np.float64))
    half = r / 2.0
    c, s = np.cos(half), np.sin(half)
    qx = np.stack([c[..., 0], s[..., 0], np.zeros_like(c[..., 0]),
                   np.zeros_like(c[..., 0])], -1)
    qy = np.stack([c[..., 1], np.zeros_like(c[..., 1]), s[..., 1],
                   np.zeros_like(c[..., 1])], -1)
    qz = np.stack([c[..., 2], np.zeros_like(c[..., 2]),
                   np.zeros_like(c[..., 2]), s[..., 2]], -1)
    axis_q = {"x": qx, "y": qy, "z": qz}
    seqs = {0: "xyz", 1: "xzy", 2: "yzx", 3: "yxz", 4: "zxy", 5: "zyx"}
    seq = seqs.get(int(order), "xyz")
    # "rotate about seq[0] first" => compose q = q3 * q2 * q1
    q = axis_q[seq[0]]
    for ax in seq[1:]:
        q = _q_mul_np(axis_q[ax], q)
    return q


def _q_mul_np(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], -1)


def _ancestors(models, i):
    seen = set()
    p = models[i]["parent"]
    while p in models and p not in seen:
        seen.add(p)
        yield p
        p = models[p]["parent"]


def _sample_curve(times, values, t_grid, default):
    if times is None or len(times) == 0:
        return np.full_like(t_grid, default, dtype=np.float64)
    t = np.asarray(times, np.float64) / _KTIME_PER_S
    return np.interp(t_grid, t, np.asarray(values, np.float64))


def load_fbx_motion(path: str, fps: float | None = None, root_name: str | None = None) -> dict:
    """Parse a binary FBX mocap clip into a SkeletonMotion-style dict:
    local_rot [T,J,4] wxyz, root_pos [T,3], node_names, parents,
    local_translation [J,3], fps, plus FK-derived global velocities —
    the exact format learn/motion_lib.load_skeleton_motion returns (so
    MotionLib and retarget_motion accept it as a pre-loaded clip)."""
    root, _version = parse_fbx(path)
    objects = root.find("Objects")
    conns = root.find("Connections")
    if objects is None or conns is None:
        raise ValueError(f"{path}: no Objects/Connections sections")

    models = {}  # id -> dict
    curves = {}  # id -> (times, values)
    curve_nodes = {}  # id -> {"name": "T"/"R"/"S", "channels": {}}
    for obj in objects.children:
        if obj.name == "Model":
            oid, longname, cls = obj.props[0], obj.props[1], obj.props[2]
            name = longname.split("\x00")[0].split("::")[-1]
            p = _props70(obj)
            models[oid] = dict(
                name=name,
                cls=cls,
                lcl_t=np.asarray(
                    p.get("Lcl Translation", (0.0, 0.0, 0.0)), np.float64
                ),
                lcl_r=np.asarray(
                    p.get("Lcl Rotation", (0.0, 0.0, 0.0)), np.float64
                ),
                pre_r=np.asarray(
                    p.get("PreRotation", (0.0, 0.0, 0.0)), np.float64
                ),
                rot_order=int(
                    p.get("RotationOrder", 0) or 0
                ),
                parent=None,
                t_curves={}, r_curves={},
            )
        elif obj.name == "AnimationCurve":
            oid = obj.props[0]
            kt = obj.find("KeyTime")
            kv = obj.find("KeyValueFloat")
            curves[oid] = (
                kt.props[0] if kt is not None else None,
                kv.props[0] if kv is not None else None,
            )
        elif obj.name == "AnimationCurveNode":
            oid, longname = obj.props[0], obj.props[1]
            curve_nodes[oid] = dict(
                kind=longname.split("\x00")[0].split("::")[-1],
                channels={},
                target=None,
                target_prop=None,
            )

    for c in conns.children:
        if c.name != "C" or len(c.props) < 3:
            continue
        ctype, src, dst = c.props[0], c.props[1], c.props[2]
        if ctype == "OO" and src in models and dst in models:
            models[src]["parent"] = dst
        elif ctype == "OP" and len(c.props) >= 4:
            prop = c.props[3]
            if src in curves and dst in curve_nodes:
                ch = prop.split("|")[-1]  # d|X -> X
                curve_nodes[dst]["channels"][ch] = src
            elif src in curve_nodes and dst in models:
                curve_nodes[src]["target"] = dst
                curve_nodes[src]["target_prop"] = prop

    # attach animation channels to models
    for cn in curve_nodes.values():
        tgt = cn["target"]
        if tgt is None or tgt not in models:
            continue
        slot = (
            "t_curves" if cn["target_prop"] == "Lcl Translation"
            else "r_curves" if cn["target_prop"] == "Lcl Rotation"
            else None
        )
        if slot is None:
            continue
        for ch, cid in cn["channels"].items():
            models[tgt][slot][ch] = curves.get(cid, (None, None))

    # skeleton = models reachable from the root model(s); mocap exports
    # parent the skeleton root (e.g. "Hips") to the scene root (id 0)
    def _animated(m):
        # real motion, not a 2-key constant track (scene/reference nodes
        # like the CMU take node carry constant -90deg/scale-100 tracks)
        for slot in ("t_curves", "r_curves"):
            for times, _ in m[slot].values():
                if times is not None and len(times) > 2:
                    return True
        return False

    ids = list(models)
    if root_name is not None:
        roots = [i for i in ids if models[i]["name"] == root_name]
    else:
        # skeleton root = outermost genuinely-animated node (the reference
        # backend's "first node with an animation curve" walk,
        # fbx_backend.py:66-100 — scene parents above it are not joints).
        # Its static scene transform (axis-up rotation, unit scale) is
        # deliberately NOT applied: the reference evaluates LOCAL
        # transforms only and the retarget config's rotation/scale absorb
        # the conversion.
        roots = [
            i for i in ids
            if _animated(models[i])
            and not any(
                _animated(models[a]) for a in _ancestors(models, i)
            )
        ]
        if not roots:
            roots = [i for i in ids if models[i]["parent"] not in models]
    if not roots:
        raise ValueError(f"{path}: no skeleton root found")
    order = []
    stack = [roots[0]]
    while stack:
        i = stack.pop()
        order.append(i)
        stack.extend(
            sorted(
                (c for c in ids if models[c]["parent"] == i),
                key=lambda c: models[c]["name"], reverse=True,
            )
        )
    idx = {oid: j for j, oid in enumerate(order)}
    node_names = [models[i]["name"] for i in order]
    parents = np.asarray(
        [idx.get(models[i]["parent"], -1) for i in order], np.int64
    )
    local_translation = np.stack(
        [models[i]["lcl_t"] for i in order]
    ).astype(np.float64)

    # time grid across genuinely-animated curves; fps=None samples at the
    # file's native key rate (median key spacing snapped to a standard
    # rate), matching the reference backend's per-frame evaluation
    t_max, spacings = 0.0, []
    for i in order:
        for slot in ("t_curves", "r_curves"):
            for times, _ in models[i][slot].values():
                if times is not None and len(times) > 2:
                    t = np.asarray(times, np.float64) / _KTIME_PER_S
                    t_max = max(t_max, float(t[-1]))
                    spacings.append(np.median(np.diff(t)))
    if fps is None:
        native = 1.0 / np.median(spacings) if spacings else 30.0
        std = np.asarray([24.0, 25.0, 30.0, 50.0, 60.0, 100.0, 120.0])
        fps = float(std[np.argmin(np.abs(std - native))]) if (
            np.min(np.abs(std - native)) < 0.05 * native
        ) else float(native)
    n_frames = max(int(round(t_max * fps)) + 1, 2)
    t_grid = np.arange(n_frames, dtype=np.float64) / fps

    J = len(order)
    local_rot = np.zeros((n_frames, J, 4), np.float64)
    root_pos = np.zeros((n_frames, 3), np.float64)
    for j, i in enumerate(order):
        m = models[i]
        e = np.stack([
            _sample_curve(*m["r_curves"].get(ax, (None, None)), t_grid,
                          m["lcl_r"][k])
            for k, ax in enumerate("XYZ")
        ], -1)
        q = _euler_to_quat_xyz(e, m["rot_order"])
        if np.any(m["pre_r"]):
            # FBX evaluates PreRotation in fixed XYZ order regardless of
            # the node's RotationOrder (which only governs Lcl Rotation)
            q_pre = _euler_to_quat_xyz(m["pre_r"][None], 0)[0]
            q = _q_mul_np(np.broadcast_to(q_pre, q.shape), q)
        local_rot[:, j] = q
        if j == 0:
            root_pos = np.stack([
                _sample_curve(*m["t_curves"].get(ax, (None, None)), t_grid,
                              m["lcl_t"][k])
                for k, ax in enumerate("XYZ")
            ], -1)

    # FK-derived global velocities, matching motion_lib's convention
    from handarm_tpu.learn.motion_lib import _skeleton_fk

    g_rot, g_pos = _skeleton_fk(local_rot, root_pos, parents,
                                local_translation)
    dt = 1.0 / fps
    g_vel = np.gradient(g_pos, dt, axis=0)
    # angular velocity from finite-difference quats: w ~ 2*(dq * q^-1).xyz/dt
    dq = _q_mul_np(
        np.roll(g_rot, -1, axis=0),
        np.concatenate([g_rot[..., :1], -g_rot[..., 1:]], -1),
    )
    dq[-1] = dq[-2]
    sign = np.where(dq[..., :1] >= 0.0, 1.0, -1.0)
    g_ang_vel = 2.0 * sign * dq[..., 1:] / dt

    return dict(
        local_rot=local_rot,
        root_pos=root_pos,
        global_vel=g_vel,
        global_ang_vel=g_ang_vel,
        node_names=node_names,
        parents=parents,
        local_translation=local_translation,
        fps=float(fps),
    )

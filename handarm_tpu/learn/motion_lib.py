"""Motion library: loads poselib SkeletonMotion .npy clips and serves
reference-state samples + AMP demo features on device.

TPU-native re-design of the reference stack (tasks/amp/utils_amp/
motion_lib.py + tasks/amp/poselib/skeleton3d.py): the poselib
SkeletonTree/SkeletonState machinery collapses to a numpy FK pass at
load time; all clips are padded into stacked device arrays so sampling
and frame interpolation are pure gathers inside jit (the reference
gathers per-motion tensors on GPU the same way).

Motion files are the reference's own assets (assets/amp/motions/*.npy):
local joint rotations [T, 15, 4] (xyzw), root translation [T, 3],
global (angular) velocities [T, 15, 3], skeleton tree, fps.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from handarm_tpu.learn.amp_obs import (
    DOF_OFFSETS,
    KEY_BODY_NAMES,
    NUM_DOF,
    build_amp_observations,
)

# skeleton node carrying each dof cluster (humanoid_amp_base.py:41):
# torso, head, right_upper_arm, right_lower_arm, left_upper_arm,
# left_lower_arm, right_thigh, right_shin, right_foot, left_thigh,
# left_shin, left_foot
DOF_BODY_IDS = (1, 2, 3, 4, 6, 7, 9, 10, 11, 12, 13, 14)


def _xyzw_to_wxyz(q):
    return np.concatenate([q[..., 3:4], q[..., 0:3]], axis=-1)


def _q_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def _q_rot(q, v):
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = np.cross(u, v)
    return v + 2.0 * (w * uv + np.cross(u, uv))


def _q_conj(q):
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def _q_to_angle_axis(q, eps=1e-6):
    w = np.clip(q[..., 0], -1.0, 1.0)
    angle = 2.0 * np.arccos(np.abs(w))
    sign = np.sign(q[..., 0])[..., None]
    xyz = q[..., 1:4] * np.where(sign == 0, 1.0, sign)
    s = np.linalg.norm(xyz, axis=-1, keepdims=True)
    axis = np.where(s > eps, xyz / np.maximum(s, eps),
                    np.array([1.0, 0.0, 0.0]))
    return angle, axis


def _q_to_exp_map(q):
    angle, axis = _q_to_angle_axis(q)
    angle = np.arctan2(np.sin(angle), np.cos(angle))  # normalize to [-pi,pi]
    return angle[..., None] * axis


def load_clip_npz(path: str) -> dict:
    """Clip .npz written by scripts/fbx_to_motion.py -> motion dict (the
    same format load_skeleton_motion returns)."""
    d = np.load(path, allow_pickle=True)
    out = {k: d[k] for k in d.files}
    out["node_names"] = [str(n) for n in out["node_names"]]
    out["fps"] = float(out["fps"])
    return out


def load_skeleton_motion(path: str) -> dict:
    """Raw SkeletonMotion npy -> numpy dict (rotations converted to wxyz).
    .npz clips (fbx_to_motion.py output) load through load_clip_npz."""
    if path.endswith(".npz"):
        return load_clip_npz(path)
    d = np.load(path, allow_pickle=True).item()
    tree = d["skeleton_tree"]
    return dict(
        local_rot=_xyzw_to_wxyz(np.asarray(d["rotation"]["arr"], np.float64)),
        root_pos=np.asarray(d["root_translation"]["arr"], np.float64),
        global_vel=np.asarray(d["global_velocity"]["arr"], np.float64),
        global_ang_vel=np.asarray(
            d["global_angular_velocity"]["arr"], np.float64
        ),
        node_names=list(tree["node_names"]),
        parents=np.asarray(tree["parent_indices"]["arr"], np.int64),
        local_translation=np.asarray(
            tree["local_translation"]["arr"], np.float64
        ),
        fps=float(d["fps"]),
    )


def _skeleton_fk(local_rot, root_pos, parents, local_translation):
    """Global rotations/positions from local rotations. [T, J, 4]/[T, 3]."""
    T, J, _ = local_rot.shape
    g_rot = np.zeros_like(local_rot)
    g_pos = np.zeros((T, J, 3))
    for j in range(J):
        p = parents[j]
        if p < 0:
            g_rot[:, j] = local_rot[:, j]
            g_pos[:, j] = root_pos
        else:
            g_rot[:, j] = _q_mul(g_rot[:, p], local_rot[:, j])
            g_pos[:, j] = g_pos[:, p] + _q_rot(
                g_rot[:, p], np.broadcast_to(local_translation[j], (T, 3))
            )
    return g_rot, g_pos


def _local_rotation_to_dof(local_rot):
    """[T, 15, 4] wxyz -> [T, 28] dof positions (motion_lib.py:265-293)."""
    T = local_rot.shape[0]
    dof = np.zeros((T, NUM_DOF))
    for j, body in enumerate(DOF_BODY_IDS):
        o, o1 = DOF_OFFSETS[j], DOF_OFFSETS[j + 1]
        q = local_rot[:, body]
        if o1 - o == 3:
            dof[:, o:o1] = _q_to_exp_map(q)
        else:
            angle, axis = _q_to_angle_axis(q)
            theta = angle * axis[..., 1]  # hinges are about local y
            dof[:, o] = np.arctan2(np.sin(theta), np.cos(theta))
    return dof


def _dof_vels(local_rot, dof_pos, dt):
    """Finite-difference dof velocities (motion_lib.py:248-325)."""
    T = local_rot.shape[0]
    vel = np.zeros((T, NUM_DOF))
    diff = _q_mul(_q_conj(local_rot[:-1]), local_rot[1:])
    angle, axis = _q_to_angle_axis(diff)
    angle = np.arctan2(np.sin(angle), np.cos(angle))
    local_w = axis * angle[..., None] / dt  # [T-1, 15, 3]
    for j, body in enumerate(DOF_BODY_IDS):
        o, o1 = DOF_OFFSETS[j], DOF_OFFSETS[j + 1]
        if o1 - o == 3:
            vel[:-1, o:o1] = local_w[:, body]
        else:
            vel[:-1, o] = local_w[:, body, 1]
    vel[-1] = vel[-2] if T > 1 else 0.0
    return vel


class MotionLib:
    """Stacked motion clips on device with jittable sampling."""

    def __init__(self, motion_files, weights=None):
        # entries may be paths OR pre-loaded/retargeted clip dicts
        # (learn/retarget.py output) in load_skeleton_motion format
        clips = [
            f if isinstance(f, dict) else load_skeleton_motion(f)
            for f in motion_files
        ]
        M = len(clips)
        T = max(c["local_rot"].shape[0] for c in clips)
        root_pos = np.zeros((M, T, 3), np.float32)
        root_rot = np.zeros((M, T, 4), np.float32)
        root_vel = np.zeros((M, T, 3), np.float32)
        root_ang = np.zeros((M, T, 3), np.float32)
        dof_pos = np.zeros((M, T, NUM_DOF), np.float32)
        dof_vel = np.zeros((M, T, NUM_DOF), np.float32)
        key_pos = np.zeros((M, T, len(KEY_BODY_NAMES), 3), np.float32)
        num_frames = np.zeros(M, np.int32)
        dts = np.zeros(M, np.float32)
        for m, c in enumerate(clips):
            t = c["local_rot"].shape[0]
            dt = 1.0 / c["fps"]
            g_rot, g_pos = _skeleton_fk(
                c["local_rot"], c["root_pos"], c["parents"],
                c["local_translation"],
            )
            key_ids = [c["node_names"].index(n) for n in KEY_BODY_NAMES]
            dof = _local_rotation_to_dof(c["local_rot"])
            num_frames[m] = t
            dts[m] = dt
            root_pos[m, :t] = c["root_pos"]
            root_rot[m, :t] = c["local_rot"][:, 0]
            root_vel[m, :t] = c["global_vel"][:, 0]
            root_ang[m, :t] = c["global_ang_vel"][:, 0]
            dof_pos[m, :t] = dof
            dof_vel[m, :t] = _dof_vels(c["local_rot"], dof, dt)
            key_pos[m, :t] = g_pos[:, key_ids]
            # pad with the last frame so out-of-range gathers are benign
            root_pos[m, t:] = root_pos[m, t - 1]
            root_rot[m, t:] = root_rot[m, t - 1]
            dof_pos[m, t:] = dof_pos[m, t - 1]
            key_pos[m, t:] = key_pos[m, t - 1]
        self.num_motions = M
        self.root_pos = jnp.asarray(root_pos)
        self.root_rot = jnp.asarray(root_rot)
        self.root_vel = jnp.asarray(root_vel)
        self.root_ang = jnp.asarray(root_ang)
        self.dof_pos = jnp.asarray(dof_pos)
        self.dof_vel = jnp.asarray(dof_vel)
        self.key_pos = jnp.asarray(key_pos)
        self.num_frames = jnp.asarray(num_frames)
        self.dt = jnp.asarray(dts)
        self.length_s = jnp.asarray((num_frames - 1) * dts)
        w = np.ones(M) if weights is None else np.asarray(weights, np.float64)
        self.weights = jnp.asarray(w / w.sum(), jnp.float32)

    # -- jittable sampling -------------------------------------------------

    def sample_motions(self, key, n):
        return jax.random.choice(
            key, self.num_motions, (n,), p=self.weights
        )

    def sample_time(self, key, motion_ids, truncate: float = 0.0):
        phase = jax.random.uniform(key, motion_ids.shape)
        return phase * jnp.maximum(
            self.length_s[motion_ids] - truncate, 1e-3
        )

    def get_state(self, motion_ids, times):
        """Interpolated motion frame at (motion, time). All gathers."""
        dt = self.dt[motion_ids]
        n = self.num_frames[motion_ids]
        f = jnp.clip(times / dt, 0.0, (n - 1).astype(jnp.float32) - 1e-4)
        f0 = jnp.floor(f).astype(jnp.int32)
        f1 = jnp.minimum(f0 + 1, n - 1)
        b = (f - f0)[..., None]

        def lerp(arr, extra_dims=0):
            a0 = arr[motion_ids, f0]
            a1 = arr[motion_ids, f1]
            bb = b.reshape(b.shape + (1,) * extra_dims)
            return a0 * (1 - bb) + a1 * bb

        root_pos = lerp(self.root_pos)
        rr0 = self.root_rot[motion_ids, f0]
        rr1 = self.root_rot[motion_ids, f1]
        # nlerp with hemisphere alignment (frames are close)
        sign = jnp.sign(jnp.sum(rr0 * rr1, axis=-1, keepdims=True))
        rr = rr0 * (1 - b) + rr1 * sign * b
        root_rot = rr / jnp.sqrt(
            jnp.sum(rr * rr, axis=-1, keepdims=True) + 1e-12
        )
        return dict(
            root_pos=root_pos,
            root_rot=root_rot,
            root_vel=lerp(self.root_vel),
            root_ang_vel=lerp(self.root_ang),
            dof_pos=lerp(self.dof_pos),
            dof_vel=lerp(self.dof_vel),
            key_pos=lerp(self.key_pos, extra_dims=1),
        )

    def amp_obs_demo(self, key, n, env_dt: float):
        """[n, 2 * 105] two-frame AMP demo windows (humanoid_amp.py
        fetch_amp_obs_demo: current frame + the frame env_dt earlier)."""
        k1, k2 = jax.random.split(key)
        ids = self.sample_motions(k1, n)
        t1 = self.sample_time(k2, ids, truncate=env_dt) + env_dt
        feats = []
        for t in (t1, t1 - env_dt):
            s = self.get_state(ids, t)
            feats.append(build_amp_observations(
                s["root_pos"], s["root_rot"], s["root_vel"],
                s["root_ang_vel"], s["dof_pos"], s["dof_vel"], s["key_pos"],
            ))
        return jnp.concatenate(feats, axis=-1)

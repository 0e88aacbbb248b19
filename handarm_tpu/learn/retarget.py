"""Skeleton motion retargeting — poselib's "other half".

Host-side numpy re-implementation of the reference retarget pipeline
(isaacgymenvs/tasks/amp/poselib/poselib/skeleton/skeleton3d.py:814-1419
SkeletonState.retarget_to / SkeletonMotion.retarget_to): map a motion
captured on a SOURCE skeleton (different joint names, rest pose, scale,
world orientation) onto a TARGET skeleton (the AMP humanoid), so new clips
can be ingested — MotionLib is no longer limited to the reference's
pre-exported humanoid npys.

Algorithm (the reference's own procedure, documented at
skeleton3d.py:826-849):
  1. keep only the joints present in the joint mapping
  2. rotate source state + source tpose into the target frame
     (rotation_to_target_skeleton)
  3. scale the root translation to the target skeleton's size
  4. per mapped joint: the retargeted GLOBAL rotation is the source's
     global rotation RELATIVE to its tpose, re-applied to the target tpose
  5. convert global rotations back to target-local rotations
  6. drop feet onto the ground (z offset)

All quaternions are wxyz (motion_lib conventions). Velocities are
re-estimated by finite differences at the source fps, matching
SkeletonMotion.retarget_to's discard-and-recompute behavior
(skeleton3d.py:1323-1326).
"""

from __future__ import annotations

import numpy as np

from handarm_tpu.learn.motion_lib import (
    _q_conj,
    _q_mul,
    _q_rot,
    _skeleton_fk,
)


def _normalize(q):
    return q / np.maximum(
        np.linalg.norm(q, axis=-1, keepdims=True), 1e-12
    )


def _global_to_local(g_rot, parents):
    """Invert FK rotation accumulation: local_j = conj(g_parent) * g_j."""
    local = np.array(g_rot)
    for j in range(g_rot.shape[1]):
        p = parents[j]
        if p >= 0:
            local[:, j] = _q_mul(_q_conj(g_rot[:, p]), g_rot[:, j])
    return _normalize(local)


def _tpose_global(skel, tpose_local_rot=None):
    """Global rotations/positions of a skeleton's tpose (identity local
    rotations unless given), as [1, J, 4] / [1, J, 3]."""
    J = len(skel["node_names"])
    local = (
        np.broadcast_to(
            np.array([1.0, 0, 0, 0]), (1, J, 4)
        ).copy()
        if tpose_local_rot is None
        else np.asarray(tpose_local_rot, np.float64)[None]
    )
    root = np.zeros((1, 3))
    return _skeleton_fk(
        local, root, skel["parents"], skel["local_translation"]
    )


def retarget_motion(
    source: dict,
    target_skeleton: dict,
    joint_mapping: dict[str, str],
    rotation_to_target: np.ndarray = (1.0, 0.0, 0.0, 0.0),
    scale_to_target: float = 1.0,
    source_tpose_local_rot: np.ndarray | None = None,
    target_tpose_local_rot: np.ndarray | None = None,
    ground_feet: bool = True,
    root_height_offset: float = 0.0,
) -> dict:
    """Retarget `source` (a load_skeleton_motion dict) onto
    `target_skeleton` ({node_names, parents, local_translation}).

    joint_mapping: source joint name -> target joint name (must include the
    roots). Returns a dict in load_skeleton_motion format, consumable by
    MotionLib."""
    src_names = list(source["node_names"])
    tgt_names = list(target_skeleton["node_names"])
    tgt_parents = np.asarray(target_skeleton["parents"])
    T = source["local_rot"].shape[0]
    J_t = len(tgt_names)
    R = np.asarray(rotation_to_target, np.float64)

    # source global rotations for the motion and for the source tpose
    g_rot_src, _ = _skeleton_fk(
        source["local_rot"], source["root_pos"],
        source["parents"], source["local_translation"],
    )
    g_tpose_src, _ = _tpose_global(
        dict(
            node_names=src_names,
            parents=source["parents"],
            local_translation=source["local_translation"],
        ),
        source_tpose_local_rot,
    )
    # step 2: rotate into the target frame
    g_rot_src = _q_mul(np.broadcast_to(R, g_rot_src.shape), g_rot_src)
    g_tpose_src = _q_mul(np.broadcast_to(R, g_tpose_src.shape), g_tpose_src)
    root_pos = _q_rot(
        np.broadcast_to(R, (T, 4)), np.asarray(source["root_pos"], np.float64)
    )
    # step 3: scale root translation
    root_pos = root_pos * float(scale_to_target)

    # target tpose globals
    g_tpose_tgt, tpose_pos_tgt = _tpose_global(
        target_skeleton, target_tpose_local_rot
    )

    # step 4: relative-to-tpose global rotation re-applied to target tpose
    g_rot_tgt = np.broadcast_to(
        g_tpose_tgt, (T, J_t, 4)
    ).copy()
    for s_name, t_name in joint_mapping.items():
        s = src_names.index(s_name)
        t = tgt_names.index(t_name)
        q_rel = _q_mul(g_rot_src[:, s], _q_conj(g_tpose_src[0, s]))
        g_rot_tgt[:, t] = _q_mul(q_rel, g_tpose_tgt[0, t])
    g_rot_tgt = _normalize(g_rot_tgt)

    # step 5: back to local rotations on the target tree
    local_rot = _global_to_local(g_rot_tgt, tgt_parents)

    # step 6: ground the feet — offset root z so the minimum body height
    # over the whole clip sits on the ground plane z=0, plus the optional
    # anti-penetration offset (reference retarget_motion.py:259-268:
    # `root_translation[:, 2] += -min_h` then `+= root_height_offset`).
    # Absolute root height is an AMP feature, so retargeted clips must
    # share the native clips' ground convention or the discriminator
    # separates them on height alone.
    if ground_feet:
        _, g_pos = _skeleton_fk(
            local_rot, root_pos, tgt_parents,
            target_skeleton["local_translation"],
        )
        z_min = g_pos[..., 2].min()
        root_pos = root_pos + np.array(
            [0.0, 0.0, float(root_height_offset) - float(z_min)]
        )

    # re-estimate velocities by finite differences at the source fps
    fps = float(source["fps"])
    dt = 1.0 / fps
    g_rot_final, g_pos_final = _skeleton_fk(
        local_rot, root_pos, tgt_parents,
        target_skeleton["local_translation"],
    )
    g_vel = np.zeros_like(g_pos_final)
    if T > 1:
        g_vel[:-1] = (g_pos_final[1:] - g_pos_final[:-1]) / dt
        g_vel[-1] = g_vel[-2]
    diff = _q_mul(_q_conj(g_rot_final[:-1]), g_rot_final[1:])
    ang = 2.0 * diff[..., 1:4] / dt  # small-angle world-rate approximation
    ang = _q_rot(g_rot_final[:-1], ang)
    g_ang = np.zeros((T,) + ang.shape[1:])
    if T > 1:
        g_ang[:-1] = ang
        g_ang[-1] = g_ang[-2]

    return dict(
        local_rot=local_rot.astype(np.float64),
        root_pos=root_pos.astype(np.float64),
        global_vel=g_vel.astype(np.float64),
        global_ang_vel=g_ang.astype(np.float64),
        node_names=tgt_names,
        parents=tgt_parents,
        local_translation=np.asarray(target_skeleton["local_translation"]),
        fps=fps,
    )

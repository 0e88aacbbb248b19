"""Synthetic pointcloud observations.

TPU-native analog of the reference's synthetic pointcloud observables
(isaacgymenvs/tasks/hand_arm/env/multi_object.py:774-819 object clouds,
base/ur5sih.py:347-374 robot clouds) and the PointType semantic channel
(utils/camera.py:43-47). Surface samples are precomputed per mesh on the
host (area-proportional, zero-padded to max_num_points with a PADDING
semantic id — the reference's own masked-buffer idiom); per step they are
just gathered + rigidly transformed, a pure batched quat-rotate.

Clouds are N x 4: xyz + PointType (PADDING=0, REGULAR=1, TARGET=2, GOAL=3).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from handarm_tpu.math.quat import quat_rotate, quat_rotate_inv

# PointType semantic ids (reference utils/camera.py:43-47)
PADDING, REGULAR, TARGET, GOAL = 0, 1, 2, 3


def pad_cloud(points: np.ndarray, max_points: int) -> tuple[np.ndarray, np.ndarray]:
    """Zero-pad a [P, 3] sample set to [max_points, 3] + validity mask."""
    out = np.zeros((max_points, 3))
    mask = np.zeros(max_points)
    n = min(len(points), max_points)
    out[:n] = points[:n]
    mask[:n] = 1.0
    return out, mask


def area_sample_counts(areas: np.ndarray, average_num_points: int) -> np.ndarray:
    """Per-mesh sample counts proportional to surface area (reference
    pointclouds.sample_mode 'area', average_num_points knob)."""
    total = areas.sum()
    counts = np.maximum(
        1, np.round(areas / max(total, 1e-9) * average_num_points * len(areas))
    ).astype(int)
    return counts


def transform_cloud(points, mask, quat, pos, point_type=REGULAR):
    """Rigidly transform a body-frame cloud into world frame with semantics.

    points: [P, 3] or [B, P, 3]; quat/pos: [B, 4]/[B, 3].
    Returns [B, P, 4] (xyz + type, padding rows stay zero)."""
    if points.ndim == 2:
        pts = quat_rotate(quat[:, None, :], points[None]) + pos[:, None, :]
    else:
        pts = quat_rotate(quat[:, None, :], points) + pos[:, None, :]
    m = mask[None, :, None] if mask.ndim == 1 else mask[..., None]
    typ = jnp.full(pts.shape[:-1] + (1,), float(point_type), pts.dtype) * m
    return jnp.concatenate([pts * m, typ], axis=-1)


def merge_clouds(*clouds):
    """Concatenate [B, P_i, 4] clouds along the point axis."""
    return jnp.concatenate(clouds, axis=1)


def to_relative_frame(cloud, frame_quat, frame_pos):
    """Express cloud xyz relative to a frame (e.g. flange-relative clouds,
    reference multi_object.py:795-806). Keeps the semantic channel."""
    xyz = quat_rotate_inv(
        frame_quat[:, None, :], cloud[..., :3] - frame_pos[:, None, :]
    )
    valid = cloud[..., 3:] > 0
    return jnp.concatenate([jnp.where(valid, xyz, 0.0), cloud[..., 3:]], axis=-1)


def subsample_pad(cloud, key, out_points: int):
    """Random-permutation subsample/pad to a fixed budget (the reference
    permutes then pads, multi_object.py:782-806). cloud: [B, P, 4]."""
    import jax

    B, P, _ = cloud.shape
    if P < out_points:  # pad up to the budget
        pad = jnp.zeros((B, out_points - P, cloud.shape[-1]), cloud.dtype)
        cloud = jnp.concatenate([cloud, pad], axis=1)
        P = out_points
    valid = cloud[..., 3] > 0
    # rank valid points first under a random permutation
    scores = jax.random.uniform(key, (B, P)) + (1.0 - valid) * 10.0
    order = jnp.argsort(scores, axis=-1)[:, :out_points]
    picked = jnp.take_along_axis(cloud, order[..., None], axis=1)
    # rows that were padding stay zeroed
    picked_valid = jnp.take_along_axis(valid, order, axis=1)
    return picked * picked_valid[..., None]


# --- observation transforms (reference utils/transforms.py) -----------------


def flatten_cloud(cloud):
    """FlattenPointcloud: [B, P, 4] -> [B, P*4]."""
    return cloud.reshape(cloud.shape[0], -1)


def interval_sample(value, progress, interval: int, fill=0.0):
    """InvervalSample (sic): expose the value only every `interval` steps,
    blanking it otherwise (reference transforms.py:23-34 — used to train
    history-aware students under intermittent sensing)."""
    keep = (progress % interval) == 0
    keep = keep.reshape(keep.shape + (1,) * (value.ndim - 1))
    return jnp.where(keep, value, fill)

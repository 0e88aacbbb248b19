"""Point-rasterized camera sensors: depth, segmentation, and
occlusion-filtered pointclouds.

TPU-native replacement for the reference's Vulkan camera pipeline
(isaacgymenvs/tasks/hand_arm/utils/camera.py: IsaacGymCameraSensor with
GPU depth/segmentation tensors + the sparse-depth unprojection trick at
:50-81). Instead of rasterizing triangles, the known scene surface points
(robot cloud + object samples) are projected into the camera and
z-buffered per pixel with segment-min — giving real occlusion behavior for
pointcloud observations (the reference's cameras ultimately feed exactly
such sparse clouds to the distillation students). COLOR images render the
same way: each point carries a flat RGB albedo baked from the object's
texture (utils/mesh.py sample_texture_colors), and the z-buffer winner
paints its pixel (reference ImageType.COLOR, utils/camera.py:17-40).

Segmentation ids follow the reference convention: 0 background, 1 robot,
3+k for object k (multi_object.py create_actor segmentationId arguments).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import quat_rotate, quat_rotate_inv


@dataclass(frozen=True)
class CameraConfig:
    """Pose/intrinsics (counterpart of the reference Ur5SihMultiObject.yaml
    cameras block). Convention here: quat (wxyz) maps camera frame to world;
    the camera looks along its +x axis with +z up in camera body (u = -y,
    v = -z). The reference's yaml quats embed Isaac's internal sensor-mount
    rotation and don't transfer 1:1. Default: overhead topview looking
    straight down at the workspace center."""

    name: str = "topview"
    pos: tuple = (0.28, 0.58, 1.3)
    quat: tuple = (-0.5, 0.5, -0.5, -0.5)  # +x -> straight down
    fovx_deg: float = 87.0
    width: int = 160
    height: int = 90
    max_depth: float = 3.0


class CameraRender(NamedTuple):
    depth: jnp.ndarray  # [B, H, W] (max_depth where empty)
    segmentation: jnp.ndarray  # [B, H, W] int32
    points_uvz: jnp.ndarray  # [B, P, 3] pixel coords + depth per input point
    visible: jnp.ndarray  # [B, P] 1.0 where the point won its pixel
    color: jnp.ndarray | None = None  # [B, H, W, 3] float in [0,1] (flat-
    # shaded splats; reference ImageType.COLOR, utils/camera.py:17-40)


def _intrinsics(cfg: CameraConfig):
    fx = cfg.width / (2.0 * np.tan(np.radians(cfg.fovx_deg) / 2.0))
    fy = fx  # square pixels
    cx, cy = cfg.width / 2.0, cfg.height / 2.0
    return fx, fy, cx, cy


def render_points(
    cfg: CameraConfig,
    points_world: jnp.ndarray,  # [B, P, 3]
    seg_ids: jnp.ndarray,  # [P] or [B, P] int32 (0 = invalid/background)
    valid: jnp.ndarray | None = None,  # [B, P]
    colors: jnp.ndarray | None = None,  # [P, 3] or [B, P, 3] RGB in [0,1]
) -> CameraRender:
    """Project + z-buffer scene points. Camera looks along +x of its frame
    (gym convention), +z up; image u right, v down."""
    B, P, _ = points_world.shape
    cam_pos = jnp.asarray(cfg.pos, points_world.dtype)
    cam_quat = jnp.asarray(cfg.quat, points_world.dtype)
    rel = quat_rotate_inv(cam_quat[None, None], points_world - cam_pos)
    # camera frame: +x forward, +y left, +z up  ->  u = -y, v = -z
    depth = rel[..., 0]
    fx, fy, cx, cy = _intrinsics(cfg)
    safe_depth = jnp.maximum(depth, 1e-4)
    u = (-rel[..., 1] / safe_depth) * fx + cx
    v = (-rel[..., 2] / safe_depth) * fy + cy
    in_front = depth > 1e-3
    in_img = (u >= 0) & (u < cfg.width) & (v >= 0) & (v < cfg.height)
    ok = in_front & in_img
    if valid is not None:
        ok = ok & (valid > 0)
    ui = jnp.clip(u.astype(jnp.int32), 0, cfg.width - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, cfg.height - 1)
    pix = vi * cfg.width + ui  # [B, P]
    npix = cfg.width * cfg.height

    big = cfg.max_depth
    d_masked = jnp.where(ok, depth, big)

    def per_env(pix_b, d_b, seg_b, rgb_b):
        zbuf = jax.ops.segment_min(
            d_b, pix_b, num_segments=npix, indices_are_sorted=False
        )
        zbuf = jnp.minimum(zbuf, big)
        # winner-takes-pixel segmentation: a point is visible iff it matches
        # the z-buffer at its pixel (ties share visibility)
        at_pix = zbuf[pix_b]
        vis = (jnp.abs(d_b - at_pix) < 1e-5) & (d_b < big)
        seg_flat = jax.ops.segment_max(
            jnp.where(vis, seg_b, 0), pix_b, num_segments=npix
        )
        if rgb_b is None:
            return zbuf, seg_flat, vis, None
        # one winning point's FULL rgb per pixel: pack the three channels
        # into one int so segment_max can't mix channels across tied points
        q = jnp.clip(rgb_b * 255.0, 0, 255).astype(jnp.int32)
        packed = (q[:, 0] << 16) | (q[:, 1] << 8) | q[:, 2]
        col_flat = jax.ops.segment_max(
            jnp.where(vis, packed, -1), pix_b, num_segments=npix
        )
        won = col_flat >= 0
        col_flat = jnp.where(won, col_flat, 0)
        rgb_img = (
            jnp.stack(
                [col_flat >> 16, (col_flat >> 8) & 255, col_flat & 255],
                axis=-1,
            ).astype(jnp.float32)
            / 255.0
        )
        return zbuf, seg_flat, vis, rgb_img * won[:, None]

    seg_b = (
        jnp.broadcast_to(seg_ids[None], (B, P))
        if seg_ids.ndim == 1
        else seg_ids
    )
    if colors is not None:
        rgb_b = (
            jnp.broadcast_to(colors[None], (B, P, 3))
            if colors.ndim == 2
            else colors
        )
        zbuf, seg_flat, vis, col = jax.vmap(per_env)(pix, d_masked, seg_b, rgb_b)
        color_img = col.reshape(B, cfg.height, cfg.width, 3)
    else:
        zbuf, seg_flat, vis, _ = jax.vmap(
            lambda p, d, s: per_env(p, d, s, None)
        )(pix, d_masked, seg_b)
        color_img = None
    return CameraRender(
        depth=zbuf.reshape(B, cfg.height, cfg.width),
        segmentation=seg_flat.reshape(B, cfg.height, cfg.width).astype(jnp.int32),
        points_uvz=jnp.stack([u, v, depth], axis=-1),
        visible=vis.astype(points_world.dtype),
        color=color_img,
    )


def depth_to_points(cfg: CameraConfig, depth: jnp.ndarray, stride: int = 1):
    """Unproject a depth image back to world points (the reference's
    depth_image_to_global_points, camera.py:50-69). Returns [B, H*W//s^2, 3]."""
    B = depth.shape[0]
    fx, fy, cx, cy = _intrinsics(cfg)
    vs = jnp.arange(0, cfg.height, stride)
    us = jnp.arange(0, cfg.width, stride)
    vv, uu = jnp.meshgrid(vs, us, indexing="ij")
    d = depth[:, vv, uu]  # [B, h, w]
    x = d
    y = -(uu[None] - cx) / fx * d
    z = -(vv[None] - cy) / fy * d
    cam = jnp.stack([x, y, z], axis=-1).reshape(B, -1, 3)
    cam_pos = jnp.asarray(cfg.pos, depth.dtype)
    cam_quat = jnp.asarray(cfg.quat, depth.dtype)
    world = quat_rotate(cam_quat[None, None], cam) + cam_pos
    mask = (d < cfg.max_depth - 1e-3).reshape(B, -1)
    return world, mask


def visible_pointcloud(
    render: CameraRender,
    points_world: jnp.ndarray,
    point_types: jnp.ndarray,
    key,
    out_points: int,
):
    """Occlusion-filtered semantic cloud from the rasterization: keep only
    points that won their pixel, subsample/pad to a fixed budget (the
    reference's camera pointcloud path: render -> segment -> subsample,
    multi_object.py:837-855)."""
    from handarm_tpu.envs.pointcloud import subsample_pad

    cloud = jnp.concatenate(
        [points_world, (point_types * render.visible)[..., None]], axis=-1
    )
    return subsample_pad(cloud * render.visible[..., None], key, out_points)

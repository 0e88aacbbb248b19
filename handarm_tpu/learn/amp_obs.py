"""AMP observation features for the humanoid motion-imitation stack.

Ports the feature math shared by the env and the motion library
(reference tasks/amp/humanoid_amp_base.py:463-530 `dof_to_obs` /
`compute_humanoid_observations`, tasks/humanoid_amp.py:300-330
`build_amp_observations`). Quaternions are wxyz throughout (the repo
convention; the reference/poselib use xyzw).

Layout (NUM_AMP_OBS_PER_STEP = 105):
  [root_h(1), root_rot tan-norm(6), local root vel(3), local root ang
   vel(3), dof_obs(52: 6 per spherical cluster + 1 per hinge), dof_vel
   (28), local key body pos(4*3)]
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import (
    quat_mul,
    quat_normalize,
    quat_rotate,
    safe_norm,
)

# amp_humanoid skeleton dof layout (humanoid_amp_base.py:41-42):
# 12 joints, spherical clusters are 3 consecutive hinge dofs
DOF_OFFSETS = (0, 3, 6, 9, 10, 13, 14, 17, 18, 21, 24, 25, 28)
NUM_DOF = 28
DOF_OBS_SIZE = 52
KEY_BODY_NAMES = ("right_hand", "left_hand", "right_foot", "left_foot")
NUM_AMP_OBS_PER_STEP = 13 + DOF_OBS_SIZE + NUM_DOF + 12  # 105


def exp_map_to_quat(e):
    """Exponential map [..., 3] -> wxyz quaternion."""
    angle = safe_norm(e, keepdims=True)
    axis = e / jnp.maximum(angle, 1e-9)
    half = 0.5 * angle
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def quat_to_tan_norm(q):
    """6D rotation representation: rotated x (tangent) + z (normal) axes
    (amp_torch_utils quat_to_tan_norm)."""
    tan = quat_rotate(q, jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0]), q.shape[:-1] + (3,)
    ))
    norm = quat_rotate(q, jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0]), q.shape[:-1] + (3,)
    ))
    return jnp.concatenate([tan, norm], axis=-1)


def calc_heading_quat_inv(q):
    """Inverse of the heading (yaw-only) rotation of q (wxyz)."""
    # heading = atan2 of the rotated x axis
    ref = quat_rotate(q, jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0]), q.shape[:-1] + (3,)
    ))
    heading = jnp.arctan2(ref[..., 1], ref[..., 0])
    half = -0.5 * heading  # inverse rotation about z
    zeros = jnp.zeros_like(half)
    return jnp.stack(
        [jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1
    )


def dof_to_obs(pose):
    """[..., 28] dof positions -> [..., 52] (6D per spherical cluster,
    raw angle per hinge). Static python loop over the 12 joints."""
    parts = []
    for j in range(len(DOF_OFFSETS) - 1):
        o, o1 = DOF_OFFSETS[j], DOF_OFFSETS[j + 1]
        jp = pose[..., o:o1]
        if o1 - o == 3:
            parts.append(quat_to_tan_norm(exp_map_to_quat(jp)))
        else:
            parts.append(jp)
    return jnp.concatenate(parts, axis=-1)


def build_amp_observations(root_pos, root_rot, root_vel, root_ang_vel,
                           dof_pos, dof_vel, key_pos):
    """[..., 105] AMP features (humanoid_amp.py:300-330). key_pos is the
    GLOBAL key body positions [..., 4, 3]."""
    root_h = root_pos[..., 2:3]
    hq = calc_heading_quat_inv(root_rot)
    root_rot_obs = quat_to_tan_norm(quat_normalize(quat_mul(hq, root_rot)))
    local_vel = quat_rotate(hq, root_vel)
    local_ang = quat_rotate(hq, root_ang_vel)
    rel = key_pos - root_pos[..., None, :]
    local_key = quat_rotate(hq[..., None, :], rel)
    local_key = local_key.reshape(local_key.shape[:-2] + (12,))
    return jnp.concatenate(
        [root_h, root_rot_obs, local_vel, local_ang,
         dof_to_obs(dof_pos), dof_vel, local_key],
        axis=-1,
    )


def compute_humanoid_observations(root_pos, root_rot, root_vel,
                                  root_ang_vel, dof_pos, dof_vel, key_pos,
                                  local_root_obs: bool = True):
    """Policy observations — identical feature set to the AMP features
    (humanoid_amp_base.py:495-530). 105 dims."""
    if local_root_obs:
        return build_amp_observations(
            root_pos, root_rot, root_vel, root_ang_vel, dof_pos, dof_vel,
            key_pos,
        )
    root_h = root_pos[..., 2:3]
    hq = calc_heading_quat_inv(root_rot)
    root_rot_obs = quat_to_tan_norm(root_rot)
    local_vel = quat_rotate(hq, root_vel)
    local_ang = quat_rotate(hq, root_ang_vel)
    rel = key_pos - root_pos[..., None, :]
    local_key = quat_rotate(hq[..., None, :], rel)
    local_key = local_key.reshape(local_key.shape[:-2] + (12,))
    return jnp.concatenate(
        [root_h, root_rot_obs, local_vel, local_ang,
         dof_to_obs(dof_pos), dof_vel, local_key],
        axis=-1,
    )

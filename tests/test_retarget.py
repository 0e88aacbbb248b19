"""Motion retargeting (poselib's missing half, reference
skeleton3d.py:814-1419): a clip on a FOREIGN skeleton — renamed joints,
extra joints, rotated world frame, different scale — retargets onto the
AMP humanoid and reproduces the native clip's motion features."""

import numpy as np
import pytest

from handarm_tpu.learn.motion_lib import (
    MotionLib,
    _q_mul,
    _skeleton_fk,
    load_skeleton_motion,
)
from handarm_tpu.learn.retarget import retarget_motion

CLIP = "/root/reference/assets/amp/motions/amp_humanoid_walk.npy"


def _make_foreign_clip(native):
    """Disguise the native walk clip as a mocap export from a different
    rig: joints renamed mixamo-style, two extra leaf joints, the whole
    skeleton twice as large, and the world frame rotated 90 deg about z."""
    J = len(native["node_names"])
    rename = {n: f"mixamorig:{n.upper()}" for n in native["node_names"]}
    # 90 deg about z: world frame differs from the humanoid's
    s, c = np.sin(np.pi / 4), np.cos(np.pi / 4)
    R = np.array([c, 0.0, 0.0, s])  # wxyz
    Rc = R * np.array([1.0, -1, -1, -1])

    names = [rename[n] for n in native["node_names"]] + [
        "mixamorig:PROP_L", "mixamorig:PROP_R",
    ]
    parents = np.concatenate([native["parents"], [0, 0]])
    local_t = np.concatenate(
        [2.0 * native["local_translation"],
         np.array([[0.1, 0.0, 0.0], [-0.1, 0.0, 0.0]])],
        axis=0,
    )
    T = native["local_rot"].shape[0]
    extra = np.broadcast_to(np.array([1.0, 0, 0, 0]), (T, 2, 4))
    local_rot = np.concatenate([native["local_rot"], extra], axis=1)
    # rotate the root into the foreign frame: root_local' = R * root_local
    local_rot = np.array(local_rot)
    local_rot[:, 0] = _q_mul(np.broadcast_to(R, (T, 4)), local_rot[:, 0])
    from handarm_tpu.learn.motion_lib import _q_rot

    root_pos = 2.0 * _q_rot(
        np.broadcast_to(R, (T, 4)), np.asarray(native["root_pos"])
    )
    return dict(
        local_rot=local_rot,
        root_pos=root_pos,
        global_vel=np.zeros((T, J + 2, 3)),
        global_ang_vel=np.zeros((T, J + 2, 3)),
        node_names=names,
        parents=parents,
        local_translation=local_t,
        fps=native["fps"],
    ), Rc, rename


@pytest.fixture(scope="module")
def clips():
    native = load_skeleton_motion(CLIP)
    foreign, R_back, rename = _make_foreign_clip(native)
    target_skel = dict(
        node_names=native["node_names"],
        parents=native["parents"],
        local_translation=native["local_translation"],
    )
    # the foreign rig's tpose lives in the rotated frame too: its root
    # rest rotation is R (the same frame change baked into the motion)
    J2 = len(foreign["node_names"])
    src_tpose = np.broadcast_to(np.array([1.0, 0, 0, 0]), (J2, 4)).copy()
    s, c = np.sin(np.pi / 4), np.cos(np.pi / 4)
    src_tpose[0] = np.array([c, 0.0, 0.0, s])
    retargeted = retarget_motion(
        foreign,
        target_skel,
        joint_mapping={rename[n]: n for n in native["node_names"]},
        rotation_to_target=R_back,
        scale_to_target=0.5,
        source_tpose_local_rot=src_tpose,
    )
    return native, retargeted


def test_retarget_recovers_local_rotations(clips):
    native, ret = clips
    assert ret["local_rot"].shape == native["local_rot"].shape
    # quaternion equality up to sign
    q0, q1 = native["local_rot"], ret["local_rot"]
    dot = np.abs(np.sum(q0 * q1, axis=-1))
    assert dot.min() > 0.995, dot.min()


def test_retarget_recovers_root_trajectory(clips):
    native, ret = clips
    # grounding may shift z by a constant; compare relative trajectory
    d_native = native["root_pos"] - native["root_pos"][0]
    d_ret = ret["root_pos"] - ret["root_pos"][0]
    np.testing.assert_allclose(d_ret, d_native, atol=2e-3)


def test_retargeted_clip_matches_native_amp_features(clips):
    native, ret = clips
    import jax

    lib_native = MotionLib([CLIP])
    lib_ret = MotionLib([ret])
    key = jax.random.PRNGKey(0)
    demo_n = np.asarray(lib_native.amp_obs_demo(key, 64, env_dt=1.0 / 30))
    demo_r = np.asarray(lib_ret.amp_obs_demo(key, 64, env_dt=1.0 / 30))
    # identical sampling keys -> same (motion, time) draws; the AMP
    # features (root h, rotations, velocities, dof pos/vel, key bodies)
    # must agree closely — this is the "discriminator parity" criterion:
    # a discriminator cannot separate distributions that coincide
    err = np.abs(demo_n - demo_r)
    assert np.median(err) < 2e-2, np.median(err)
    assert np.quantile(err, 0.95) < 0.25, np.quantile(err, 0.95)


def test_retargeted_clip_trains_amp_discriminator():
    """End-to-end: MotionLib on a retargeted clip feeds the AMP learner
    (discriminator sees features of the same dimension and learns)."""
    native = load_skeleton_motion(CLIP)
    foreign, R_back, rename = _make_foreign_clip(native)
    target_skel = dict(
        node_names=native["node_names"],
        parents=native["parents"],
        local_translation=native["local_translation"],
    )
    ret = retarget_motion(
        foreign, target_skel,
        joint_mapping={rename[n]: n for n in native["node_names"]},
        rotation_to_target=R_back, scale_to_target=0.5,
    )
    import jax

    lib = MotionLib([ret])
    demo = lib.amp_obs_demo(jax.random.PRNGKey(1), 256, env_dt=1.0 / 30)
    assert demo.shape == (256, 210)
    assert np.all(np.isfinite(np.asarray(demo)))

"""From-scratch binary FBX importer (learn/fbx.py) against the reference's
own CMU mocap exports and tpose (tasks/amp/poselib/data) — the ingestion
path the reference implements via the closed Autodesk FBX SDK
(poselib/skeleton/backend/fbx/fbx_backend.py)."""

import os

import numpy as np
import pytest

DATA = "/root/reference/isaacgymenvs/tasks/amp/poselib/data"
WALK_FBX = os.path.join(DATA, "07_01_cmu.fbx")
CMU_TPOSE = os.path.join(DATA, "cmu_tpose.npy")
AMP_TPOSE = os.path.join(DATA, "amp_humanoid_tpose.npy")
REF_WALK = "/root/reference/assets/amp/motions/amp_humanoid_walk.npy"

pytestmark = pytest.mark.skipif(
    not os.path.exists(WALK_FBX), reason="reference CMU fbx assets absent"
)


@pytest.fixture(scope="module")
def walk():
    from handarm_tpu.learn.fbx import load_fbx_motion

    return load_fbx_motion(WALK_FBX)


def test_fbx_skeleton_matches_cmu_tpose(walk):
    """Node set and topology match the reference's exported CMU tpose
    skeleton exactly; bone offsets agree to inter-subject tolerance."""
    d = np.load(CMU_TPOSE, allow_pickle=True).item()
    tn = [str(n) for n in d["skeleton_tree"]["node_names"]]
    assert set(tn) == set(walk["node_names"])
    assert walk["node_names"][0] == "Hips"
    assert walk["fps"] == 120.0  # native CMU export rate, auto-detected
    assert walk["local_rot"].shape[0] > 300  # ~2.6 s clip
    # bone lengths: same rig family, different capture subject -> close
    tl = np.asarray(d["skeleton_tree"]["local_translation"]["arr"])
    perm = [walk["node_names"].index(n) for n in tn]
    a = np.linalg.norm(tl[1:], axis=-1)
    b = np.linalg.norm(walk["local_translation"][perm][1:], axis=-1)
    assert np.abs(a - b).mean() < 0.2 * max(a.mean(), 1e-6)


def test_fbx_fk_is_rigid_and_upright(walk):
    """FK of the imported clip preserves bone lengths exactly over time and
    produces an upright walking figure (head above hips above feet)."""
    from handarm_tpu.learn.motion_lib import _skeleton_fk

    g_rot, g_pos = _skeleton_fk(
        walk["local_rot"], walk["root_pos"], walk["parents"],
        walk["local_translation"],
    )
    nm = walk["node_names"]
    lengths = np.linalg.norm(
        g_pos[:, 1:] - g_pos[:, walk["parents"][1:]], axis=-1
    )
    assert np.abs(lengths - lengths[0]).max() < 1e-9
    head = g_pos[:, nm.index("Head"), 2]
    hips = g_pos[:, nm.index("Hips"), 2]
    feet = g_pos[:, nm.index("LeftFoot"), 2]
    assert np.all(head > hips) and np.all(hips > feet)


def test_fbx_retargets_onto_amp_humanoid(walk):
    """Full pipeline fbx -> retarget(cmu config) -> amp humanoid clip:
    agrees with the reference's shipped walk clip (leg/torso local
    rotations within a few percent quaternion misalignment; same ground
    convention; comparable gait speed). Proves raw mocap can enter the
    AMP pipeline with no FBX SDK."""
    import json

    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    from fbx_to_motion import load_tpose

    from handarm_tpu.learn.fbx import load_fbx_motion
    from handarm_tpu.learn.motion_lib import load_skeleton_motion
    from handarm_tpu.learn.retarget import retarget_motion

    cfg = json.load(open(os.path.join(DATA, "configs/retarget_cmu_to_amp.json")))
    src = load_fbx_motion(WALK_FBX, fps=60)
    st, tt = load_tpose(CMU_TPOSE), load_tpose(AMP_TPOSE)
    perm = [st["node_names"].index(n) for n in src["node_names"]]
    r = np.asarray(cfg["rotation"])
    ret = retarget_motion(
        src,
        dict(node_names=tt["node_names"], parents=tt["parents"],
             local_translation=tt["local_translation"]),
        cfg["joint_mapping"],
        rotation_to_target=np.concatenate([r[3:4], r[:3]]),
        scale_to_target=cfg["scale"],
        source_tpose_local_rot=st["local_rot"][perm],
        target_tpose_local_rot=tt["local_rot"],
        root_height_offset=cfg.get("root_height_offset", 0.0),
    )
    ref = load_skeleton_motion(REF_WALK)
    assert ret["node_names"] == ref["node_names"]
    T = min(ref["local_rot"].shape[0], ret["local_rot"].shape[0])
    mis = []
    for off in range(ret["local_rot"].shape[0] - T + 1):
        d = 1.0 - np.abs(
            np.sum(ref["local_rot"][:T] * ret["local_rot"][off:off + T], -1)
        )
        mis.append(float(d.mean()))
    assert min(mis) < 0.06, min(mis)  # all-joints mean misalignment
    # same ground convention: root rides at standing height
    assert 0.7 < ret["root_pos"][:, 2].mean() < 1.1
    # comparable gait speed
    v_ref = np.linalg.norm(
        np.diff(ref["root_pos"][:, :2], axis=0), axis=-1
    ).mean() * ref["fps"]
    v_ret = np.linalg.norm(
        np.diff(ret["root_pos"][:, :2], axis=0), axis=-1
    ).mean() * ret["fps"]
    assert abs(v_ref - v_ret) < 0.4 * v_ref, (v_ref, v_ret)


def test_fbx_clip_feeds_motion_lib(walk, tmp_path):
    """fbx_to_motion.py output round-trips through the npz loader and
    MotionLib serves finite AMP demo features from it."""
    import subprocess
    import sys

    out = tmp_path / "clip.npz"
    r = subprocess.run(
        [sys.executable, "scripts/fbx_to_motion.py", WALK_FBX, str(out),
         "--fps", "60", "--retarget-config",
         os.path.join(DATA, "configs/retarget_cmu_to_amp.json"),
         "--data-root", DATA],
        capture_output=True, text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import jax

    from handarm_tpu.learn.motion_lib import MotionLib, load_clip_npz

    clip = load_clip_npz(str(out))
    lib = MotionLib([clip])
    demo = np.asarray(
        lib.amp_obs_demo(jax.random.PRNGKey(0), 32, env_dt=1.0 / 30)
    )
    assert np.all(np.isfinite(demo))
    assert demo.std() > 0.01

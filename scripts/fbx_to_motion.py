"""Convert a raw binary .fbx mocap clip into a MotionLib-ready .npz clip,
optionally retargeting it through a poselib-style retarget config.

Replaces the reference's fbx_importer.py + retarget_motion.py pair
(tasks/amp/poselib/) without the Autodesk FBX SDK: the from-scratch
binary-FBX reader (handarm_tpu/learn/fbx.py) feeds the numpy retarget
(handarm_tpu/learn/retarget.py).

Usage:
  # import only (source-skeleton motion dict)
  python scripts/fbx_to_motion.py clip.fbx out.npz

  # import + retarget via a reference-format json config
  python scripts/fbx_to_motion.py clip.fbx out.npz \
      --retarget-config data/configs/retarget_cmu_to_amp.json \
      --data-root /root/reference/isaacgymenvs/tasks/amp/poselib/data

The json config format is the reference's (joint_mapping, rotation xyzw,
scale, root_height_offset, trim_frame_beg/end, source/target tpose npys).
Output .npz holds the load_skeleton_motion dict fields; load with
handarm_tpu.learn.motion_lib.load_clip_npz or pass the dict to MotionLib.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_tpose(path):
    """poselib SkeletonState tpose npy -> skeleton dict + local rots."""
    from handarm_tpu.learn.motion_lib import _xyzw_to_wxyz
    from handarm_tpu.learn.retarget import _global_to_local

    d = np.load(path, allow_pickle=True).item()
    tree = d["skeleton_tree"]
    rot = _xyzw_to_wxyz(np.asarray(d["rotation"]["arr"], np.float64))
    parents = np.asarray(tree["parent_indices"]["arr"])
    if not bool(d["is_local"]):
        rot = _global_to_local(rot[None], parents)[0]
    return dict(
        node_names=[str(n) for n in tree["node_names"]],
        parents=parents,
        local_translation=np.asarray(
            tree["local_translation"]["arr"], np.float64
        ),
        local_rot=rot,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("fbx")
    ap.add_argument("out")
    ap.add_argument("--fps", type=float, default=None,
                    help="resample rate (default: file-native)")
    ap.add_argument("--root-name", default=None)
    ap.add_argument("--retarget-config", default=None)
    ap.add_argument("--data-root", default=None,
                    help="directory the config's tpose paths resolve in")
    args = ap.parse_args()

    from handarm_tpu.learn.fbx import load_fbx_motion

    motion = load_fbx_motion(args.fbx, fps=args.fps, root_name=args.root_name)
    print(
        f"imported {args.fbx}: {motion['local_rot'].shape[0]} frames, "
        f"{len(motion['node_names'])} joints @ {motion['fps']:.0f} fps "
        f"(root {motion['node_names'][0]})"
    )

    if args.retarget_config:
        from handarm_tpu.learn.retarget import retarget_motion

        cfg = json.load(open(args.retarget_config))
        root = args.data_root or os.path.dirname(args.retarget_config)

        def resolve(p):
            return p if os.path.isabs(p) else os.path.join(
                root, p.removeprefix("data/")
            )

        src_tp = load_tpose(resolve(cfg["source_tpose"]))
        tgt_tp = load_tpose(resolve(cfg["target_tpose"]))
        # source tpose local rots, permuted into the fbx clip's node order
        perm = [src_tp["node_names"].index(n) for n in motion["node_names"]]
        rxyzw = np.asarray(cfg["rotation"], np.float64)
        motion = retarget_motion(
            motion,
            dict(
                node_names=tgt_tp["node_names"],
                parents=tgt_tp["parents"],
                local_translation=tgt_tp["local_translation"],
            ),
            joint_mapping=cfg["joint_mapping"],
            rotation_to_target=np.concatenate([rxyzw[3:4], rxyzw[:3]]),
            scale_to_target=float(cfg["scale"]),
            source_tpose_local_rot=src_tp["local_rot"][perm],
            target_tpose_local_rot=tgt_tp["local_rot"],
            root_height_offset=float(cfg.get("root_height_offset", 0.0)),
        )
        beg = int(cfg.get("trim_frame_beg", 0))
        end = int(cfg.get("trim_frame_end", -1))
        if end == -1:
            end = motion["local_rot"].shape[0]
        for k in ("local_rot", "root_pos", "global_vel", "global_ang_vel"):
            motion[k] = motion[k][beg:end]
        print(
            f"retargeted -> {len(motion['node_names'])} joints, trimmed "
            f"[{beg}:{end}] -> {motion['local_rot'].shape[0]} frames"
        )

    np.savez(
        args.out,
        **{
            k: (np.asarray(v) if not isinstance(v, list) else np.array(v))
            for k, v in motion.items()
        },
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

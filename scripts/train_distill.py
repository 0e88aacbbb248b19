"""Flagship teacher->student distillation run (VERDICT r3 item 4).

Mirrors the reference CPD workflow
(cfg/train/HandArmTaskMultiObjectManipulationCPD.yaml:1-90 + cpd DAggerAgent,
train.py:102-105): a privileged PPO teacher trained on the full state
observation set supervises a pointcloud student that only sees deployable
observations (proprioception + target-object synthetic pointcloud), with
beta-mixed DAgger rollouts collected in the SAME vectorized env.

Usage:
  python scripts/train_distill.py \
      --teacher runs/lift_teacher/nn/best_0.npz \
      --task Ur5SihLift --iters 800 --envs 8192 --out runs/distill_a
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher", required=True, help="teacher ckpt .npz")
    ap.add_argument("--task", default="Ur5SihLift")
    ap.add_argument("--envs", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="runs/distill")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--beta-decay-iters", type=int, default=400)
    ap.add_argument(
        "--student-obs",
        default=(
            "ur5_joint_pos,ur5_flange_pose,dof_position_targets,"
            "target_object_synthetic_pointcloud,target_object_to_goal_pos"
        ),
        help=(
            "deployable observation list (reference CPD student: proprio + "
            "goal + synthetic pointclouds, cfg yaml observations block)"
        ),
    )
    args = ap.parse_args()

    from handarm_tpu.utils.jaxinit import force_platform, setup_cache

    force_platform(args.platform)
    setup_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from handarm_tpu.envs.registry import compose_task
    from handarm_tpu.learn.distill import DAgger, DistillConfig
    from handarm_tpu.learn.ppo import PPO, PPOConfig
    from handarm_tpu.utils.checkpoint import load_checkpoint

    # 1. teacher env/policy exactly as trained (task defaults + yaml)
    teacher_env, ppo_overrides = compose_task(
        args.task, [f"num_envs={args.envs}"]
    )
    if "hidden" in ppo_overrides and not isinstance(
        ppo_overrides["hidden"], tuple
    ):
        ppo_overrides["hidden"] = tuple(ppo_overrides["hidden"])
    teacher = PPO(teacher_env, PPOConfig(**ppo_overrides))
    teacher_ts = teacher.init(jax.random.PRNGKey(args.seed))
    teacher_ts = load_checkpoint(args.teacher, example_tree=teacher_ts)
    print(f"teacher loaded from {args.teacher}", flush=True)

    # 2. student env: same scene/task, deployable obs; the teacher's
    # observation list becomes the env's teacher_observations so both
    # vectors come out of one env step
    student_obs = tuple(s for s in args.student_obs.split(",") if s)
    cloud_keys = tuple(s for s in student_obs if "pointcloud" in s)
    from handarm_tpu.envs.hand_arm import HandArmEnv

    # cloud observables are dict-typed (key=name): they must stay in the
    # requested observation list to be computed, but they land in
    # res.obs_dict rather than the flat obs vector
    env = HandArmEnv(
        dataclasses.replace(
            teacher_env.cfg,
            observations=student_obs,
            teacher_observations=teacher_env.cfg.observations,
        )
    )

    # aux regression targets sliced from the teacher obs (reference CPD
    # auxiliary block: predict privileged quantities from the encoding)
    aux = {}
    layout = getattr(env, "teacher_obs_slices", {}) or {}
    for name in ("target_object_pos", "object_pos", "sih_fingertip_pos"):
        if name in layout:
            aux[name] = tuple(layout[name])

    dagger = DAgger(
        env, teacher, teacher_ts,
        DistillConfig(
            horizon=16, minibatch_size=min(32768, args.envs * 4),
            mini_epochs=2, beta_decay_iters=args.beta_decay_iters,
            cloud_keys=cloud_keys,
        ),
        aux_from_obs=aux,
    )
    ds = dagger.init(jax.random.PRNGKey(args.seed + 1))
    train_iter = jax.jit(dagger.train_iter)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "config.yaml"), "w") as f:
        f.write(
            f"task: {args.task}\nteacher: {args.teacher}\n"
            f"envs: {args.envs}\niters: {args.iters}\nseed: {args.seed}\n"
            f"student_obs: {list(student_obs)}\naux: {list(aux)}\n"
        )
    metrics_path = os.path.join(args.out, "metrics.jsonl")
    t_start = time.time()
    pending = None
    with open(metrics_path, "a") as mf:
        for it in range(args.iters):
            ds, stats = train_iter(ds)
            if (it + 1) % 10 == 0 or it == args.iters - 1:
                s = {k: float(v) for k, v in jax.device_get(stats).items()}
                row = dict(step=it + 1, t=round(time.time() - t_start, 1), **s)
                mf.write(json.dumps(row) + "\n")
                mf.flush()
                print(row, flush=True)
    # save student params
    import numpy as np

    flat, treedef = jax.tree_util.tree_flatten(jax.device_get(ds.params))
    np.savez(os.path.join(args.out, "student.npz"),
             **{str(i): np.asarray(x) for i, x in enumerate(flat)})
    print("saved student to", os.path.join(args.out, "student.npz"), flush=True)


if __name__ == "__main__":
    main()

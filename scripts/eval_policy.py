"""Deterministic policy evaluation: success rate over N completed episodes.

Works for both PPO checkpoints (mean action head) and distilled pointcloud
students (scripts/train_distill.py student.npz). The metric is
total_successes / total_resets accumulated in device state over the eval
horizon — the same counters the trainer's EWMA integrates (reference eval
criterion: success rate of the deployed deterministic policy,
multi_object_manipulation.py:316-351).

Usage:
  python scripts/eval_policy.py --ckpt runs/lift/nn/best_0.npz --task Ur5SihLift
  python scripts/eval_policy.py --student runs/distill/student.npz \
      --teacher docs/evidence/lift_r3a/best_0.npz --task Ur5SihLift
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="PPO checkpoint .npz")
    ap.add_argument("--student", default=None, help="distill student .npz")
    ap.add_argument("--teacher", default=None,
                    help="teacher ckpt (student mode: defines obs/arch)")
    ap.add_argument("--task", default="Ur5SihLift")
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=600,
                    help="control steps (600 = 3 episodes of 200)")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--platform", default=None)
    ap.add_argument(
        "--student-obs",
        default=(
            "ur5_joint_pos,ur5_flange_pose,dof_position_targets,"
            "target_object_synthetic_pointcloud,target_object_to_goal_pos"
        ),
    )
    args = ap.parse_args()

    from handarm_tpu.utils.jaxinit import force_platform, setup_cache

    force_platform(args.platform)
    setup_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from handarm_tpu.envs.registry import compose_task
    from handarm_tpu.learn.ppo import PPO, PPOConfig
    from handarm_tpu.utils.checkpoint import load_checkpoint

    # env.num_envs: the yaml-composition path (tasks with a config group,
    # e.g. Ur5SihMultiObjectManipulation) rejects bare top-level keys
    teacher_env, ppo_over = compose_task(
        args.task, [f"env.num_envs={args.envs}"]
    )
    if "hidden" in ppo_over and not isinstance(ppo_over["hidden"], tuple):
        ppo_over["hidden"] = tuple(ppo_over["hidden"])

    if args.student:
        # rebuild the student env/net exactly as train_distill.py did
        from handarm_tpu.envs.hand_arm import HandArmEnv
        from handarm_tpu.learn.distill import DAgger, DistillConfig

        student_obs = tuple(s for s in args.student_obs.split(",") if s)
        cloud_keys = tuple(s for s in student_obs if "pointcloud" in s)
        env = HandArmEnv(
            dataclasses.replace(
                teacher_env.cfg,
                observations=student_obs,
                teacher_observations=teacher_env.cfg.observations,
            )
        )
        teacher = PPO(teacher_env, PPOConfig(**ppo_over))
        teacher_ts = teacher.init(jax.random.PRNGKey(0))
        teacher_ts = load_checkpoint(args.teacher, example_tree=teacher_ts)
        aux = {}
        layout = getattr(env, "teacher_obs_slices", {}) or {}
        for name in ("target_object_pos", "object_pos", "sih_fingertip_pos"):
            if name in layout:
                aux[name] = tuple(layout[name])
        dagger = DAgger(
            env, teacher, teacher_ts,
            DistillConfig(cloud_keys=cloud_keys), aux_from_obs=aux,
        )
        ds = dagger.init(jax.random.PRNGKey(args.seed))
        data = np.load(args.student, allow_pickle=False)
        flat = [data[str(i)] for i in range(len(data.files))]
        params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(ds.params), flat
        )

        def policy(obs, obs_dict):
            mu, _ = dagger.net.apply(params, obs, obs_dict)
            return mu
    else:
        env = teacher_env
        ppo = PPO(env, PPOConfig(**ppo_over))
        ts = load_checkpoint(args.ckpt, example_tree=ppo.init(
            jax.random.PRNGKey(0)))

        def policy(obs, obs_dict):
            mu, _, _ = ppo._policy_value(
                ts, ts.params, obs, jnp.zeros((obs.shape[0], 0))
            )
            return mu

    if hasattr(env, "ensure_initial_pool"):
        env.ensure_initial_pool()
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(args.seed))

    @jax.jit
    def tick(state, obs, obs_dict):
        a = policy(obs, obs_dict)
        state, res = env.step(state, a)
        return state, res

    # one zero-action step to materialize obs_dict (cloud observables ride
    # the step result, not reset)
    zero = jnp.zeros((args.envs, env.num_actions), jnp.float32)
    state, res = jax.jit(env.step)(state, zero)

    # burn-in one full episode so the counters only see policy-driven
    # episodes from a policy-conditioned state distribution
    ep = env.cfg.episode_length
    for t in range(args.steps + ep):
        state, res = tick(state, res.obs, res.obs_dict)
        if t == ep - 1:
            # zero the counters after burn-in
            mets = state.metrics._replace(
                total_resets=jnp.zeros(()), total_successes=jnp.zeros(())
            )
            state = state._replace(metrics=mets)
    m = jax.device_get(state.metrics)
    rate = float(m.total_successes) / max(float(m.total_resets), 1.0)
    out = {
        "task": args.task,
        "policy": args.student or args.ckpt,
        "episodes": int(m.total_resets),
        "successes": int(m.total_successes),
        "success_rate": round(rate, 4),
        "success_ewma": round(float(m.success_ewma), 4),
        "per_object_ewma": [round(float(x), 4) for x in
                            np.atleast_1d(m.per_object_ewma)],
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

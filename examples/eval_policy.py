"""Evaluate a trained checkpoint: deterministic policy rollouts, success
rate over full episodes.

Usage:
  python examples/eval_policy.py runs/lift_r2b/nn/ckpt_1000.npz \
      [--task Ur5SihLift] [--envs 512] [--episodes 2] [--platform cpu]

Reports end-of-episode success fraction (goal reached at any point during
the episode, the reference's latched criterion) and mean episode reward.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--task", default="Ur5SihLift")
    ap.add_argument("--envs", type=int, default=512)
    ap.add_argument("--episodes", type=int, default=1)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument(
        "--record", metavar="DIR", default=None,
        help="write per-env depth/segmentation mp4s from the camera "
        "pipeline into DIR (hand-arm tasks; use a small --envs — the "
        "camera renders the whole batch)",
    )
    ap.add_argument(
        "--record-envs", type=int, default=1,
        help="how many envs to record (ids 0..N-1)",
    )
    ap.add_argument(
        "--set", action="append", default=[], metavar="KEY=VAL",
        help="extra registry overrides, e.g. env.solver_prep_dtype=bf16",
    )
    args = ap.parse_args(argv)

    from handarm_tpu.utils.jaxinit import force_platform, setup_cache

    import jax
    import jax.numpy as jnp
    import numpy as np

    force_platform(args.platform)
    setup_cache()

    from handarm_tpu.envs.registry import make_env
    from handarm_tpu.learn.ppo import PPO, PPOConfig
    from handarm_tpu.utils.checkpoint import load_checkpoint

    env, ppo_over = make_env(
        args.task, [f"env.num_envs={args.envs}"] + list(args.set)
    )

    recorder = None
    if args.record:
        import dataclasses

        from handarm_tpu.envs.camera import CameraConfig
        from handarm_tpu.envs.hand_arm import HandArmEnv
        from handarm_tpu.utils.visualization import CameraRecorder

        if not isinstance(env, HandArmEnv):
            raise SystemExit("--record supports hand-arm tasks only")
        if not env.cfg.cameras:
            # inject the default overhead camera (reference topview)
            env = HandArmEnv(
                dataclasses.replace(env.cfg, cameras=(CameraConfig(),))
            )
        recorder = CameraRecorder(
            env, args.record, env_ids=range(args.record_envs)
        )

    ppo = PPO(env, PPOConfig(**ppo_over))
    ts = ppo.init(jax.random.PRNGKey(args.seed))
    ts = load_checkpoint(args.checkpoint, example_tree=ts)
    print(f"loaded {args.checkpoint}")

    @jax.jit
    def policy_step(ts, env_state, obs):
        mu, _, _ = ppo._policy_value(
            ts, ts.params, obs, jnp.zeros((obs.shape[0], 0))
        )
        env_state, res = env.step(env_state, mu)  # deterministic (mean)
        return env_state, res

    horizon = env.cfg.episode_length
    total_succ, total_eps, total_rew = 0.0, 0.0, 0.0
    key = jax.random.PRNGKey(args.seed + 1)
    for ep in range(args.episodes):
        key, k = jax.random.split(key)
        env_state, obs = env.reset(k)
        # align clocks so every env runs one full episode
        env_state = env_state._replace(
            task=env_state.task._replace(
                progress=jnp.zeros(args.envs, jnp.int32)
            )
        ) if hasattr(env_state, "task") else env_state
        succ = jnp.zeros(args.envs, bool)
        rew = jnp.zeros(args.envs)
        for t in range(horizon):
            env_state, res = policy_step(ts, env_state, obs)
            obs = res.obs
            rew = rew + res.reward
            if hasattr(env_state, "task"):
                succ = succ | env_state.task.goal_reached_before
            if recorder is not None:
                for p in recorder.add(env_state, done=res.done):
                    print(f"wrote {p}", flush=True)
        sr = float(jnp.mean(succ.astype(jnp.float32)))
        mr = float(jnp.mean(rew))
        print(f"episode {ep}: success_rate={sr:.3f} mean_return={mr:.2f}",
              flush=True)
        total_succ += sr
        total_rew += mr
        total_eps += 1
    print(
        f"FINAL success_rate={total_succ / total_eps:.3f} "
        f"mean_return={total_rew / total_eps:.2f} "
        f"({args.envs} envs x {args.episodes} episodes)"
    )


if __name__ == "__main__":
    main(sys.argv[1:])

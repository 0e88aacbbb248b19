"""Training entry point: `python train.py [task=Ur5SihLift] [key=value ...]`.

The analog of the reference's hydra train.py (isaacgymenvs/train.py:71-230),
without the Hydra dependency: yaml config composition + key=value overrides
via handarm_tpu.utils.config. The full PPO iteration (rollout + SGD) is one
jitted function; multi-device runs shard envs over the mesh data axis.

Examples:
  python train.py                                # lift task, defaults
  python train.py env.num_envs=2048 ppo.horizon=32
  python train.py task=Ur5SihReposition max_iterations=500
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main(argv):
    overrides = [a for a in argv if "=" in a]
    kv = dict(o.split("=", 1) for o in overrides)
    task = kv.pop("task", "Ur5SihLift")
    wandb_project = kv.pop("wandb_project", None)
    platform = kv.pop("platform", None)
    max_iterations = int(kv.pop("max_iterations", 1000))
    seed = int(kv.pop("seed", 42))
    exp_name = kv.pop("experiment", task)
    resume = kv.pop("resume", "")  # "" | "auto" | path to a ckpt .npz
    save_every = int(kv.pop("save_every", 100))

    from handarm_tpu.utils.jaxinit import force_platform, setup_cache

    import jax

    force_platform(platform)
    setup_cache()

    from handarm_tpu.envs.registry import compose_task
    from handarm_tpu.learn.ppo import PPO, PPOConfig
    from handarm_tpu.parallel.mesh import make_mesh, shard_train_state
    from handarm_tpu.utils.logging import MetricsLogger

    # yaml config-group composition (reference hydra cfg/ groups): registry
    # defaults < configs/task/<task>.yaml < configs/train/<task>PPO.yaml <
    # CLI key=value overrides. `task=` also accepts a yaml path directly.
    env, ppo_overrides = compose_task(
        task, [f"{k}={v}" for k, v in kv.items()]
    )
    if "hidden" in ppo_overrides and not isinstance(
        ppo_overrides["hidden"], tuple
    ):
        ppo_overrides["hidden"] = tuple(ppo_overrides["hidden"])
    ppo = PPO(env, PPOConfig(**ppo_overrides))

    run_dir = os.path.join("runs", exp_name)
    os.makedirs(run_dir, exist_ok=True)
    logger = MetricsLogger(
        run_dir, wandb_project=wandb_project, experiment=exp_name
    )

    key = jax.random.PRNGKey(seed)
    ts = ppo.init(key)
    start_it = 0
    if resume:
        from handarm_tpu.utils.checkpoint import load_checkpoint

        path = resume
        if resume == "auto":
            # newest periodic checkpoint in this run dir, if any
            import glob

            cands = [
                p for p in glob.glob(os.path.join(run_dir, "nn", "ckpt_*.npz"))
                if "best" not in p
            ]
            path = max(
                cands,
                key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]),
                default="",
            )
        if path:
            ts = load_checkpoint(path, example_tree=ts)
            start_it = int(path.rsplit("_", 1)[1].split(".")[0])
            print(f"resumed from {path} at iter {start_it}")
    mesh = make_mesh()
    if mesh.devices.size > 1:
        ts = shard_train_state(mesh, ts)
    train_iter = jax.jit(ppo.train_iter)

    steps_per_iter = env.cfg.num_envs * ppo.cfg.horizon
    print(
        f"task={task} envs={env.cfg.num_envs} obs={env.num_obs} "
        f"act={env.num_actions} devices={mesh.devices.size} "
        f"steps/iter={steps_per_iter}"
    )
    from handarm_tpu.utils.checkpoint import save_checkpoint

    best_reward = float("-inf")
    t_start = time.time()
    for it in range(start_it, max_iterations):
        t0 = time.time()
        ts, stats = train_iter(ts)
        stats = {k: float(v) for k, v in stats.items()}
        dt = time.time() - t0
        stats["env_steps_per_s"] = steps_per_iter / dt
        stats["total_env_steps"] = (it + 1) * steps_per_iter
        logger.log(it, stats)
        if it % 10 == 0 or it == max_iterations - 1:
            print(
                f"it {it:5d} | {stats['env_steps_per_s']:>10,.0f} sps | "
                f"rew {stats['reward_mean']:.4f} | kl {stats['kl']:.4f} | "
                f"lr {stats['lr']:.2e} | succ {stats['success_rate_ewma']:.3f}",
                flush=True,
            )
        # periodic + best checkpoints (reference rl_games save_frequency /
        # save_best_after behavior)
        if (it + 1) % save_every == 0:
            save_checkpoint(os.path.join(run_dir, "nn"), ts, step=it + 1)
        if it > 50 and stats["reward_mean"] > best_reward:
            best_reward = stats["reward_mean"]
            save_checkpoint(os.path.join(run_dir, "nn"), ts, step=0, name="best")
    print(f"done in {time.time()-t_start:.0f}s")
    logger.close()
    save_checkpoint(os.path.join(run_dir, "nn"), ts, step=max_iterations)


if __name__ == "__main__":
    main(sys.argv[1:])

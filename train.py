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


_PBT_MUTABLE = (
    "learning_rate", "e_clip", "kl_threshold", "entropy_coef", "reward_scale"
)


def pbt_restart_argv(argv, new_hparams: dict) -> list[str]:
    """Rebuild the train.py argv for a PBT full-process restart (reference
    pbt.py:123-177 restarts via os.execv with the winner's checkpoint and
    mutated hyperparameters): drop stale ppo.<mutable> and resume=
    overrides, append the mutated values, resume from the newest periodic
    checkpoint (which the caller just wrote with the donor's weights)."""
    stale = {f"ppo.{k}" for k in new_hparams} | {"resume"}
    kept = [a for a in argv if a.split("=", 1)[0] not in stale]
    return kept + [f"ppo.{k}={v}" for k, v in new_hparams.items()] + [
        "resume=auto"
    ]


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
    # PBT surface (reference pbt/pbt.py observer, enabled via pbt.* keys):
    # population exchange through a shared-FS workspace + full-process
    # exec restart when this policy is a replacement candidate.
    pbt_kv = {k[4:]: v for k, v in kv.items() if k.startswith("pbt.")}
    for k in list(kv):
        if k.startswith("pbt."):
            kv.pop(k)

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
    mesh = make_mesh()
    # lay the SGD phase out over the data mesh (shard-local minibatching;
    # see PPOConfig.data_shards)
    ppo_overrides.setdefault("data_shards", mesh.devices.size)
    ppo = PPO(env, PPOConfig(**ppo_overrides))

    run_dir = os.path.join("runs", exp_name)
    os.makedirs(run_dir, exist_ok=True)
    # snapshot the fully-resolved config for reproducibility (reference
    # train.py:213-219 dumps the hydra config into the experiment dir)
    import dataclasses

    import yaml

    with open(os.path.join(run_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(
            {
                "task": task,
                "experiment": exp_name,
                "seed": seed,
                "max_iterations": max_iterations,
                "cli_overrides": {k: str(v) for k, v in kv.items()},
                "env": {
                    k: (list(v) if isinstance(v, tuple) else v)
                    for k, v in dataclasses.asdict(env.cfg).items()
                    if isinstance(v, (int, float, str, bool, tuple, list))
                },
                "ppo_overrides": {
                    k: (list(v) if isinstance(v, tuple) else v)
                    for k, v in ppo_overrides.items()
                },
            },
            f, sort_keys=False,
        )
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

    pbt_cfg = None
    if pbt_kv:
        import numpy as np

        from handarm_tpu.parallel.pbt import PbtConfig, pbt_step

        pbt_objective_key = pbt_kv.pop("objective", "success_rate_ewma")
        pbt_cfg = PbtConfig(
            workspace=pbt_kv.pop(
                "workspace", os.path.join("runs", exp_name, "pbt_workspace")
            ),
            policy_idx=int(pbt_kv.pop("policy_idx", 0)),
            num_policies=int(pbt_kv.pop("num_policies", 8)),
            interval_steps=int(float(pbt_kv.pop("interval_steps", 10_000_000))),
            **{k: float(v) for k, v in pbt_kv.items()},
        )
        pbt_rng = np.random.default_rng(seed * 997 + pbt_cfg.policy_idx)
        pbt_hparams = {
            k: float(getattr(ppo.cfg, k)) for k in _PBT_MUTABLE
        }
        pbt_last_interval = (start_it * steps_per_iter) // pbt_cfg.interval_steps

    best_reward = float("-inf")
    last_best_it = -(10**9)
    t_start = time.time()
    # metrics are logged one iteration behind: the device arrays from
    # iteration i are fetched (ONE batched device_get, not one sync per
    # metric — each float() is a full round trip through the remote TPU
    # tunnel) only after iteration i+1 has been dispatched, so the
    # readback and the host-side TB/jsonl writes overlap device compute.
    # Measured: 116K -> ~250K env-steps/s end-to-end at 8192 envs.
    pending = None  # (it, device stats, dispatch wall-clock)

    def drain(next_t0):
        """Fetch + finalize the pending iteration's stats (single batched
        device_get)."""
        p_it, p_stats, p_t0 = pending
        s = {k: float(v) for k, v in jax.device_get(p_stats).items()}
        s["env_steps_per_s"] = steps_per_iter / max(next_t0 - p_t0, 1e-9)
        s["total_env_steps"] = (p_it + 1) * steps_per_iter
        return p_it, s

    for loop_it in range(start_it, max_iterations):
        t0 = time.time()
        # params after exactly `loop_it` iterations: the drained stats below
        # belong to iteration loop_it-1, so a checkpoint named step=loop_it
        # must hold THESE params, not the post-update ts (resume would
        # otherwise re-apply an already-applied iteration).
        ts_at_loop_it = ts
        ts, stats_d = train_iter(ts)
        if pending is None:
            # first iteration: force completion for an honest timing base
            jax.block_until_ready(stats_d["kl"])
            pending = (loop_it, stats_d, t0)
            continue
        it, stats = drain(t0)
        pending = (loop_it, stats_d, t0)
        logger.log(it, stats)
        if pbt_cfg is not None:
            frames = int(stats["total_env_steps"])
            if frames // pbt_cfg.interval_steps > pbt_last_interval:
                pbt_last_interval = frames // pbt_cfg.interval_steps
                objective = float(
                    stats.get(pbt_objective_key, stats["reward_mean"])
                )
                new_ts, new_hp, restarted = pbt_step(
                    pbt_cfg, ts, pbt_hparams, frames, objective,
                    example_tree=ts, rng=pbt_rng,
                )
                if restarted:
                    # reference semantics (pbt.py:123-177): write the
                    # donor's weights as our newest periodic checkpoint,
                    # then replace the process image with a restart that
                    # resumes from it under the mutated hyperparameters.
                    save_checkpoint(
                        os.path.join(run_dir, "nn"), new_ts, step=it + 1,
                        sync=True,  # execv below must see the file on disk
                    )
                    new_argv = pbt_restart_argv(argv, new_hp)
                    print(
                        f"[pbt] policy {pbt_cfg.policy_idx} restarts from "
                        f"donor at iter {it + 1}: {new_hp}", flush=True,
                    )
                    logger.close()
                    os.execv(
                        sys.executable,
                        [sys.executable, os.path.abspath(__file__)] + new_argv,
                    )
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
            save_checkpoint(
                os.path.join(run_dir, "nn"), ts_at_loop_it, step=it + 1
            )
        if (
            it > 50
            and stats["reward_mean"] > best_reward
            # throttle: early training improves on MOST iterations; saving
            # "best" each time puts a param fetch + npz write on every
            # iteration (the dominant stall on fast small-batch tasks)
            and it - last_best_it >= 25
        ):
            best_reward = stats["reward_mean"]
            last_best_it = it
            save_checkpoint(
                os.path.join(run_dir, "nn"), ts_at_loop_it, step=0, name="best"
            )
    if pending is not None:
        it, stats = drain(time.time())
        logger.log(it, stats)
        print(
            f"it {it:5d} | {stats['env_steps_per_s']:>10,.0f} sps | "
            f"rew {stats['reward_mean']:.4f} | "
            f"succ {stats['success_rate_ewma']:.3f}",
            flush=True,
        )
    print(f"done in {time.time()-t_start:.0f}s")
    logger.close()
    save_checkpoint(
        os.path.join(run_dir, "nn"), ts, step=max_iterations, sync=True
    )


if __name__ == "__main__":
    main(sys.argv[1:])

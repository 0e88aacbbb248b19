"""Benchmark: UR5+SIH lift-task env throughput on the available device.

Prints progressive JSON lines (one per completed measurement, flushed
immediately); the LAST line is the headline number:
  {"metric": "env_steps_per_s", "value": N, "unit": "env-steps/s",
   "vs_baseline": N / 1e6}
vs_baseline is relative to the BASELINE.md north-star target of 1M
env-steps/s per chip at 8192 envs (the reference publishes no hand-arm
throughput; Isaac Gym paper single-A100 numbers are 150K-700K for
simpler tasks).

One env-step = one 20 Hz policy step = 3 sim steps x 2 substeps with full
contact solve (the reference's cadence: Ur5SihMultiObjectManipulation.yaml
controlFrequencyInv=3, Ur5SihBase.yaml dt=1/60 substeps=2).

Timeout-proofing (round-1 driver run died at rc=124 with no output):
- a small-shape (1024-env) result is printed and flushed BEFORE the
  full 8192-env run starts, so a partial run still yields a number;
- warmup/measure step counts are small; compile goes through the
  persistent cache in .jax_cache (pre-warmed during the build);
- all progress/diagnostics go to stderr, stdout carries ONLY JSON lines.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def emit(sps: float, envs: int, scene: str = "lift") -> None:
    rec = {
        "metric": "env_steps_per_s",
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / 1e6, 4),
        "envs": envs,
    }
    if scene != "lift":
        rec["scene"] = scene
    print(json.dumps(rec), flush=True)


def measure(envs: int, steps: int, warmup: int, scene: str = "lift",
            policy: str | None = None, overrides: list | None = None) -> float:
    import jax

    t0 = time.perf_counter()
    if scene == "multiobj":
        # the reference's centerpiece workload: bin of YCB objects,
        # C~372 contact slots (cfg/task/Ur5SihMultiObjectManipulation.yaml)
        from handarm_tpu.envs.registry import make_env

        env, ppo_over = make_env(
            "Ur5SihMultiObjectManipulation",
            [f"num_envs={envs}"] + list(overrides or []),
        )
    else:
        from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv

        cfg = HandArmConfig(num_envs=envs)
        env = HandArmEnv(cfg)
        ppo_over = {}

    key = jax.random.PRNGKey(0)
    if hasattr(env, "ensure_initial_pool"):
        # physics-accurate drop-settled piles: the bench must pay the same
        # contact density training pays (genesis runs OUTSIDE the timed
        # region — it is a once-per-process dataset build)
        env.ensure_initial_pool()
    state, obs = jax.jit(env.reset)(key)

    if policy:
        # trained-policy-in-the-loop: policy inference + env step per tick
        # (what a deployment/eval loop actually pays)
        import jax.numpy as jnp

        from handarm_tpu.learn.ppo import PPO, PPOConfig
        from handarm_tpu.utils.checkpoint import load_checkpoint

        ppo = PPO(env, PPOConfig(**ppo_over))
        ts = load_checkpoint(policy, example_tree=ppo.init(key))

        @jax.jit
        def step(state, obs):
            mu, _, _ = ppo._policy_value(
                ts, ts.params, obs, jnp.zeros((obs.shape[0], 0))
            )
            state, res = env.step(state, mu)
            return state, res

        carry = obs

        def tick(state, carry):
            state, res = step(state, carry)
            return state, res.obs, res

    else:
        step = jax.jit(env.step)
        k = jax.random.PRNGKey(1)
        carry = 0.1 * jax.random.normal(k, (envs, env.num_actions))

        def tick(state, carry):
            state, res = step(state, carry)
            return state, carry, res

    for _ in range(warmup):
        state, carry, res = tick(state, carry)
    jax.block_until_ready(res.reward)
    log(f"[bench] envs={envs} build+compile+warmup "
        f"{time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    for _ in range(steps):
        state, carry, res = tick(state, carry)
    jax.block_until_ready(res.reward)
    dt = time.perf_counter() - t0
    return envs * steps / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=int(os.environ.get("BENCH_ENVS", 8192)))
    p.add_argument("--steps", type=int, default=int(os.environ.get("BENCH_STEPS", 30)))
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--platform", default=None)
    p.add_argument("--scene", default="lift", choices=["lift", "multiobj"],
                   help="lift (default headline) or multiobj (C~372 slots)")
    p.add_argument("--skip-small", action="store_true",
                   help="skip the insurance small-shape measurement")
    p.add_argument("--policy", default=None, metavar="CKPT",
                   help="measure trained-policy-in-the-loop throughput "
                   "(policy inference + env step) with this checkpoint")
    p.add_argument("--override", action="append", default=[],
                   metavar="K=V", help="extra task config overrides "
                   "(e.g. solver_iterations=8); multiobj scene only")
    args = p.parse_args()

    from handarm_tpu.utils.jaxinit import force_platform, setup_cache

    import jax

    force_platform(args.platform)
    setup_cache()
    log(f"[bench] devices={jax.devices()}")

    if not args.skip_small and args.envs > 1024:
        try:
            sps = measure(1024, max(10, args.steps // 2), args.warmup,
                          args.scene, args.policy, args.override)
            emit(sps, 1024, args.scene)
        except Exception as e:  # insurance path must never kill the real run
            log(f"[bench] small-shape run failed: {e!r}")

    sps = measure(args.envs, args.steps, args.warmup, args.scene,
                  args.policy, args.override)
    emit(sps, args.envs, args.scene)


if __name__ == "__main__":
    main()

"""Benchmark: UR5+SIH lift-task env throughput on the available device.

Prints ONE JSON line:
  {"metric": "env_steps_per_s", "value": N, "unit": "env-steps/s",
   "vs_baseline": N / 1e6}
vs_baseline is relative to the BASELINE.md north-star target of 1M
env-steps/s per chip at 8192 envs (the reference publishes no hand-arm
throughput; Isaac Gym paper single-A100 numbers are 150K-700K for
simpler tasks).

One env-step = one 20 Hz policy step = 3 sim steps x 2 substeps with full
contact solve (the reference's cadence: Ur5SihMultiObjectManipulation.yaml
controlFrequencyInv=3, Ur5SihBase.yaml dt=1/60 substeps=2).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=int(os.environ.get("BENCH_ENVS", 8192)))
    p.add_argument("--steps", type=int, default=int(os.environ.get("BENCH_STEPS", 50)))
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    from handarm_tpu.utils.jaxinit import force_platform, setup_cache

    import jax

    force_platform(args.platform)
    setup_cache()
    import jax.numpy as jnp

    from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv

    cfg = HandArmConfig(num_envs=args.envs)
    env = HandArmEnv(cfg)

    key = jax.random.PRNGKey(0)
    state, obs = jax.jit(env.reset)(key)
    step = jax.jit(env.step)

    k = jax.random.PRNGKey(1)
    actions = 0.1 * jax.random.normal(k, (args.envs, env.num_actions))

    for _ in range(args.warmup):
        state, res = step(state, actions)
    jax.block_until_ready(res.reward)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, res = step(state, actions)
    jax.block_until_ready(res.reward)
    dt = time.perf_counter() - t0

    sps = args.envs * args.steps / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s",
                "value": round(sps, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(sps / 1e6, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

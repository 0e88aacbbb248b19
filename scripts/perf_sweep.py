"""Throughput sweep over solver configurations (run on the TPU while the
training job is paused).

Usage: python scripts/perf_sweep.py [--envs 8192] [--steps 30]

Measures env-steps/s of the lift task for each configuration and prints
one line per config. Follow up by setting the winner as the default.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def measure(envs, steps, warmup, **cfg_kw):
    import jax

    from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv

    t0 = time.perf_counter()
    env = HandArmEnv(HandArmConfig(num_envs=envs, **cfg_kw))
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    actions = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (envs, env.num_actions)
    )
    for _ in range(warmup):
        state, res = step(state, actions)
    jax.block_until_ready(res.reward)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(steps):
        state, res = step(state, actions)
    jax.block_until_ready(res.reward)
    dt = time.perf_counter() - t0
    return envs * steps / dt, compile_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=8192)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--multiobject", action="store_true")
    args = p.parse_args()

    import jax

    print("devices:", jax.devices(), flush=True)
    configs = [
        ("baseline f32 it8", dict()),
        ("prep bf16 it8", dict(solver_prep_dtype="bf16")),
        ("prep bf16 it12", dict(solver_prep_dtype="bf16", solver_iterations=12)),
        ("prep bf16 it6", dict(solver_prep_dtype="bf16", solver_iterations=6)),
    ]
    for name, kw in configs:
        try:
            sps, cs = measure(args.envs, args.steps, args.warmup, **kw)
            print(f"{name:24s} {sps:>12,.0f} env-steps/s "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()

"""Quick A/B of config-level perf levers on the lift scene.

Usage: python scripts/perf_try.py [--envs 8192] [--steps 30]
       [--set heavy_prep_per_control=True] [--set solver_prep_dtype=bf16]
"""

import argparse
import ast
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=8192)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--scene", default="lift")
    p.add_argument("--set", action="append", default=[])
    args = p.parse_args()

    from handarm_tpu.utils.jaxinit import setup_cache

    setup_cache()
    import jax

    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        overrides[k] = v

    if args.scene == "multiobj":
        from handarm_tpu.envs.registry import make_env

        ov = [f"num_envs={args.envs}"] + [f"{k}={v}" for k, v in overrides.items()]
        env, _ = make_env("Ur5SihMultiObjectManipulation", ov)
    else:
        from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv

        cfg = HandArmConfig(num_envs=args.envs, **overrides)
        env = HandArmEnv(cfg)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    if hasattr(env, "ensure_initial_pool"):
        env.ensure_initial_pool()  # build genesis pool before reset is traced
    state, obs = jax.jit(env.reset)(key)
    step = jax.jit(env.step)
    act = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (args.envs, env.num_actions))
    for _ in range(args.warmup):
        state, res = step(state, act)
    jax.block_until_ready(res.reward)
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, res = step(state, act)
    jax.block_until_ready(res.reward)
    dt = time.perf_counter() - t0
    sps = args.envs * args.steps / dt
    print(f"{overrides} -> {sps:,.0f} env-steps/s  ({dt/args.steps*1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()

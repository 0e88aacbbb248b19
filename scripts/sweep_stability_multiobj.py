"""Pile-scene solver-sweep stability study (VERDICT r4 weak #5).

The flagship multiobj run trains at solver_iterations=16 while bench, the
reference cost anchor (8 TGS position iterations,
/root/reference/isaacgymenvs/cfg/task/Ur5SihBase.yaml sim block), and the
stack/kick stability tables all use 8. This script answers which budget the
PILE scene (C~372 slots, drop-settled YCB objects in a bin) actually needs:

For each sweep count it
  1. drop-settles the pile (genesis pool, physics-accurate),
  2. holds the robot parked and simulates a quiet interval, measuring
     object drift + residual speed (rest stability), and
  3. kicks every object with a lateral impulse and simulates until quiet,
     measuring peak speed (divergence check, analog of the kicked-YCB
     stress test) and whether objects stay inside the bin.

Usage: python scripts/sweep_stability_multiobj.py [--envs 64] [--sweeps 8 12 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def run_one(n_sweeps, num_envs, quiet_steps, kick_steps):
    import jax
    import jax.numpy as jnp

    from handarm_tpu.envs.registry import make_env

    env, _ = make_env(
        "Ur5SihMultiObjectManipulation",
        [f"num_envs={num_envs}", f"solver_iterations={n_sweeps}"],
    )
    env.ensure_initial_pool()
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))

    # zero-action step: servo targets hold the bringup pose
    act0 = jnp.zeros((num_envs, env.num_actions), jnp.float32)
    step = jax.jit(env.step)

    def obj_stats(phys):
        pos = phys.objects.pos  # [B, K, 3]
        lin = phys.objects.linvel
        speed = jnp.linalg.norm(lin, axis=-1)
        return pos, speed

    # --- rest phase: the settled pile must stay put under the active solver
    pos0, _ = obj_stats(state.physics)
    peak_rest = 0.0
    for _ in range(quiet_steps):
        state, res = step(state, act0)
        _, speed = obj_stats(state.physics)
        peak_rest = max(peak_rest, float(speed.max()))
    pos1, speed1 = obj_stats(state.physics)
    drift = float(jnp.linalg.norm((pos1 - pos0)[..., :2], axis=-1).max())
    rest_speed = float(speed1.max())

    # --- kick phase: lateral impulse on every object
    kick = jax.random.normal(jax.random.PRNGKey(1), pos1[..., :2].shape)
    kick = kick / (jnp.linalg.norm(kick, axis=-1, keepdims=True) + 1e-6)
    lin = state.physics.objects.linvel
    lin = lin.at[..., :2].add(2.0 * kick)  # 2 m/s lateral
    phys = state.physics._replace(
        objects=state.physics.objects._replace(linvel=lin)
    )
    state = state._replace(physics=phys)
    peak_kick = 0.0
    for _ in range(kick_steps):
        state, res = step(state, act0)
        _, speed = obj_stats(state.physics)
        peak_kick = max(peak_kick, float(speed.max()))
    pos2, speed2 = obj_stats(state.physics)
    final_kick_speed = float(speed2.max())
    # bin containment: objects should remain near the bin footprint
    xy_extent = float(jnp.abs(pos2[..., :2] - pos0[..., :2]).max())
    z_min = float(pos2[..., 2].min())

    return dict(
        sweeps=n_sweeps,
        rest_drift_m=drift,
        rest_peak_speed=peak_rest,
        rest_final_speed=rest_speed,
        kick_peak_speed=peak_kick,
        kick_final_speed=final_kick_speed,
        kick_xy_extent_m=xy_extent,
        z_min=z_min,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=64)
    p.add_argument("--sweeps", type=int, nargs="+", default=[8, 12, 16])
    p.add_argument("--quiet-steps", type=int, default=60)  # 3s at 20Hz policy
    p.add_argument("--kick-steps", type=int, default=60)
    args = p.parse_args()

    import json

    rows = []
    for n in args.sweeps:
        r = run_one(n, args.envs, args.quiet_steps, args.kick_steps)
        rows.append(r)
        print(json.dumps(r), flush=True)
    print("\nsweeps  rest_drift  rest_v_final  kick_v_peak  kick_v_final  z_min")
    for r in rows:
        print(
            f"{r['sweeps']:6d}  {r['rest_drift_m']:10.4f}  "
            f"{r['rest_final_speed']:12.4f}  {r['kick_peak_speed']:11.3f}  "
            f"{r['kick_final_speed']:12.4f}  {r['z_min']:6.3f}"
        )


if __name__ == "__main__":
    main()

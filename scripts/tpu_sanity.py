"""TPU physics sanity check — run on the axon backend after jax/compiler
updates. The axon backend has miscompiled fused norm patterns before
(see math.quat.safe_norm); this drives the two flagship scenes a few
hundred steps under jit and asserts bounded contact impulses, bounded
object speeds, and finite states. All three bounds blow up by many
orders of magnitude when contact bases are corrupted, so this catches
that class of bug without needing a CPU reference on the same host.

Usage: python scripts/tpu_sanity.py [--steps 120]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check_ant(steps: int) -> None:
    from handarm_tpu.envs.locomotion import make_ant

    env = make_ant(num_envs=32)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    worst_lam = 0.0
    key = jax.random.PRNGKey(1)
    for i in range(steps):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (32, 8), minval=-1.0, maxval=1.0)
        state, res = step(state, a)
        worst_lam = max(
            worst_lam,
            float(jnp.abs(state.physics.contact_impulse).max()),
        )
    z = np.asarray(state.physics.robot.base_pos[:, 2])
    assert np.isfinite(z).all(), "ant state went non-finite"
    assert worst_lam < 50.0, f"ant contact impulses exploded: {worst_lam}"
    print(f"ant ok: worst impulse {worst_lam:.3f} N*s, z in "
          f"[{z.min():.2f}, {z.max():.2f}]")


def check_lift(steps: int) -> None:
    from handarm_tpu.envs.registry import make_env

    env, _ = make_env("Ur5SihLift", ["env.num_envs=4"])
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    worst_v = 0.0
    key = jax.random.PRNGKey(2)
    for i in range(steps):
        key, k = jax.random.split(key)
        a = jax.random.uniform(
            k, (4, env.num_actions), minval=-1.0, maxval=1.0
        )
        state, res = step(state, a)
        worst_v = max(
            worst_v,
            float(jnp.linalg.norm(
                np.asarray(state.physics.objects.linvel), axis=-1
            ).max()),
        )
    assert bool(jnp.all(jnp.isfinite(res.obs))), "lift obs went non-finite"
    assert worst_v < 5.0, f"object ejected: {worst_v} m/s"
    print(f"lift ok: worst object speed {worst_v:.2f} m/s")


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    args = ap.parse_args(argv)
    print("platform:", jax.devices())
    check_ant(args.steps)
    check_lift(args.steps)
    print("TPU SANITY: OK")


if __name__ == "__main__":
    main(sys.argv[1:])

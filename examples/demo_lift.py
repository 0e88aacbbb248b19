"""Drive the framework end-to-end through its public surface:
build the UR5+SIH lift env, jit the step, run an episode with scripted
actions, and report physics/obs/reward behavior.

Usage: python examples/demo_lift.py [--envs N] [--steps N] [--platform cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--envs", type=int, default=8)
parser.add_argument("--steps", type=int, default=40)
parser.add_argument("--platform", default="cpu")
args = parser.parse_args()

from handarm_tpu.utils.jaxinit import force_platform, setup_cache

import jax

force_platform(args.platform)
setup_cache()
import jax.numpy as jnp
import numpy as np

from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv

cfg = HandArmConfig(num_envs=args.envs, episode_length=25)
env = HandArmEnv(cfg)
print(f"env: num_obs={env.num_obs} num_actions={env.num_actions} "
      f"objects={env.cfg_num_objects} contact_slots={env.scene.slots.num_slots}")

key = jax.random.PRNGKey(0)
t0 = time.time()
state, obs = jax.jit(env.reset)(key)
print(f"reset compiled+ran in {time.time()-t0:.1f}s; obs shape {obs.shape}")
assert obs.shape == (args.envs, env.num_obs)

step = jax.jit(env.step)
t0 = time.time()
state, res = step(state, jnp.zeros((args.envs, env.num_actions)))
jax.block_until_ready(res.reward)
print(f"step compiled+ran in {time.time()-t0:.1f}s")

t0 = time.time()
rewards = []
for i in range(args.steps):
    # scripted probe: arm joints toward the object, fingers closing
    a = np.zeros((args.envs, env.num_actions), np.float32)
    a[:, :6] = 0.3 * np.sin(i / 10.0)
    a[:, 6:] = -0.5  # close hand
    state, res = step(state, jnp.asarray(a))
    rewards.append(float(res.reward.mean()))
dt = time.time() - t0
sps = args.envs * args.steps / dt
print(f"{args.steps} steps x {args.envs} envs in {dt:.2f}s -> {sps:,.0f} env-steps/s (policy rate)")

op = np.asarray(state.physics.objects.pos)
q = np.asarray(state.physics.robot.q)
print("object z (should rest near table 0.5 + half-extent):",
      np.round(op[:4, :, 2].ravel(), 3))
print("robot q[0, :6] (arm):", np.round(q[0, :6], 3))
print("mean reward first/last:", round(rewards[0], 4), round(rewards[-1], 4))
print("success_ewma:", float(res.info["success_rate_ewma"]))
print("max_penetration:", float(res.info["max_penetration"].max()))
ok = (
    np.isfinite(op).all()
    and np.isfinite(q).all()
    and (op[..., 2] > 0.4).all()
    and (op[..., 2] < 1.2).all()
)
print("PHYSICS SANE:", ok)
sys.exit(0 if ok else 1)

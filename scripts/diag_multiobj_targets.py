"""Diagnose per-target-object behavior of a multiobj checkpoint.

Forces target_obj to each object index across env groups and reports, per
object: min fingertip-to-target distance over the episode, max lift delta_z,
min goal distance, and success — to tell apart "never reaches", "reaches but
can't grasp", and "grasps but can't hold" failure modes per object class.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.envs.registry import make_env
from handarm_tpu.learn.ppo import PPO, PPOConfig
from handarm_tpu.utils.checkpoint import load_checkpoint

CKPT = sys.argv[1] if len(sys.argv) > 1 else "runs/multiobj_r3a/nn/ckpt_3400.npz"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 12
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 200

env, ppo_over = make_env(
    "Ur5SihMultiObjectManipulation", [f"env.num_envs={B}"]
)
K = env.cfg_num_objects
print("objects:", env.cfg.object_names if hasattr(env.cfg, "object_names") else "?")

ppo = PPO(env, PPOConfig(**ppo_over))
ts = ppo.init(jax.random.PRNGKey(0))
ts = load_checkpoint(CKPT, example_tree=ts)
print("loaded", CKPT)

env_state, obs = env.reset(jax.random.PRNGKey(7))
# force targets: env i -> object i % K, reset clocks
tgt = jnp.arange(B, dtype=jnp.int32) % K
env_state = env_state._replace(
    task=env_state.task._replace(
        target_obj=tgt, progress=jnp.zeros(B, jnp.int32)
    )
)
# recompute obs for the forced targets
obs = env.compute_observations(env_state) if hasattr(env, "compute_observations") else obs

print("initial object pos per slot (env 0..2):")
print(np.asarray(env_state.physics.objects.pos[:3]))

@jax.jit
def policy_step(ts, env_state, obs):
    mu, _, _ = ppo._policy_value(ts, ts.params, obs, jnp.zeros((obs.shape[0], 0)))
    env_state, res = env.step(env_state, mu)
    return env_state, res

min_tipd = jnp.full(B, 1e9)
max_dz = jnp.full(B, -1e9)
min_goald = jnp.full(B, 1e9)
succ = jnp.zeros(B, bool)
init_obj = env_state.task.initial_obj_pos

for t in range(STEPS):
    env_state, res = policy_step(ts, env_state, obs)
    obs = res.obs
    pos = env_state.physics.objects.pos  # [B,K,3]
    tp = jnp.take_along_axis(pos, tgt[:, None, None], axis=1)[:, 0]
    ip = jnp.take_along_axis(init_obj, tgt[:, None, None], axis=1)[:, 0]
    # fingertips via obs context
    from handarm_tpu.envs.hand_arm import ObsContext
    ctx = ObsContext(env=env, state=env_state, info=res.info if hasattr(res, "info") else None)
    tips = ctx.fingertips[1]
    d = jnp.linalg.norm(tips - tp[:, None, :], axis=-1).min(axis=-1)
    min_tipd = jnp.minimum(min_tipd, d)
    max_dz = jnp.maximum(max_dz, (tp - ip)[:, 2])
    gd = jnp.linalg.norm(tp - env_state.task.goal_pos, axis=-1)
    min_goald = jnp.minimum(min_goald, gd)
    succ = succ | env_state.task.goal_reached_before

min_tipd, max_dz, min_goald, succ = map(np.asarray, (min_tipd, max_dz, min_goald, succ))
tgt = np.asarray(tgt)
for k in range(K):
    m = tgt == k
    print(
        f"obj{k}: n={m.sum()} succ={succ[m].mean():.2f} "
        f"min_tip_dist={min_tipd[m].mean():.3f} max_dz={max_dz[m].mean():.3f} "
        f"min_goal_dist={min_goald[m].mean():.3f}"
    )

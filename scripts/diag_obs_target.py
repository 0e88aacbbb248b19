"""Check that policy observations actually depend on task.target_obj."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.envs.registry import make_env

env, _ = make_env("Ur5SihMultiObjectManipulation", ["env.num_envs=4"])
K = env.cfg_num_objects

state, obs0 = env.reset(jax.random.PRNGKey(7))
print("obs dim:", obs0.shape)

# Take one step so objects/fingers are in generic positions, then compare
# obs computed under different forced targets on the SAME physics state.
a = jnp.zeros((4, env.num_actions))
state, res = env.step(state, a)

rows = []
for k in range(K):
    st = state._replace(task=state.task._replace(
        target_obj=jnp.full((4,), k, jnp.int32)))
    # step with zero actions to produce obs from this state
    st2, r2 = env.step(st, a)
    rows.append(np.asarray(r2.obs[0]))

for k in range(1, K):
    diff = np.abs(rows[k] - rows[0])
    print(f"target {k} vs 0: max|obs diff| = {diff.max():.4f}, "
          f"ndiff = {(diff > 1e-6).sum()}/{diff.size}")

# also show the obs layout so we can name the differing slices
layout = env.obs_slices
if layout:
    print("layout:")
    off = 0
    for name, sl in layout.items():
        print(f"  {sl} {name}")

"""AnymalTerrain (reference tasks/anymal_terrain.py): heightfield contacts,
188-dim obs with height measurements, terrain curriculum."""

import numpy as np
import jax
import jax.numpy as jnp

from handarm_tpu.envs.anymal_terrain import make_anymal_terrain
from handarm_tpu.physics.terrain import generate_terrain


def test_terrain_generation_shapes_and_origins():
    t = generate_terrain(num_levels=3, num_types=4, length=8.0, width=8.0)
    assert t.height.shape == (3 * 80 + 160, 4 * 80 + 160)
    assert t.env_origins.shape == (3, 4, 3)
    # level-0 patches must include a flat spawn platform
    assert abs(t.env_origins[0, 0, 2]) < 0.2
    # stairs rows get steeper with level (difficulty monotone): the height
    # range of the hardest row exceeds the easiest
    def patch(i, j):
        return t.height[160 // 2 + 0:][i * 80:(i + 1) * 80][:, j * 80:(j + 1) * 80]
    assert np.ptp(t.height) > 0.3  # terrain is actually rough


def test_anymal_terrain_stands_and_observes():
    env = make_anymal_terrain(num_envs=8, num_levels=3, num_types=4)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (8, 188)
    step = jax.jit(env.step)
    for _ in range(60):
        state, res = step(state, jnp.zeros((8, 12)))
    # standing on its local terrain patch (not fallen through, not flying)
    z = np.asarray(state.physics.robot.base_pos[:, 2])
    org = np.asarray(env._origin_for(state.terrain_level, env._types(8)))
    rel = z - org[:, 2]
    assert (rel > 0.1).all() and (rel < 0.8).all(), rel
    assert bool(jnp.all(jnp.isfinite(res.obs)))
    # height observations are in range and see actual terrain (nonconstant
    # across the batch: different envs stand on different patches)
    heights = np.asarray(res.obs[:, 27:167])
    assert np.abs(heights).max() <= 5.0 + 1e-5
    assert heights.std() > 1e-3


def test_anymal_terrain_curriculum_moves_levels():
    """Walking the full patch length promotes; standing still demotes
    (anymal_terrain.py:428-435)."""
    env = make_anymal_terrain(num_envs=4, num_levels=3, num_types=4,
                              episode_length=50, max_init_level=1)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(3))
    state = state._replace(
        progress=jnp.zeros(4, jnp.int32),
        terrain_level=jnp.ones(4, jnp.int32),
        # big commanded velocity so the stand-still demotion triggers
        commands=jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (4, 1)),
    )
    step = jax.jit(env.step)
    # teleport env 0 far along x (walked > patch/2), keep env 1 in place
    for _ in range(49):
        state, res = step(state, jnp.zeros((4, 12)))
    bp = state.physics.robot.base_pos
    state = state._replace(
        physics=state.physics._replace(
            robot=state.physics.robot._replace(
                base_pos=bp.at[0, 0].add(5.0)
            )
        )
    )
    state, res = step(state, jnp.zeros((4, 12)))
    lvls = np.asarray(state.terrain_level)
    assert lvls[0] == 2, lvls  # promoted
    assert (lvls[1:] == 0).all(), lvls  # demoted (walked < 25% of command)

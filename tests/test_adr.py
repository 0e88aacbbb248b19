"""Adaptive DR (DeXtreme adr_vec_task.py:57-102, 666-918 port)."""

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.envs.adr import (
    AdrConfig, adr_entropy, adr_step, init_adr_state,
)


def _cfg(**kw):
    return AdrConfig(
        enabled=True,
        queue_len=32,
        boundary_fraction=0.5,
        **kw,
    )


def test_adr_ranges_expand_when_objective_high():
    """Boundary workers succeeding everywhere -> every bound steps outward
    (OpenAI ADR Algorithm 1, expand branch)."""
    cfg = _cfg()
    key = jax.random.PRNGKey(0)
    s = init_adr_state(cfg, key, B=256)
    step = jax.jit(lambda s, k: adr_step(
        cfg, s, jnp.ones(256, bool), jnp.ones(256), k
    ))
    ent0 = float(adr_entropy(s))
    for i in range(8):
        key, k = jax.random.split(key)
        s = step(s, k)
    assert float(adr_entropy(s)) > ent0
    lo, hi = np.asarray(s.lo), np.asarray(s.hi)
    assert (lo < np.asarray(cfg.init_lo) + 1e-6).all()
    assert (hi > np.asarray(cfg.init_hi) - 1e-6).all()
    assert (hi > np.asarray(cfg.init_hi)).any()


def test_adr_ranges_contract_when_objective_low():
    """Failing boundary workers pull expanded bounds back toward init."""
    cfg = _cfg()
    key = jax.random.PRNGKey(1)
    s = init_adr_state(cfg, key, B=256)
    # manually pre-expand the ranges
    s = s._replace(
        lo=jnp.asarray(cfg.limit_lo, jnp.float32),
        hi=jnp.asarray(cfg.limit_hi, jnp.float32),
    )
    width0 = float(jnp.sum(s.hi - s.lo))
    step = jax.jit(lambda s, k: adr_step(
        cfg, s, jnp.ones(256, bool), jnp.zeros(256), k
    ))
    for i in range(8):
        key, k = jax.random.split(key)
        s = step(s, k)
    assert float(jnp.sum(s.hi - s.lo)) < width0
    # never narrower than the init range
    assert (np.asarray(s.lo) <= np.asarray(cfg.init_lo) + 1e-6).all()
    assert (np.asarray(s.hi) >= np.asarray(cfg.init_hi) - 1e-6).all()


def test_adr_values_respect_ranges_and_boundaries():
    cfg = _cfg()
    s = init_adr_state(cfg, jax.random.PRNGKey(2), B=512)
    v = np.asarray(s.values)
    lo = np.asarray(s.lo)[None]
    hi = np.asarray(s.hi)[None]
    assert (v >= lo - 1e-6).all() and (v <= hi + 1e-6).all()
    mode = np.asarray(s.worker_mode)
    assert (mode == -1).any() and (mode >= 0).any()
    # boundary workers pin their parameter exactly at a bound
    for b in np.where(mode >= 0)[0][:50]:
        p, side = mode[b] // 2, mode[b] % 2
        expect = lo[0, p] if side == 0 else hi[0, p]
        np.testing.assert_allclose(v[b, p], expect, atol=1e-6)


def test_adr_runs_on_hand_arm_lift():
    from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv

    cfg = HandArmConfig(
        num_envs=8, episode_length=6, adr=_cfg(), spawn_noise=(0.0, 0.0, 0.0),
    )
    env = HandArmEnv(cfg)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert state.task.adr is not None
    step = jax.jit(env.step)
    for t in range(14):  # crosses an episode boundary -> workers recycle
        state, res = step(state, jnp.zeros((8, env.num_actions)))
    assert bool(jnp.all(jnp.isfinite(res.obs)))
    assert state.task.adr.values.shape == (8, 4)


def test_dextreme_rna_and_adr_wrapper():
    """AllegroHandDextreme (reference dextreme/allegro_hand_dextreme.py):
    RNA perturbs actions per-env, ADR ranges widen under forced success."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from handarm_tpu.envs.dextreme import make_allegro_dextreme
    from handarm_tpu.learn.rna import rna_apply, rna_masks

    env = make_allegro_dextreme(num_envs=8, episode_length=40)
    s, obs = env.reset(jax.random.PRNGKey(0))
    # RNA: binned outputs in [-1, 1], different nets (masks) per env
    a = rna_apply(env.rna_params, s.rna, s.obs)
    assert a.shape == (8, env.num_actions)
    assert float(a.min()) >= -1.0 and float(a.max()) <= 1.0
    assert float(jnp.std(a, axis=0).mean()) > 1e-3  # envs differ
    # same obs + same masks -> deterministic (fixed random network)
    a2 = rna_apply(env.rna_params, s.rna, s.obs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a2))

    step = jax.jit(env.step)
    # force boundary-worker successes: objective above objective_hi at
    # every episode end -> ranges must widen
    for i in range(200):
        s = s._replace(inner=s.inner._replace(
            successes=jnp.full(8, 10.0, s.inner.successes.dtype),
            progress=jnp.full(8, env.cfg.episode_length, jnp.int32),
        ))
        s, r = step(s, jnp.zeros((8, env.num_actions)))
    assert float(r.info["adr_range_width"]) > 0.0, "ADR ranges never widened"

"""Determinism, replay buffer, config system, profiling utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_env_step_deterministic():
    """Same seed -> bitwise-identical trajectories (the reference only
    documents determinism caveats, docs/reproducibility.md; here it holds
    exactly because all randomness flows from the state's PRNG key)."""
    from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv

    cfg = HandArmConfig(
        num_envs=4, episode_length=6,
        observations=("ur5_joint_pos", "object_pos"),
        actions=("ur5_relative_joint_pos",),
        solver_iterations=4,
    )
    env = HandArmEnv(cfg)
    step = jax.jit(env.step)

    def rollout():
        state, obs = jax.jit(env.reset)(jax.random.PRNGKey(123))
        out = []
        for i in range(5):
            a = 0.1 * jnp.sin(jnp.arange(env.num_actions) + i)[None].repeat(4, 0)
            state, res = step(state, a)
            out.append(np.asarray(res.obs))
        return np.stack(out)

    a, b = rollout(), rollout()
    np.testing.assert_array_equal(a, b)


def test_replay_buffer_ring():
    from handarm_tpu.learn import replay_buffer as rb

    ex = {"x": jnp.zeros((1, 3)), "y": jnp.zeros((1,), jnp.int32)}
    buf = rb.create(ex, capacity=8)
    add = jax.jit(rb.add)
    for i in range(3):  # insert 3 batches of 4 -> wraps once
        batch = {
            "x": jnp.full((4, 3), float(i)),
            "y": jnp.full((4,), i, jnp.int32),
        }
        buf = add(buf, batch)
    assert int(buf.size) == 8
    assert int(buf.head) == 4
    y = np.asarray(buf.storage["y"])
    assert (np.sort(np.unique(y)) == [1, 2]).all()  # batch 0 overwritten
    s = rb.sample(buf, jax.random.PRNGKey(0), 16)
    assert s["x"].shape == (16, 3)


def test_config_layering_and_overrides(tmp_path):
    from handarm_tpu.utils.config import load_config

    (tmp_path / "base.yaml").write_text("a: 1\nnested: {x: 1, y: 2}\n")
    (tmp_path / "child.yaml").write_text(
        "inherits: base.yaml\nnested: {y: 3}\nb: 2\n"
    )
    cfg = load_config(str(tmp_path / "child.yaml"), ["nested.x=10", "c=hi"])
    assert cfg == {"a": 1, "nested": {"x": 10, "y": 3}, "b": 2, "c": "hi"}


def test_phase_timer():
    from handarm_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    x = jnp.ones(16)
    with t.phase("mul", sync_result=x):
        y = x * 2
    assert "mul" in t.means_ms()
    assert t.counts["mul"] == 1
    assert "mul" in t.report()


def test_launch_helpers_single_process():
    from handarm_tpu.parallel.launch import (
        init_distributed,
        is_main_process,
        per_host_envs,
    )

    info = init_distributed()
    assert info["process_count"] == 1
    assert is_main_process()
    assert per_host_envs(1024) == 1024


def test_env_from_yaml_reference_style_config():
    from handarm_tpu.envs.registry import env_from_yaml

    env, ppo_cfg = env_from_yaml(
        "configs/task/Ur5SihMultiObjectManipulation.yaml",
        ["env.numEnvs=2", "rl.goal=lift", "objects.num_objects=2"],
    )
    assert env.cfg.num_envs == 2
    assert env.cfg.goal == "lift"
    assert env.cfg_num_objects == 2
    assert env.cfg.use_drop_init  # dataset configs drop-initialize
    assert env.num_actions == 11
    # the declarative obs list composes proprio + object + task groups
    assert "sih_fingertip_to_target_object_pos" in env.obs_slices


def test_sih_servo_spline_calibration():
    """Servo-tick -> joint mapping matches an independent scipy natural
    cubic spline through the same calibration tables, including the
    feedback-coupled distal joints and the mimicking little finger
    (reference ur5sih.py:437-527)."""
    from scipy.interpolate import CubicSpline

    from handarm_tpu.robots.ur5sih import (
        SERVO_UPPER,
        _INDEX_PROX,
        _THUMB_PROX,
        build_sih_splines,
        servo_to_joint_targets,
    )

    splines = build_sih_splines()
    ticks = jnp.asarray(np.tile(SERVO_UPPER * 0.5, (3, 1)), jnp.float32)
    dof_pos = jnp.zeros((3, 11), jnp.float32)
    out = np.asarray(servo_to_joint_targets(splines, ticks, dof_pos))
    assert out.shape == (3, 11)

    # thumb opposition is the linear servo map
    np.testing.assert_allclose(
        out[:, 0], (-1.571 / 2675.0) * np.asarray(ticks)[:, 0], atol=1e-5
    )
    # proximal joints match scipy natural cubic splines on the same knots
    ref_thumb = CubicSpline(*_THUMB_PROX, bc_type="natural")
    np.testing.assert_allclose(
        out[:, 1], -ref_thumb(np.asarray(ticks)[:, 1]), atol=1e-4
    )
    ref_index = CubicSpline(*_INDEX_PROX, bc_type="natural")
    np.testing.assert_allclose(
        out[:, 3], ref_index(np.asarray(ticks)[:, 2]), atol=1e-4
    )
    # little finger mimics the ring finger (targets equal)
    np.testing.assert_allclose(out[:, 9], out[:, 7], atol=1e-6)
    np.testing.assert_allclose(out[:, 10], out[:, 8], atol=1e-6)
    # fully-open command (upper limits): extrapolates the boundary
    # polynomials exactly like the reference's torchcubicspline (the thumb
    # servo range intentionally overdrives past the calibration knots)
    open_out = np.asarray(
        servo_to_joint_targets(
            splines, jnp.asarray(SERVO_UPPER, jnp.float32)[None], dof_pos[:1]
        )
    )
    np.testing.assert_allclose(
        open_out[0, 1], -ref_thumb(SERVO_UPPER[1]), atol=1e-4
    )
    # the (calibrated-range) fingers open to near zero
    assert np.abs(open_out[0, 3:]).max() < 0.2


def test_mass_and_interval_observables():
    """object_com / object_inertia (reference multi_object.py:907-925) and
    the InvervalSample variants (:310-330)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv

    cfg = HandArmConfig(
        num_envs=2,
        observations=(
            "object_com", "object_inertia", "object_mass",
            "target_object_interval_pos", "target_object_pos",
        ),
        episode_length=50,
    )
    env = HandArmEnv(cfg)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    lo, hi = env.obs_slices["object_inertia"]
    inert = np.asarray(obs[0, lo:hi]).reshape(3, 3)
    # diagonal inertia of the default box, positive on the diagonal
    assert (np.diag(inert) > 0).all()
    assert abs(inert[0, 1]) < 1e-9
    # interval pos matches target pos every 4th step and blanks otherwise
    ilo, ihi = env.obs_slices["target_object_interval_pos"]
    plo, phi = env.obs_slices["target_object_pos"]
    seen_blank = seen_live = False
    for t in range(8):
        state, res = step(state, jnp.zeros((2, env.num_actions)))
        iv = np.asarray(res.obs[0, ilo:ihi])
        pv = np.asarray(res.obs[0, plo:phi])
        if np.allclose(iv, 0.0, atol=1e-6):
            seen_blank = True
        elif np.allclose(iv, pv, atol=1e-5):
            seen_live = True
    assert seen_blank and seen_live


def test_wandb_sink_degrades_gracefully():
    """Without the wandb package the sink is a no-op and MetricsLogger
    still works end-to-end (reference wandb_utils.py WandbAlgoObserver)."""
    import tempfile
    from handarm_tpu.utils.logging import MetricsLogger, WandbSink, retry

    sink = WandbSink("proj", "exp")
    assert not sink.active
    sink.log(0, {"a": 1.0})
    sink.close()

    calls = []

    @retry(3, exceptions=(ValueError,))
    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise ValueError
        return 42

    assert flaky() == 42 and len(calls) == 3

    with tempfile.TemporaryDirectory() as d:
        lg = MetricsLogger(d, use_tensorboard=False, wandb_project="p")
        lg.log(0, {"x": 1.0})
        lg.close()


def test_balanced_target_sampling_weights_hard_objects():
    """With balanced_target_sampling, reset targets are drawn proportional
    to per-object failure rate: a mastered object (EWMA ~1) is sampled far
    less often than unmastered ones (round-3 multiobj collapse fix)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv

    cfg = HandArmConfig(
        num_envs=4,
        objects=(
            ("box", (0.03, 0.03, 0.03), 0.1),
            ("box", (0.03, 0.03, 0.03), 0.1),
            ("box", (0.03, 0.03, 0.03), 0.1),
        ),
        balanced_target_sampling=True,
    )
    env = HandArmEnv(cfg)
    key = jax.random.PRNGKey(0)
    B = 4096
    # uniform when nothing is mastered (EWMAs all zero)
    t0 = env._sample_target(key, B, jnp.zeros(3))
    f0 = np.bincount(np.asarray(t0), minlength=3) / B
    np.testing.assert_allclose(f0, 1 / 3, atol=0.03)
    # object 0 mastered: its sampling share collapses toward the floor
    ewma = jnp.asarray([0.96, 0.0, 0.0])
    t1 = env._sample_target(key, B, ewma)
    f1 = np.bincount(np.asarray(t1), minlength=3) / B
    assert f1[0] < 0.12, f1
    np.testing.assert_allclose(f1[1], f1[2], atol=0.04)
    # flag off -> uniform regardless of EWMAs
    env2 = HandArmEnv(
        HandArmConfig(num_envs=4, objects=cfg.objects)
    )
    t2 = env2._sample_target(key, B, ewma)
    f2 = np.bincount(np.asarray(t2), minlength=3) / B
    np.testing.assert_allclose(f2, 1 / 3, atol=0.03)

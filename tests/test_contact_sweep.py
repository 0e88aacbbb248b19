"""Fused Pallas sweep kernel vs the SoA scan path: element-wise parity.

The kernel (ops/contact_sweep.py) implements the exact update order of
`_solve_jacobi_soa`'s scan; on identical inputs the trajectories must agree
to float tolerance. Runs the kernel in interpret mode off-TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handarm_tpu.physics.engine import SimParams, initial_state, step
from handarm_tpu.physics.solver import SolverParams
from handarm_tpu.physics.shapes import make_box_object, make_sphere_object

from tests.test_engine import tiny_scene


def _run(tmp_path, impl, steps=40):
    tmp_path.mkdir(parents=True, exist_ok=True)
    objs = [
        make_box_object([0.05, 0.05, 0.05], mass=0.3),
        make_box_object([0.04, 0.04, 0.04], mass=0.2),
        make_sphere_object(0.03, mass=0.1),
    ]
    scene = tiny_scene(
        tmp_path, objs,
        params=SimParams(
            substeps=2,
            solver=SolverParams(jacobi_impl=impl, iterations=8),
        ),
    )
    state = initial_state(
        scene, B=8,
        obj_pos0=jnp.asarray(
            [[0.5, 0.0, 0.06], [0.5, 0.0, 0.2], [0.3, 0.1, 0.1]]
        ),
    )
    # arm swings so robot-side impulses flow too
    state = state._replace(
        robot=state.robot._replace(
            targets=jnp.full_like(state.robot.targets, 1.0)
        )
    )
    stepj = jax.jit(lambda s: step(scene, s)[0])
    for _ in range(steps):
        state = stepj(state)
    return state


def test_pallas_matches_scan(tmp_path):
    ref = _run(tmp_path / "a", "pallas_off")
    got = _run(tmp_path / "b", "pallas")
    np.testing.assert_allclose(
        np.asarray(got.objects.pos), np.asarray(ref.objects.pos), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.robot.q), np.asarray(ref.robot.q), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.objects.linvel), np.asarray(ref.objects.linvel),
        atol=2e-3,
    )
    # and the scene actually settled into a stack (not just agreeing NaNs)
    assert np.all(np.isfinite(np.asarray(got.objects.pos)))
    z = np.asarray(got.objects.pos[0, :2, 2])
    assert z[1] > z[0] > 0.0


def test_anchored_fused_matches_generic():
    """engine._step_anchored_fused (the TPU fast path: anchored_pack once
    per sim step + in-kernel warm apply + XLA post-clamp depth advance)
    must match the generic anchored path bit-for-bit, including across
    chained sim steps so the TGS depth advance feeds back."""
    from handarm_tpu.envs.registry import make_env
    from handarm_tpu.physics.engine import (
        EnvOverrides, _step_anchored, _step_anchored_fused, compute_heavy)

    env, _ = make_env("Ur5SihLift", ["num_envs=64"])
    st, _ = env.reset(jax.random.PRNGKey(0))
    stepf = jax.jit(env.step)
    a = jnp.asarray(
        0.3 * np.random.default_rng(0).standard_normal(
            (64, env.num_actions)
        ),
        jnp.float32,
    )
    for _ in range(30):  # drive into contact-rich states
        st, _ = stepf(st, a)
    ph = st.physics
    scene, ovr = env.scene, EnvOverrides()
    heavy = compute_heavy(scene, ph)
    g = scene.gravity
    g_obj = g if g.ndim == 1 else g[:, None, :]
    args = (heavy.fk0, heavy.dyn, heavy.contacts0, heavy.prep,
            heavy.bias_acc, scene.kp, scene.kd, g_obj)
    s1 = s2 = ph
    for _ in range(2):
        s1, _ = _step_anchored(scene, s1, ovr, *args)
        s2, _ = _step_anchored_fused(scene, s2, ovr, *args)
    for name in ("q", "qd"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s1.robot, name)),
            np.asarray(getattr(s2.robot, name)), err_msg=name,
        )
    for name in ("pos", "quat", "linvel", "angvel"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s1.objects, name)),
            np.asarray(getattr(s2.objects, name)), err_msg=name,
        )
    np.testing.assert_array_equal(
        np.asarray(s1.contact_impulse), np.asarray(s2.contact_impulse)
    )

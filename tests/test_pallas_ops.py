"""Pallas kernels vs jnp references (run in interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handarm_tpu.ops.spd_inverse import spd_inverse


def spd_batch(B, n, seed=0, cond_boost=0.0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(B, n, n))
    M = np.einsum("bij,bkj->bik", A, A) + (n + cond_boost) * np.eye(n)
    return jnp.asarray(M, jnp.float32)


def test_spd_inverse_matches_linalg():
    M = spd_batch(128, 17)
    inv_pallas = spd_inverse(M, force_pallas=True)
    inv_ref = jnp.linalg.inv(M)
    np.testing.assert_allclose(
        np.asarray(inv_pallas), np.asarray(inv_ref), atol=1e-5
    )


def test_spd_inverse_fallback_matches():
    M = spd_batch(64, 9, seed=3)
    np.testing.assert_allclose(
        np.asarray(spd_inverse(M, force_pallas=False)),
        np.asarray(jnp.linalg.inv(M)),
        atol=1e-5,
    )


def test_spd_inverse_mass_matrix_conditioning():
    """Realistic Mtilde spectrum: arm inertias O(1-10) against finger
    armature O(1e-3) — the kernel must stay accurate at that conditioning."""
    from handarm_tpu.physics.dynamics import compute_dyn
    from handarm_tpu.physics.kinematics import forward_kinematics, model_arrays
    from handarm_tpu.physics.model import compile_urdf

    art = compile_urdf("/root/reference/assets/hand_arm/robot/hand_arm.urdf")
    m = model_arrays(art)
    q = jnp.zeros((4, 17))
    fk = jax.jit(lambda q: forward_kinematics(m, q))(q)
    kp = jnp.full(17, 50.0)
    dyn = jax.jit(
        lambda q, qd: compute_dyn(m, fk, qd, jnp.asarray([0.0, 0, -9.81]), kp, kp * 0.1, 1 / 120.0)
    )(q, jnp.zeros((4, 17)))
    ident = np.einsum("bij,bjk->bik", np.asarray(dyn.Minv), np.asarray(dyn.Mtilde))
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(17), (4, 17, 17)), atol=5e-3)


def test_sdf_gather_matches_reference():
    """Pallas one-hot-matmul SDF sampler vs the jnp trilinear reference
    (interpret mode on CPU). Accuracy bound: bf16 hi+lo table recovers
    ~f32; the bf16 weight rounding leaves ~2e-3 relative error on the
    interpolation weights -> sub-millimeter at decimeter field values."""
    from handarm_tpu.ops.sdf_gather import pack_sdf_tables, sdf_sample_pallas
    from handarm_tpu.physics.sdf import sample_sdf_channels

    rng = np.random.default_rng(0)
    R = 32
    field = (0.1 * rng.normal(size=(R, R, R, 4))).astype(np.float32)
    lo = jnp.asarray([-0.06, -0.05, -0.04])
    spacing = jnp.float32(0.004)
    hi, lo_t = pack_sdf_tables(field)
    p = jnp.asarray(
        rng.uniform(-0.09, 0.09, size=(7, 513, 3)), jnp.float32
    )  # includes out-of-grid points and a non-tile-multiple count
    out = sdf_sample_pallas(
        jnp.asarray(hi), jnp.asarray(lo_t), lo, spacing, p, R=R,
        interpret=True,
    )
    ref = sample_sdf_channels(jnp.asarray(field), lo, spacing, p)
    # reference lacks the out-of-grid excess on channel 0; apply it
    u = (p - lo) / spacing
    excess = jnp.linalg.norm(
        jnp.maximum(jnp.abs(u - (R - 1) / 2) - (R - 1) / 2, 0.0), axis=-1
    )
    ref = ref.at[..., 0].add(excess * spacing)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-3
    )
    # distance channel must be tighter than the gradient channels
    np.testing.assert_allclose(
        np.asarray(out[..., 0]), np.asarray(ref[..., 0]), atol=1e-3
    )

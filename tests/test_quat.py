"""Quaternion/SO(3) math vs scipy.spatial.transform ground truth."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from handarm_tpu.math import quat as Q


def rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def to_scipy(q_wxyz):
    return Rotation.from_quat(np.roll(np.asarray(q_wxyz), -1, axis=-1))


def test_rotate_matches_scipy():
    q = rand_quats(64)
    v = np.random.default_rng(1).normal(size=(64, 3))
    got = np.asarray(Q.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    want = to_scipy(q).apply(v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mul_matches_scipy():
    a, b = rand_quats(32, 0), rand_quats(32, 1)
    got = to_scipy(np.asarray(Q.quat_mul(jnp.asarray(a), jnp.asarray(b)))).as_matrix()
    want = (to_scipy(a) * to_scipy(b)).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_matrix_roundtrip():
    q = rand_quats(128, 2)
    m = Q.quat_to_matrix(jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(m), to_scipy(q).as_matrix(), atol=1e-5)
    q2 = np.asarray(Q.quat_from_matrix(m))
    # q and -q are the same rotation
    dots = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_axis_angle_roundtrip():
    axis = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    angle = np.array([0.7, -1.3])
    q = Q.quat_from_axis_angle(jnp.asarray(axis), jnp.asarray(angle))
    ax, an = Q.quat_to_axis_angle(q)
    got = np.asarray(ax) * np.asarray(an)[..., None]
    want = axis * angle[..., None]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_euler_zyx_matches_urdf_rpy():
    from handarm_tpu.physics.urdf import rpy_to_matrix

    rpy = np.array([0.3, -0.5, 1.1])
    q = Q.quat_from_euler_zyx(*[jnp.asarray(x) for x in rpy])
    np.testing.assert_allclose(
        np.asarray(Q.quat_to_matrix(q)), rpy_to_matrix(rpy), atol=1e-5
    )


def test_integrate_constant_omega():
    q0 = jnp.asarray([[1.0, 0, 0, 0]])
    omega = jnp.asarray([[0.0, 0.0, np.pi]])  # half-turn per second about z
    q = q0
    for _ in range(100):
        q = Q.quat_integrate(q, omega, 0.01)
    want = Rotation.from_euler("z", np.pi).as_quat()  # xyzw
    got = np.asarray(Q.wxyz_to_xyzw(q))[0]
    assert min(np.linalg.norm(got - want), np.linalg.norm(got + want)) < 1e-3


def test_transform_compose_inverse():
    q = jnp.asarray(rand_quats(8, 3))
    p = jnp.asarray(np.random.default_rng(4).normal(size=(8, 3)))
    qi, pi = Q.transform_inv(q, p)
    qc, pc = Q.transform_compose(q, p, qi, pi)
    np.testing.assert_allclose(np.asarray(pc), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(qc)[:, 0]), 1.0, atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    a = jnp.asarray([[1.0, 0, 0, 0]])
    b = Q.quat_from_axis_angle(jnp.asarray([[0.0, 0, 1.0]]), jnp.asarray([1.0]))
    np.testing.assert_allclose(np.asarray(Q.quat_slerp(a, b, 0.0)), np.asarray(a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Q.quat_slerp(a, b, 1.0)), np.asarray(b), atol=1e-5)
    mid = Q.quat_slerp(a, b, 0.5)
    want = Q.quat_from_axis_angle(jnp.asarray([[0.0, 0, 1.0]]), jnp.asarray([0.5]))
    np.testing.assert_allclose(np.asarray(mid), np.asarray(want), atol=1e-5)


def test_quat_diff_rad():
    a = Q.quat_from_axis_angle(jnp.asarray([[0.0, 1.0, 0]]), jnp.asarray([0.4]))
    b = Q.quat_from_axis_angle(jnp.asarray([[0.0, 1.0, 0]]), jnp.asarray([-0.3]))
    np.testing.assert_allclose(np.asarray(Q.quat_diff_rad(a, b)), [0.7], atol=1e-5)

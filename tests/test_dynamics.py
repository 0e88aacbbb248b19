"""Articulated dynamics vs independent oracles.

- FK vs a from-scratch scipy/numpy chain composition over the raw URDF.
- Mass matrix & bias torques vs an autodiff Lagrangian oracle (energies built
  only from FK + inertias, differentiated with jax).
- Analytic double-pendulum mass matrix.
- Energy behavior of an undamped pendulum under semi-implicit integration.
"""

import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from handarm_tpu.math.quat import quat_rotate, quat_to_matrix
from handarm_tpu.physics.dynamics import (
    bias_forces,
    chol_solve,
    compute_dyn,
    mass_matrix,
    world_spatial_inertias,
)
from handarm_tpu.physics.kinematics import (
    body_velocities,
    forward_kinematics,
    model_arrays,
)
from handarm_tpu.physics.model import compile_urdf
from handarm_tpu.physics.urdf import parse_urdf

HAND_ARM_URDF = "/root/reference/assets/hand_arm/robot/hand_arm.urdf"

DOUBLE_PENDULUM = """
<robot name="dp">
  <link name="base"/>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-10" upper="10" effort="100" velocity="100"/>
  </joint>
  <link name="l1">
    <inertial><mass value="1.5"/><origin xyz="0 0 -0.7"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/></inertial>
  </link>
  <joint name="j2" type="revolute">
    <parent link="l1"/><child link="l2"/>
    <origin xyz="0 0 -0.7"/><axis xyz="0 1 0"/>
    <limit lower="-10" upper="10" effort="100" velocity="100"/>
  </joint>
  <link name="l2">
    <inertial><mass value="0.8"/><origin xyz="0 0 -0.4"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/></inertial>
  </link>
</robot>
"""


@pytest.fixture(scope="module")
def dp_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("urdf") / "dp.urdf"
    p.write_text(DOUBLE_PENDULUM)
    return str(p)


def _reference_fk_numpy(urdf_path, q_dict):
    """Independent FK: walk raw URDF joints with scipy Rotations."""
    urdf = parse_urdf(urdf_path)
    poses = {urdf.root_link: (Rotation.identity(), np.zeros(3))}
    moving = {}
    pending = list(urdf.joints)
    while pending:
        progressed = False
        for j in list(pending):
            if j.parent in poses:
                Rp, tp = poses[j.parent]
                Rj = Rp * Rotation.from_matrix(j.origin_rot)
                tj = tp + Rp.apply(j.origin_pos)
                if j.joint_type in ("revolute", "continuous"):
                    Rj = Rj * Rotation.from_rotvec(j.axis * q_dict.get(j.name, 0.0))
                elif j.joint_type == "prismatic":
                    tj = tj + Rj.apply(j.axis * q_dict.get(j.name, 0.0))
                poses[j.child] = (Rj, tj)
                if j.joint_type != "fixed":
                    moving[j.child] = (Rj, tj)
                pending.remove(j)
                progressed = True
        assert progressed
    return moving


def test_fk_matches_scipy_chain_hand_arm():
    art = compile_urdf(HAND_ARM_URDF)
    assert art.nv == 17  # 6 UR5 + 11 SIH joints
    m = model_arrays(art)
    rng = np.random.default_rng(0)
    q = rng.uniform(np.maximum(art.q_min, -3), np.minimum(art.q_max, 3))
    fk = jax.jit(lambda qq: forward_kinematics(m, qq))(jnp.asarray(q, jnp.float32)[None])
    want = _reference_fk_numpy(HAND_ARM_URDF, dict(zip(art.joint_names, q)))
    for i, name in enumerate(art.body_names):
        Rw, tw = want[name]
        np.testing.assert_allclose(np.asarray(fk.body_pos[0, i]), tw, atol=1e-5)
        got_R = np.asarray(quat_to_matrix(fk.body_quat[0, i]))
        np.testing.assert_allclose(got_R, Rw.as_matrix(), atol=1e-5)


def test_site_poses_fingertips():
    from handarm_tpu.physics.kinematics import site_poses

    art = compile_urdf(HAND_ARM_URDF)
    tips = ["thumb_fingertip", "index_fingertip", "middle_fingertip",
            "ring_fingertip", "little_fingertip", "flange"]
    for t in tips:
        assert t in art.sites, t
    m = model_arrays(art)
    rng = np.random.default_rng(3)
    q = rng.uniform(-0.5, 0.5, art.nv)
    body, pos, quat = art.site_array(tips)

    @jax.jit
    def run(qq):
        fk = forward_kinematics(m, qq)
        return site_poses(fk, body, jnp.asarray(pos, jnp.float32), jnp.asarray(quat, jnp.float32))

    wq, wp = run(jnp.asarray(q, jnp.float32)[None])
    # independent check via raw-URDF FK (sites are URDF link frames)
    urdf_fk = {}
    art_q = dict(zip(art.joint_names, q))
    all_poses = _reference_fk_numpy_all(HAND_ARM_URDF, art_q)
    for si, t in enumerate(tips):
        Rw, tw = all_poses[t]
        np.testing.assert_allclose(np.asarray(wp[0, si]), tw, atol=1e-5)


def _reference_fk_numpy_all(urdf_path, q_dict):
    urdf = parse_urdf(urdf_path)
    poses = {urdf.root_link: (Rotation.identity(), np.zeros(3))}
    pending = list(urdf.joints)
    while pending:
        for j in list(pending):
            if j.parent in poses:
                Rp, tp = poses[j.parent]
                Rj = Rp * Rotation.from_matrix(j.origin_rot)
                tj = tp + Rp.apply(j.origin_pos)
                if j.joint_type in ("revolute", "continuous"):
                    Rj = Rj * Rotation.from_rotvec(j.axis * q_dict.get(j.name, 0.0))
                elif j.joint_type == "prismatic":
                    tj = tj + Rj.apply(j.axis * q_dict.get(j.name, 0.0))
                poses[j.child] = (Rj, tj)
                pending.remove(j)
    return poses


def _lagrangian_oracle(m, art, q, qd, gravity):
    """Autodiff ground truth: M from the Hessian of kinetic energy, bias from
    the Euler-Lagrange equation with qdd = 0."""

    def com_world(qv):
        fk = forward_kinematics(m, qv[None])
        R = quat_to_matrix(fk.body_quat[0])
        return fk.body_pos[0] + jnp.einsum("nij,nj->ni", R, m.com), R

    def kinetic(qv, qdv):
        p, R = com_world(qv)
        Jp = jax.jacfwd(lambda x: com_world(x)[0])(qv)  # [nb, 3, nv]
        v = jnp.einsum("nij,j->ni", Jp, qdv)
        dR = jnp.einsum("nijk,k->nij", jax.jacfwd(lambda x: com_world(x)[1])(qv), qdv)
        Wskew = jnp.einsum("nij,nkj->nik", dR, R)  # omega^ = dR R^T
        omega = jnp.stack(
            [Wskew[:, 2, 1], Wskew[:, 0, 2], Wskew[:, 1, 0]], axis=-1
        )
        I_w = jnp.einsum("nij,njk,nlk->nil", R, jnp.asarray(art.inertia, jnp.float32), R)
        return 0.5 * jnp.sum(m.mass * jnp.sum(v * v, -1)) + 0.5 * jnp.einsum(
            "ni,nij,nj->", omega, I_w, omega
        )

    def potential(qv):
        p, _ = com_world(qv)
        return -jnp.sum(m.mass * (p @ gravity))

    @jax.jit
    def oracle(q, qd):
        M_auto = jax.hessian(kinetic, argnums=1)(q, qd)
        dT_dqd = jax.grad(kinetic, argnums=1)
        conv = jax.jacfwd(dT_dqd, argnums=0)(q, qd) @ qd  # d/dt dT/dqd, qdd=0
        bias_auto = (
            conv - jax.grad(kinetic, argnums=0)(q, qd) + jax.grad(potential)(q)
        )
        return M_auto, bias_auto

    return oracle(q, qd)


BRANCHED_TREE = """
<robot name="tree">
  <link name="base"/>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="trunk"/>
    <origin xyz="0 0 0.2" rpy="0.3 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-10" upper="10" effort="100" velocity="100"/>
  </joint>
  <link name="trunk">
    <inertial><mass value="2.0"/><origin xyz="0.05 0 -0.3"/>
      <inertia ixx="0.02" ixy="0" ixz="0" iyy="0.03" iyz="0" izz="0.01"/></inertial>
  </link>
  <joint name="j2" type="revolute">
    <parent link="trunk"/><child link="left"/>
    <origin xyz="0.1 0 -0.4" rpy="0 0.2 0"/><axis xyz="0 1 0"/>
    <limit lower="-10" upper="10" effort="100" velocity="100"/>
  </joint>
  <link name="left">
    <inertial><mass value="0.7"/><origin xyz="0 0 -0.25"/>
      <inertia ixx="0.004" ixy="0" ixz="0" iyy="0.004" iyz="0" izz="0.001"/></inertial>
  </link>
  <joint name="j3" type="prismatic">
    <parent link="trunk"/><child link="right"/>
    <origin xyz="-0.1 0 -0.4"/><axis xyz="0 0 1"/>
    <limit lower="-0.5" upper="0.5" effort="100" velocity="100"/>
  </joint>
  <link name="right">
    <inertial><mass value="0.4"/><origin xyz="0 0.02 -0.1"/>
      <inertia ixx="0.002" ixy="0" ixz="0" iyy="0.002" iyz="0" izz="0.0005"/></inertial>
  </link>
</robot>
"""


@pytest.fixture(scope="module")
def tree_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("urdf2") / "tree.urdf"
    p.write_text(BRANCHED_TREE)
    return str(p)


@pytest.mark.parametrize("which", ["dp", "tree"])
def test_mass_and_bias_vs_lagrangian(which, dp_path, tree_path):
    path = dp_path if which == "dp" else tree_path
    art = compile_urdf(path, default_armature=0.0)
    m = model_arrays(art)
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.uniform(-1, 1, art.nv), jnp.float32)
    qd = jnp.asarray(rng.uniform(-1, 1, art.nv), jnp.float32)
    gravity = jnp.asarray([0.0, 0.0, -9.81], jnp.float32)

    @jax.jit
    def mine(q, qd):
        fk = forward_kinematics(m, q[None])
        I_sp = world_spatial_inertias(m, fk)
        bv = body_velocities(m, fk, qd[None])
        M = mass_matrix(m, fk, I_sp)[0]
        bias = bias_forces(m, fk, qd[None], gravity, I_sp, bv)[0]
        return M, bias

    M, bias = mine(q, qd)

    M_auto, bias_auto = _lagrangian_oracle(m, art, q, qd, gravity)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M_auto), atol=2e-3)
    np.testing.assert_allclose(np.asarray(bias), np.asarray(bias_auto), atol=5e-3)


def _numpy_T_V(art, urdf_path, q, qd, eps=1e-6):
    """Kinetic/potential energy from the independent scipy-chain FK with
    finite-difference velocities (f64, no jax). Uses the compiled model's
    per-moving-body inertial properties."""
    names = art.joint_names

    def body_poses(qv):
        all_p = _reference_fk_numpy_all(urdf_path, dict(zip(names, qv)))
        return [all_p[n] for n in art.body_names]

    P0 = body_poses(q)
    Pp = body_poses(q + eps * qd)
    Pm = body_poses(q - eps * qd)
    T = 0.0
    V = 0.0
    for b in range(art.nv):
        R0 = P0[b][0].as_matrix()
        com0 = R0 @ art.com[b] + P0[b][1]
        com_p = Pp[b][0].as_matrix() @ art.com[b] + Pp[b][1]
        com_m = Pm[b][0].as_matrix() @ art.com[b] + Pm[b][1]
        v = (com_p - com_m) / (2 * eps)
        dR = (Pp[b][0].as_matrix() - Pm[b][0].as_matrix()) / (2 * eps)
        W = dR @ R0.T
        w = np.array([W[2, 1] - W[1, 2], W[0, 2] - W[2, 0], W[1, 0] - W[0, 1]]) / 2
        I_w = R0 @ art.inertia[b] @ R0.T
        T += 0.5 * art.mass[b] * v @ v + 0.5 * w @ I_w @ w
        V += art.mass[b] * 9.81 * com0[2]
    return T, V


def test_mass_and_bias_vs_numpy_fd_hand_arm():
    """Full 17-DoF branched hand-arm: M and bias vs a pure-numpy finite-
    difference Lagrangian oracle (independent FK, f64 — no jit)."""
    art = compile_urdf(HAND_ARM_URDF, default_armature=0.0)
    m = model_arrays(art)
    rng = np.random.default_rng(11)
    q = rng.uniform(-1, 1, art.nv)
    qd = rng.uniform(-1, 1, art.nv)
    gravity = jnp.asarray([0.0, 0.0, -9.81], jnp.float32)

    @jax.jit
    def mine(q, qd):
        fk = forward_kinematics(m, q[None])
        I_sp = world_spatial_inertias(m, fk)
        bv = body_velocities(m, fk, qd[None])
        return (
            mass_matrix(m, fk, I_sp)[0],
            bias_forces(m, fk, qd[None], gravity, I_sp, bv)[0],
        )

    M, bias = mine(jnp.asarray(q, jnp.float32), jnp.asarray(qd, jnp.float32))

    # oracle M via the quadratic form T(qd) = 0.5 qd^T M qd
    nv = art.nv
    e = np.eye(nv)
    T_single = np.array([_numpy_T_V(art, HAND_ARM_URDF, q, e[i])[0] for i in range(nv)])
    M_fd = np.zeros((nv, nv))
    for i in range(nv):
        M_fd[i, i] = 2 * T_single[i]
        for j in range(i + 1, nv):
            Tij = _numpy_T_V(art, HAND_ARM_URDF, q, e[i] + e[j])[0]
            M_fd[i, j] = M_fd[j, i] = Tij - T_single[i] - T_single[j]
    scale = max(1.0, np.abs(M_fd).max())
    np.testing.assert_allclose(np.asarray(M), M_fd, atol=2e-3 * scale)

    # oracle bias via Euler-Lagrange at qdd = 0. Step sizes balance
    # truncation vs roundoff: the outer t-derivative double-differences the
    # energy, so eps_t must be much larger than the inner eps_q.
    eps_q, eps_t = 1e-4, 1e-3

    def dT_dqd(qv):
        g = np.zeros(nv)
        for i in range(nv):
            Tp = _numpy_T_V(art, HAND_ARM_URDF, qv, qd + eps_q * e[i])[0]
            Tm = _numpy_T_V(art, HAND_ARM_URDF, qv, qd - eps_q * e[i])[0]
            g[i] = (Tp - Tm) / (2 * eps_q)
        return g

    dgdt = (dT_dqd(q + eps_t * qd) - dT_dqd(q - eps_t * qd)) / (2 * eps_t)
    dT_dq = np.zeros(nv)
    dV_dq = np.zeros(nv)
    for i in range(nv):
        Tp, Vp = _numpy_T_V(art, HAND_ARM_URDF, q + eps_q * e[i], qd)
        Tm, Vm = _numpy_T_V(art, HAND_ARM_URDF, q - eps_q * e[i], qd)
        dT_dq[i] = (Tp - Tm) / (2 * eps_q)
        dV_dq[i] = (Vp - Vm) / (2 * eps_q)
    bias_fd = dgdt - dT_dq + dV_dq
    np.testing.assert_allclose(
        np.asarray(bias), bias_fd, atol=1e-2 * max(1.0, np.abs(bias_fd).max())
    )


def test_double_pendulum_analytic_mass(dp_path):
    art = compile_urdf(dp_path, default_armature=0.0)
    m = model_arrays(art)
    m1, m2, l1, l2 = 1.5, 0.8, 0.7, 0.4
    th2 = 0.6
    q = jnp.asarray([[0.3, th2]], jnp.float32)

    @jax.jit
    def mm(q):
        fk = forward_kinematics(m, q)
        return mass_matrix(m, fk, world_spatial_inertias(m, fk))

    M = np.asarray(mm(q))[0]
    M11 = m1 * l1**2 + m2 * (l1**2 + l2**2 + 2 * l1 * l2 * np.cos(th2))
    M12 = m2 * (l2**2 + l1 * l2 * np.cos(th2))
    M22 = m2 * l2**2
    np.testing.assert_allclose(M, [[M11, M12], [M12, M22]], atol=1e-5)


def test_pendulum_energy_stability(dp_path):
    """Undamped double pendulum, semi-implicit Euler: energy stays bounded
    (no blow-up) over 2000 substeps at h = 1/240."""
    art = compile_urdf(dp_path, default_armature=0.0)
    m = model_arrays(art)
    gravity = jnp.asarray([0.0, 0.0, -9.81], jnp.float32)
    h = 1.0 / 240.0
    kp = jnp.zeros(art.nv)
    kd = jnp.zeros(art.nv)

    def substep(carry, _):
        q, qd = carry
        fk = forward_kinematics(m, q)
        dyn = compute_dyn(m, fk, qd, gravity, kp, kd, h)
        qdd = dyn.solve(-dyn.bias)
        qd = qd + h * qdd
        q = q + h * qd
        return (q, qd), None

    q0 = jnp.asarray([[1.2, 0.5]], jnp.float32)
    qd0 = jnp.zeros((1, 2), jnp.float32)

    @jax.jit
    def energy(q, qd):
        fk = forward_kinematics(m, q)
        I_sp = world_spatial_inertias(m, fk)
        bv = body_velocities(m, fk, qd)
        T = 0.5 * jnp.einsum("bni,bnij,bnj->b", bv, I_sp, bv)
        R = quat_to_matrix(fk.body_quat)
        com_w = fk.body_pos + jnp.einsum("bnij,nj->bni", R, m.com)
        V = -jnp.einsum("n,bn->b", m.mass, com_w @ gravity)
        return T + V

    e0 = float(energy(q0, qd0)[0])
    (q, qd), _ = jax.jit(
        lambda c: jax.lax.scan(substep, c, None, length=2000)
    )((q0, qd0))
    e1 = float(energy(q, qd)[0])
    # semi-implicit Euler is symplectic: energy oscillates but stays bounded
    # near e0 (scale mgl ~ 15 J) instead of drifting monotonically
    assert abs(e1 - e0) < 1.0, (e0, e1)


def test_stable_pd_tracks_target_hand_arm():
    """Full 17-DoF robot with reference PD gains tracks a target without
    instability at h = 1/120 (2 substeps of 60 Hz — the reference sim rate)."""
    import yaml

    art = compile_urdf(HAND_ARM_URDF)
    m = model_arrays(art)
    with open("/root/reference/isaacgymenvs/cfg/task/Ur5SihBase.yaml") as f:
        base_cfg = yaml.safe_load(f)
    kp = jnp.asarray(base_cfg["asset"]["dof_properties"]["prop_gain"], jnp.float32)
    kd = jnp.asarray(base_cfg["asset"]["dof_properties"]["deriv_gain"], jnp.float32)
    target = jnp.asarray(base_cfg["asset"]["joint_configurations"]["reset"], jnp.float32)[None]
    gravity = jnp.asarray([0.0, 0.0, -9.81], jnp.float32)
    h = 1.0 / 120.0

    from handarm_tpu.physics.dynamics import stable_pd_torque

    def substep(carry, _):
        q, qd = carry
        fk = forward_kinematics(m, q)
        dyn = compute_dyn(m, fk, qd, gravity, kp, kd, h)
        tau = stable_pd_torque(q, qd, target, kp, kd, h, m.effort_limit)
        qdd = dyn.solve(tau - dyn.bias)
        qd = qd + h * qdd
        q = q + h * qd
        return (q, qd), None

    q0 = jnp.zeros((1, art.nv), jnp.float32)
    qd0 = jnp.zeros((1, art.nv), jnp.float32)
    (q, qd), _ = jax.jit(
        lambda c: jax.lax.scan(substep, c, None, length=720)
    )((q0, qd0))  # 6 s
    assert np.all(np.isfinite(np.asarray(q)))
    # converged (no oscillation/instability)
    assert np.abs(np.asarray(qd)).max() < 0.01, np.asarray(qd)
    # settles at the stable-PD fixed point: kp (target - q) = g(q).
    # (A pure PD drive sags under gravity by tau_g / kp — ~0.3 rad at the
    # shoulder with the reference's kp=120; PhysX's position drive behaves
    # the same. Verify the sag is exactly gravity-consistent.)
    fk = forward_kinematics(m, q)
    I_sp = world_spatial_inertias(m, fk)
    bv = body_velocities(m, fk, qd)
    g_tau = np.asarray(
        bias_forces(m, fk, qd, gravity, I_sp, bv)
    )[0]
    residual = np.asarray(kp) * np.asarray(target[0] - q[0]) - g_tau
    scale = np.maximum(np.abs(g_tau), 1.0)
    assert np.all(np.abs(residual) / scale < 0.05), (residual, g_tau)
    # gravity-light joints (wrists, fingers) track tightly
    err = np.abs(np.asarray(q[0] - target[0]))
    assert err[3:].max() < 0.05, err

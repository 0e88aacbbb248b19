"""Floating-base dynamics oracles.

The reference's locomotion / dexterity-on-wheels tasks lean on PhysX's free
root joint (isaacgymenvs/tasks/ant.py root_states, humanoid.py); here the
6-dof world-screw base (physics/model.py compile_model, physics/kinematics.py
forward_kinematics) is validated against first-principles mechanics:

- mass-matrix structure (translation block = m_total * I3, symmetry, PD)
- ballistic projectile motion of a free body through the full engine step
- spatial-momentum rate == applied gravity wrench (checks M, bias, FK and
  the velocity model all at once, by finite differences — nothing shared
  with the implementation's RNEA sweep)
- internal joint torques conserve total momentum in zero gravity
- MJCF parsing of the reference nv_ant.xml (topology + geom-density mass)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handarm_tpu.physics.kinematics import (
    body_velocities,
    forward_kinematics,
    model_arrays,
)
from handarm_tpu.physics.dynamics import (
    bias_forces,
    mass_matrix,
    world_spatial_inertias,
)
from handarm_tpu.math.quat import quat_integrate, quat_to_matrix
from handarm_tpu.physics.model import compile_mjcf, compile_urdf

FREE_BODY = """
<robot name="brick">
  <link name="body">
    <inertial><mass value="1.7"/><origin xyz="0.03 -0.02 0.05"/>
      <inertia ixx="0.010" ixy="0" ixz="0" iyy="0.020" iyz="0" izz="0.032"/>
    </inertial>
  </link>
</robot>
"""

FREE_PENDULUM = """
<robot name="flyer">
  <link name="body">
    <inertial><mass value="1.2"/><origin xyz="0 0 0"/>
      <inertia ixx="0.01" ixy="0" ixz="0" iyy="0.015" iyz="0" izz="0.02"/>
    </inertial>
  </link>
  <joint name="arm" type="revolute">
    <parent link="body"/><child link="limb"/>
    <origin xyz="0.1 0 -0.1" rpy="0.2 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-10" upper="10" effort="100" velocity="100"/>
  </joint>
  <link name="limb">
    <inertial><mass value="0.5"/><origin xyz="0 0 -0.2"/>
      <inertia ixx="0.004" ixy="0" ixz="0" iyy="0.004" iyz="0" izz="0.001"/>
    </inertial>
  </link>
</robot>
"""


@pytest.fixture(scope="module")
def brick_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("fb") / "brick.urdf"
    p.write_text(FREE_BODY)
    return str(p)


@pytest.fixture(scope="module")
def flyer_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("fb2") / "flyer.urdf"
    p.write_text(FREE_PENDULUM)
    return str(p)


def _random_state(art, seed, base_speed=1.0):
    rng = np.random.default_rng(seed)
    q = np.zeros(art.nv)
    q[6:] = rng.uniform(-0.5, 0.5, art.nv - 6)
    qd = rng.uniform(-base_speed, base_speed, art.nv)
    bq = rng.normal(size=4)
    bq /= np.linalg.norm(bq)
    bp = rng.uniform(-0.5, 0.5, 3)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return f32(q)[None], f32(qd)[None], f32(bq)[None], f32(bp)[None]


def _momentum(m, fk, qd):
    """Total spatial momentum about the world origin, [B, 6] (ang, lin)."""
    I_sp = world_spatial_inertias(m, fk)
    bv = body_velocities(m, fk, qd)
    return jnp.einsum("bnij,bnj->bi", I_sp, bv)


def test_mass_matrix_structure(flyer_path):
    art = compile_urdf(flyer_path, default_armature=0.0, floating_base=True)
    assert art.floating and art.nv == 7 and art.nb == 2
    m = model_arrays(art)
    q, qd, bq, bp = _random_state(art, 3)

    @jax.jit
    def M_of(q, bq, bp):
        fk = forward_kinematics(m, q, bq, bp)
        return mass_matrix(m, fk, world_spatial_inertias(m, fk))[0]

    M = np.asarray(M_of(q, bq, bp))
    np.testing.assert_allclose(M, M.T, atol=1e-5)
    # translation-translation block: m_total * I3 regardless of pose
    m_tot = art.mass.sum()
    np.testing.assert_allclose(M[:3, :3], m_tot * np.eye(3), atol=1e-5)
    # positive definite
    w = np.linalg.eigvalsh(M)
    assert w.min() > 0, w


def test_projectile_motion(brick_path):
    """Full engine step: a spinning free brick follows the ballistic arc.

    Base linear dofs are the velocity of the body point at the world origin
    (origin Plücker), so launch with zero spin to make com motion explicit,
    then a pure-spin case to check attitude integration.
    """
    from handarm_tpu.physics import engine as E
    from handarm_tpu.physics.contacts import RobotSpheres, StaticGeom
    from handarm_tpu.physics.shapes import stack_objects

    art = compile_urdf(brick_path, default_armature=0.0, floating_base=True)
    spheres = RobotSpheres(
        body=np.zeros((0,), np.int32),
        offset=jnp.zeros((0, 3)),
        radius=jnp.zeros((0,)),
        friction=jnp.zeros((0,)),
    )
    geom = StaticGeom(
        table_lo=jnp.array([100.0, 100.0]),
        table_hi=jnp.array([101.0, 101.0]),
        table_height=jnp.asarray(0.0),
        friction=jnp.asarray(1.0),
    )
    scene = E.build_scene(
        art, stack_objects([]), spheres, geom,
        kp=jnp.zeros(art.nv), kd=jnp.zeros(art.nv),
        base_pos=np.array([0.0, 0.0, 3.0]),
        params=E.SimParams(dt=1 / 120, substeps=2),
    )
    s0 = E.initial_state(scene, B=1)
    v0 = jnp.array([[1.2, -0.4, 2.0, 0.0, 0.0, 0.0]])
    s0 = s0._replace(robot=s0.robot._replace(qd=v0))

    @jax.jit
    def roll(s):
        def body(s, _):
            s, _ = E.step(scene, s)
            return s, None
        return jax.lax.scan(body, s, None, length=60)[0]

    s = roll(s0)
    t = 60 / 120
    p_expect = np.array([0.0, 0.0, 3.0]) + np.array([1.2, -0.4, 2.0]) * t
    p_expect[2] -= 0.5 * 9.81 * t * t
    np.testing.assert_allclose(
        np.asarray(s.robot.base_pos[0]), p_expect, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(s.robot.qd[0, 2]), 2.0 - 9.81 * t, atol=2e-2
    )

    # pure spin about z at the com (com offset from body origin): attitude
    # advances by |w| t; z angular momentum is exactly preserved
    w0 = jnp.array([[0.0, 0.0, 0.0, 0.0, 0.0, 2.5]])
    # spin about a principal axis through the com: v_o = w x (o - com) etc.
    # z is principal here; place com on the z axis by zeroing xy offsets
    s1 = E.initial_state(scene, B=1)._replace(
        robot=E.initial_state(scene, B=1).robot._replace(qd=w0)
    )
    s1 = roll(s1)
    wz = float(s1.robot.qd[0, 5])
    np.testing.assert_allclose(wz, 2.5, atol=5e-2)


@pytest.mark.parametrize("which", ["flyer", "ant"])
def test_momentum_rate_equals_gravity_wrench(which, flyer_path):
    """d/dt(total spatial momentum) == gravity wrench, by finite differences.

    Advance the configuration by eps along qd (base pose by its twist, the
    chart the engine integrates in) and the velocity by eps * qdd from
    M qdd = -bias; the momentum difference quotient must equal the external
    wrench (sum_i m_i g, sum_i c_i x m_i g). This closes the loop on FK,
    world inertias, CRBA and the bias sweep with an independent predicate.
    """
    if which == "ant":
        art, _ = compile_mjcf("/root/reference/assets/mjcf/nv_ant.xml")
    else:
        art = compile_urdf(flyer_path, default_armature=0.0, floating_base=True)
    m = model_arrays(art)
    q, qd, bq, bp = _random_state(art, 11)
    g = jnp.asarray([0.0, 0.0, -9.81], jnp.float32)
    eps = 1e-4

    @jax.jit
    def fd(q, qd, bq, bp):
        fk = forward_kinematics(m, q, bq, bp)
        I_sp = world_spatial_inertias(m, fk)
        bv = body_velocities(m, fk, qd)
        M = mass_matrix(m, fk, I_sp)
        bias = bias_forces(m, fk, qd, g, I_sp, bv)
        qdd = jnp.linalg.solve(M, -bias[..., None])[..., 0]

        # central difference along the flow: joints additively, base by its
        # twist (the chart the engine integrates in). Central kills the
        # O(eps) truncation term, which dominates for this light, fast model.
        v_o, w = qd[:, 0:3], qd[:, 3:6]

        def shifted(s):
            bp1 = bp + s * (v_o + jnp.cross(w, bp))
            bq1 = quat_integrate(bq, w, s)
            q1 = q.at[:, 6:].add(s * qd[:, 6:])
            fk1 = forward_kinematics(m, q1, bq1, bp1)
            return _momentum(m, fk1, qd + s * qdd)

        h0, h1 = shifted(-eps), shifted(eps)

        com_w = fk.body_pos + jnp.einsum(
            "bnij,nj->bni", quat_to_matrix(fk.body_quat), m.com
        )
        f = m.mass[None, :, None] * g  # [1, nb, 3]
        wrench = jnp.concatenate(
            [jnp.sum(jnp.cross(com_w, f), axis=1), jnp.sum(f, axis=1)], axis=-1
        )
        return (h1 - h0) / (2 * eps), wrench

    dh, wrench = fd(q, qd, bq, bp)
    np.testing.assert_allclose(
        np.asarray(dh[0]), np.asarray(wrench[0]), atol=5e-3, rtol=1e-3
    )


def test_internal_torques_conserve_momentum(flyer_path):
    """Zero gravity: joint torques are internal forces — momentum rate 0."""
    art = compile_urdf(flyer_path, default_armature=0.0, floating_base=True)
    m = model_arrays(art)
    q, qd, bq, bp = _random_state(art, 5)
    g = jnp.zeros(3, jnp.float32)
    eps = 1e-4

    @jax.jit
    def fd(q, qd, bq, bp):
        fk = forward_kinematics(m, q, bq, bp)
        I_sp = world_spatial_inertias(m, fk)
        bv = body_velocities(m, fk, qd)
        M = mass_matrix(m, fk, I_sp)
        bias = bias_forces(m, fk, qd, g, I_sp, bv)
        tau = jnp.zeros_like(qd).at[:, 6:].set(3.0)  # joint torque only
        qdd = jnp.linalg.solve(M, (tau - bias)[..., None])[..., 0]
        v_o, w = qd[:, 0:3], qd[:, 3:6]

        def shifted(s):
            bp1 = bp + s * (v_o + jnp.cross(w, bp))
            bq1 = quat_integrate(bq, w, s)
            q1 = q.at[:, 6:].add(s * qd[:, 6:])
            fk1 = forward_kinematics(m, q1, bq1, bp1)
            return _momentum(m, fk1, qd + s * qdd)

        return (shifted(eps) - shifted(-eps)) / (2 * eps)

    dh = np.asarray(fd(q, qd, bq, bp)[0])
    np.testing.assert_allclose(dh, np.zeros(6), atol=5e-3)


def test_mjcf_ant_parse():
    art, extras = compile_mjcf("/root/reference/assets/mjcf/nv_ant.xml")
    assert art.floating and art.nv == 14 and art.nb == 9
    assert extras.floating
    # 8 actuated joints, gear 15 (nv_ant.xml <motor gear="15">)
    assert len(extras.motor_gears) == 8
    assert all(abs(gv - 15.0) < 1e-9 for gv in extras.motor_gears.values())
    # geom-density mass (density 5.0 default class): stable regression value
    np.testing.assert_allclose(art.mass.sum(), 0.91088, atol=1e-3)
    # collision spheres derived for every body
    assert sum(len(v) for v in extras.link_spheres.values()) > 0
    for jn in ("hip_1", "ankle_1", "hip_4", "ankle_4"):
        assert jn in art.joint_names

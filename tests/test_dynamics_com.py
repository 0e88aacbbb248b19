"""COM-referenced (Gram-product) dynamics vs the 6x6 spatial-inertia oracle.

`compute_dyn` runs the TPU-native COM form (dynamics.mass_matrix_com /
bias_forces_com: no [B, nb, 6, 6] tensors, mass matrix as an exact G G^T).
These tests pin it element-wise to the textbook world-spatial-inertia CRBA /
RNEA implementations kept in dynamics.py as oracles, on both a floating-base
model and the fixed-base UR5+SIH arm (reference workload:
isaacgymenvs/tasks/hand_arm/base/ur5sih.py dynamics via PhysX).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from handarm_tpu.math.quat import quat_rotate
from handarm_tpu.physics.dynamics import (
    bias_forces,
    bias_forces_com,
    body_coms_world,
    mass_matrix,
    mass_matrix_com,
    world_spatial_inertias,
)
from handarm_tpu.physics.kinematics import (
    body_velocities,
    forward_kinematics,
    model_arrays,
)
from handarm_tpu.physics.model import compile_urdf

FLYER = """
<robot name="flyer">
  <link name="body">
    <inertial><mass value="1.2"/><origin xyz="0.02 -0.01 0.03"/>
      <inertia ixx="0.01" ixy="0.001" ixz="0" iyy="0.015" iyz="0.002" izz="0.02"/>
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
  <joint name="slide" type="prismatic">
    <parent link="limb"/><child link="tip"/>
    <origin xyz="0 0 -0.3"/><axis xyz="1 0 0"/>
    <limit lower="-1" upper="1" effort="50" velocity="10"/>
  </joint>
  <link name="tip">
    <inertial><mass value="0.1"/><origin xyz="0.01 0 0"/>
      <inertia ixx="0.0002" ixy="0" ixz="0" iyy="0.0002" iyz="0" izz="0.0002"/>
    </inertial>
  </link>
</robot>
"""


@pytest.fixture(scope="module")
def flyer(tmp_path_factory):
    p = tmp_path_factory.mktemp("dyncom") / "flyer.urdf"
    p.write_text(FLYER)
    return compile_urdf(p, default_armature=0.0, floating_base=True)


def _rand(m, seed, B=3):
    rng = np.random.default_rng(seed)
    q = rng.uniform(-0.6, 0.6, (B, m.nv)).astype(np.float32)
    if m.floating:
        q[:, :6] = 0.0
    qd = rng.uniform(-2.0, 2.0, (B, m.nv)).astype(np.float32)
    bq = rng.normal(size=(B, 4)).astype(np.float32)
    bq /= np.linalg.norm(bq, axis=-1, keepdims=True)
    bp = rng.uniform(-0.4, 0.4, (B, 3)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(qd), jnp.asarray(bq), jnp.asarray(bp)


def _check_model(art, seed):
    m = model_arrays(art)
    q, qd, bq, bp = _rand(m, seed)
    fk = forward_kinematics(m, q, bq if art.floating else None,
                            bp if art.floating else None)
    I_sp = world_spatial_inertias(m, fk)
    bv = body_velocities(m, fk, qd)
    com_w = body_coms_world(m, fk)
    g = jnp.asarray([0.0, 0.0, -9.81])

    M_ref = mass_matrix(m, fk, I_sp)
    M_com = mass_matrix_com(m, fk, com_w)
    scale = float(jnp.max(jnp.abs(M_ref)))
    np.testing.assert_allclose(
        np.asarray(M_com), np.asarray(M_ref), atol=2e-5 * scale, rtol=2e-4
    )
    # exact symmetry by construction
    np.testing.assert_allclose(
        np.asarray(M_com), np.asarray(jnp.swapaxes(M_com, -1, -2)), rtol=0,
        atol=0,
    )

    b_ref = bias_forces(m, fk, qd, g, I_sp, bv)
    b_com = bias_forces_com(m, fk, qd, g, com_w, bv)
    bscale = float(jnp.max(jnp.abs(b_ref))) + 1.0
    np.testing.assert_allclose(
        np.asarray(b_com), np.asarray(b_ref), atol=3e-5 * bscale, rtol=3e-4
    )


def test_floating_base_matches_oracle(flyer):
    _check_model(flyer, seed=0)


def test_inertia_chol_reconstructs(flyer):
    m = model_arrays(flyer)
    L = np.asarray(m.inertia_chol, np.float64)
    I = np.asarray(m.inertia, np.float64)
    np.testing.assert_allclose(L @ np.swapaxes(L, -1, -2), I, atol=1e-9)


def test_ur5sih_matches_oracle():
    from handarm_tpu.robots.ur5sih import load_ur5sih

    art = load_ur5sih()
    _check_model(art, seed=1)


def test_point_mass_link_no_nan(tmp_path):
    """A degenerate zero-inertia link must not poison the Gram factor (the
    eigh-based square root clamps negative/zero eigenvalues; a Cholesky
    would NaN here)."""
    p = tmp_path / "pm.urdf"
    p.write_text(
        """
<robot name="pm">
  <link name="base">
    <inertial><mass value="1.0"/>
      <inertia ixx="0.01" ixy="0" ixz="0" iyy="0.01" iyz="0" izz="0.01"/>
    </inertial>
  </link>
  <joint name="j" type="revolute">
    <parent link="base"/><child link="pt"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 0 1"/>
    <limit lower="-3" upper="3" effort="10" velocity="10"/>
  </joint>
  <link name="pt">
    <inertial><mass value="0.2"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/>
    </inertial>
  </link>
</robot>
"""
    )
    art = compile_urdf(p, default_armature=0.0)
    m = model_arrays(art)
    q = jnp.zeros((2, m.nv))
    fk = forward_kinematics(m, q)
    com_w = body_coms_world(m, fk)
    M = mass_matrix_com(m, fk, com_w)
    assert bool(jnp.all(jnp.isfinite(M)))

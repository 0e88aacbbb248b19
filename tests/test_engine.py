"""End-to-end physics engine behavior: drops, resting contact, friction."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handarm_tpu.physics.contacts import RobotSpheres, StaticGeom
from handarm_tpu.physics.engine import (
    PhysicsState,
    SimParams,
    build_scene,
    initial_state,
    step,
)
from handarm_tpu.physics.model import compile_urdf
from handarm_tpu.physics.shapes import make_box_object, make_sphere_object, stack_objects

HAND_ARM_URDF = "/root/reference/assets/hand_arm/robot/hand_arm.urdf"

TINY_ARM = """
<robot name="tiny">
  <link name="base"/>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 0.1"/><axis xyz="0 1 0"/>
    <limit lower="-3" upper="3" effort="50" velocity="10"/>
  </joint>
  <link name="l1">
    <inertial><mass value="1.0"/><origin xyz="0.2 0 0"/>
      <inertia ixx="0.01" ixy="0" ixz="0" iyy="0.01" iyz="0" izz="0.01"/></inertial>
  </link>
</robot>
"""


def tiny_scene(tmp_path, objs, table_height=0.0, spheres=None, substeps=2,
               params=None):
    p = tmp_path / "tiny.urdf"
    p.write_text(TINY_ARM)
    art = compile_urdf(str(p))
    if spheres is None:
        spheres = RobotSpheres(
            body=np.array([0], dtype=np.int32),
            offset=jnp.asarray([[0.4, 0.0, 0.0]], jnp.float32),
            radius=jnp.asarray([0.05], jnp.float32),
            friction=jnp.asarray([1.0], jnp.float32),
        )
    geom = StaticGeom(
        table_lo=jnp.asarray([-10.0, -10.0]),
        table_hi=jnp.asarray([10.0, 10.0]),
        table_height=jnp.asarray(table_height),
        friction=jnp.asarray(1.0),
    )
    shapes = stack_objects(objs)
    scene = build_scene(
        art, shapes, spheres, geom,
        kp=np.full(art.nv, 50.0), kd=np.full(art.nv, 5.0),
        base_pos=(0.0, 0.0, 1.0),
        params=params or SimParams(substeps=substeps),
    )
    return scene


def run_steps(scene, state, n):
    stepj = jax.jit(lambda s: step(scene, s)[0])
    for _ in range(n):
        state = stepj(state)
    return state


def test_box_drop_settles_on_table(tmp_path):
    scene = tiny_scene(tmp_path, [make_box_object([0.03, 0.04, 0.05], mass=0.2)], table_height=0.5)
    state = initial_state(scene, B=4, obj_pos0=jnp.asarray([[0.5, 0.0, 0.8]]))
    state = run_steps(scene, state, 90)  # 1.5 s
    z = np.asarray(state.objects.pos[:, 0, 2])
    np.testing.assert_allclose(z, 0.55, atol=0.01)  # rests on table at h + hz
    v = np.asarray(state.objects.linvel)
    assert np.abs(v).max() < 0.05


def test_sphere_drop_bounces_not_through_ground(tmp_path):
    scene = tiny_scene(tmp_path, [make_sphere_object(0.04, mass=0.1)])
    state = initial_state(scene, B=2, obj_pos0=jnp.asarray([[0.5, 0.2, 0.6]]))
    traj_min = 1.0
    stepj = jax.jit(lambda s: step(scene, s)[0])
    for _ in range(120):
        state = stepj(state)
        traj_min = min(traj_min, float(np.asarray(state.objects.pos[:, 0, 2]).min()))
    assert traj_min > 0.02  # never tunnels through the ground
    z = np.asarray(state.objects.pos[:, 0, 2])
    np.testing.assert_allclose(z, 0.04, atol=0.01)


def test_friction_holds_box_on_table(tmp_path):
    """A resting box under gravity should not drift laterally."""
    scene = tiny_scene(tmp_path, [make_box_object([0.05, 0.05, 0.02], mass=0.5)], table_height=0.3)
    state = initial_state(scene, B=2, obj_pos0=jnp.asarray([[0.6, -0.2, 0.33]]))
    state = run_steps(scene, state, 120)
    xy = np.asarray(state.objects.pos[:, 0, :2])
    np.testing.assert_allclose(xy, np.tile([[0.6, -0.2]], (2, 1)), atol=0.01)


def test_robot_sphere_pushes_box(tmp_path):
    """Swinging the 1-DoF arm's sphere through a box knocks it along -x.

    Arm base (0,0,1), joint at z=1.1, sphere center at 0.4 m along the link
    (radius 0.05). Rotating q: 0 -> 1.3 about +y sweeps the sphere from
    (0.4, 0, 1.1) down/left through (0.19, 0, 0.75) — put the box there."""
    scene = tiny_scene(
        tmp_path, [make_box_object([0.04, 0.04, 0.04], mass=0.05)],
        table_height=0.7,
    )
    state = initial_state(scene, B=1, obj_pos0=jnp.asarray([[0.19, 0.0, 0.74]]))
    state = state._replace(
        robot=state.robot._replace(targets=jnp.asarray([[1.3]], jnp.float32))
    )
    x0 = float(state.objects.pos[0, 0, 0])
    state = run_steps(scene, state, 90)
    x1 = float(state.objects.pos[0, 0, 0])
    assert np.all(np.isfinite(np.asarray(state.objects.pos)))
    assert x1 < x0 - 0.02, (x0, x1)


def test_restitution_bounce(tmp_path):
    """A sphere dropped with restitution e rebounds to ~e^2 of its fall
    height (Newtonian bounce via the solver's restitution bias)."""
    from handarm_tpu.physics.solver import SolverParams

    scene = tiny_scene(
        tmp_path, [make_sphere_object(0.04, mass=0.1)],
        params=SimParams(substeps=2, solver=SolverParams(restitution=0.8)),
    )
    # fall height 0.5 m -> impact ~3.13 m/s -> rebound apex ~ 0.8^2 * 0.5 = 0.32
    state = initial_state(scene, B=2, obj_pos0=jnp.asarray([[0.5, 0.2, 0.54]]))
    stepj = jax.jit(lambda s: step(scene, s)[0])
    apex = 0.0
    for t in range(70):
        state = stepj(state)
        z = float(np.asarray(state.objects.pos[:, 0, 2]).min())
        if t > 22:  # after first impact (~0.32 s)
            apex = max(apex, z - 0.04)
    assert 0.18 < apex < 0.45, apex


def test_zero_restitution_no_bounce(tmp_path):
    """Default params: the same drop stays dead on the ground (regression
    guard that the restitution path is inert at e=0)."""
    scene = tiny_scene(tmp_path, [make_sphere_object(0.04, mass=0.1)])
    state = initial_state(scene, B=1, obj_pos0=jnp.asarray([[0.5, 0.2, 0.54]]))
    stepj = jax.jit(lambda s: step(scene, s)[0])
    apex = 0.0
    for t in range(70):
        state = stepj(state)
        if t > 26:
            apex = max(apex, float(state.objects.pos[0, 0, 2]) - 0.04)
    assert apex < 0.05, apex


def test_jacobi_vs_gs_cross_check(tmp_path):
    """The vectorized Jacobi solver and the PhysX-faithful sequential-impulse
    GS solver settle the same scene to the same configuration (bounded
    divergence on a stack + robot-sphere scene)."""
    from handarm_tpu.physics.solver import SolverParams

    objs = [
        make_box_object([0.05, 0.05, 0.05], mass=0.3),
        make_box_object([0.04, 0.04, 0.04], mass=0.2),
    ]
    finals = {}
    for mode in ("jacobi", "gs"):
        scene = tiny_scene(
            tmp_path, objs,
            params=SimParams(
                substeps=2, solver=SolverParams(mode=mode, iterations=8)
            ),
        )
        state = initial_state(
            scene, B=1,
            obj_pos0=jnp.asarray([[0.5, 0.0, 0.06], [0.5, 0.0, 0.2]]),
        )
        state = run_steps(scene, state, 120)
        finals[mode] = (
            np.asarray(state.objects.pos[0]),
            np.asarray(state.robot.q[0]),
        )
    pos_j, q_j = finals["jacobi"]
    pos_g, q_g = finals["gs"]
    np.testing.assert_allclose(pos_j, pos_g, atol=0.02)
    np.testing.assert_allclose(q_j, q_g, atol=0.05)
    # both must actually be settled stacks
    np.testing.assert_allclose(pos_j[:, 2], [0.05, 0.14], atol=0.015)


def test_stack_two_boxes(tmp_path):
    objs = [
        make_box_object([0.05, 0.05, 0.05], mass=0.3),
        make_box_object([0.04, 0.04, 0.04], mass=0.2),
    ]
    scene = tiny_scene(tmp_path, objs, table_height=0.0)
    state = initial_state(
        scene, B=2,
        obj_pos0=jnp.asarray([[0.5, 0.0, 0.06], [0.5, 0.0, 0.2]]),
    )
    state = run_steps(scene, state, 150)
    z = np.asarray(state.objects.pos[0, :, 2])
    np.testing.assert_allclose(z[0], 0.05, atol=0.01)
    np.testing.assert_allclose(z[1], 0.14, atol=0.015)  # stacked on top


def test_rolling_friction_stops_sphere(tmp_path):
    """A rolling sphere conserves momentum forever without rolling
    resistance; with it, contact-supported rolling decays to rest
    (PhysX contact-patch analog, SolverParams.rolling_friction)."""
    from handarm_tpu.physics.solver import SolverParams
    objs = [make_sphere_object(0.05, mass=0.2)]
    finals = {}
    for mu_roll in (0.0, 0.005):
        scene = tiny_scene(
            tmp_path, objs, table_height=0.0,
            params=SimParams(solver=SolverParams(rolling_friction=mu_roll)),
        )
        state = initial_state(
            scene, B=1, obj_pos0=jnp.asarray([[0.5, 0.0, 0.05]])
        )
        # rolling without slipping: v = w x r
        obj = state.objects._replace(
            linvel=jnp.asarray([[[0.5, 0.0, 0.0]]]),
            angvel=jnp.asarray([[[0.0, 10.0, 0.0]]]),
        )
        state = state._replace(objects=obj)
        state = run_steps(scene, state, 180)
        finals[mu_roll] = (
            float(jnp.linalg.norm(state.objects.linvel[0, 0])),
            float(state.objects.pos[0, 0, 0]),
        )
    v_free, x_free = finals[0.0]
    v_roll, x_roll = finals[0.005]
    assert v_free > 0.25, v_free  # no rolling friction: still rolling
    assert v_roll < 0.02, v_roll  # with it: stopped
    assert x_roll < x_free  # and travelled strictly less


def test_bin_walls_contain_kicked_sphere(tmp_path):
    """Wall AABBs (bin) block a fast object; without walls it escapes the
    region (reference bin assets, env/multi_object.py:422-435)."""
    objs = [make_sphere_object(0.04, mass=0.2)]
    p = tmp_path / "tiny2.urdf"
    p.write_text(TINY_ARM)
    art = compile_urdf(str(p))
    spheres = RobotSpheres(
        body=np.array([0], dtype=np.int32),
        offset=jnp.asarray([[0.4, 0.0, 0.0]], jnp.float32),
        radius=jnp.asarray([0.05], jnp.float32),
        friction=jnp.asarray([1.0], jnp.float32),
    )
    wall_lo = np.array(
        [[0.19, -0.3, 0.0], [0.81, -0.3, 0.0],
         [0.19, -0.31, 0.0], [0.19, 0.3, 0.0]], np.float32)
    wall_hi = np.array(
        [[0.20, 0.3, 0.15], [0.82, 0.3, 0.15],
         [0.82, -0.3, 0.15], [0.82, 0.31, 0.15]], np.float32)
    geom = StaticGeom(
        table_lo=jnp.asarray([-10.0, -10.0]),
        table_hi=jnp.asarray([10.0, 10.0]),
        table_height=jnp.asarray(0.0),
        friction=jnp.asarray(1.0),
        wall_lo=wall_lo,
        wall_hi=wall_hi,
    )
    shapes = stack_objects(objs)
    scene = build_scene(
        art, shapes, spheres, geom,
        kp=np.full(art.nv, 50.0), kd=np.full(art.nv, 5.0),
        base_pos=(0.0, 0.0, 1.0),
        params=SimParams(),
    )
    state = initial_state(scene, B=1, obj_pos0=jnp.asarray([[0.5, 0.0, 0.04]]))
    obj = state.objects._replace(linvel=jnp.asarray([[[-2.0, 0.6, 0.0]]]))
    state = state._replace(objects=obj)
    state = run_steps(scene, state, 150)
    pos = np.asarray(state.objects.pos[0, 0])
    assert 0.20 < pos[0] < 0.82, pos  # stopped by the -x wall
    assert -0.31 < pos[1] < 0.31, pos
    assert pos[2] < 0.1, pos  # still on the floor, not launched


def run_steps_heavy(scene, state, n, every=3):
    """Advance n sim steps refreshing heavy prep only every `every` steps
    (the heavy_prep_per_control cadence: compute_heavy + step(heavy=...))."""
    from handarm_tpu.physics.engine import compute_heavy

    heavy_fn = jax.jit(lambda s: compute_heavy(scene, s))
    stepj = jax.jit(lambda s, h: step(scene, s, heavy=h)[0])
    for i in range(n):
        if i % every == 0:
            heavy = heavy_fn(state)
        state = stepj(state, heavy)
    return state


def test_box_drop_settles_under_heavy_cadence(tmp_path):
    """Stability probe for HeavyPrep reuse (mass structure frozen over a
    20 Hz control interval): the drop/settle behavior must match the
    per-step-prep path within contact tolerances."""
    scene = tiny_scene(tmp_path, [make_box_object([0.03, 0.04, 0.05], mass=0.2)], table_height=0.5)
    state = initial_state(scene, B=4, obj_pos0=jnp.asarray([[0.5, 0.0, 0.8]]))
    state = run_steps_heavy(scene, state, 90, every=3)
    z = np.asarray(state.objects.pos[:, 0, 2])
    np.testing.assert_allclose(z, 0.55, atol=0.01)
    assert np.abs(np.asarray(state.objects.linvel)).max() < 0.05


def test_stack_survives_heavy_cadence(tmp_path):
    objs = [
        make_box_object([0.05, 0.05, 0.05], mass=0.3),
        make_box_object([0.04, 0.04, 0.04], mass=0.2),
    ]
    scene = tiny_scene(tmp_path, objs, table_height=0.0)
    state = initial_state(
        scene, B=2,
        obj_pos0=jnp.asarray([[0.5, 0.0, 0.06], [0.5, 0.0, 0.2]]),
    )
    state = run_steps_heavy(scene, state, 150, every=3)
    z = np.asarray(state.objects.pos[0, :, 2])
    np.testing.assert_allclose(z[0], 0.05, atol=0.01)
    np.testing.assert_allclose(z[1], 0.14, atol=0.015)


def test_friction_holds_under_heavy_cadence(tmp_path):
    scene = tiny_scene(tmp_path, [make_box_object([0.05, 0.05, 0.02], mass=0.5)], table_height=0.3)
    state = initial_state(scene, B=2, obj_pos0=jnp.asarray([[0.6, -0.2, 0.33]]))
    state = run_steps_heavy(scene, state, 120, every=3)
    xy = np.asarray(state.objects.pos[:, 0, :2])
    np.testing.assert_allclose(xy, np.tile([[0.6, -0.2]], (2, 1)), atol=0.01)


def test_env_heavy_prep_per_control_sane(tmp_path):
    """The env-level flag: a full hand-arm env steps finitely and objects
    rest at table height with heavy prep per control step."""
    from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv

    env = HandArmEnv(HandArmConfig(
        num_envs=2, episode_length=10, observations=("ur5_joint_pos",),
        heavy_prep_per_control=True,
    ))
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    stepj = jax.jit(env.step)
    for _ in range(10):
        state, res = stepj(state, jnp.zeros((2, env.num_actions)))
    assert bool(jnp.isfinite(res.obs).all())
    z = np.asarray(state.physics.objects.pos[:, 0, 2])
    np.testing.assert_allclose(z, 0.532, atol=0.02)  # rests on the table

"""RobotAdapter for the Hello-Robot Stretch (reference stretch.py)."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from handarm_tpu.robots import RobotAdapter
from handarm_tpu.robots.stretch import (
    BRINGUP_JOINT_CONFIG,
    DEFAULT_DERIV_GAIN,
    DEFAULT_PROP_GAIN,
    FINGERTIP_SITES,
    RESET_JOINT_CONFIG,
    STRETCH_URDF,
    load_stretch,
    make_stretch_spheres,
)


class StretchControl(NamedTuple):
    joint_target: jnp.ndarray  # [B, 9]


@functools.lru_cache(maxsize=2)
def stretch_surface_cloud(total_points: int = 128):
    from handarm_tpu.physics.urdf import parse_urdf
    from handarm_tpu.robots.ur5sih import _quat_to_mat_np
    from handarm_tpu.utils.mesh import load_mesh

    art = load_stretch()
    urdf = parse_urdf(STRETCH_URDF)
    metas = []
    for link_name, link in urdf.links.items():
        site = art.sites.get(link_name)
        if site is None or site.body < 0 or not link.collisions:
            continue
        for col in link.collisions:
            if col.geometry.kind != "mesh":
                continue
            try:
                mesh = load_mesh(col.geometry.mesh_path, col.geometry.mesh_scale)
            except FileNotFoundError:
                continue
            metas.append((site, col, mesh, mesh.area()))
    total_area = sum(a for *_, a in metas) or 1.0
    rng = np.random.default_rng(11)
    bodies, offsets = [], []
    for site, col, mesh, area in metas:
        n = max(1, int(round(total_points * area / total_area)))
        pts = mesh.sample_surface(n, rng)
        pts = pts @ col.origin_rot.T + col.origin_pos
        pts = pts @ _quat_to_mat_np(site.quat).T + site.pos
        bodies.extend([site.body] * n)
        offsets.append(pts)
    return np.array(bodies, dtype=np.int32), np.concatenate(offsets)


def _register_stretch_actionable():
    from handarm_tpu.envs.hand_arm import REGISTRY

    if "stretch_relative_joint_pos" in REGISTRY.actionables:
        return

    @REGISTRY.actionable("stretch_relative_joint_pos", 5)
    def _act_stretch_rel(env, control: StretchControl, a):
        # grouped relative targets with per-group scaling
        # (reference stretch.py:216-229, action_scale=0.25)
        dt, s = env.cfg.dt, 0.25
        t = control.joint_target
        t = t.at[:, 0:2].add(dt * s * a[:, 0:2])
        t = t.at[:, 2:6].add(dt * s * a[:, 2:3])  # telescoping arm, shared
        t = t.at[:, 6:7].add(dt * 8 * s * a[:, 3:4])  # wrist yaw
        t = t.at[:, 7:9].add(dt * 6 * s * a[:, 4:5])  # gripper fingers
        lo = jnp.asarray(env.art.q_min, jnp.float32)
        hi = jnp.asarray(env.art.q_max, jnp.float32)
        return control._replace(joint_target=jnp.clip(t, lo, hi))


def make_adapter() -> RobotAdapter:
    art = load_stretch()
    reset_q = np.asarray(RESET_JOINT_CONFIG)
    _register_stretch_actionable()

    def init_control(B: int) -> StretchControl:
        return StretchControl(
            joint_target=jnp.broadcast_to(
                jnp.asarray(reset_q, jnp.float32), (B, art.nv)
            )
        )

    def compute_targets(env, control: StretchControl, q):
        return control.joint_target

    def register_observables(registry, env):
        from handarm_tpu.envs.hand_arm import _mk_obs

        tips = env._sites(FINGERTIP_SITES)
        flange = env._sites(["link_grasp_center"])
        from handarm_tpu.physics.kinematics import site_poses

        def tip_pos(ctx):
            _, p = site_poses(ctx.fk, *tips)
            return p.reshape(ctx.batch, -1)

        def flange_pose(ctx):
            q_, p = site_poses(ctx.fk, *flange)
            return jnp.concatenate([p[:, 0], q_[:, 0]], axis=-1)

        def tip_linvel(ctx):
            from handarm_tpu.physics.kinematics import body_velocities

            bv = body_velocities(
                env.scene.model, ctx.fk, ctx.state.physics.robot.qd
            )
            _, p = site_poses(ctx.fk, *tips)
            v = bv[:, tips[0]]
            lin = v[..., 3:] + jnp.cross(v[..., :3], p)
            return lin.reshape(ctx.batch, -1)

        registry.observables["stretch_fingertip_pos"] = _mk_obs(
            "stretch_fingertip_pos", 6, tip_pos
        )
        registry.observables["stretch_fingertip_linvel"] = _mk_obs(
            "stretch_fingertip_linvel", 6, tip_linvel
        )
        registry.observables["stretch_flange_pose"] = _mk_obs(
            "stretch_flange_pose", 7, flange_pose
        )
        registry.observables["stretch_joint_pos"] = _mk_obs(
            "stretch_joint_pos", art.nv,
            lambda ctx: ctx.state.physics.robot.q,
        )

    adapter = RobotAdapter(
        name="stretch",
        art=art,
        make_spheres=lambda hand_only: make_stretch_spheres(hand_only=hand_only),
        fingertip_site_names=list(FINGERTIP_SITES),
        flange_site_name="link_grasp_center",
        reset_q=reset_q,
        bringup_q=np.asarray(BRINGUP_JOINT_CONFIG),
        kp=np.asarray(DEFAULT_PROP_GAIN),
        kd=np.asarray(DEFAULT_DERIV_GAIN),
        default_actions=("stretch_relative_joint_pos",),
        init_control=init_control,
        compute_targets=compute_targets,
        register_observables=register_observables,
        # 180° yaw: the telescoping arm extends toward the base's local -y,
        # so the mount must face it at the bin (+y in the world); xy offset
        # mirrors the reference actor pose (base/stretch.py:97). Without
        # this the bin is entirely OUTSIDE the reach envelope (measured:
        # grasp-center y range [-0.55, -0.11] vs bin at y ~ +0.64) and no
        # policy can ever succeed.
        base_xy=(0.2, 0.175),
        base_yaw=np.pi,
    )
    adapter.surface_cloud = stretch_surface_cloud
    return adapter

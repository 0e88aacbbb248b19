"""Hello-Robot Stretch: model build and grouped relative joint control.

TPU-native re-design of the reference Stretch robot class (isaacgymenvs/
tasks/hand_arm/base/stretch.py): 9 DoF (mast, lift, 4 telescoping arm
segments, wrist yaw, 2 gripper fingers), one 5-dim grouped relative action
(stretch.py:216-229: [mast, lift, arm(all 4 segments), wrist x8 scale,
gripper x6 scale]), fingertip_left/right observables.
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

from handarm_tpu.physics.contacts import RobotSpheres
from handarm_tpu.physics.model import Articulation, compile_urdf
from handarm_tpu.robots.ur5sih import ASSET_ROOT, _quat_to_mat_np
from handarm_tpu.utils.mesh import fit_spheres, load_mesh

STRETCH_URDF = os.path.join(ASSET_ROOT, "stretch", "stretch.urdf")

STRETCH_JOINTS = [
    "joint_mast", "joint_lift",
    "joint_arm_l3", "joint_arm_l2", "joint_arm_l1", "joint_arm_l0",
    "joint_wrist_yaw",
    "joint_gripper_finger_left", "joint_gripper_finger_right",
]
FINGERTIP_SITES = ["fingertip_left", "fingertip_right"]

DEFAULT_PROP_GAIN = [400.0, 400.0, 200.0, 200.0, 200.0, 200.0, 40.0, 10.0, 10.0]
DEFAULT_DERIV_GAIN = [40.0, 40.0, 20.0, 20.0, 20.0, 20.0, 4.0, 1.0, 1.0]
# reference StretchBase.yaml:7-8: reset lift 0.7 / arm retracted / fingers
# open; bringup lift 0.9 with wrist yawed 90deg clear of the bin
RESET_JOINT_CONFIG = [0.0, 0.7, 0.0, 0.0, 0.0, 0.0, 0.0, 0.6, 0.6]
BRINGUP_JOINT_CONFIG = [0.0, 0.9, 0.0, 0.0, 0.0, 0.0, 1.571, 0.6, 0.6]


@functools.lru_cache(maxsize=2)
def load_stretch(urdf_path: str = STRETCH_URDF) -> Articulation:
    art = compile_urdf(urdf_path)
    # traversal order must match the grouped-action layout
    assert art.joint_names == STRETCH_JOINTS, art.joint_names
    return art


@functools.lru_cache(maxsize=2)
def stretch_collision_spheres(
    urdf_path: str = STRETCH_URDF, spheres_per_link: int = 2
) -> tuple:
    art = load_stretch(urdf_path)
    from handarm_tpu.physics.urdf import parse_urdf

    urdf = parse_urdf(urdf_path)
    bodies, centers, radii = [], [], []
    for link_name, link in urdf.links.items():
        site = art.sites.get(link_name)
        if site is None or site.body < 0 or not link.collisions:
            continue
        pts_all = []
        for col in link.collisions:
            g = col.geometry
            if g.kind == "mesh":
                try:
                    mesh = load_mesh(g.mesh_path, g.mesh_scale)
                except FileNotFoundError:
                    continue
                pts = mesh.sample_surface(300)
            elif g.kind == "box":
                from handarm_tpu.physics.shapes import box_points

                pts = box_points(np.asarray(g.size) / 2)
            else:
                continue
            pts = pts @ col.origin_rot.T + col.origin_pos
            Rq = _quat_to_mat_np(site.quat)
            pts_all.append(pts @ Rq.T + site.pos)
        if not pts_all:
            continue
        # The gripper fingers are ~18 cm elongated curved rods: 2 fitted
        # spheres cover them only at r ~ 5 cm, which makes the closed pinch
        # (tip gap 2.1 cm) a ~9 cm sphere-overlap — geometrically incapable
        # of holding ANY object (measured: every scripted pinch ejects the
        # box before finger contact). Elongated finger links get a chain of
        # small spheres that follow the rod instead.
        k = 8 if link_name.startswith("link_gripper_finger_") else spheres_per_link
        ctr, rad = fit_spheres(np.concatenate(pts_all), k, padding=0.002)
        for c, r in zip(ctr, rad):
            bodies.append(site.body)
            centers.append(c)
            radii.append(r)
    return np.array(bodies, dtype=np.int32), np.stack(centers), np.array(radii)


def make_stretch_spheres(friction: float = 1.0, hand_only: bool = False) -> RobotSpheres:
    bodies, centers, radii = stretch_collision_spheres()
    if hand_only:  # wrist + gripper bodies only
        sel = bodies >= 6
        bodies, centers, radii = bodies[sel], centers[sel], radii[sel]
    return RobotSpheres(
        body=bodies,
        offset=jnp.asarray(centers, jnp.float32),
        radius=jnp.asarray(radii, jnp.float32),
        friction=jnp.asarray(np.full(len(radii), friction), jnp.float32),
    )

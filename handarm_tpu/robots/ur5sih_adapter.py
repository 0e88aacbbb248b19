"""RobotAdapter for the UR5 + Schunk SIH hand-arm."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from handarm_tpu.robots import RobotAdapter
from handarm_tpu.robots.ur5sih import (
    BRINGUP_JOINT_CONFIG,
    DEFAULT_DERIV_GAIN,
    DEFAULT_PROP_GAIN,
    FINGERTIP_SITES,
    RESET_JOINT_CONFIG,
    SERVO_UPPER,
    build_sih_splines,
    load_ur5sih,
    make_robot_spheres,
    servo_to_joint_targets,
    ur5sih_surface_cloud,
)


class ControlState(NamedTuple):
    arm_target: jnp.ndarray  # [B, 6]
    servo_ticks: jnp.ndarray  # [B, 5]
    sih_smoothed: jnp.ndarray  # [B, 5]


def make_adapter() -> RobotAdapter:
    art = load_ur5sih()
    splines = build_sih_splines()
    reset_q = np.asarray(RESET_JOINT_CONFIG)

    def init_control(B: int) -> ControlState:
        return ControlState(
            arm_target=jnp.broadcast_to(
                jnp.asarray(reset_q[:6], jnp.float32), (B, 6)
            ),
            servo_ticks=jnp.broadcast_to(
                jnp.asarray(SERVO_UPPER, jnp.float32), (B, 5)
            ),
            sih_smoothed=jnp.zeros((B, 5), jnp.float32),
        )

    def compute_targets(env, control: ControlState, q):
        sih = servo_to_joint_targets(splines, control.servo_ticks, q[:, 6:])
        return jnp.concatenate([control.arm_target, sih], axis=-1)

    def register_observables(registry, env):
        pass  # ur5/sih observables are registered at module scope in envs.hand_arm

    adapter = RobotAdapter(
        name="ur5sih",
        art=art,
        make_spheres=lambda hand_only: make_robot_spheres(hand_only=hand_only),
        fingertip_site_names=list(FINGERTIP_SITES),
        flange_site_name="flange",
        reset_q=reset_q,
        bringup_q=np.asarray(BRINGUP_JOINT_CONFIG),
        kp=np.asarray(DEFAULT_PROP_GAIN),
        kd=np.asarray(DEFAULT_DERIV_GAIN),
        default_actions=("ur5_relative_joint_pos", "sih_smoothed_relative_servo_pos"),
        init_control=init_control,
        compute_targets=compute_targets,
        register_observables=register_observables,
    )
    adapter.surface_cloud = ur5sih_surface_cloud
    return adapter

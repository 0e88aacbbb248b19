"""Robot adapters: a uniform interface the environment layer builds against.

Each adapter packages what the reference's per-robot classes provided
(isaacgymenvs/tasks/hand_arm/base/ur5sih.py, stretch.py): the compiled
articulation, collision sphere proxies, named sites, reset configurations,
PD gains, the robot-specific control state + target computation, and the
robot's actionable/observable registrations.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np


@dataclass
class RobotAdapter:
    name: str
    art: Any  # Articulation
    make_spheres: Callable[[bool], Any]  # (hand_only) -> RobotSpheres
    fingertip_site_names: list[str]
    flange_site_name: str
    reset_q: np.ndarray
    bringup_q: np.ndarray
    kp: np.ndarray
    kd: np.ndarray
    default_actions: tuple[str, ...]
    # init_control(B) -> robot-specific control pytree
    init_control: Callable[[int], Any]
    # compute_targets(env, control, q) -> [B, nv] PD position targets
    compute_targets: Callable[[Any, Any, jnp.ndarray], jnp.ndarray]
    # register robot-specific observables: fn(registry, env)
    register_observables: Callable[[Any, Any], None]
    # fixed-base mount pose relative to the table origin: xy offset and
    # yaw. UR5-SIH mounts at the origin facing +y; Stretch mounts offset
    # and yawed 180° so its (-y)-extending telescoping arm faces the bin
    # (reference actor pose p=(0.2, 0.175, 0), r=Quat(0,0,1,0) — a 180°
    # z-rotation — base/stretch.py:97).
    base_xy: tuple[float, float] = (0.0, 0.0)
    base_yaw: float = 0.0


def get_robot(name: str) -> RobotAdapter:
    if name == "ur5sih":
        from handarm_tpu.robots.ur5sih_adapter import make_adapter
    elif name == "stretch":
        from handarm_tpu.robots.stretch_adapter import make_adapter
    else:
        raise KeyError(f"unknown robot {name!r} (known: ur5sih, stretch)")
    return make_adapter()

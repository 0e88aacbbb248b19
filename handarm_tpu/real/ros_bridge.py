"""Sim-to-real seam: ROS bridge interface for UR5+SIH deployment.

Re-implements the reference's ROS execution path as a clean interface
(isaacgymenvs/tasks/hand_arm/base/ur5sih.py:381-435 arm trajectory client,
:463-483 SIH ticks publisher, :540-607 sim-vs-real state cross-checks).
The TPU core never imports rospy; this module degrades to a recording stub
when ROS is unavailable so policies can be exercised against logged robot
state. The env exposes the same actionables/observables in sim and real —
the bridge only moves the numbers.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

try:  # pragma: no cover - real-robot only
    import rospy  # type: ignore

    HAVE_ROS = True
except Exception:  # ROS not in the TPU image
    rospy = None
    HAVE_ROS = False


@dataclass
class CrossCheckConfig:
    """Sim-vs-real divergence guards (reference hard-fails at 0.01)."""

    max_joint_divergence: float = 0.01  # rad
    max_flange_divergence: float = 0.01  # m
    max_staleness_s: float = 0.5


class SimRealCrossCheck:
    """The reference's end-to-end consistency oracle: compare sim state
    against the measured robot and hard-fail on divergence
    (ur5sih.py:546-559, 586-603)."""

    def __init__(self, cfg: CrossCheckConfig = CrossCheckConfig()):
        self.cfg = cfg
        self.last_real_joint: np.ndarray | None = None
        self.last_real_flange: np.ndarray | None = None
        self.last_update_t: float = 0.0

    def update_real(self, joint_pos=None, flange_pos=None):
        if joint_pos is not None:
            self.last_real_joint = np.asarray(joint_pos)
        if flange_pos is not None:
            self.last_real_flange = np.asarray(flange_pos)
        self.last_update_t = time.time()

    def check(self, sim_joint_pos, sim_flange_pos=None):
        if time.time() - self.last_update_t > self.cfg.max_staleness_s:
            raise RuntimeError(
                f"real-robot state stale (> {self.cfg.max_staleness_s}s)"
            )
        if self.last_real_joint is not None:
            d = np.abs(np.asarray(sim_joint_pos) - self.last_real_joint).max()
            if d > self.cfg.max_joint_divergence:
                raise RuntimeError(
                    f"sim/real joint divergence {d:.4f} rad > "
                    f"{self.cfg.max_joint_divergence}"
                )
        if sim_flange_pos is not None and self.last_real_flange is not None:
            d = np.linalg.norm(
                np.asarray(sim_flange_pos) - self.last_real_flange
            )
            if d > self.cfg.max_flange_divergence:
                raise RuntimeError(
                    f"sim/real flange divergence {d:.4f} m > "
                    f"{self.cfg.max_flange_divergence}"
                )


@dataclass
class Ur5SihRosBridge:
    """Publishes the env's actionable outputs to the real UR5 (trajectory
    action client) and SIH (servo-tick topic); subscribes to joint state /
    TF / camera topics for the observable side.

    Without rospy (TPU pods), calls are recorded into `outbox` so tests and
    offline replay can assert on the exact commands a policy would send."""

    arm_controller_topic: str = (
        "/scaled_pos_joint_traj_controller/follow_joint_trajectory"
    )
    sih_ticks_topic: str = "sih/ticks_command"
    cross_check: SimRealCrossCheck = field(default_factory=SimRealCrossCheck)
    outbox: list = field(default_factory=list)

    def __post_init__(self):
        self._client = None
        self._tick_pub = None
        if HAVE_ROS:  # pragma: no cover
            import actionlib
            from control_msgs.msg import FollowJointTrajectoryAction
            from std_msgs.msg import Int32MultiArray

            self._client = actionlib.SimpleActionClient(
                self.arm_controller_topic, FollowJointTrajectoryAction
            )
            self._tick_pub = rospy.Publisher(
                self.sih_ticks_topic, Int32MultiArray, queue_size=1
            )

    def publish_arm_joint_targets(self, joint_pos, duration_s: float):
        """Single-point FollowJointTrajectory goal (ur5sih.py:410-435)."""
        cmd = ("arm", np.asarray(joint_pos, dtype=np.float64), duration_s)
        self.outbox.append(cmd)
        if self._client is not None:  # pragma: no cover
            from control_msgs.msg import FollowJointTrajectoryGoal
            from trajectory_msgs.msg import JointTrajectoryPoint

            self._client.cancel_all_goals()
            point = JointTrajectoryPoint()
            point.positions = list(map(float, joint_pos))
            point.time_from_start = rospy.Duration(duration_s)
            goal = FollowJointTrajectoryGoal()
            goal.trajectory.joint_names = [
                "shoulder_pan_joint", "shoulder_lift_joint", "elbow_joint",
                "wrist_1_joint", "wrist_2_joint", "wrist_3_joint",
            ]
            goal.trajectory.points.append(point)
            self._client.send_goal(goal)

    def publish_sih_ticks(self, ticks):
        """Servo tick command (ur5sih.py:478-483)."""
        cmd = ("sih", np.asarray(ticks, dtype=np.int64))
        self.outbox.append(cmd)
        if self._tick_pub is not None:  # pragma: no cover
            from std_msgs.msg import Int32MultiArray

            msg = Int32MultiArray()
            msg.data = [int(t) for t in ticks]
            self._tick_pub.publish(msg)

    def step(self, env_state, env, duration_s: float | None = None):
        """Mirror one env control step to the real robot: arm targets +
        servo ticks from the current control state, with cross-checking."""
        control = env_state.control
        self.publish_arm_joint_targets(
            np.asarray(control.arm_target[0]),
            duration_s if duration_s is not None else env.cfg.dt,
        )
        self.publish_sih_ticks(np.asarray(control.servo_ticks[0]))

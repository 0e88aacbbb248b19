"""Task registry: name -> env constructor (+ per-task PPO overrides).

The analog of the reference's isaacgym_task_map (isaacgymenvs/tasks/
__init__.py:94-123) plus its train-config pairing. Tasks are thin config
presets over HandArmEnv; `overrides` are `key=value` strings applied to the
HandArmConfig fields (dots index into tuples-of-tuples is not supported —
use the yaml config layer for deep structure).
"""

from __future__ import annotations

import dataclasses

from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv
from handarm_tpu.utils.config import _parse_value

TASKS: dict[str, tuple[HandArmConfig, dict]] = {}


def register(name: str, cfg: HandArmConfig, ppo_overrides: dict | None = None):
    TASKS[name] = (cfg, ppo_overrides or {})


register(
    "Ur5SihLift",
    HandArmConfig(goal="lift"),
    dict(minibatch_size=8192),
)
register(
    "Ur5SihReposition",
    HandArmConfig(goal="reposition"),
    dict(minibatch_size=8192),
)
register(
    "Ur5SihThrow",
    HandArmConfig(
        goal="throw",
        goal_pos=(0.28, 1.08, 0.8),  # reference shifts throw goals +0.5 y
    ),
    dict(minibatch_size=8192),
)
register(
    "Ur5SihMultiObjectManipulation",
    HandArmConfig(
        goal="reposition",
        # reference Ur5SihMultiObject.yaml default dataset
        object_dataset=(
            ("ycb", ("015_peach", "005_tomato_soup_can", "006_mustard_bottle")),
        ),
        num_objects=3,
        use_drop_init=True,
        num_initial_poses=1,
        randomize=True,
    ),
    dict(minibatch_size=8192),
)
STRETCH_OBS = (
    "stretch_joint_pos", "stretch_flange_pose", "stretch_fingertip_pos",
    "stretch_fingertip_linvel", "dof_position_targets",
    "object_pos", "object_bounding_box", "target_object_bounding_box",
    "target_object_to_goal_pos",
)
register(
    "StretchMultiObjectManipulation",
    HandArmConfig(
        robot="stretch",
        goal="reposition",
        observations=STRETCH_OBS,
        actions=("stretch_relative_joint_pos",),
        objects=(
            ("box", (0.03, 0.03, 0.03), 0.1),
            ("sphere", (0.03,), 0.08),
        ),
    ),
    dict(minibatch_size=8192),
)
register(
    "Ur5SihReach",
    HandArmConfig(
        goal="lift",
        reward={"reaching": 1.0},
        observations=(
            "ur5_joint_pos", "ur5_flange_pose", "sih_fingertip_pos",
            "dof_position_targets", "target_object_pos",
        ),
        actions=("ur5_relative_joint_pos",),
        num_envs=64,
        hand_only_collision=True,
    ),
    dict(minibatch_size=256, hidden=(256, 128, 64)),
)


def make_env(name: str, overrides: list[str] | None = None):
    if name not in TASKS:
        raise KeyError(f"unknown task {name!r}; known: {sorted(TASKS)}")
    cfg, ppo_overrides = TASKS[name]
    fields = {f.name for f in dataclasses.fields(cfg)}
    updates = {}
    ppo_updates = dict(ppo_overrides)
    for ov in overrides or []:
        key, val = ov.split("=", 1)
        key = key.removeprefix("env.")
        if key.startswith("ppo."):
            ppo_updates[key[4:]] = _parse_value(val)
        elif key in fields:
            v = _parse_value(val)
            if isinstance(getattr(cfg, key), tuple) and isinstance(v, list):
                v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
            updates[key] = v
        else:
            raise KeyError(f"unknown config key {key!r}")
    if updates:
        cfg = dataclasses.replace(cfg, **updates)
    return HandArmEnv(cfg), ppo_updates

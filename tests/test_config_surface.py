"""Yaml config-group surface: every registered task is reachable from
`configs/task/<Name>.yaml` (+ train yaml), with CLI overrides winning
(reference hydra cfg/ composition, SURVEY.md §2.8/§5.6)."""

import os

import numpy as np
import pytest

import jax

from handarm_tpu.envs.registry import (
    CLASSIC_TASKS,
    TASKS,
    all_task_names,
    compose_task,
)

CONFIG_ROOT = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")


def test_every_task_has_yaml_config_group():
    missing_task, missing_train = [], []
    for name in all_task_names():
        if not os.path.exists(
            os.path.join(CONFIG_ROOT, "task", f"{name}.yaml")
        ):
            missing_task.append(name)
        has_train = os.path.exists(
            os.path.join(CONFIG_ROOT, "train", f"{name}PPO.yaml")
        ) or os.path.exists(
            os.path.join(
                CONFIG_ROOT, "train", "HandArmTaskMultiObjectManipulationPPO.yaml"
            )
        )
        if not has_train:
            missing_train.append(name)
    assert not missing_task, missing_task
    assert not missing_train, missing_train


@pytest.mark.parametrize(
    "name,n_act",
    [("Cartpole", 1), ("Ur5SihLift", 11), ("FactoryTaskNutBoltPick", 12)],
)
def test_compose_roundtrip(name, n_act):
    env, ppo = compose_task(name, ["num_envs=8", "episode_length=20"])
    assert env.cfg.num_envs == 8
    assert env.num_actions == n_act
    assert isinstance(ppo, dict)


def test_env_dotted_num_envs_override_applies():
    # regression: `env.num_envs=N` (the documented train.py form) was
    # silently ignored for yaml hand-arm tasks because env_from_yaml only
    # read the reference-camelCase `numEnvs` key — a run launched with
    # env.num_envs=4096 trained at the yaml default 8192.
    env, _ = compose_task(
        "Ur5SihMultiObjectManipulation", ["env.num_envs=4"]
    )
    assert env.cfg.num_envs == 4


def test_cli_overrides_beat_yaml():
    env, ppo = compose_task(
        "Cartpole", ["num_envs=16", "ppo.minibatch_size=64", "ppo.gamma=0.9"]
    )
    assert env.cfg.num_envs == 16
    # yaml train sets minibatch_size=2048; CLI must win
    assert ppo["minibatch_size"] == 64
    assert ppo["gamma"] == 0.9


def test_env_kwargs_forward_to_config():
    # arbitrary env-config fields are reachable from the CLI / yaml
    env, _ = compose_task(
        "FrankaCubeStack", ["num_envs=4", "episode_length=16"]
    )
    assert env.cfg.num_envs == 4
    env2, _ = compose_task(
        "Trifinger", ["num_envs=4", "episode_length=16"]
    )
    assert env2.cfg.num_envs == 4


def test_unknown_env_key_raises():
    with pytest.raises(TypeError):
        compose_task("Trifinger", ["num_envs=4", "not_a_field=1"])


def test_full_layered_config_still_routes():
    env, ppo = compose_task(
        "Ur5SihMultiObjectManipulation",
        ["env.numEnvs=4", "objects.num_objects=2",
         "objects.drop.num_initial_poses=1"],
    )
    assert env.cfg.num_envs == 4
    assert env.cfg.num_objects == 2
    assert ppo.get("hidden") == (768, 512, 256)

"""Generate the yaml config-group surface from the task registry.

Mirrors the reference's cfg/ layout (a task yaml + a train yaml per task,
isaacgymenvs/cfg/task/*.yaml + cfg/train/*PPO.yaml): every registered task
gets `configs/task/<Name>.yaml` (env block) and
`configs/train/<Name>PPO.yaml` (ppo block), so `python train.py task=<Name>`
composes registry defaults < task yaml < train yaml < CLI overrides.

Hand-written full layered configs (the Ur5SihBase lineage) are never
overwritten. Regenerate after registry changes:
    python scripts/gen_task_yamls.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yaml

from handarm_tpu.envs.hand_arm import HandArmConfig
from handarm_tpu.envs.registry import CLASSIC_TASKS, TASKS

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "configs")


def _plain(v):
    if isinstance(v, tuple):
        return [_plain(x) for x in v]
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    return v


def main():
    os.makedirs(os.path.join(ROOT, "task"), exist_ok=True)
    os.makedirs(os.path.join(ROOT, "train"), exist_ok=True)
    defaults = HandArmConfig()
    written = 0
    for name, (cfg, ppo) in sorted(TASKS.items()):
        tpath = os.path.join(ROOT, "task", f"{name}.yaml")
        if not os.path.exists(tpath):
            env_block = {}
            for f in dataclasses.fields(cfg):
                v = getattr(cfg, f.name)
                if v != getattr(defaults, f.name):
                    env_block[f.name] = _plain(v)
            env_block.setdefault("num_envs", cfg.num_envs)
            env_block.setdefault("episode_length", cfg.episode_length)
            with open(tpath, "w") as fh:
                fh.write(
                    f"# {name} — generated from the task registry "
                    "(scripts/gen_task_yamls.py).\n"
                    "# Keys override HandArmConfig fields; any field name "
                    "is accepted.\n"
                )
                yaml.safe_dump({"env": env_block}, fh, sort_keys=True)
            written += 1
        _write_train(name, ppo)
    for name, (factory, ppo) in sorted(CLASSIC_TASKS.items()):
        tpath = os.path.join(ROOT, "task", f"{name}.yaml")
        if not os.path.exists(tpath):
            with open(tpath, "w") as fh:
                fh.write(
                    f"# {name} — generated from the task registry "
                    "(scripts/gen_task_yamls.py).\n"
                    "# Extra env keys are forwarded to the env's config "
                    "dataclass (full override surface).\n"
                )
                yaml.safe_dump(
                    {"env": {"num_envs": 512, "episode_length": 500}},
                    fh, sort_keys=True,
                )
            written += 1
        _write_train(name, ppo)
    print(f"wrote {written} task yamls + train yamls under {ROOT}")


def _write_train(name, ppo):
    trpath = os.path.join(ROOT, "train", f"{name}PPO.yaml")
    if os.path.exists(trpath):
        return
    with open(trpath, "w") as fh:
        fh.write(
            f"# {name} PPO config — generated from the task registry.\n"
            "# Keys override PPOConfig fields (learn/ppo.py).\n"
        )
        yaml.safe_dump({"ppo": {k: _plain(v) for k, v in ppo.items()}}, fh,
                       sort_keys=True)


if __name__ == "__main__":
    main()

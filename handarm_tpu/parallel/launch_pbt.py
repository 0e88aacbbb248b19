"""Local multi-process experiment launcher + parameter grids.

Port of the reference's OS-process PBT/sweep launcher
(isaacgymenvs/pbt/launcher/run_processes.py + run_description.py
ParamGrid): generate the cross-product of parameter values as command
lines, run them with bounded parallelism, restart nothing (PBT jobs are
individually fault-tolerant — parallel/pbt.py), collect exit codes.

CLI:
    python -m handarm_tpu.parallel.launch_pbt \
        --max-parallel 2 --num-policies 4 \
        -- python train.py task=Ur5SihLift pbt.policy_idx={policy_idx}

Library:
    cmds = experiment_grid(["python", "train.py"], {"seed": [1, 2, 3]})
    run_processes(cmds, max_parallel=2)
"""

from __future__ import annotations

import itertools
import subprocess
import sys
import time


def experiment_grid(base_cmd: list[str], params: dict[str, list]) -> list[list[str]]:
    """Cross-product of `params` appended to base_cmd as key=value args
    (reference ParamGrid, launcher/run_description.py)."""
    keys = list(params)
    cmds = []
    for combo in itertools.product(*(params[k] for k in keys)):
        cmds.append(
            list(base_cmd) + [f"{k}={v}" for k, v in zip(keys, combo)]
        )
    return cmds


def run_processes(
    cmds: list[list[str]],
    max_parallel: int = 2,
    poll_s: float = 0.5,
    env=None,
) -> list[int]:
    """Run all commands with at most `max_parallel` alive at once
    (reference launcher/run_processes.py run()). Returns exit codes in
    cmds order."""
    pending = list(enumerate(cmds))
    running: list[tuple[int, subprocess.Popen]] = []
    codes = [None] * len(cmds)
    while pending or running:
        while pending and len(running) < max_parallel:
            idx, cmd = pending.pop(0)
            running.append((idx, subprocess.Popen(cmd, env=env)))
        still = []
        for idx, p in running:
            rc = p.poll()
            if rc is None:
                still.append((idx, p))
            else:
                codes[idx] = rc
        running = still
        if running:
            time.sleep(poll_s)
    return codes


def main(argv):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--max-parallel", type=int, default=2)
    p.add_argument("--num-policies", type=int, default=4)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="command template after --; {policy_idx} is filled in")
    args = p.parse_args(argv)
    template = [a for a in args.cmd if a != "--"]
    cmds = [
        [part.format(policy_idx=i) for part in template]
        for i in range(args.num_policies)
    ]
    codes = run_processes(cmds, max_parallel=args.max_parallel)
    print("exit codes:", codes)
    return max(c or 0 for c in codes)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

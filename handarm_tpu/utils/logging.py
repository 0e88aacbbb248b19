"""Metrics logging: TensorBoard + jsonl side-channel.

The observer-pattern analog of the reference's RLGPUAlgoObserver/W&B stack
(SURVEY.md §2.12): training code emits dict[str, float] once per iteration;
sinks are pluggable. The env itself never logs from the device — success
EWMAs etc. ride the jitted step's info dict (no host syncs in the hot loop).
"""

from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, run_dir: str, use_tensorboard: bool = True):
        os.makedirs(run_dir, exist_ok=True)
        self.jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(os.path.join(run_dir, "tb"))
            except Exception:
                self.tb = None
        self.t0 = time.time()

    def log(self, step: int, metrics: dict):
        rec = {"step": step, "t": round(time.time() - self.t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(k, float(v), step)

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()

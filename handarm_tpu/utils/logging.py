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
    def __init__(
        self,
        run_dir: str,
        use_tensorboard: bool = True,
        wandb_project: str | None = None,
        experiment: str | None = None,
        wandb_kwargs: dict | None = None,
    ):
        os.makedirs(run_dir, exist_ok=True)
        self.jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(os.path.join(run_dir, "tb"))
            except Exception:
                self.tb = None
        self.wandb = None
        if wandb_project:
            self.wandb = WandbSink(
                wandb_project,
                experiment or os.path.basename(run_dir),
                **(wandb_kwargs or {}),
            )
        self.t0 = time.time()

    def log(self, step: int, metrics: dict):
        rec = {"step": step, "t": round(time.time() - self.t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(k, float(v), step)
        if self.wandb is not None:
            self.wandb.log(step, metrics)

    def close(self):
        self.jsonl.close()
        if self.wandb is not None:
            self.wandb.close()
        if self.tb is not None:
            self.tb.close()


def retry(times: int, exceptions=(Exception,)):
    """Retry decorator (reference isaacgymenvs/utils/utils.py retry — W&B
    init can fail transiently)."""

    def decorator(fn):
        def wrapper(*args, **kwargs):
            last = None
            for _ in range(times):
                try:
                    return fn(*args, **kwargs)
                except exceptions as e:  # noqa: PERF203
                    last = e
            raise last

        return wrapper

    return decorator


class WandbSink:
    """Weights & Biases metrics sink (reference utils/wandb_utils.py:7-75
    WandbAlgoObserver). Degrades to a no-op when the wandb package is not
    installed; init is retry-wrapped like the reference."""

    def __init__(
        self,
        project: str,
        experiment: str,
        entity: str | None = None,
        group: str | None = None,
        tags: tuple = (),
        config: dict | None = None,
    ):
        self._run = None
        try:
            import wandb
        except ImportError:
            return

        @retry(3, exceptions=(Exception,))
        def _init():
            return wandb.init(
                project=project,
                entity=entity,
                group=group,
                tags=list(tags),
                id=f"uid_{experiment}",
                name=experiment,
                resume=True,
                config=config or {},
            )

        self._run = _init()

    @property
    def active(self) -> bool:
        return self._run is not None

    def log(self, step: int, metrics: dict):
        if self._run is not None:
            self._run.log({k: float(v) for k, v in metrics.items()}, step=step)

    def close(self):
        if self._run is not None:
            self._run.finish()

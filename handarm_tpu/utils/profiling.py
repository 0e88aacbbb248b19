"""Tracing / profiling as a first-class feature.

The reference has none built in (SURVEY.md §5.1 — only rl_games print_stats
and closed-source PhysX internals). Here:

- `trace(logdir)` context manager wraps jax.profiler for TensorBoard-viewable
  device traces of the jitted step/train functions.
- `PhaseTimer` measures named phases (rollout/sgd/env-step) with proper
  device synchronization, keeping running means — cheap enough to leave on.
- `annotate` adds named-scope annotations visible in profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str = "runs/profile"):
    """Capture a jax.profiler device trace (open with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in profiler traces (use around jitted calls)."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Wall-clock phase timing with device sync and running statistics."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._starts: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_result is not None:
                jax.block_until_ready(sync_result)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def means_ms(self) -> dict[str, float]:
        return {
            k: 1000.0 * self.totals[k] / max(self.counts[k], 1)
            for k in self.totals
        }

    def report(self) -> str:
        return " | ".join(
            f"{k}: {v:.2f}ms" for k, v in sorted(self.means_ms().items())
        )

    def reset(self):
        self.totals.clear()
        self.counts.clear()

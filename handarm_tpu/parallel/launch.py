"""Multi-host launch helpers.

The reference's scale-out story is torchrun + NCCL env plumbing
(SURVEY.md §2.10/§5.8). Here a pod-slice run is one SPMD program: call
`init_distributed()` on every host, build the global mesh, and jit —
XLA/ICI do the rest. This module is the thin veneer (and the place where
DCN-vs-ICI axis layout decisions would live for multi-slice runs)."""

from __future__ import annotations

import os

import jax


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID — on Cloud TPU pods
    jax autodetects and all args may be None). Returns topology info."""
    kwargs = {}
    if coordinator_address or os.environ.get("COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["COORDINATOR_ADDRESS"]
        )
    if num_processes or os.environ.get("NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["NUM_PROCESSES"]
        )
    if process_id is not None or os.environ.get("PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None else os.environ["PROCESS_ID"]
        )
    if jax.process_count() == 1 and (kwargs or _on_tpu_pod()):
        jax.distributed.initialize(**kwargs)
    return dict(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=jax.local_device_count(),
        global_devices=jax.device_count(),
    )


def _on_tpu_pod() -> bool:
    return bool(os.environ.get("TPU_WORKER_HOSTNAMES", "")) and (
        "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    )


def is_main_process() -> bool:
    """rank-0 gating for logging/W&B (reference train.py:183-188)."""
    return jax.process_index() == 0


def per_host_envs(total_envs: int) -> int:
    n = jax.process_count()
    assert total_envs % n == 0, (total_envs, n)
    return total_envs // n

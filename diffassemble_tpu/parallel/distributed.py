"""Multi-host runtime + failure handling.

The reference's distributed runtime is Lightning DDP + wandb-id resume
(SURVEY.md §5: recovery = re-glob checkpoints; no preemption handling). The
TPU-native equivalents here:

- `initialize()` — `jax.distributed.initialize` for multi-host (DCN across
  slices); no-op on a single host. Call before building meshes.
- `is_main_process()` — the `local_rank == 0` guard
  (spatial_diffusion.py:723,861) in jax terms.
- `PreemptionGuard` — SIGTERM/SIGINT hook that flips a flag so the training
  loop checkpoints and exits cleanly on preemption (TPU pods get SIGTERM
  ahead of maintenance) — capability the reference lacks entirely.
"""

from __future__ import annotations

import signal
from typing import Callable

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the multi-host runtime. With no args, uses TPU/cluster
    autodetection (Cloud TPU metadata, SLURM, k8s — jax._src.clusters), or the
    DIFFASSEMBLE_{COORDINATOR,NUM_PROCESSES,PROCESS_ID} env vars set by
    scripts/launch_multihost.sh. Single-process environments are a no-op."""
    import os

    coordinator_address = coordinator_address or os.environ.get("DIFFASSEMBLE_COORDINATOR")
    if num_processes is None and "DIFFASSEMBLE_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["DIFFASSEMBLE_NUM_PROCESSES"])
    if process_id is None and "DIFFASSEMBLE_PROCESS_ID" in os.environ:
        process_id = int(os.environ["DIFFASSEMBLE_PROCESS_ID"])
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except (ValueError, RuntimeError):
        pass  # single host / already initialized


def is_main_process() -> bool:
    return jax.process_index() == 0


class PreemptionGuard:
    """Install handlers for SIGTERM/SIGINT; training loops poll `.requested`
    and checkpoint+exit at the next step boundary."""

    def __init__(self, on_preempt: Callable[[], None] | None = None):
        self.requested = False
        self._on_preempt = on_preempt
        self._installed = False

    def install(self) -> "PreemptionGuard":
        if self._installed:
            return self

        def handler(signum, frame):
            self.requested = True
            if self._on_preempt is not None:
                self._on_preempt()

        try:
            signal.signal(signal.SIGTERM, handler)
            signal.signal(signal.SIGINT, handler)
            self._installed = True
        except ValueError:
            pass  # not in main thread — polling only
        return self

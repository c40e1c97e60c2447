"""Multi-host initialization + host-0 gather helpers.

Reference parity: `initialize_ddp` (diarizen/utils.py:68-76 — NCCL process
group, 3600 s timeout) becomes `jax.distributed.initialize`; metric/output
gathers become `multihost_utils` collectives over ICI/DCN.

Single-host (including the 8-virtual-device test mesh) needs none of this —
`make_mesh()` just works; these helpers only matter on multi-host pods.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host jax (NCCL-DDP equivalent). With no arguments,
    jax auto-detects the TPU pod environment variables."""
    if jax.process_count() > 1 or coordinator_address is None:
        # already initialized or auto-detectable environment
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            pass  # single-process / already initialized
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_main_process() -> bool:
    return jax.process_index() == 0


def gather_to_host(x) -> np.ndarray:
    """All-gather a per-process array to every host (host 0 included) —
    the pipeline's posterior/embedding gather for global clustering
    (SURVEY.md section 2.5 north-star scale-out)."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return np.asarray(x)
    return np.asarray(multihost_utils.process_allgather(x))


def broadcast_from_host(x) -> np.ndarray:
    """Broadcast host-0 data (e.g. cluster assignments) to every process."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return np.asarray(x)
    return np.asarray(multihost_utils.broadcast_one_to_all(x))

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
    jax auto-detects the TPU pod environment variables.

    Must run before any backend-creating jax call — probing
    `jax.process_count()` here would itself initialize the backends and make
    `jax.distributed.initialize` fail. Already-initialized detection is done
    by catching initialize's own RuntimeError (public API only; the private
    jax._src.distributed.global_state handle is version-unstable)."""
    try:
        if coordinator_address is None:
            # auto-detectable environment (TPU pod env vars) or single-process
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except (RuntimeError, ValueError) as e:
        # "already initialized" (repeat call) or a single-process environment
        # with nothing to auto-detect — both are fine to ignore; an explicit
        # coordinator that fails for another reason is a real error
        if coordinator_address is not None and "already" not in str(e).lower():
            raise


def is_main_process() -> bool:
    return jax.process_index() == 0


def gather_to_host(x) -> np.ndarray:
    """All-gather a per-process array to every host (host 0 included) —
    the pipeline's posterior/embedding gather for global clustering
    (SURVEY.md section 2.5 north-star scale-out)."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return np.asarray(x)
    # copy: np.asarray of a jax output is a read-only view, and pipeline
    # callers mutate the result in place (inactive-speaker marking)
    return np.array(multihost_utils.process_allgather(x))


def broadcast_from_host(x) -> np.ndarray:
    """Broadcast host-0 data (e.g. cluster assignments) to every process."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return np.asarray(x)
    return np.array(multihost_utils.broadcast_one_to_all(x))


def process_window_shard(
    num_windows: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> np.ndarray:
    """This process's strided shard of window indices for multi-host
    inference fan-out: process p handles windows p, p+P, p+2P, ...
    (the SURVEY section 2.5 scale-out flow: shard windows across hosts,
    gather posteriors/embeddings back for global clustering).

    Pure function of (n, p, P) so the sharding math is unit-testable without
    a multi-process run; defaults come from the live jax runtime."""
    p = jax.process_index() if process_index is None else process_index
    P = jax.process_count() if process_count is None else process_count
    return np.arange(num_windows)[p::P]


def reassemble_window_shards(shards, num_windows: int) -> np.ndarray:
    """Re-interleave per-process strided shards (shards[p] holds windows
    p, p+P, ...; possibly padded past its true length) back to original
    window order. Pure — unit-testable without a multi-process run."""
    P = len(shards)
    out = np.zeros((num_windows,) + tuple(shards[0].shape[1:]), shards[0].dtype)
    for p in range(P):
        idx = np.arange(num_windows)[p::P]
        out[idx] = shards[p][: len(idx)]
    return out


def gather_window_shards(local: np.ndarray, num_windows: int) -> np.ndarray:
    """Inverse of `process_window_shard` across all processes: pad the local
    shard to the common per-process length, all-gather, and re-interleave to
    the original window order. Identity (modulo copy) in single-process."""
    P = jax.process_count()
    if P == 1:
        return np.asarray(local)
    per = -(-num_windows // P)  # ceil — all processes must gather equal shapes
    padded = np.zeros((per,) + local.shape[1:], dtype=local.dtype)
    padded[: len(local)] = local
    gathered = gather_to_host(padded)  # (P, per, ...)
    return reassemble_window_shards(list(gathered), num_windows)

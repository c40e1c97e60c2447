"""Small utilities (reference diarizen/utils.py parity: seed, Timer, dirs,
clamp, env print). The config engine lives in config.py; DDP init in
parallel/distributed.py."""

from __future__ import annotations

import os
import random
import shutil
import time
from pathlib import Path

import numpy as np


def set_random_seed(seed: int = 3407) -> None:
    """Seed python/numpy (jax randomness is explicit-key; torch only if
    present for converter code paths)."""
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass


def prepare_empty_dir(path: str | Path, resume: bool = False) -> Path:
    path = Path(path)
    if path.exists() and not resume:
        shutil.rmtree(path)
    path.mkdir(parents=True, exist_ok=True)
    return path


def clamp_inf_value(x: np.ndarray, limit: float = 1e10) -> np.ndarray:
    """Replace +-inf/nan with finite values (reference utils.py)."""
    return np.nan_to_num(x, nan=0.0, posinf=limit, neginf=-limit)


class Timer:
    """Context-manager / start-stop wall timer (reference utils.py:47-65)."""

    def __init__(self):
        self.start_time = None
        self.elapsed = 0.0

    def start(self) -> "Timer":
        self.start_time = time.perf_counter()
        return self

    def stop(self) -> float:
        if self.start_time is not None:
            self.elapsed += time.perf_counter() - self.start_time
            self.start_time = None
        return self.elapsed

    def __enter__(self) -> "Timer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def is_oom_error(exc: BaseException) -> bool:
    """True when an exception is a device memory exhaustion (TPU HBM /
    scoped-VMEM RESOURCE_EXHAUSTED, or a backend OOM string) — the condition
    the reference catches as `torch.cuda.OutOfMemoryError`
    (pyannote core/inference.py:216-223)."""
    msg = str(exc)
    return (
        "RESOURCE_EXHAUSTED" in msg
        or "Out of memory" in msg
        or "out of memory" in msg
        or "OOM" in msg
    )


def halve_batch_or_raise(exc: BaseException, batch_size: int, stage: str) -> int:
    """Batch-backoff policy for device OOM during inference: halve and retry,
    or re-raise with the reference's actionable message when already at 1
    (core/inference.py:216-223)."""
    import logging

    if not is_oom_error(exc):
        raise exc
    if batch_size <= 1:
        raise RuntimeError(
            f"{stage} ran out of device memory even at batch_size=1 — "
            "use shorter chunks (smaller `duration`), a smaller model, or "
            "a device with more HBM"
        ) from exc
    new = batch_size // 2
    logging.getLogger("diarizen_tpu.infer").warning(
        "%s hit device OOM at batch_size=%d; retrying at %d",
        stage, batch_size, new,
    )
    return new


def print_env() -> dict:
    """Collect runtime environment info (reference utils.py print_env)."""
    import jax

    info = {
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }
    for k, v in info.items():
        print(f"{k}: {v}")
    return info

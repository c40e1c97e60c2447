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

"""Logging setup: console + per-experiment file handlers.

Reference parity: diarizen/logger.py:26-85 (`init_logging_logger`, LOG_LEVEL
env var, config echo). TensorBoard writing lives in train/trainer.py.
"""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path
from typing import Optional

FORMAT = "%(asctime)s [%(levelname)s] %(name)s: %(message)s"


def init_logging(
    exp_dir: Optional[str | Path] = None,
    level: Optional[str] = None,
    filename: str = "train.log",
) -> logging.Logger:
    """Configure the root `diarizen_tpu` logger with console + optional file
    output. Level from arg or the LOG_LEVEL env var (default INFO)."""
    level = (level or os.environ.get("LOG_LEVEL", "INFO")).upper()
    logger = logging.getLogger("diarizen_tpu")
    logger.setLevel(level)
    logger.handlers.clear()

    console = logging.StreamHandler(sys.stderr)
    console.setFormatter(logging.Formatter(FORMAT))
    logger.addHandler(console)

    if exp_dir is not None:
        exp_dir = Path(exp_dir)
        exp_dir.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(exp_dir / filename)
        fh.setFormatter(logging.Formatter(FORMAT))
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def log_config(logger: logging.Logger, config: dict) -> None:
    import json

    logger.info("configuration:\n%s", json.dumps(config, indent=2, default=str))

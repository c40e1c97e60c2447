"""Hooks + logger unit tests."""

import logging

from diarizen_tpu.hooks import ArtifactHook, Hooks, ProgressHook, TimingHook
from diarizen_tpu.logger import init_logging, log_config


def test_timing_hook():
    import time

    h = TimingHook()
    h("segmentation")
    time.sleep(0.02)
    h("embeddings", total=4, completed=1)
    time.sleep(0.01)
    h.finish()
    assert h.timings["segmentation"] >= 0.015
    assert "embeddings" in h.timings
    h.audio_duration = 10.0
    assert h.throughput() > 0


def test_artifact_and_compose(capsys):
    a = ArtifactHook("segmentation")
    p = ProgressHook()
    hooks = Hooks(a, p, None)
    hooks("segmentation", artifact=[1, 2, 3], total=2, completed=2)
    hooks("embeddings", artifact="skip-me")
    assert a.artifacts == {"segmentation": [1, 2, 3]}


def test_logger_file_output(tmp_path):
    logger = init_logging(tmp_path, level="DEBUG", filename="x.log")
    logger.info("hello-world")
    log_config(logger, {"a": 1})
    text = (tmp_path / "x.log").read_text()
    assert "hello-world" in text and '"a": 1' in text
    # idempotent re-init does not duplicate handlers
    logger2 = init_logging(tmp_path, filename="x.log")
    assert len(logger2.handlers) == 2

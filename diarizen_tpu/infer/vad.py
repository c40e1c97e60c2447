"""Voice-activity / overlapped-speech detection pipelines.

Reference parity: pyannote pipelines/voice_activity_detection.py and
overlapped_speech_detection.py (upstream capabilities retained by the fork) —
both reduce the segmentation model's aggregated frame scores to a 1-D
activation and hysteresis-binarize it:
  * VAD: P(speech) = max over speakers (soft multilabel aggregate);
  * OSD: P(overlap) = probability that >= 2 speakers are active, taken as the
    2nd-largest per-frame speaker score.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from diarizen_tpu.core.segments import Annotation, SlidingWindowFeature
from diarizen_tpu.infer.sliding import SlidingInference
from diarizen_tpu.ops.binarize import Binarize


@dataclass
class VoiceActivityDetection:
    seg_inference: SlidingInference
    onset: float = 0.5
    offset: float = 0.5
    min_duration_on: float = 0.0
    min_duration_off: float = 0.0

    def __call__(self, waveform: np.ndarray, sample_rate: int = 16000,
                 uri: Optional[str] = None) -> Annotation:
        agg = self.seg_inference.aggregated(waveform, sample_rate, soft=True)
        speech = np.max(agg.data, axis=-1, keepdims=True)  # (frames, 1)
        binarize = Binarize(
            onset=self.onset, offset=self.offset,
            min_duration_on=self.min_duration_on,
            min_duration_off=self.min_duration_off,
        )
        ann = binarize(SlidingWindowFeature(speech, agg.sliding_window))
        ann.uri = uri
        return ann.rename_labels({l: "SPEECH" for l in ann.labels()})


@dataclass
class OverlappedSpeechDetection:
    seg_inference: SlidingInference
    onset: float = 0.5
    offset: float = 0.5
    min_duration_on: float = 0.0
    min_duration_off: float = 0.0

    def __call__(self, waveform: np.ndarray, sample_rate: int = 16000,
                 uri: Optional[str] = None) -> Annotation:
        agg = self.seg_inference.aggregated(waveform, sample_rate, soft=True)
        if agg.data.shape[-1] < 2:
            ann = Annotation(uri=uri)
            return ann
        top2 = np.sort(agg.data, axis=-1)[:, -2:]
        overlap = top2[:, 0:1]  # 2nd-largest speaker probability
        binarize = Binarize(
            onset=self.onset, offset=self.offset,
            min_duration_on=self.min_duration_on,
            min_duration_off=self.min_duration_off,
        )
        ann = binarize(SlidingWindowFeature(overlap, agg.sliding_window))
        ann.uri = uri
        return ann.rename_labels({l: "OVERLAP" for l in ann.labels()})

"""Multi-label segmentation pipeline (e.g. speech/music/noise detection).

Reference parity: pyannote pipelines/multilabel.py (upstream capability
retained by the fork): aggregated per-class frame scores -> independent
per-class hysteresis binarization (each class with its own onset/offset and
optionally shared min-duration post-processing) -> one Annotation labelled
with the class names (multilabel.py:155-221).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np

from diarizen_tpu.core.segments import Annotation, SlidingWindowFeature
from diarizen_tpu.infer.sliding import SlidingInference
from diarizen_tpu.ops.binarize import Binarize


@dataclass
class MultiLabelSegmentation:
    """`classes[k]` names the segmentation model's k-th output activation.

    thresholds : per-class dict {"onset", "offset", and (when
    share_min_duration=False) "min_duration_on", "min_duration_off"} —
    the reference's ParamDict hyper-parameter layout (multilabel.py:103-127).
    """

    seg_inference: SlidingInference
    classes: List[str]
    thresholds: Dict[str, Dict[str, float]] = field(default_factory=dict)
    share_min_duration: bool = False
    min_duration_on: float = 0.0
    min_duration_off: float = 0.0

    def _binarizer(self, label: str) -> Binarize:
        t = self.thresholds.get(label, {})
        return Binarize(
            onset=t.get("onset", 0.5),
            offset=t.get("offset", 0.5),
            min_duration_on=(
                self.min_duration_on
                if self.share_min_duration
                else t.get("min_duration_on", 0.0)
            ),
            min_duration_off=(
                self.min_duration_off
                if self.share_min_duration
                else t.get("min_duration_off", 0.0)
            ),
        )

    def __call__(
        self,
        waveform: np.ndarray,
        sample_rate: int = 16000,
        uri: Optional[str] = None,
        hook: Optional[Callable] = None,
    ) -> Annotation:
        agg = self.seg_inference.aggregated(waveform, sample_rate, soft=True)
        if hook is not None:
            hook("segmentation", agg)

        detection = Annotation(uri=uri)
        for i, label in enumerate(self.classes):
            scores = SlidingWindowFeature(
                agg.data[:, i : i + 1], agg.sliding_window
            )
            ann = self._binarizer(label)(scores)
            for seg, track, _ in ann.itertracks():
                detection[seg, (label, track)] = label
        return detection

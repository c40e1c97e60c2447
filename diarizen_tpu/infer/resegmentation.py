"""Resegmentation pipeline: refine an existing diarization with a
segmentation model.

Reference parity: pyannote pipelines/resegmentation.py (upstream capability
retained by the fork). Flow (reference apply(), resegmentation.py:155-265):

  1. sliding-window segmentation, chunked output (skip-aggregation —
     permutation-invariant models always skip, core/inference.py:368-380);
  2. hysteresis-binarize chunks -> frame-level speaker count;
  3. discretize the *input* diarization onto the model's frame grid;
  4. trim warm-up regions from the raw segmentation;
  5. per chunk, permutate local segmentation speakers to best match the
     input diarization under MAE cost (utils/permutation.py:83-97);
  6. overlap-add the permutated chunks, keep top-count speakers per frame,
     hysteresis-binarize to a continuous Annotation.

Default hyper-parameters are the reference's DIHARD3-optimized values
(resegmentation.py:121-130).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from diarizen_tpu.core.segments import (
    Annotation,
    Segment,
    SlidingWindowFeature,
)
from diarizen_tpu.infer.pipeline import speaker_count, to_diarization
from diarizen_tpu.infer.sliding import SlidingInference, receptive_field_window
from diarizen_tpu.ops.aggregate import trim
from diarizen_tpu.ops.binarize import Binarize, binarize_hysteresis
from diarizen_tpu.ops.permutation import permutate_hungarian


def binarize_chunked(
    scores: SlidingWindowFeature,
    onset: float,
    offset: float,
    initial_state: bool = False,
) -> SlidingWindowFeature:
    """Hysteresis-binarize a chunked (chunks, frames, classes) feature
    (reference utils/signal.py:44-204 `binarize` on 3-D data)."""
    data = np.asarray(scores.data, dtype=np.float32)
    chunks, frames, classes = data.shape
    flat = np.transpose(data, (0, 2, 1)).reshape(chunks * classes, frames)
    binary = binarize_hysteresis(
        flat, onset=onset, offset=offset, initial_state=initial_state
    )
    binary = binary.reshape(chunks, classes, frames).transpose(0, 2, 1)
    return SlidingWindowFeature(
        binary.astype(np.float32), scores.sliding_window
    )


@dataclass
class Resegmentation:
    """Refine `diarization` using `seg_inference`'s local segmentations."""

    seg_inference: SlidingInference
    warm_up: float = 0.05
    onset: float = 0.810
    offset: float = 0.481
    min_duration_on: float = 0.055
    min_duration_off: float = 0.098

    def __call__(
        self,
        waveform: np.ndarray,
        sample_rate: int,
        diarization: Annotation,
        uri: Optional[str] = None,
        hook: Optional[Callable] = None,
    ) -> Annotation:
        if waveform.ndim == 1:
            waveform = waveform[None]
        duration = waveform.shape[-1] / sample_rate
        frames = receptive_field_window(self.seg_inference.cfg)

        # 1. chunked soft multilabel segmentation
        segmentations = self.seg_inference(waveform, sample_rate, soft=True)
        if hook is not None:
            hook("segmentation", segmentations)
        num_local = segmentations.data.shape[-1]

        # 2. binarize -> instantaneous speaker count
        binarized = binarize_chunked(
            segmentations, onset=self.onset, offset=self.offset,
            initial_state=False,
        )
        count = speaker_count(
            binarized, frames, warm_up=(self.warm_up, self.warm_up)
        )
        if hook is not None:
            hook("speaker_counting", count)

        # 3. discretize the input diarization on the model frame grid
        # (reference support extends one chunk-step past the file end,
        # resegmentation.py:233-238)
        support = Segment(0.0, duration + self.seg_inference.step)
        labels = diarization.labels()
        discretized = diarization.discretize(support, frames, labels=labels)
        if hook is not None:
            hook("@resegmentation/original", discretized)

        # 4. drop warm-up regions (less robust near chunk borders)
        segmentations = trim(
            segmentations, warm_up=(self.warm_up, self.warm_up)
        )
        if hook is not None:
            hook("@resegmentation/trim", segmentations)

        # 5. zero-pad speaker axes to a common width, then per-chunk MAE
        # permutation of the local segmentation against the input diarization
        num_speakers = max(len(labels), num_local)
        seg_data = segmentations.data
        if num_speakers > seg_data.shape[-1]:
            seg_data = np.pad(
                seg_data,
                ((0, 0), (0, 0), (0, num_speakers - seg_data.shape[-1])),
            )
        diar_data = discretized.data
        if num_speakers > diar_data.shape[-1]:
            diar_data = np.pad(
                diar_data, ((0, 0), (0, num_speakers - diar_data.shape[-1]))
            )
        discretized = SlidingWindowFeature(diar_data, discretized.sliding_window)

        num_chunks, num_frames, _ = seg_data.shape
        permutated = np.zeros_like(seg_data)
        for c in range(num_chunks):
            chunk = segmentations.sliding_window[c]
            local = discretized.crop(chunk, mode="loose").data[:num_frames]
            if local.shape[0] < num_frames:
                local = np.pad(
                    local, ((0, num_frames - local.shape[0]), (0, 0))
                )
            out, _ = permutate_hungarian(
                local[None].astype(np.float32),
                seg_data[c][None].astype(np.float32),
                cost="mae",
            )
            permutated[c] = out[0]
        permutated_swf = SlidingWindowFeature(
            permutated, segmentations.sliding_window
        )
        if hook is not None:
            hook("@resegmentation/permutated", permutated_swf)

        # 6. stitch + binarize
        discrete = to_diarization(permutated_swf, count)
        to_annotation = Binarize(
            onset=0.5, offset=0.5,
            min_duration_on=self.min_duration_on,
            min_duration_off=self.min_duration_off,
        )
        result = to_annotation(discrete)
        result.uri = uri
        # map integer column labels back to input diarization speakers where
        # possible (columns beyond the input labels keep SPEAKER_%02d names)
        mapping = {}
        for i in range(discrete.data.shape[-1]):
            mapping[str(i)] = labels[i] if i < len(labels) else f"SPEAKER_{i:02d}"
        return result.rename_labels(mapping)

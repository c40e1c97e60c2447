"""Diarization error rate.

Two implementations:

1. `der_components` — frame-level, jit-able, used for streaming validation
   metrics. Semantics match the reference torchmetrics functional
   (pyannote-audio/pyannote/audio/torchmetrics/functional/audio/
   diarization_error_rate.py:33-262): optimal speaker permutation of the
   *soft* predictions against targets, threshold, then
   FA/miss/confusion/total components.

2. `der_report` — segment-level scorer for final pipeline output
   (md-eval/dscore-style: optimal speaker mapping by total overlap via
   Hungarian, exact interval sweep, optional collar, overlap scored).
   Used as the end-to-end accuracy gate against reference RTTMs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from diarizen_tpu.core.segments import Annotation, Segment, Timeline
from diarizen_tpu.ops.permutation import permutate_enumerate


def der_components(
    preds: jnp.ndarray,
    target: jnp.ndarray,
    threshold: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Frame-level DER components with optimal speaker permutation.

    preds : (B, K, F) continuous [0, 1] predictions
    target : (B, K, F) binary targets
    Returns scalar (false_alarm, missed_detection, speaker_confusion,
    speech_total); DER = (fa + miss + conf) / total.
    """
    # optimal permutation of soft preds against target (MSE cost, exhaustive)
    permutated, _ = permutate_enumerate(
        jnp.transpose(target, (0, 2, 1)), jnp.transpose(preds, (0, 2, 1))
    )
    preds_p = jnp.transpose(permutated, (0, 2, 1))  # (B, K, F)

    hyp = (preds_p > threshold).astype(jnp.float32)
    tgt = target.astype(jnp.float32)

    speech_total = jnp.sum(tgt)
    detection_error = jnp.sum(hyp, axis=1) - jnp.sum(tgt, axis=1)  # (B, F)
    false_alarm = jnp.sum(jnp.maximum(detection_error, 0.0))
    missed = jnp.sum(jnp.maximum(-detection_error, 0.0))
    confusion = jnp.sum((hyp != tgt) * hyp) - false_alarm
    return false_alarm, missed, confusion, speech_total


@dataclass
class DERReport:
    false_alarm: float
    missed_detection: float
    confusion: float
    total: float

    @property
    def der(self) -> float:
        return (
            (self.false_alarm + self.missed_detection + self.confusion) / self.total
            if self.total > 0
            else 0.0
        )

    def __add__(self, other: "DERReport") -> "DERReport":
        return DERReport(
            self.false_alarm + other.false_alarm,
            self.missed_detection + other.missed_detection,
            self.confusion + other.confusion,
            self.total + other.total,
        )


def _boundaries(anns: List[Annotation], extra: List[float]) -> np.ndarray:
    times = set(extra)
    for ann in anns:
        for seg, _, _ in ann.itertracks():
            times.add(seg.start)
            times.add(seg.end)
    return np.array(sorted(times), dtype=np.float64)


def _interval_speaker_matrix(
    ann: Annotation, bounds: np.ndarray, labels: List[str]
) -> np.ndarray:
    """(num_intervals, num_labels) activity matrix over boundary intervals."""
    n_int = len(bounds) - 1
    mat = np.zeros((n_int, len(labels)), dtype=bool)
    label_idx = {l: i for i, l in enumerate(labels)}
    starts = bounds[:-1]
    ends = bounds[1:]
    for seg, _, label in ann.itertracks():
        j = label_idx[label]
        sel = (starts >= seg.start - 1e-9) & (ends <= seg.end + 1e-9)
        mat[sel, j] = True
    return mat


def optimal_mapping(
    reference: Annotation, hypothesis: Annotation
) -> Dict[str, str]:
    """Greedy-optimal (Hungarian) hypothesis->reference label mapping by
    maximizing total overlap duration (md-eval semantics)."""
    ref_labels = reference.labels()
    hyp_labels = hypothesis.labels()
    if not ref_labels or not hyp_labels:
        return {}
    overlap = np.zeros((len(hyp_labels), len(ref_labels)))
    for i, h in enumerate(hyp_labels):
        h_tl = hypothesis.label_timeline(h).support()
        for j, r in enumerate(ref_labels):
            r_tl = reference.label_timeline(r).support()
            overlap[i, j] = sum(
                hs.overlap_duration(rs) for hs in h_tl for rs in r_tl
            )
    row, col = linear_sum_assignment(-overlap)
    return {
        hyp_labels[i]: ref_labels[j]
        for i, j in zip(row, col)
        if overlap[i, j] > 0
    }


def der_report(
    reference: Annotation,
    hypothesis: Annotation,
    uem: Optional[Timeline] = None,
    collar: float = 0.0,
) -> DERReport:
    """Exact interval-sweep DER with optimal speaker mapping.

    collar: no-score zone of +-collar/2 around every reference boundary
    (md-eval convention; `dscore --collar 0` means collar=0.0 here).
    Overlapping speech is scored.
    """
    if uem is not None:
        reference = reference.crop(uem)
        hypothesis = hypothesis.crop(uem)

    # collar: remove +-collar/2 around each reference segment boundary
    if collar > 0:
        half = collar / 2
        noscore = Timeline()
        for seg, _, _ in reference.itertracks():
            noscore.add(Segment(seg.start - half, seg.start + half))
            noscore.add(Segment(seg.end - half, seg.end + half))
        extent = Timeline(
            [reference.get_timeline().extent(), hypothesis.get_timeline().extent()]
        ).extent()
        score_zone = noscore.support().gaps(
            Segment(extent.start - half, extent.end + half)
        )
        reference = reference.crop(score_zone)
        hypothesis = hypothesis.crop(score_zone)

    mapping = optimal_mapping(reference, hypothesis)
    hypothesis = hypothesis.rename_labels(
        {h: mapping.get(h, f"!unmapped_{h}") for h in hypothesis.labels()}
    )

    bounds = _boundaries([reference, hypothesis], [])
    if len(bounds) < 2:
        return DERReport(0.0, 0.0, 0.0, 0.0)
    durations = np.diff(bounds)

    all_labels = sorted(set(reference.labels()) | set(hypothesis.labels()))
    ref_mat = _interval_speaker_matrix(reference, bounds, all_labels)
    hyp_mat = _interval_speaker_matrix(hypothesis, bounds, all_labels)

    n_ref = ref_mat.sum(axis=1).astype(np.float64)
    n_hyp = hyp_mat.sum(axis=1).astype(np.float64)
    n_correct = (ref_mat & hyp_mat).sum(axis=1).astype(np.float64)

    total = float(np.sum(n_ref * durations))
    missed = float(np.sum(np.maximum(n_ref - n_hyp, 0.0) * durations))
    false_alarm = float(np.sum(np.maximum(n_hyp - n_ref, 0.0) * durations))
    confusion = float(np.sum((np.minimum(n_ref, n_hyp) - n_correct) * durations))
    return DERReport(false_alarm, missed, confusion, total)


class DiarizationErrorRate:
    """Streaming accumulator over batches of frame-level predictions
    (torchmetrics-style for validation loops)."""

    def __init__(self, threshold: float = 0.5):
        self.threshold = threshold
        self.reset()

    def reset(self) -> None:
        self.false_alarm = 0.0
        self.missed = 0.0
        self.confusion = 0.0
        self.total = 0.0

    def update(self, preds: jnp.ndarray, target: jnp.ndarray) -> None:
        fa, miss, conf, total = der_components(preds, target, self.threshold)
        self.false_alarm += float(fa)
        self.missed += float(miss)
        self.confusion += float(conf)
        self.total += float(total)

    def compute(self) -> Dict[str, float]:
        denom = max(self.total, 1e-12)
        return {
            "der": (self.false_alarm + self.missed + self.confusion) / denom,
            "false_alarm": self.false_alarm / denom,
            "missed_detection": self.missed / denom,
            "confusion": self.confusion / denom,
        }

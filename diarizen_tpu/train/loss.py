"""Training/validation objectives for EEND powerset segmentation.

Reference semantics (recipes/diar_ssl/trainer_dual_opt.py:41-111):
  * training: powerset scores -> hard multilabel -> PIT-align the TARGET to
    the prediction (MSE cost) -> convert aligned target to powerset index ->
    frame NLL. The reference runs scipy Hungarian per sample on host; we
    enumerate all K! permutations on device (K <= 4 -> 24) — exact and jit-able.
  * validation: thresholded multilabel at 0.5 vs PIT-aligned target ->
    FA / missed / confusion / total frame counts (torchmetrics
    `_der_update` parity, reduce='batch').
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from diarizen_tpu.ops.losses import nll_loss
from diarizen_tpu.ops.permutation import permutate_enumerate
from diarizen_tpu.ops.powerset import Powerset


def segmentation_loss(
    powerset: Powerset, scores: jnp.ndarray, target: jnp.ndarray
) -> jnp.ndarray:
    """PIT powerset NLL.

    scores : (B, F, P) log-powerset probabilities
    target : (B, F, K) binary multilabel speaker activity
    """
    multilabel = powerset.to_multilabel(scores, soft=False)  # (B, F, K) hard
    permutated_target, _ = permutate_enumerate(multilabel, target.astype(scores.dtype))
    target_idx = powerset.to_powerset_index(permutated_target)  # (B, F)
    return nll_loss(scores, target_idx)


def der_metrics(
    powerset: Powerset,
    scores: jnp.ndarray,
    target: jnp.ndarray,
    threshold: float = 0.5,
) -> Dict[str, jnp.ndarray]:
    """Streaming DER components over a batch of chunks.

    Returns scalar sums {false_alarm, missed_detection, confusion,
    speech_total}; DER = (fa + miss + conf) / total accumulated over batches
    (reference pyannote torchmetrics diarization_error_rate.py:33-262 +
    all-silence guard in recipes trainer_dual_opt.py:74-111).
    """
    pred = powerset.to_multilabel(scores, soft=False).astype(jnp.float32)
    target = target.astype(jnp.float32)
    # MSE-optimal permutation of (soft) prediction columns onto the target,
    # then threshold — exact _der_update ordering
    pred_aligned, _ = permutate_enumerate(target, pred)
    hyp = (pred_aligned > threshold).astype(jnp.float32)  # (B, F, K)

    detection_error = jnp.sum(hyp, axis=-1) - jnp.sum(target, axis=-1)  # (B, F)
    false_alarm_f = jnp.maximum(detection_error, 0.0)
    missed_detection = jnp.sum(jnp.maximum(-detection_error, 0.0))
    confusion = jnp.sum(jnp.sum((hyp != target) * hyp, axis=-1) - false_alarm_f)
    false_alarm = jnp.sum(false_alarm_f)
    speech_total = jnp.sum(target)
    return {
        "false_alarm": false_alarm,
        "missed_detection": missed_detection,
        "confusion": confusion,
        "speech_total": speech_total,
    }

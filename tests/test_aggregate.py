"""Aggregation parity tests: our vectorized overlap-add must match the
reference loop semantics (pyannote core/inference.py:543-666), verified here
against a direct reimplementation of the reference's per-chunk loop."""

import numpy as np

from diarizen_tpu.core.segments import SlidingWindow, SlidingWindowFeature
from diarizen_tpu.ops.aggregate import aggregate, trim


def _reference_loop_aggregate(
    data, chunks, frames, warm_up=(0.0, 0.0), hamming=False, skip_average=False,
    missing=np.nan, epsilon=1e-12,
):
    """Direct transcription of the reference algorithm (slow loop)."""
    num_chunks, chunk_frames, num_classes = data.shape
    out_frames = SlidingWindow(start=chunks.start, duration=frames.duration, step=frames.step)
    masks = 1 - np.isnan(data)
    data = np.nan_to_num(data, copy=True, nan=0.0)
    hamming_window = (
        np.hamming(chunk_frames).reshape(-1, 1) if hamming else np.ones((chunk_frames, 1))
    )
    warm_up_window = np.ones((chunk_frames, 1))
    left = round(warm_up[0] / chunks.duration * chunk_frames)
    warm_up_window[:left] = epsilon
    right = round(warm_up[1] / chunks.duration * chunk_frames)
    warm_up_window[chunk_frames - right:] = epsilon
    num_frames = (
        out_frames.closest_frame(
            chunks.start + chunks.duration + (num_chunks - 1) * chunks.step
            + 0.5 * frames.duration
        ) + 1
    )
    agg = np.zeros((num_frames, num_classes), dtype=np.float32)
    cnt = np.zeros((num_frames, num_classes), dtype=np.float32)
    msk = np.zeros((num_frames, num_classes), dtype=np.float32)
    for c in range(num_chunks):
        chunk = chunks[c]
        start_frame = out_frames.closest_frame(chunk.start + 0.5 * frames.duration)
        agg[start_frame:start_frame + chunk_frames] += (
            data[c] * masks[c] * hamming_window * warm_up_window
        )
        cnt[start_frame:start_frame + chunk_frames] += masks[c] * hamming_window * warm_up_window
        msk[start_frame:start_frame + chunk_frames] = np.maximum(
            msk[start_frame:start_frame + chunk_frames], masks[c]
        )
    average = agg if skip_average else agg / np.maximum(cnt, epsilon)
    average[msk == 0.0] = missing
    return average


def test_aggregate_matches_reference_loop():
    rng = np.random.default_rng(0)
    chunks = SlidingWindow(duration=8.0, step=0.8, start=0.0)
    frames = SlidingWindow(duration=0.025046875, step=0.02, start=0.0)
    data = rng.random((12, 399, 4)).astype(np.float32)
    data[3, 100:150, 2] = np.nan  # masked region

    for hamming in (False, True):
        for skip_average in (False, True):
            for warm_up in ((0.0, 0.0), (0.8, 0.8)):
                got = aggregate(
                    SlidingWindowFeature(data.copy(), chunks),
                    frames,
                    warm_up=warm_up,
                    hamming=hamming,
                    skip_average=skip_average,
                )
                want = _reference_loop_aggregate(
                    data.copy(), chunks, frames,
                    warm_up=warm_up, hamming=hamming, skip_average=skip_average,
                )
                np.testing.assert_allclose(got.data, want, rtol=2e-5, atol=2e-5)


def test_trim():
    chunks = SlidingWindow(duration=8.0, step=0.8, start=0.0)
    data = np.arange(5 * 100 * 2, dtype=np.float32).reshape(5, 100, 2)
    trimmed = trim(SlidingWindowFeature(data, chunks), warm_up=(0.1, 0.1))
    assert trimmed.data.shape == (5, 80, 2)
    np.testing.assert_array_equal(trimmed.data, data[:, 10:90])
    assert abs(trimmed.sliding_window.start - 0.8) < 1e-9
    assert abs(trimmed.sliding_window.duration - 6.4) < 1e-9

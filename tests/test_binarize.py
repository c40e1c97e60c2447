import numpy as np

from diarizen_tpu.core.segments import Segment, SlidingWindow, SlidingWindowFeature
from diarizen_tpu.ops.binarize import Binarize, binarize_hysteresis


def test_hysteresis_basic():
    scores = np.array([[0.9, 0.6, 0.4, 0.6, 0.2, 0.9]])
    # onset 0.8, offset 0.3: on at 0 (0.9>0.8), holds through 0.6/0.4/0.6,
    # off at 0.2, on again at 0.9
    out = binarize_hysteresis(scores, onset=0.8, offset=0.3)
    np.testing.assert_array_equal(out, [[True, True, True, True, False, True]])


def test_hysteresis_initial_state():
    scores = np.array([[0.5, 0.5, 0.9, 0.5]])
    out = binarize_hysteresis(scores, onset=0.8, offset=0.3, initial_state=False)
    np.testing.assert_array_equal(out, [[False, False, True, True]])
    out = binarize_hysteresis(scores, onset=0.8, offset=0.3, initial_state=True)
    np.testing.assert_array_equal(out, [[True, True, True, True]])


def test_hysteresis_default_initial_state_midpoint():
    # default initial state: score[0] >= (onset+offset)/2
    scores = np.array([[0.6, 0.5], [0.4, 0.5]])
    out = binarize_hysteresis(scores, onset=0.8, offset=0.3)
    np.testing.assert_array_equal(out, [[True, True], [False, False]])


def test_binarize_to_annotation():
    frames = SlidingWindow(duration=0.02, step=0.02, start=0.0)
    data = np.zeros((100, 2), dtype=np.float32)
    data[10:30, 0] = 1.0
    data[50:70, 1] = 1.0
    ann = Binarize(onset=0.5)(SlidingWindowFeature(data, frames))
    rows = list(ann.itertracks())
    assert len(rows) == 2
    (seg0, _, lab0), (seg1, _, lab1) = rows
    assert lab0 == "0" and lab1 == "1"
    # active frames 10..29; onset crossing detected at frame 10's middle,
    # drop below offset at frame 30's middle
    assert abs(seg0.start - (10 * 0.02 + 0.01)) < 1e-9
    assert abs(seg0.end - (30 * 0.02 + 0.01)) < 1e-9


def test_binarize_min_duration_on():
    frames = SlidingWindow(duration=0.02, step=0.02, start=0.0)
    data = np.zeros((100, 1), dtype=np.float32)
    data[10:12, 0] = 1.0  # 40 ms blip
    data[50:90, 0] = 1.0  # 800 ms segment
    ann = Binarize(onset=0.5, min_duration_on=0.1)(SlidingWindowFeature(data, frames))
    assert len(ann) == 1


def test_binarize_still_active_at_end():
    frames = SlidingWindow(duration=0.02, step=0.02, start=0.0)
    data = np.ones((10, 1), dtype=np.float32)
    ann = Binarize(onset=0.5)(SlidingWindowFeature(data, frames))
    rows = list(ann.itertracks())
    assert len(rows) == 1
    seg = rows[0][0]
    # ends at LAST frame middle (reference signal.py:301-303)
    assert abs(seg.end - (9 * 0.02 + 0.01)) < 1e-9

"""Resegmentation + multi-label segmentation pipelines.

Reference parity targets: pyannote pipelines/resegmentation.py and
pipelines/multilabel.py. The per-chunk MAE permutation — the step that
decides resegmentation quality — is oracle-tested against the reference
permutate()/mae_cost_func loaded from /root/reference.
"""

import numpy as np
import pytest

from diarizen_tpu.core.segments import (
    Annotation,
    Segment,
    SlidingWindow,
    SlidingWindowFeature,
)
from diarizen_tpu.infer import MultiLabelSegmentation, Resegmentation
from diarizen_tpu.ops.permutation import permutate_hungarian

from ref_shim import load_ref_permutation


# ---------------------------------------------------------------- permutation


@pytest.mark.parametrize("cost", ["mse", "mae"])
def test_permutate_cost_matches_reference(cost):
    import torch

    ref = load_ref_permutation()
    cost_func = ref.mse_cost_func if cost == "mse" else ref.mae_cost_func
    rng = np.random.default_rng(0)
    y1 = rng.random((5, 40, 4)).astype(np.float32)
    y2 = rng.random((5, 40, 4)).astype(np.float32)
    got, got_perm = permutate_hungarian(y1, y2, cost=cost)
    want, want_perms = ref.permutate(
        torch.from_numpy(y1), torch.from_numpy(y2), cost_func=cost_func
    )
    np.testing.assert_allclose(got, want.numpy(), atol=1e-6)
    assert [tuple(p) for p in got_perm] == [tuple(p) for p in want_perms]


# ----------------------------------------------------------------- discretize


def test_annotation_discretize():
    ann = Annotation(uri="u")
    ann[Segment(1.0, 3.0), 0] = "A"
    ann[Segment(2.0, 4.0), 0] = "B"
    res = SlidingWindow(duration=0.0, step=0.5, start=0.0)
    swf = ann.discretize(Segment(0.0, 5.0), res)
    assert swf.data.shape == (10, 2)
    # frame centers at 0.0, 0.5, ..., 4.5 (duration 0 -> center = start)
    np.testing.assert_array_equal(
        swf.data[:, 0], [0, 0, 1, 1, 1, 1, 0, 0, 0, 0]  # A in [1, 3)
    )
    np.testing.assert_array_equal(
        swf.data[:, 1], [0, 0, 0, 0, 1, 1, 1, 1, 0, 0]  # B in [2, 4)
    )
    # explicit label order + missing labels stay as zero columns
    swf2 = ann.discretize(Segment(0.0, 5.0), res, labels=["B", "A", "C"])
    np.testing.assert_array_equal(swf2.data[:, 0], swf.data[:, 1])
    np.testing.assert_array_equal(swf2.data[:, 2], 0.0)


# ------------------------------------------------------------- resegmentation


class _FakeCfg:
    """Just enough of EendConfig for receptive_field_window/num_frames: a
    1-layer 'conv stack' at 160-sample stride (10 ms frames)."""

    sample_rate = 16000

    class wavlm:
        conv_layers = ((1, 160, 160),)

    def rf_info(self):
        return 160 / 16000, 160 / 16000

    def num_frames(self, num_samples: int) -> int:
        return num_samples // 160


TRUTH = [("A", 1.0, 8.0), ("B", 5.0, 10.0), ("A", 12.0, 18.0), ("B", 14.0, 19.0)]


def _truth_annotation() -> Annotation:
    ann = Annotation(uri="synthetic")
    for i, (label, s, e) in enumerate(TRUTH):
        ann[Segment(s, e), i] = label
    return ann


class _FakeSegInference:
    """Emits 'ideal' local segmentations of the TRUTH activity, with the
    local speaker order permuted per chunk — exactly the ambiguity the
    resegmentation pipeline's per-chunk MAE permutation must undo."""

    def __init__(self, duration=4.0, step=2.0):
        self.cfg = _FakeCfg()
        self.duration = duration
        self.step = step

    def __call__(self, waveform, sample_rate, soft=True, hook=None):
        total = waveform.shape[-1] / sample_rate
        frames = SlidingWindow(duration=0.01, step=0.01, start=0.0)
        truth = _truth_annotation().discretize(
            Segment(0.0, total), frames, labels=["A", "B"]
        )
        num_frames = self.cfg.num_frames(round(self.duration * sample_rate))
        starts = []
        t = 0.0
        while t + self.duration <= total + 1e-9:
            starts.append(t)
            t += self.step
        data = np.zeros((len(starts), num_frames, 2), dtype=np.float32)
        for c, start in enumerate(starts):
            i0 = int(round(start / 0.01))
            local = truth.data[i0 : i0 + num_frames]
            if c % 2 == 1:  # chunk-dependent local speaker order
                local = local[:, ::-1]
            data[c, : local.shape[0]] = local
        chunks = SlidingWindow(duration=self.duration, step=self.step, start=0.0)
        return SlidingWindowFeature(data, chunks)


def test_resegmentation_recovers_truth_with_permuted_chunks():
    fake = _FakeSegInference()
    reseg = Resegmentation(
        fake, warm_up=0.05, onset=0.5, offset=0.5,
        min_duration_on=0.0, min_duration_off=0.0,
    )
    waveform = np.zeros((1, 16000 * 20), dtype=np.float32)
    truth = _truth_annotation()
    result = reseg(waveform, 16000, diarization=truth, uri="synthetic")

    assert result.uri == "synthetic"
    assert set(result.labels()) <= {"A", "B"}

    # frame-level agreement with the truth raster must be near-perfect
    res = SlidingWindow(duration=0.0, step=0.05, start=0.0)
    want = truth.discretize(Segment(0.0, 20.0), res, labels=["A", "B"])
    got = result.discretize(Segment(0.0, 20.0), res, labels=["A", "B"])
    agreement = float(np.mean(want.data == got.data))
    assert agreement > 0.97, agreement

    hooks = []
    reseg(
        waveform, 16000, diarization=truth, uri="synthetic",
        hook=lambda name, artifact, **kw: hooks.append(name),
    )
    assert hooks == [
        "segmentation", "speaker_counting", "@resegmentation/original",
        "@resegmentation/trim", "@resegmentation/permutated",
    ]


def test_resegmentation_handles_more_input_speakers_than_local():
    """Input diarization with 3 speakers vs 2 local slots: the speaker axes
    are zero-padded to a common width (reference resegmentation.py:218-230)."""
    fake = _FakeSegInference()
    reseg = Resegmentation(fake, onset=0.5, offset=0.5,
                           min_duration_on=0.0, min_duration_off=0.0)
    diar = _truth_annotation()
    diar[Segment(0.0, 0.5), 9] = "C"
    waveform = np.zeros((1, 16000 * 20), dtype=np.float32)
    result = reseg(waveform, 16000, diarization=diar, uri="u")
    assert set(result.labels()) <= {"A", "B", "C"}


# ------------------------------------------------------------------ multilabel


class _FakeAggInference:
    def __init__(self, data):
        self._data = data

    def aggregated(self, waveform, sample_rate, soft=True):
        frames = SlidingWindow(duration=0.02, step=0.02, start=0.0)
        return SlidingWindowFeature(self._data, frames)


def test_multilabel_segmentation():
    num_frames = 500  # 10 s at 20 ms frames
    data = np.zeros((num_frames, 2), dtype=np.float32)
    data[50:150, 0] = 0.9   # speech in [1.0, 3.0)
    data[200:400, 1] = 0.7  # music in [4.0, 8.0)
    pipeline = MultiLabelSegmentation(
        _FakeAggInference(data),
        classes=["speech", "music"],
        thresholds={
            "speech": {"onset": 0.5, "offset": 0.5},
            "music": {"onset": 0.6, "offset": 0.6},
        },
    )
    ann = pipeline(np.zeros((1, 160000), np.float32), 16000, uri="u")
    assert set(ann.labels()) == {"speech", "music"}
    speech = ann.label_timeline("speech").segments
    music = ann.label_timeline("music").segments
    assert len(speech) == 1 and len(music) == 1
    assert speech[0].start == pytest.approx(1.0, abs=0.05)
    assert speech[0].end == pytest.approx(3.0, abs=0.05)
    assert music[0].start == pytest.approx(4.0, abs=0.05)
    assert music[0].end == pytest.approx(8.0, abs=0.05)

    # music onset 0.6 > its score 0.55 -> music disappears
    data2 = data.copy()
    data2[200:400, 1] = 0.55
    pipeline2 = MultiLabelSegmentation(
        _FakeAggInference(data2), classes=["speech", "music"],
        thresholds={"speech": {"onset": 0.5, "offset": 0.5},
                    "music": {"onset": 0.6, "offset": 0.6}},
    )
    ann2 = pipeline2(np.zeros((1, 160000), np.float32), 16000)
    assert set(ann2.labels()) == {"speech"}

    # shared min_duration_on drops the short speech blip
    data3 = np.zeros((num_frames, 1), dtype=np.float32)
    data3[10:12, 0] = 0.9
    pipeline3 = MultiLabelSegmentation(
        _FakeAggInference(data3), classes=["speech"],
        thresholds={"speech": {"onset": 0.5, "offset": 0.5}},
        share_min_duration=True, min_duration_on=0.5,
    )
    assert len(pipeline3(np.zeros((1, 160000), np.float32), 16000)) == 0

import numpy as np

from diarizen_tpu.core.segments import (
    Annotation,
    Segment,
    SlidingWindow,
    Timeline,
)


def test_sliding_window_indexing():
    sw = SlidingWindow(duration=8.0, step=0.8, start=0.0)
    assert sw[0] == Segment(0.0, 8.0)
    assert abs(sw[3].start - 2.4) < 1e-9 and abs(sw[3].end - 10.4) < 1e-9


def test_closest_frame_matches_pyannote_rounding():
    # closest_frame(t) = rint((t - start - duration/2) / step)
    sw = SlidingWindow(duration=0.025, step=0.02, start=0.0)
    for t, expected in [(0.0125, 0), (0.0325, 1), (1.0125, 50)]:
        assert sw.closest_frame(t) == expected


def test_timeline_support_collar_semantics():
    tl = Timeline([Segment(0, 1), Segment(1, 2), Segment(2.5, 3)])
    # collar 0: touching segments NOT merged (pyannote.core semantics)
    assert len(tl.support(0.0)) == 3
    # collar 0.6: gap of 0.5 merged
    assert len(tl.support(0.6)) == 1
    # overlap always merged
    tl2 = Timeline([Segment(0, 1.5), Segment(1, 2)])
    assert tl2.support(0.0).segments == [Segment(0, 2)]


def test_timeline_gaps():
    tl = Timeline([Segment(1, 2), Segment(3, 4)])
    gaps = tl.gaps(Segment(0, 5))
    assert gaps.segments == [Segment(0, 1), Segment(2, 3), Segment(4, 5)]


def test_annotation_chart_and_rttm():
    ann = Annotation(uri="rec1")
    ann[Segment(0, 2), 0] = "alice"
    ann[Segment(1, 2), 1] = "bob"
    ann[Segment(3, 7), 2] = "bob"
    chart = ann.chart()
    assert chart[0] == ("bob", 5.0)
    rttm = ann.to_rttm()
    assert "SPEAKER rec1 1 0.000 2.000" in rttm
    assert rttm.count("\n") == 3


def test_annotation_crop():
    ann = Annotation()
    ann[Segment(0, 10), 0] = "a"
    cropped = ann.crop(Timeline([Segment(2, 4), Segment(6, 8)]))
    segs = [seg for seg, _, _ in cropped.itertracks()]
    assert segs == [Segment(2, 4), Segment(6, 8)]

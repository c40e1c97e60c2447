"""DER tests with hand-computed expected values
(reference model: pyannote tests/test_metrics.py:46-140)."""

import numpy as np
import jax.numpy as jnp

from diarizen_tpu.core.segments import Annotation, Segment, Timeline
from diarizen_tpu.ops.der import der_components, der_report, optimal_mapping


def test_der_components_perfect():
    target = np.zeros((1, 3, 10), dtype=np.float32)
    target[0, 0, 2:6] = 1
    target[0, 1, 4:8] = 1
    fa, miss, conf, total = der_components(jnp.asarray(target), jnp.asarray(target))
    assert float(fa) == 0 and float(miss) == 0 and float(conf) == 0
    assert float(total) == 8


def test_der_components_miss_and_fa():
    target = np.zeros((1, 2, 10), dtype=np.float32)
    target[0, 0, 0:6] = 1  # 6 frames speaker 0
    preds = np.zeros((1, 2, 10), dtype=np.float32)
    preds[0, 0, 0:4] = 1  # misses 2 frames
    preds[0, 1, 8:10] = 1  # 2 false alarm frames
    fa, miss, conf, total = der_components(jnp.asarray(preds), jnp.asarray(target))
    assert float(miss) == 2
    assert float(fa) == 2
    assert float(conf) == 0
    assert float(total) == 6


def test_der_components_confusion_via_permutation():
    """Prediction uses the 'wrong' speaker index but matches perfectly ->
    permutation-invariant DER must be 0."""
    target = np.zeros((1, 2, 10), dtype=np.float32)
    target[0, 0, 0:5] = 1
    preds = np.zeros((1, 2, 10), dtype=np.float32)
    preds[0, 1, 0:5] = 1
    fa, miss, conf, total = der_components(jnp.asarray(preds), jnp.asarray(target))
    assert float(fa) + float(miss) + float(conf) == 0


def _ann(rows, uri=None):
    ann = Annotation(uri=uri)
    for i, (s, e, label) in enumerate(rows):
        ann[Segment(s, e), i] = label
    return ann


def test_der_report_perfect():
    ref = _ann([(0, 10, "a"), (12, 20, "b")])
    hyp = _ann([(0, 10, "x"), (12, 20, "y")])
    r = der_report(ref, hyp)
    assert r.der == 0.0
    assert r.total == 18.0


def test_der_report_components():
    ref = _ann([(0, 10, "a")])
    hyp = _ann([(0, 8, "x"), (8, 12, "y")])
    # x->a (8s overlap). miss: 0; from 8-10: y is unmapped -> confusion 2;
    # 10-12: false alarm 2
    r = der_report(ref, hyp)
    assert r.total == 10.0
    assert r.missed_detection == 0.0
    assert abs(r.confusion - 2.0) < 1e-9
    assert abs(r.false_alarm - 2.0) < 1e-9


def test_der_report_overlap_scored():
    ref = _ann([(0, 10, "a"), (5, 10, "b")])  # 5 s of overlap
    hyp = _ann([(0, 10, "x")])  # only one speaker found
    r = der_report(ref, hyp)
    assert r.total == 15.0
    assert abs(r.missed_detection - 5.0) < 1e-9
    assert r.false_alarm == 0.0


def test_der_report_uem_crop():
    ref = _ann([(0, 10, "a")])
    hyp = _ann([(0, 10, "x")])
    uem = Timeline([Segment(2, 8)])
    r = der_report(ref, hyp, uem=uem)
    assert r.total == 6.0
    assert r.der == 0.0


def test_optimal_mapping_prefers_max_overlap():
    ref = _ann([(0, 10, "a"), (10, 12, "b")])
    hyp = _ann([(0, 9, "h1"), (9, 12, "h2")])
    mapping = optimal_mapping(ref, hyp)
    assert mapping == {"h1": "a", "h2": "b"}

"""Direct oracles: diarizen_tpu host-side pipeline math vs the ACTUAL
reference functions loaded from /root/reference (stubbed-deps import, same
technique as test_embedding.py).

These lock the DER-parity gate: aggregate/trim, speaker_count/to_diarization,
AHC (incl. dendrogram re-traversal tie-breaks), hysteresis Binarize, VBx, and
the end-to-end stage-4..7 chain must be bit-identical to the reference
(SURVEY.md section 7 "hard parts").
"""

import os
import sys

import numpy as np
import pytest

import ref_shim
from ref_shim import annotation_tuples

from diarizen_tpu.core import segments as my_seg
from diarizen_tpu.ops.aggregate import aggregate as my_aggregate, trim as my_trim
from diarizen_tpu.ops.binarize import Binarize as MyBinarize, binarize_hysteresis
from diarizen_tpu.cluster.ahc import AgglomerativeClustering as MyAHC, ahc_cluster
import importlib

# the cluster package re-exports a `vbx` *function*, shadowing the submodule
my_vbx = importlib.import_module("diarizen_tpu.cluster.vbx")
from diarizen_tpu.infer.pipeline import (
    reconstruct as my_reconstruct,
    speaker_count as my_speaker_count,
    to_diarization as my_to_diarization,
)

pytestmark = pytest.mark.skipif(
    not ref_shim.HAVE_REFERENCE, reason="reference checkout not available"
)

pytest.importorskip("torch")


# --------------------------------------------------------------------------
# fixtures / builders
# --------------------------------------------------------------------------

CHUNK_WIN = dict(duration=2.0, step=0.4, start=0.0)
FRAME_WIN = dict(duration=0.04, step=0.02, start=0.0)


def make_scores(rng, num_chunks=7, num_frames=40, num_classes=3, with_nan=True):
    data = rng.standard_normal((num_chunks, num_frames, num_classes)).astype(
        np.float32
    )
    if with_nan:
        # whole-chunk-speaker NaN (failed embedding pattern) + scattered NaNs
        data[2, :, 1] = np.nan
        nan_mask = rng.uniform(size=data.shape) < 0.05
        data[nan_mask] = np.nan
    return data


def ref_swf(data, win_kwargs):
    return ref_shim.SlidingWindowFeature(
        data.copy(), ref_shim.SlidingWindow(**win_kwargs)
    )


def my_swf(data, win_kwargs):
    return my_seg.SlidingWindowFeature(
        data.copy(), my_seg.SlidingWindow(**win_kwargs)
    )


# --------------------------------------------------------------------------
# aggregate / trim
# --------------------------------------------------------------------------

@pytest.mark.parametrize("hamming", [False, True])
@pytest.mark.parametrize("skip_average", [False, True])
@pytest.mark.parametrize("warm_up", [(0.0, 0.0), (0.1, 0.1), (0.2, 0.05)])
def test_aggregate_oracle(rng, hamming, skip_average, warm_up):
    ref_inf = ref_shim.load_ref_inference()
    data = make_scores(rng)
    for missing in (np.nan, 0.0):
        expected = ref_inf.Inference.aggregate(
            ref_swf(data, CHUNK_WIN),
            ref_shim.SlidingWindow(**FRAME_WIN),
            warm_up=warm_up,
            hamming=hamming,
            missing=missing,
            skip_average=skip_average,
        )
        got = my_aggregate(
            my_swf(data, CHUNK_WIN),
            my_seg.SlidingWindow(**FRAME_WIN),
            warm_up=warm_up,
            hamming=hamming,
            missing=missing,
            skip_average=skip_average,
        )
        assert got.data.shape == expected.data.shape
        np.testing.assert_array_equal(
            np.isnan(got.data), np.isnan(expected.data)
        )
        np.testing.assert_allclose(
            np.nan_to_num(got.data), np.nan_to_num(expected.data),
            rtol=1e-6, atol=1e-6,
        )
        sw, esw = got.sliding_window, expected.sliding_window
        assert (sw.start, sw.duration, sw.step) == (esw.start, esw.duration, esw.step)


def test_aggregate_oracle_offset_start(rng):
    """Chunk window starting at a non-zero offset (Inference.crop path)."""
    ref_inf = ref_shim.load_ref_inference()
    win = dict(duration=2.0, step=0.5, start=1.3)
    data = make_scores(rng, num_chunks=4)
    expected = ref_inf.Inference.aggregate(
        ref_swf(data, win), ref_shim.SlidingWindow(**FRAME_WIN)
    )
    got = my_aggregate(my_swf(data, win), my_seg.SlidingWindow(**FRAME_WIN))
    np.testing.assert_allclose(
        np.nan_to_num(got.data), np.nan_to_num(expected.data), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(np.isnan(got.data), np.isnan(expected.data))
    assert got.sliding_window.start == expected.sliding_window.start


@pytest.mark.parametrize("warm_up", [(0.1, 0.1), (0.0, 0.25), (0.33, 0.0)])
def test_trim_oracle(rng, warm_up):
    ref_inf = ref_shim.load_ref_inference()
    data = make_scores(rng)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        expected = ref_inf.Inference.trim(ref_swf(data, CHUNK_WIN), warm_up=warm_up)
        got = my_trim(my_swf(data, CHUNK_WIN), warm_up=warm_up)
    np.testing.assert_array_equal(
        np.nan_to_num(got.data), np.nan_to_num(expected.data)
    )
    sw, esw = got.sliding_window, expected.sliding_window
    np.testing.assert_allclose(
        [sw.start, sw.duration, sw.step], [esw.start, esw.duration, esw.step]
    )


# --------------------------------------------------------------------------
# speaker_count / to_diarization
# --------------------------------------------------------------------------

def make_binary_segmentations(rng, num_chunks=9, num_frames=40, num_speakers=4):
    """Binary activity with realistic runs (hysteresis-like blocks)."""
    data = np.zeros((num_chunks, num_frames, num_speakers), dtype=np.float32)
    for c in range(num_chunks):
        for s in range(num_speakers):
            if rng.uniform() < 0.25:
                continue  # silent speaker in this chunk
            n_runs = rng.integers(1, 4)
            for _ in range(n_runs):
                start = rng.integers(0, num_frames - 5)
                length = rng.integers(3, 15)
                data[c, start : start + length, s] = 1.0
    return data


@pytest.mark.parametrize("warm_up", [(0.0, 0.0), (0.1, 0.1)])
def test_speaker_count_oracle(rng, warm_up):
    diar = ref_shim.load_ref_diarization()
    data = make_binary_segmentations(rng)
    expected = diar.SpeakerDiarizationMixin.speaker_count(
        ref_swf(data, CHUNK_WIN),
        ref_shim.SlidingWindow(**FRAME_WIN),
        warm_up=warm_up,
    )
    got = my_speaker_count(
        my_swf(data, CHUNK_WIN), my_seg.SlidingWindow(**FRAME_WIN), warm_up=warm_up
    )
    assert got.data.dtype == expected.data.dtype == np.uint8
    np.testing.assert_array_equal(got.data, expected.data)
    assert got.sliding_window.start == expected.sliding_window.start


def test_to_diarization_oracle(rng):
    diar = ref_shim.load_ref_diarization()
    # clustered segmentations: NaN where a cluster is absent from a chunk
    data = make_binary_segmentations(rng, num_chunks=6, num_speakers=3).astype(
        np.float64
    )
    data[data == 0] = rng.uniform(0.0, 0.45, size=(data == 0).sum())
    data[1, :, 2] = np.nan

    count_data = rng.integers(0, 4, size=(120, 1)).astype(np.uint8)
    count_win = dict(duration=FRAME_WIN["duration"], step=FRAME_WIN["step"], start=0.0)

    expected_binary, _ = diar.SpeakerDiarizationMixin.to_diarization(
        ref_swf(data, CHUNK_WIN), ref_swf(count_data, count_win)
    )
    got = my_to_diarization(
        my_swf(data, CHUNK_WIN), my_swf(count_data, count_win)
    )
    np.testing.assert_array_equal(got.data, expected_binary.data)
    assert got.sliding_window.start == expected_binary.sliding_window.start


def test_to_diarization_count_exceeds_speakers(rng):
    """count > num_clusters triggers the zero-pad branch (diarization.py:221)."""
    diar = ref_shim.load_ref_diarization()
    data = rng.uniform(0, 1, size=(4, 40, 2))
    count_data = np.full((100, 1), 4, dtype=np.uint8)
    count_win = dict(duration=FRAME_WIN["duration"], step=FRAME_WIN["step"], start=0.0)
    expected_binary, _ = diar.SpeakerDiarizationMixin.to_diarization(
        ref_swf(data, CHUNK_WIN), ref_swf(count_data, count_win)
    )
    got = my_to_diarization(my_swf(data, CHUNK_WIN), my_swf(count_data, count_win))
    np.testing.assert_array_equal(got.data, expected_binary.data)


# --------------------------------------------------------------------------
# AHC (incl. dendrogram re-traversal tie-break cases)
# --------------------------------------------------------------------------

def make_blob_embeddings(rng, sizes=(25, 20, 15), dim=16, spread=0.15, ties=False):
    centers = rng.standard_normal((len(sizes), dim)) * 2.0
    parts = []
    for k, n in enumerate(sizes):
        pts = centers[k] + spread * rng.standard_normal((n, dim))
        parts.append(pts)
    emb = np.concatenate(parts).astype(np.float64)
    if ties:
        # quantize to force equal linkage distances -> exercises the argsort
        # tie-breaking inside the dendrogram re-traversal
        emb = np.round(emb, 1)
    return emb


def _make_ref_ahc(clustering_mod, threshold, method, min_cluster_size):
    ref = clustering_mod.AgglomerativeClustering(metric="cosine")
    ref.threshold = threshold
    ref.method = method
    ref.min_cluster_size = min_cluster_size
    return ref


AHC_CASES = [
    # (threshold, method, min_cluster_size, num_clusters, min_c, max_c)
    (0.7, "centroid", 5, None, 1, 10),      # natural threshold clustering
    (0.7, "centroid", 5, 2, None, None),    # force retraversal down
    (0.7, "centroid", 1, 5, None, None),    # force retraversal up
    (0.3, "average", 3, None, 1, 2),        # max_clusters cap
    (1.2, "centroid", 5, None, 4, 10),      # min_clusters floor
    (0.7, "centroid", 30, None, 1, 10),     # min_cluster_size heuristic clamp
]


@pytest.mark.parametrize("ties", [False, True])
@pytest.mark.parametrize("case", AHC_CASES)
def test_ahc_cluster_oracle(rng, case, ties):
    clustering_mod = ref_shim.load_ref_clustering()
    threshold, method, mcs, num_c, min_c, max_c = case
    emb = make_blob_embeddings(rng, ties=ties)
    n = emb.shape[0]

    ref = _make_ref_ahc(clustering_mod, threshold, method, mcs)
    num_clusters, min_clusters, max_clusters = ref.set_num_clusters(
        n, num_clusters=num_c, min_clusters=min_c, max_clusters=max_c
    )
    expected = ref.cluster(
        emb.copy(), min_clusters, max_clusters, num_clusters=num_clusters
    )
    got = ahc_cluster(
        emb.copy(), min_clusters, max_clusters, num_clusters=num_clusters,
        threshold=threshold, method=method, min_cluster_size=mcs,
    )
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("constrained", [False, True])
def test_ahc_full_call_oracle(rng, constrained):
    """Full __call__: filter -> set_num_clusters -> cluster -> assign."""
    clustering_mod = ref_shim.load_ref_clustering()
    num_chunks, num_speakers, dim = 30, 4, 16
    segmentations = make_binary_segmentations(
        rng, num_chunks=num_chunks, num_frames=40, num_speakers=num_speakers
    )
    centers = rng.standard_normal((3, dim)) * 2.0
    emb = np.full((num_chunks, num_speakers, dim), np.nan)
    for c in range(num_chunks):
        for s in range(num_speakers):
            if segmentations[c, :, s].sum() > 0:
                emb[c, s] = centers[s % 3] + 0.1 * rng.standard_normal(dim)

    ref = _make_ref_ahc(clustering_mod, 0.7, "centroid", 3)
    ref.constrained_assignment = constrained
    exp_hard, exp_soft, exp_centroids = ref(
        emb.copy(),
        segmentations=ref_swf(segmentations, CHUNK_WIN),
        min_clusters=1,
        max_clusters=6,
    )
    mine = MyAHC(threshold=0.7, method="centroid", min_cluster_size=3,
                 constrained_assignment=constrained)
    got_hard, got_soft, got_centroids = mine(
        emb.copy(), segmentations, min_clusters=1, max_clusters=6
    )
    np.testing.assert_array_equal(got_hard, exp_hard)
    np.testing.assert_allclose(got_soft, exp_soft, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(got_centroids, exp_centroids, rtol=1e-9, atol=1e-9)


def test_ahc_constrained_assignment_oracle(rng):
    clustering_mod = ref_shim.load_ref_clustering()
    ref = _make_ref_ahc(clustering_mod, 0.7, "centroid", 1)
    soft = rng.uniform(0, 2, size=(10, 4, 3))
    soft[3, 2, :] = np.nan
    expected = ref.constrained_argmax(soft.copy())
    from diarizen_tpu.cluster.base import constrained_argmax

    got = constrained_argmax(soft.copy())
    np.testing.assert_array_equal(got, expected)


def test_ahc_single_embedding_oracle(rng):
    clustering_mod = ref_shim.load_ref_clustering()
    ref = _make_ref_ahc(clustering_mod, 0.7, "centroid", 5)
    emb = rng.standard_normal((1, 16))
    expected = ref.cluster(emb.copy(), 1, 1, num_clusters=1)
    got = ahc_cluster(emb.copy(), 1, 1, num_clusters=1,
                      threshold=0.7, method="centroid", min_cluster_size=5)
    np.testing.assert_array_equal(got, expected)


def test_filter_embeddings_oracle(rng):
    clustering_mod = ref_shim.load_ref_clustering()
    segmentations = make_binary_segmentations(rng, num_chunks=12)
    emb = rng.standard_normal((12, 4, 16))
    emb[0, 0] = np.nan  # failed extraction
    ref = _make_ref_ahc(clustering_mod, 0.7, "centroid", 5)
    exp_emb, exp_chunk, exp_spk = ref.filter_embeddings(
        emb, segmentations=ref_swf(segmentations, CHUNK_WIN)
    )
    from diarizen_tpu.cluster.base import filter_embeddings

    got_emb, got_chunk, got_spk = filter_embeddings(emb, segmentations)
    np.testing.assert_array_equal(got_chunk, exp_chunk)
    np.testing.assert_array_equal(got_spk, exp_spk)
    np.testing.assert_array_equal(got_emb, exp_emb)

    # fallback branch: fully-overlapped input (no clean frames anywhere)
    seg_overlap = np.ones((5, 40, 3), dtype=np.float32)
    emb2 = rng.standard_normal((5, 3, 16))
    exp_emb, exp_chunk, exp_spk = ref.filter_embeddings(
        emb2, segmentations=ref_swf(seg_overlap, CHUNK_WIN)
    )
    got_emb, got_chunk, got_spk = filter_embeddings(emb2, seg_overlap)
    np.testing.assert_array_equal(got_chunk, exp_chunk)
    np.testing.assert_array_equal(got_spk, exp_spk)


# --------------------------------------------------------------------------
# hysteresis binarize
# --------------------------------------------------------------------------

@pytest.mark.parametrize("initial_state", [None, True, False, "array"])
def test_binarize_ndarray_oracle(rng, initial_state):
    signal = ref_shim.load_ref_signal()
    scores = rng.uniform(0, 1, size=(6, 50))
    scores[2, 10:20] = 0.45  # flat in-hysteresis region
    scores[4] = 0.45  # never well-defined -> initial state everywhere
    scores[1, 5] = np.nan
    init = initial_state
    if initial_state == "array":
        init = rng.uniform(size=6) < 0.5
    expected = signal.binarize(
        scores.copy(), onset=0.5, offset=0.4,
        initial_state=init if init is None or isinstance(init, np.ndarray) else bool(init),
    )
    got = binarize_hysteresis(scores.copy(), onset=0.5, offset=0.4, initial_state=init)
    np.testing.assert_array_equal(got, expected)


def test_binarize_annotation_oracle(rng):
    signal = ref_shim.load_ref_signal()
    frame_win = dict(duration=0.04, step=0.02, start=0.0)
    for params in [
        dict(onset=0.5, offset=0.5),
        dict(onset=0.6, offset=0.4),
        dict(onset=0.5, offset=0.5, min_duration_on=0.15),
        dict(onset=0.5, offset=0.5, min_duration_off=0.2),
        dict(onset=0.5, offset=0.5, pad_onset=0.05, pad_offset=0.08),
        dict(onset=0.5, offset=0.4, min_duration_on=0.1, min_duration_off=0.1,
             pad_onset=0.03, pad_offset=0.03),
    ]:
        scores = rng.uniform(0, 1, size=(200, 3))
        scores[50:60, 0] = 1.0
        scores[:5, 1] = 1.0  # active from the very first frame
        scores[195:, 2] = 1.0  # active through the last frame
        expected = signal.Binarize(**params)(ref_swf(scores, frame_win))
        got = MyBinarize(**params)(my_swf(scores, frame_win))
        assert annotation_tuples(got) == annotation_tuples(expected), params


# --------------------------------------------------------------------------
# VBx
# --------------------------------------------------------------------------

def make_plda_dir(tmp_path, rng, xdim=32, ldadim=8):
    lda = rng.standard_normal((xdim, ldadim))
    mean1 = rng.standard_normal(xdim)
    mean2 = rng.standard_normal(ldadim)
    np.savez(tmp_path / "xvec_transform.npz", mean1=mean1, mean2=mean2, lda=lda)
    tr = rng.standard_normal((ldadim, ldadim)) + np.eye(ldadim) * 2.0
    psi = np.sort(rng.uniform(0.5, 5.0, size=ldadim))[::-1]
    mu = rng.standard_normal(ldadim)
    np.savez(tmp_path / "plda.npz", mu=mu, tr=tr, psi=psi)
    return str(tmp_path)


def test_vbx_gmm_oracle(rng):
    """GMM-mode VB update (loopProb<=0 — the mode every recipe uses)."""
    ref_vbx = ref_shim.load_ref_vbx()
    fea = rng.standard_normal((80, 8))
    phi = np.sort(rng.uniform(0.5, 4.0, 8))[::-1]
    labels = rng.integers(0, 3, size=80)
    exp_gamma, exp_pi = ref_vbx.cluster_vbx(
        labels, fea.copy(), phi, Fa=0.3, Fb=4.0, loopProb=0.0, maxIters=15
    )
    got_gamma, got_pi = my_vbx.cluster_vbx(
        labels, fea.copy(), phi, fa=0.3, fb=4.0, loop_prob=0.0, max_iters=15
    )
    np.testing.assert_allclose(got_gamma, exp_gamma, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(got_pi, exp_pi, rtol=1e-8, atol=1e-10)


def test_vbx_setup_oracle(rng, tmp_path):
    ref_vbx = ref_shim.load_ref_vbx()
    plda_dir = make_plda_dir(tmp_path, rng)
    exp_xtf, exp_ptf, exp_psi = ref_vbx.vbx_setup(plda_dir)
    got_xtf, got_ptf, got_psi = my_vbx.vbx_setup(plda_dir)
    np.testing.assert_allclose(got_psi, exp_psi, rtol=1e-10)
    x = rng.standard_normal((20, 32))
    np.testing.assert_allclose(got_xtf(x), exp_xtf(x), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        got_ptf(got_xtf(x), 6), exp_ptf(exp_xtf(x), 6), rtol=1e-8, atol=1e-8
    )


def test_vbx_clustering_full_oracle(rng, tmp_path):
    """Full VBxClustering __call__ vs the fork's (clustering.py:601-700)."""
    clustering_mod = ref_shim.load_ref_clustering()
    plda_dir = make_plda_dir(tmp_path, rng)

    num_chunks, num_speakers, dim = 25, 4, 32
    segmentations = make_binary_segmentations(
        rng, num_chunks=num_chunks, num_frames=40, num_speakers=num_speakers
    )
    centers = rng.standard_normal((3, dim)) * 2.0
    emb = np.full((num_chunks, num_speakers, dim), np.nan)
    for c in range(num_chunks):
        for s in range(num_speakers):
            if segmentations[c, :, s].sum() > 0:
                emb[c, s] = centers[s % 3] + 0.1 * rng.standard_normal(dim)

    ref = clustering_mod.VBxClustering(plda_dir=plda_dir, lda_dim=8, maxIters=10)
    ref.ahc_criterion = "distance"
    ref.ahc_threshold = 0.6
    ref.Fa = 0.3
    ref.Fb = 4.0
    exp_hard, exp_soft, exp_centroids = ref(
        emb.copy(), segmentations=ref_swf(segmentations, CHUNK_WIN)
    )

    mine = my_vbx.VBxClustering(
        plda_dir=plda_dir, ahc_criterion="distance", ahc_threshold=0.6,
        fa=0.3, fb=4.0, lda_dim=8, max_iters=10, constrained_assignment=True,
    )
    got_hard, got_soft, got_centroids = mine(emb.copy(), segmentations)
    np.testing.assert_allclose(got_centroids, exp_centroids, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(got_soft, exp_soft, rtol=1e-7, atol=1e-8)
    np.testing.assert_array_equal(got_hard, exp_hard)


# --------------------------------------------------------------------------
# end-to-end stages 4-7: identical synthetic segmentations ->
# identical RTTM through both pipelines
# --------------------------------------------------------------------------

def test_stage47_end_to_end_oracle(rng):
    """Inject identical segmentations + embeddings into the reference's
    count -> cluster -> reconstruct -> binarize chain
    (diarizen/pipelines/inference.py:137-186) and diarizen_tpu's; RTTMs must
    match exactly."""
    sd_mod = ref_shim.load_ref_speaker_diarization()
    clustering_mod = ref_shim.load_ref_clustering()
    diar = ref_shim.load_ref_diarization()

    num_chunks, num_frames, num_speakers, dim = 20, 40, 4, 16
    max_speakers = 8
    segmentations = make_binary_segmentations(
        rng, num_chunks=num_chunks, num_frames=num_frames,
        num_speakers=num_speakers,
    )
    centers = rng.standard_normal((3, dim)) * 2.0
    emb = np.full((num_chunks, num_speakers, dim), np.nan)
    for c in range(num_chunks):
        for s in range(num_speakers):
            if segmentations[c, :, s].sum() > 0:
                emb[c, s] = centers[s % 3] + 0.1 * rng.standard_normal(dim)

    frames = ref_shim.SlidingWindow(**FRAME_WIN)

    # ---- reference chain
    binarized = ref_swf(segmentations, CHUNK_WIN)
    count = diar.SpeakerDiarizationMixin.speaker_count(
        ref_swf(segmentations, CHUNK_WIN), frames, warm_up=(0.0, 0.0)
    )
    ref_ahc = _make_ref_ahc(clustering_mod, 0.7, "centroid", 3)
    ref_ahc.constrained_assignment = True
    hard_clusters, _, _ = ref_ahc(
        emb.copy(), segmentations=binarized, min_clusters=1,
        max_clusters=max_speakers,
    )
    count.data = np.minimum(count.data, max_speakers).astype(np.int8)
    inactive = np.sum(binarized.data, axis=1) == 0
    hard_clusters[inactive] = -2
    pipeline = object.__new__(sd_mod.SpeakerDiarization)
    discrete, _ = pipeline.reconstruct(
        ref_swf(segmentations, CHUNK_WIN), hard_clusters, count
    )
    signal = ref_shim.load_ref_signal()
    expected = signal.Binarize(onset=0.5, offset=0.5)(discrete)

    # ---- diarizen_tpu chain (infer/pipeline.py __call__ stages 4-7)
    my_binarized = my_swf(segmentations, CHUNK_WIN)
    my_count = my_speaker_count(
        my_swf(segmentations, CHUNK_WIN),
        my_seg.SlidingWindow(**FRAME_WIN),
        warm_up=(0.0, 0.0),
    )
    mine_ahc = MyAHC(threshold=0.7, method="centroid", min_cluster_size=3,
                     constrained_assignment=True)
    my_hard, _, _ = mine_ahc(
        emb.copy(), segmentations, min_clusters=1, max_clusters=max_speakers
    )
    my_count.data = np.minimum(my_count.data, max_speakers).astype(np.int8)
    my_inactive = np.sum(my_binarized.data, axis=1) == 0
    my_hard[my_inactive] = -2
    np.testing.assert_array_equal(my_hard, hard_clusters)
    np.testing.assert_array_equal(my_count.data, count.data)
    my_discrete = my_reconstruct(
        my_swf(segmentations, CHUNK_WIN), my_hard, my_count
    )
    got = MyBinarize(onset=0.5, offset=0.5)(my_discrete)

    exp_tuples = annotation_tuples(expected)
    got_tuples = annotation_tuples(got)
    assert len(exp_tuples) > 0
    assert got_tuples == exp_tuples

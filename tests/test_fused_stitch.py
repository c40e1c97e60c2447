"""Device-side fused stitching (infer/fused.py) vs the host stages.

The fused path replaces exact host math (scipy median filter, ops/aggregate
speaker counting, the exclude-overlap mask logic) with an on-device program;
these tests require BIT-EQUALITY on randomized binary inputs, plus
pipeline-level RTTM identity between fused and host execution.
"""

import numpy as np
import pytest
from scipy.ndimage import median_filter

import jax.numpy as jnp

from diarizen_tpu.core.segments import SlidingWindow, SlidingWindowFeature
from diarizen_tpu.infer.fused import FusedStitch
from diarizen_tpu.infer.pipeline import speaker_count


def host_weights(filtered, min_num_frames, exclude_overlap):
    masks = filtered.astype(np.float32)
    if not exclude_overlap:
        return np.transpose(masks, (0, 2, 1))
    clean = masks * (np.sum(masks, axis=2, keepdims=True) < 2)
    use_clean = np.sum(clean, axis=1) > min_num_frames
    weights = np.where(use_clean[:, None, :], clean, masks)
    return np.transpose(weights, (0, 2, 1))


def make_stitch(f, s, chunk_dur, chunk_step, frame_dur, frame_step, **kw):
    frames = SlidingWindow(start=-0.002, duration=frame_dur, step=frame_step)
    chunks = SlidingWindow(start=0.0, duration=chunk_dur, step=chunk_step)
    return FusedStitch(frames, chunks, f, s, **kw), chunks, frames


@pytest.mark.parametrize("n_chunks", [1, 7, 32, 65])
@pytest.mark.parametrize("median", [True, False])
def test_fused_matches_host_stages(n_chunks, median):
    f, s = 39, 4  # frames per chunk, speakers
    fs, chunks, frames = make_stitch(
        f, s, 2.0, 0.2, 0.025, 0.05,
        apply_median_filtering=median, exclude_overlap=True,
        min_num_frames=2, chunk_bucket=16,
    )
    rng = np.random.default_rng(n_chunks)
    seg = (rng.random((n_chunks, f, s)) < 0.35).astype(np.uint8)

    plan = fs.plan(n_chunks)
    assert plan is not None
    packed, counts, weights = fs.stitch(jnp.asarray(seg), plan)

    # host reference chain
    filtered = seg.astype(np.float32)
    if median:
        filtered = median_filter(filtered, size=(1, 11, 1), mode="reflect")
    count_ref = speaker_count(
        SlidingWindowFeature(filtered, chunks), frames, warm_up=(0.0, 0.0)
    )
    w_ref = host_weights(filtered, 2, True)

    # bit-packed binarized roundtrip
    bits = np.unpackbits(np.asarray(packed))[: plan["n_pad"] * f * s]
    got_filtered = bits.reshape(plan["n_pad"], f, s)[:n_chunks]
    np.testing.assert_array_equal(got_filtered, filtered)

    got_counts = np.asarray(counts)[: plan["num_frames_true"]]
    assert plan["num_frames_true"] == count_ref.data.shape[0]
    np.testing.assert_array_equal(got_counts, count_ref.data[:, 0])

    # weights keep all n_pad bucket rows (round-5 zero-recompile design);
    # padding rows must be zero and real rows bit-equal to the host chain
    w = np.asarray(weights)
    assert w.shape[0] == plan["n_pad"]
    np.testing.assert_array_equal(w[:n_chunks], w_ref)
    assert not w[n_chunks:].any()


def test_non_affine_layout_falls_back():
    # chunk step below the frame step -> hop 0 -> host path
    fs, _, _ = make_stitch(0.5, 4, 2.0, 0.01, 0.025, 0.05)
    assert fs.plan(8) is None
    # and the degenerate empty file
    assert fs.plan(0) is None


def test_merge_split_roundtrip():
    f, s, n = 19, 3, 9
    fs, chunks, frames = make_stitch(
        f, s, 1.0, 0.1, 0.02, 0.02, chunk_bucket=8, min_num_frames=1
    )
    plan = fs.plan(n)
    rng = np.random.default_rng(0)
    seg = (rng.random((n, f, s)) < 0.5).astype(np.uint8)
    packed, counts, weights = fs.stitch(jnp.asarray(seg), plan)
    emb = rng.standard_normal((n, s, 32)).astype(np.float32)
    buf = np.asarray(fs.merge(packed, counts, jnp.asarray(emb)))
    binary, count_data, emb_back = fs.split(buf, plan, emb.shape)
    assert binary.shape == (n, f, s)
    assert count_data.shape == (plan["num_frames_true"], 1)
    np.testing.assert_array_equal(emb_back, emb.astype(np.float64))


def test_pipeline_fused_equals_host(tmp_path):
    """Full pipeline: fused device stitching must produce the identical
    Annotation as host-stage execution (same random models, real audio)."""
    import os

    import jax

    from diarizen_tpu.cluster import AgglomerativeClustering
    from diarizen_tpu.core.audio import read_wav
    from diarizen_tpu.infer import (
        DiarizationPipeline,
        EmbeddingInference,
        SlidingInference,
    )
    from diarizen_tpu.models.eend import init_eend_params
    from diarizen_tpu.models.resnet import ResNetConfig, init_resnet_params
    from tests.test_pipeline import EXAMPLE_WAV, tiny_eend_cfg

    if not os.path.exists(EXAMPLE_WAV):
        pytest.skip("example wav missing")

    cfg = tiny_eend_cfg(chunk_size=2.0)
    params, state = jax.jit(lambda k: init_eend_params(k, cfg))(
        jax.random.PRNGKey(0)
    )
    seg_inf = SlidingInference(params, state, cfg, batch_size=8)
    rcfg = ResNetConfig(m_channels=8, num_blocks=(1, 1, 1, 1), embed_dim=32)
    rparams = init_resnet_params(jax.random.PRNGKey(1), rcfg)
    emb_inf = EmbeddingInference(
        rparams, rcfg, window_size=seg_inf.window_size,
        num_speakers=cfg.max_speakers_per_chunk, batch_size=8,
    )

    def build(fused):
        return DiarizationPipeline(
            seg_inference=seg_inf,
            emb_inference=emb_inf,
            clustering=AgglomerativeClustering(threshold=0.7, min_cluster_size=3),
            eend_cfg=cfg,
            max_speakers=4,
            fused_stitch=fused,
        )

    wave, sr = read_wav(EXAMPLE_WAV)
    for nsec in (8, 5):  # aligned batches and an orphan tail chunk
        w = wave[:, : 16000 * nsec]
        got = build(True)(w, sr, uri="x")
        ref = build(False)(w, sr, uri="x")
        assert got.to_rttm() == ref.to_rttm()


def test_tiered_chunk_buckets():
    """Long files use coarse compile buckets (multiples of 256 above 1024
    chunks); short files keep the fine 32-chunk buckets. Padded chunks only
    touch the elementwise stitch, so the coarse tier is compute-free."""
    from diarizen_tpu.core.segments import SlidingWindow
    from diarizen_tpu.infer.fused import FusedStitch

    fs = FusedStitch(
        frames=SlidingWindow(start=-0.0006875, duration=0.005625, step=0.005),
        chunk_window=SlidingWindow(start=0.0, duration=2.0, step=0.4),
        frames_per_chunk=399, num_speakers=4,
    )
    assert fs._bucket_pad(1) == 32
    assert fs._bucket_pad(141) == 160
    assert fs._bucket_pad(1024) == 1024
    assert fs._bucket_pad(1025) == 1280
    assert fs._bucket_pad(2248) == 2304  # 30-min file: 2.5% stitch padding
    for n in (1025, 2248, 4497):
        plan = fs.plan(n)
        assert plan is not None and plan["n_true"] == n
        assert plan["n_pad"] % 256 == 0 and plan["n_pad"] >= n

"""Pipeline stage tests + synthetic end-to-end.

Released checkpoints are unavailable offline, so:
  * downstream stages (count -> cluster -> reconstruct -> binarize) are
    verified end-to-end against a hand-built 2-speaker ground truth with
    synthetic segmentations/embeddings;
  * the sliding engine + embedding engine run with tiny random models on the
    reference example wav (shape/typing contracts, batching edge cases).
"""

import os

import numpy as np
import pytest

import jax

from diarizen_tpu.cluster import AgglomerativeClustering
from diarizen_tpu.core.audio import read_wav
from diarizen_tpu.core.segments import SlidingWindow, SlidingWindowFeature
from diarizen_tpu.infer import (
    DiarizationPipeline,
    EmbeddingInference,
    SlidingInference,
    reconstruct,
    speaker_count,
    receptive_field_window,
)
from diarizen_tpu.models.conformer import ConformerConfig
from diarizen_tpu.models.eend import EendConfig, init_eend_params
from diarizen_tpu.models.resnet import ResNetConfig, init_resnet_params
from diarizen_tpu.models.wavlm import WavLMConfig

EXAMPLE_WAV = "/root/reference/example/EN2002a_30s.wav"


def tiny_eend_cfg(chunk_size=2.0):
    n = 2
    wavlm = WavLMConfig(
        conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
        embed_dim=64,
        num_layers=n,
        use_attention=(True,) * n,
        use_feed_forward=(True,) * n,
        total_num_heads=(4,) * n,
        remaining_heads=(tuple(range(4)),) * n,
        ff_interm_features=(128,) * n,
        num_buckets=40,
        max_distance=100,
        layer_drop=0.0,
    )
    return EendConfig(
        wavlm=wavlm,
        conformer=ConformerConfig(dim=32, ffn_hidden=64, num_heads=4, num_layers=1),
        wavlm_layer_num=n + 1,
        wavlm_feat_dim=64,
        attention_in=32,
        chunk_size=chunk_size,
    )


def test_speaker_count_synthetic():
    # 3 chunks of 10 frames, 2 speakers, full overlap between chunks collapses
    chunks = SlidingWindow(start=0.0, duration=1.0, step=0.5)
    data = np.zeros((3, 10, 2), dtype=np.float32)
    data[:, :, 0] = 1.0  # speaker 0 always active
    data[1, :, 1] = 1.0  # speaker 1 active in chunk 1 only
    frames = SlidingWindow(start=0.0, duration=0.1, step=0.1)
    count = speaker_count(SlidingWindowFeature(data, chunks), frames, warm_up=(0.0, 0.0))
    assert count.data.ndim == 2 and count.data.shape[1] == 1
    assert count.data.max() == 2
    assert count.data.min() >= 0


def test_reconstruct_and_binarize_end_to_end():
    """Hand-built 2-speaker scenario through count -> cluster -> reconstruct:
    speaker A talks [0, 2.5s], B talks [2.5, 5s]; chunks of 1 s, step 0.5 s,
    10 frames/chunk; local speaker order alternates per chunk to exercise the
    cluster mapping."""
    rng = np.random.default_rng(0)
    duration, step, nf, n_spk = 1.0, 0.5, 10, 2
    chunks = SlidingWindow(start=0.0, duration=duration, step=step)
    num_chunks = 9  # t = 0 .. 5 s

    seg = np.zeros((num_chunks, nf, n_spk), dtype=np.float32)
    # ground truth activity by absolute time
    for c in range(num_chunks):
        t0 = c * step
        # local speaker 0 <-> global A on even chunks, B on odd (permuted)
        for f in range(nf):
            t = t0 + (f + 0.5) * duration / nf
            a_active = t < 2.5
            b_active = t >= 2.5
            if c % 2 == 0:
                seg[c, f, 0] = a_active
                seg[c, f, 1] = b_active
            else:
                seg[c, f, 0] = b_active
                seg[c, f, 1] = a_active
    binarized = SlidingWindowFeature(seg, chunks)

    # synthetic embeddings: global A ~ +e1 blob, B ~ -e1 blob
    dim = 16
    emb = np.zeros((num_chunks, n_spk, dim))
    for c in range(num_chunks):
        for s in range(n_spk):
            is_a = (c % 2 == 0) == (s == 0)
            center = np.eye(dim)[0] * (4.0 if is_a else -4.0)
            emb[c, s] = center + 0.05 * rng.standard_normal(dim)
            if seg[c, :, s].sum() == 0:
                emb[c, s] = np.nan  # inactive -> NaN like the reference

    clustering = AgglomerativeClustering(threshold=0.7, min_cluster_size=2)
    hard, soft, centroids = clustering(emb, seg, min_clusters=1, max_clusters=4)

    frames = SlidingWindow(start=0.0, duration=duration / nf, step=duration / nf)
    count = speaker_count(binarized, frames, warm_up=(0.0, 0.0))
    count.data = np.minimum(count.data, 4).astype(np.int8)

    inactive = seg.sum(axis=1) == 0
    hard[inactive] = -2
    discrete = reconstruct(binarized, hard, count)

    from diarizen_tpu.ops.binarize import Binarize

    ann = Binarize(onset=0.5, offset=0.5)(discrete)
    labels = ann.labels()
    assert len(labels) == 2, f"expected 2 speakers, got {labels}"
    # speaker turns at ~2.5 s: each label's support should be ~2.5 s long
    durations = sorted(ann.label_timeline(l).duration() for l in labels)
    assert all(2.0 < d < 3.0 for d in durations), durations
    # the two speakers must not overlap (ground truth has none)
    t_a = ann.label_timeline(labels[0])
    t_b = ann.label_timeline(labels[1])
    overlap = sum(
        sa.overlap_duration(sb) for sa in t_a for sb in t_b
    )
    assert overlap < 0.3, f"spurious overlap {overlap}"


@pytest.mark.skipif(not os.path.exists(EXAMPLE_WAV), reason="example wav missing")
def test_sliding_inference_on_example_wav():
    cfg = tiny_eend_cfg(chunk_size=2.0)
    params, state = jax.jit(lambda k: init_eend_params(k, cfg))(jax.random.PRNGKey(0))
    inf = SlidingInference(params, state, cfg, batch_size=8)
    wave, sr = read_wav(EXAMPLE_WAV)
    assert sr == 16000
    out = inf(wave[:, : 16000 * 10], sr)  # first 10 s
    n_complete = 1 + (160000 - inf.window_size) // inf.step_size
    # orphan last chunk appended when the remainder is nonzero
    assert out.data.shape[0] in (n_complete, n_complete + 1)
    assert out.data.shape[1] == cfg.num_frames(inf.window_size)
    assert out.data.shape[2] == cfg.max_speakers_per_chunk
    assert set(np.unique(out.data)).issubset({0.0, 1.0})  # hard multilabel
    assert out.sliding_window.duration == 2.0
    assert abs(out.sliding_window.step - 0.2) < 1e-9


@pytest.mark.skipif(not os.path.exists(EXAMPLE_WAV), reason="example wav missing")
def test_int16_wave_transfer_is_bit_exact():
    """PCM-representable waveforms ship to device as int16 (half the tunnel
    bytes); the on-device x/2^15 reconstruction must give bit-identical
    segmentation to the f32 path."""
    cfg = tiny_eend_cfg(chunk_size=2.0)
    params, state = jax.jit(lambda k: init_eend_params(k, cfg))(jax.random.PRNGKey(0))
    inf = SlidingInference(params, state, cfg, batch_size=8)
    wave, sr = read_wav(EXAMPLE_WAV)
    wave = wave[:, : 16000 * 6]

    prepared = inf.prepare_wave(wave)
    assert prepared[0].dtype == np.int16  # WAV is PCM16 -> fast path taken
    out_i16 = inf(wave, sr, prepared=prepared)

    # force the f32 path by making one sample non-representable
    wave_f = wave.copy()
    wave_f[0, 0] += 2.0 ** -20
    prepared_f = inf.prepare_wave(wave_f)
    assert prepared_f[0].dtype == np.float32
    wave_f[0, 0] = wave[0, 0]
    prepared_exact_f32 = inf.prepare_wave(np.asarray(wave, np.float64))
    assert prepared_exact_f32[0].dtype == np.int16

    out_f32 = inf(
        wave, sr,
        prepared=(jax.device_put(np.asarray(prepared[0], np.float32) / 32768.0),
                  prepared[1]),
    )
    np.testing.assert_array_equal(out_i16.data, out_f32.data)


def test_host_stages_scale_to_two_hours():
    """Stages 3-7 (count -> reconstruct -> binarize) on a 2-hour file's chunk
    count must stay linear-time on the host (VERDICT r1: the pre-vectorization
    chunk x cluster / frame loops were quadratic). Budget is generous — the
    point is catching O(n^2) regressions, which blow through it by 10x+."""
    import time as _time

    from diarizen_tpu.ops.binarize import Binarize

    rng = np.random.default_rng(0)
    num_chunks = 9000  # 2 h at 8 s windows / 0.8 s step
    num_frames, K = 399, 4
    chunks = SlidingWindow(start=0.0, duration=8.0, step=0.8)
    data = (rng.uniform(size=(num_chunks, num_frames, K)) > 0.8).astype(np.float32)
    binarized = SlidingWindowFeature(data, chunks)
    frames = SlidingWindow(start=0.0, duration=0.02, step=0.02)
    hard_clusters = rng.integers(0, 3, size=(num_chunks, K))

    t0 = _time.perf_counter()
    count = speaker_count(binarized, frames, warm_up=(0.0, 0.0))
    count.data = np.minimum(count.data, 3).astype(np.int8)
    discrete = reconstruct(binarized, hard_clusters, count)
    ann = Binarize(onset=0.5, offset=0.5)(discrete)
    dt = _time.perf_counter() - t0

    assert len(count.data) > 350_000  # really 2 h of 20 ms frames
    assert len(ann.labels()) >= 1
    assert dt < 60.0, f"host stitching took {dt:.1f}s for a 2 h file"


def test_oom_backoff_halves_batch_and_matches():
    """Device OOM during inference must transparently halve the batch and
    produce identical output (reference catches CUDA OOM with an actionable
    message, core/inference.py:216-223; here we also retry)."""
    cfg = tiny_eend_cfg(chunk_size=2.0)
    params, state = jax.jit(lambda k: init_eend_params(k, cfg))(jax.random.PRNGKey(0))
    wave = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (1, 16000 * 6)) * 0.1
    ).astype(np.float32)

    ref_inf = SlidingInference(params, state, cfg, batch_size=2)
    expected = ref_inf(wave, 16000)

    inf = SlidingInference(params, state, cfg, batch_size=8)
    real_acc = inf._fwd_acc  # the bucket-buffer dispatch's forward seam

    def oomy_acc(buf, wave_device, starts, offset, soft):
        if starts.shape[0] > 2:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Attempting to allocate 99.00G in HBM"
            )
        return real_acc(buf, wave_device, starts, offset, soft)

    inf._fwd_acc = oomy_acc
    out = inf(wave, 16000)
    assert inf.batch_size == 2  # 8 -> 4 -> 2
    np.testing.assert_array_equal(out.data, expected.data)

    # non-OOM errors must propagate untouched
    inf2 = SlidingInference(params, state, cfg, batch_size=4)
    def broken(buf, wave_device, starts, offset, soft):
        raise ValueError("shape mismatch")
    inf2._fwd_acc = broken
    with pytest.raises(ValueError, match="shape mismatch"):
        inf2(wave, 16000)

    # OOM at batch_size=1 raises the actionable message
    inf3 = SlidingInference(params, state, cfg, batch_size=1)
    def always_oom(buf, wave_device, starts, offset, soft):
        raise RuntimeError("RESOURCE_EXHAUSTED")
    inf3._fwd_acc = always_oom
    with pytest.raises(RuntimeError, match="shorter chunks"):
        inf3(wave, 16000)


def test_embedding_oom_backoff():
    rcfg = ResNetConfig(m_channels=8, num_blocks=(1, 1, 1, 1), embed_dim=32)
    rparams = init_resnet_params(jax.random.PRNGKey(1), rcfg)
    emb = EmbeddingInference(
        rparams, rcfg, window_size=32000, num_speakers=3, batch_size=8
    )
    # wrap BOTH accumulate forwards: dispatch picks _fwd_feats_acc (shared
    # fbank) when the window grid aligns to the frame hop, _fwd_acc otherwise
    def oomy(real_acc):
        def wrapped(buf, src, starts, weights, offset):
            if starts.shape[0] > 2:
                raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
            return real_acc(buf, src, starts, weights, offset)

        return wrapped

    emb._fwd_acc = oomy(emb._fwd_acc)
    emb._fwd_feats_acc = oomy(emb._fwd_feats_acc)
    wave = jax.device_put(np.zeros(16000 * 6, np.float32))
    starts = np.arange(5, dtype=np.int64) * 8000
    weights = np.ones((5, 3, 99), np.float32)
    out = emb(wave, starts, weights)
    assert emb.batch_size == 2
    assert out.shape == (5, 3, 32)


@pytest.mark.skipif(not os.path.exists(EXAMPLE_WAV), reason="example wav missing")
def test_full_pipeline_runs_on_example_wav(tmp_path):
    """Mechanics end-to-end with tiny random models on real audio: the
    pipeline must produce a valid Annotation + parseable RTTM."""
    cfg = tiny_eend_cfg(chunk_size=2.0)
    params, state = jax.jit(lambda k: init_eend_params(k, cfg))(jax.random.PRNGKey(0))
    seg_inf = SlidingInference(params, state, cfg, batch_size=8)

    rcfg = ResNetConfig(m_channels=8, num_blocks=(1, 1, 1, 1), embed_dim=32)
    rparams = init_resnet_params(jax.random.PRNGKey(1), rcfg)
    emb_inf = EmbeddingInference(
        rparams, rcfg, window_size=seg_inf.window_size,
        num_speakers=cfg.max_speakers_per_chunk, batch_size=8,
    )

    pipeline = DiarizationPipeline(
        seg_inference=seg_inf,
        emb_inference=emb_inf,
        clustering=AgglomerativeClustering(threshold=0.7, min_cluster_size=3),
        eend_cfg=cfg,
        max_speakers=4,
    )
    wave, sr = read_wav(EXAMPLE_WAV)
    from diarizen_tpu.hooks import ArtifactHook, Hooks, TimingHook

    timing, artifacts = TimingHook(), ArtifactHook()
    ann = pipeline(
        wave[:, : 16000 * 8], sr, uri="EN2002a_test",
        hook=Hooks(timing, artifacts),
    )
    timing.finish()
    # every pipeline stage must have fired the hook (reference protocol,
    # pipelines/utils/hook.py) with its artifact and been timed
    expected_stages = {
        "segmentation", "speaker_counting", "embeddings", "clustering",
        "discrete_diarization",
    }
    assert expected_stages <= set(artifacts.artifacts)
    assert expected_stages <= set(timing.timings)
    assert all(t >= 0 for t in timing.timings.values())
    rttm = ann.to_rttm()
    for line in rttm.splitlines():
        parts = line.split()
        assert parts[0] == "SPEAKER" and parts[1] == "EN2002a_test"
        assert float(parts[4]) > 0  # positive durations

    # silence must early-exit with an empty annotation
    silent = np.zeros((1, 16000 * 4), dtype=np.float32)
    ann2 = pipeline(silent, sr, uri="silence")
    # (random models may fire on silence; accept either but require validity)
    assert ann2.uri == "silence"

    # streamed multi-file mode must yield identical RTTMs to per-file calls
    # (file i+1's device work overlaps file i's host stages)
    waves = [wave[:, : 16000 * 8], wave[:, 16000 * 2 : 16000 * 9], silent]
    uris = ["f0", "f1", "f2"]
    streamed = list(pipeline.stream(waves, sr, uris=uris))
    assert [a.uri for a in streamed] == uris
    for w, u, got in zip(waves, uris, streamed):
        assert got.to_rttm() == pipeline(w, sr, uri=u).to_rttm()


def test_wave_length_bucketing_shares_shapes():
    """Files whose chunk counts fall in one tier bucket share the device
    wave shape, so every per-length jit (seg forward, shared fbank, stitch)
    compiles once per BUCKET — cross-length recompiles were 76 s/file
    through the remote-compile tunnel (PERF.md round 4). Transfers still
    ship only the real samples; outputs are unchanged (the full-pipeline
    oracle runs at a non-bucket-aligned length)."""
    from diarizen_tpu.infer.sliding import chunk_length_bucket

    cfg = tiny_eend_cfg(chunk_size=2.0)
    params, state = init_eend_params(jax.random.PRNGKey(0), cfg)
    inf = SlidingInference(params, state, cfg, batch_size=8)

    w1 = np.zeros((1, 16000 * 8), np.float32)   # 31 chunks
    w2 = np.zeros((1, 16000 * 9), np.float32)   # 36 chunks -> different bucket
    w3 = np.zeros((1, 16000 * 8 - 5000), np.float32)  # same bucket as w1
    d1, s1 = inf.prepare_wave(w1)
    d2, s2 = inf.prepare_wave(w2)
    d3, s3 = inf.prepare_wave(w3)
    assert d1.shape == d3.shape  # shared compile bucket
    assert d1.shape != d2.shape
    assert len(s1) != len(s3)  # real chunk grids still differ

    assert chunk_length_bucket(1024) == 1024
    assert chunk_length_bucket(1025) == 1280
    assert chunk_length_bucket(2248) == 2304

    # outputs at a non-bucket length equal the per-chunk forward exactly
    out = inf(w3, 16000, soft=False)
    assert out.data.shape[0] == len(s3)


def test_no_speech_centroids_reset_both_paths():
    """return_embeddings on a no-speech file must yield np.zeros((0, dim))
    — the reference's shape (speaker_diarization.py:506) — and must NOT
    leak the previous file's centroids through the fused path's early
    return (advisor finding, round 4)."""
    cfg = tiny_eend_cfg(chunk_size=2.0)
    params, state = jax.jit(lambda k: init_eend_params(k, cfg))(jax.random.PRNGKey(0))
    # force the empty powerset class everywhere: zero classifier weights,
    # huge bias on class 0 ({} in the size-then-lex ordering, ops/powerset.py)
    import jax.numpy as jnp

    params["classifier"]["w"] = jnp.zeros_like(params["classifier"]["w"])
    params["classifier"]["b"] = (
        jnp.zeros_like(params["classifier"]["b"]).at[0].set(100.0)
    )

    rcfg = ResNetConfig(m_channels=8, num_blocks=(1, 1, 1, 1), embed_dim=32)
    rparams = init_resnet_params(jax.random.PRNGKey(1), rcfg)

    for fused in (True, False):
        seg_inf = SlidingInference(params, state, cfg, batch_size=8)
        emb_inf = EmbeddingInference(
            rparams, rcfg, window_size=seg_inf.window_size,
            num_speakers=cfg.max_speakers_per_chunk, batch_size=8,
        )
        pipeline = DiarizationPipeline(
            seg_inference=seg_inf,
            emb_inference=emb_inf,
            clustering=AgglomerativeClustering(threshold=0.7, min_cluster_size=3),
            eend_cfg=cfg,
            max_speakers=4,
            fused_stitch=fused,
        )
        # poison _last_centroids as if a previous file had speech
        pipeline._last_centroids = np.ones((3, 32), np.float32)
        wave = np.random.default_rng(0).standard_normal((1, 16000 * 6)).astype(np.float32)
        ann, cents = pipeline(wave, 16000, uri="nospeech", return_embeddings=True)
        assert len(ann) == 0, f"fused={fused}: expected empty annotation"
        assert cents.shape == (0, 32), f"fused={fused}: got {cents.shape}"


def test_new_length_in_visited_bucket_compiles_nothing_but_wave_pad():
    """Zero per-exact-length compiles (round-5): after a bucket is warm, a
    file of a NEW exact length in that bucket triggers at most the trivial
    device-side wave pad (`_pad_to`, whose key space is bounded by the
    bucket quantum) — the round-4 residual was ~13 pad/slice/concat
    programs (~6 s through the remote-compile tunnel)."""
    import logging

    cfg = tiny_eend_cfg(chunk_size=2.0)
    params, state = jax.jit(lambda k: init_eend_params(k, cfg))(jax.random.PRNGKey(0))
    seg_inf = SlidingInference(params, state, cfg, batch_size=8)
    rcfg = ResNetConfig(m_channels=8, num_blocks=(1, 1, 1, 1), embed_dim=32)
    rparams = init_resnet_params(jax.random.PRNGKey(1), rcfg)
    emb_inf = EmbeddingInference(
        rparams, rcfg, window_size=seg_inf.window_size,
        num_speakers=cfg.max_speakers_per_chunk, batch_size=8,
    )
    pipeline = DiarizationPipeline(
        seg_inference=seg_inf, emb_inference=emb_inf,
        clustering=AgglomerativeClustering(threshold=0.7, min_cluster_size=3),
        eend_cfg=cfg, max_speakers=4,
    )
    rng = np.random.default_rng(0)

    def wav(secs):
        return (rng.standard_normal((1, int(secs * 16000))) * 0.1).astype(np.float32)

    pipeline(wav(8.0), 16000, uri="warm")  # 31 chunks -> bucket 32

    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    handler = Capture()
    logger = logging.getLogger("jax._src.interpreters.pxla")
    jax.config.update("jax_log_compiles", True)
    logger.addHandler(handler)
    try:
        # two NEW exact lengths in the warm bucket, chosen to differ in
        # ceil8(chunks) from the warm file (31 chunks): 28 and 24 chunks —
        # the 24-chunk probe caught a ceil8-keyed merge slice that
        # reintroduced per-length compiles (r5 code review)
        pipeline(wav(7.3), 16000, uri="new-length")       # 28 chunks
        pipeline(wav(6.6), 16000, uri="new-length-ceil8")  # 24 chunks
    finally:
        logger.removeHandler(handler)
        jax.config.update("jax_log_compiles", False)
    compiles = [r for r in records if "Compiling" in r]
    allowed = [r for r in compiles if "_pad_to" in r]
    assert compiles == allowed, f"unexpected per-length compiles: {compiles}"
    assert len(compiles) <= 2  # one _pad_to per new length at most


def test_embedding_dispatch_device_weights_tiny_file():
    """Device-resident weights with EXACTLY n rows (the public interface;
    the fused stitch hands bucket-padded ones) must work when the file is
    smaller than one tail quantum — r5 code review caught a dynamic_slice
    crash in the zero-pad branch."""
    import jax.numpy as jnp

    rcfg = ResNetConfig(m_channels=8, num_blocks=(1, 1, 1, 1), embed_dim=32)
    rparams = init_resnet_params(jax.random.PRNGKey(1), rcfg)
    emb = EmbeddingInference(
        rparams, rcfg, window_size=32000, num_speakers=3, batch_size=8
    )
    wave = jax.device_put(np.zeros(16000 * 6, np.float32))
    starts = np.arange(5, dtype=np.int64) * 8000  # 5 < tail quantum 8
    weights_dev = jnp.ones((5, 3, 99), jnp.float32)  # exactly n rows
    out = emb(wave, starts, weights_dev)
    assert out.shape == (5, 3, 32)
    # and equals the host-weights result
    out_host = emb(wave, starts, np.ones((5, 3, 99), np.float32))
    np.testing.assert_allclose(out, out_host, rtol=1e-6, atol=1e-6)


def test_stream_trim_knob():
    """stream(trim_every=...) API: default fires the gc+malloc_trim cycle
    (RSS mitigation, PERF.md round 5), 0 disables it; outputs unchanged."""
    cfg = tiny_eend_cfg(chunk_size=2.0)
    params, state = jax.jit(lambda k: init_eend_params(k, cfg))(jax.random.PRNGKey(0))
    seg_inf = SlidingInference(params, state, cfg, batch_size=8)
    rcfg = ResNetConfig(m_channels=8, num_blocks=(1, 1, 1, 1), embed_dim=32)
    emb_inf = EmbeddingInference(
        init_resnet_params(jax.random.PRNGKey(1), rcfg), rcfg,
        window_size=seg_inf.window_size,
        num_speakers=cfg.max_speakers_per_chunk, batch_size=8,
    )
    pipeline = DiarizationPipeline(
        seg_inference=seg_inf, emb_inference=emb_inf,
        clustering=AgglomerativeClustering(threshold=0.7, min_cluster_size=3),
        eend_cfg=cfg, max_speakers=4,
    )
    rng = np.random.default_rng(3)
    waves = [
        (rng.standard_normal((1, 16000 * 5)) * 0.1).astype(np.float32)
        for _ in range(3)
    ]
    with_trim = [a.to_rttm() for a in pipeline.stream(waves, 16000, uris=list("abc"), trim_every=1)]
    no_trim = [a.to_rttm() for a in pipeline.stream(waves, 16000, uris=list("abc"), trim_every=0)]
    assert with_trim == no_trim

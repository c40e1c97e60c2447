"""Benchmark driver: audio-seconds/s/chip for the full diarization pipeline.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures the COMPLETE pipeline (sliding-window WavLM-Base segmentation with
90% window overlap, median filter, speaker counting, masked ResNet34
embeddings, AHC clustering, reconstruction, RTTM) on a synthetic 120 s
multi-speaker file — the reference's headline configuration
(seg_duration 8 s, step 0.8 s, batch 32; BASELINE.json north-star metric).

The reference publishes no hardware throughput numbers (BASELINE.md), so
vs_baseline anchors to a nominal 40x realtime full-pipeline rate for the
reference stack on one GPU: vs_baseline = value / 40.0.

Stage breakdown goes to stderr; the JSON line is the last stdout line.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from diarizen_tpu.cluster import AgglomerativeClustering
    from diarizen_tpu.infer import DiarizationPipeline, EmbeddingInference, SlidingInference
    from diarizen_tpu.models.conformer import ConformerConfig
    from diarizen_tpu.models.eend import EendConfig, init_eend_params
    from diarizen_tpu.models.resnet import ResNetConfig, init_resnet_params
    from diarizen_tpu.models.wavlm import WavLMConfig

    cfg = EendConfig(wavlm=WavLMConfig.base(), conformer=ConformerConfig())
    params, state = jax.jit(lambda k: init_eend_params(k, cfg))(jax.random.PRNGKey(0))
    seg_inf = SlidingInference(params, state, cfg, batch_size=32)

    rcfg = ResNetConfig()
    rparams = jax.jit(lambda k: init_resnet_params(k, rcfg))(jax.random.PRNGKey(1))
    emb_inf = EmbeddingInference(
        rparams, rcfg, window_size=seg_inf.window_size,
        num_speakers=cfg.max_speakers_per_chunk, batch_size=32,
    )
    pipeline = DiarizationPipeline(
        seg_inference=seg_inf,
        emb_inference=emb_inf,
        clustering=AgglomerativeClustering(threshold=0.7, min_cluster_size=30),
        eend_cfg=cfg,
        max_speakers=8,
    )

    # synthetic 2-speaker meeting, 120 s
    dur_s = 120
    sr = 16000
    t = np.arange(dur_s * sr) / sr
    wave = np.zeros_like(t, dtype=np.float32)
    rng = np.random.default_rng(0)
    pos = 0.0
    spk = 0
    while pos < dur_s - 2:
        seg = rng.uniform(2.0, 6.0)
        m = (t >= pos) & (t < pos + seg)
        f = 180 + 90 * spk
        wave[m] += 0.2 * np.sin(2 * np.pi * f * t[m]).astype(np.float32)
        wave[m] += 0.01 * rng.standard_normal(int(m.sum())).astype(np.float32)
        pos += seg * rng.uniform(0.6, 1.0)
        spk = 1 - spk

    waveform = wave[None]

    # warmup (compiles both engines)
    t0 = time.perf_counter()
    pipeline(waveform, sr, uri="warmup")
    print(f"warmup+compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        ann = pipeline(waveform, sr, uri="bench")
        times.append(time.perf_counter() - t0)
    dt = min(times)
    value = dur_s / dt
    print(f"pipeline: {dt:.2f}s for {dur_s}s audio; labels={ann.labels()}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "full-pipeline audio-seconds/s/chip (WavLM-Base seg 8s/0.8s + ResNet34 emb + AHC, 120s file)",
                "value": round(value, 1),
                "unit": "audio-seconds/s",
                "vs_baseline": round(value / 40.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Benchmark driver: audio-seconds/s/chip for the full diarization pipeline.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Measures the COMPLETE pipeline (sliding-window segmentation with 90% window
overlap, median filter, speaker counting, masked ResNet34 embeddings, AHC
clustering, reconstruction, RTTM) on a synthetic 120 s multi-speaker file —
the reference's headline configuration (seg_duration 8 s, step 0.8 s,
batch 32; BASELINE.json north-star metric).

The headline value is the FLAGSHIP released config, DiariZen-Base-s80
(`WavLMConfig.base_s80_md` — BASELINE.md "Released pipelines" row 2); the
JSON also carries per-config results with a per-stage breakdown
(segmentation / counting / embedding / clustering / reconstruction, via the
pipeline hook protocol) for `large_s80_md` and unpruned `base`. Random
weights at the released architecture — identical compute, no released
checkpoints in this zero-egress environment.

The reference publishes no hardware throughput numbers (BASELINE.md), so
vs_baseline anchors to a nominal 40x realtime full-pipeline rate for the
reference stack on one GPU: vs_baseline = value / 40.0.

BENCH_CONFIGS env var overrides the config list (comma-separated names from
CONFIGS below). Stage breakdown and progress go to stderr; the JSON line is
the last stdout line.
"""

import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache (works through the axon tunnel;
    same setup as tools/probe_*.py). The bench measures amortized
    steady-state dispatch, never compile time, so the cache only cuts the
    multi-minute warmup — a warm cache takes the 3-config warmup from
    ~6 min of remote compiles to seconds."""
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
    except Exception:  # noqa: BLE001 — cache is an optimization, never required
        pass


CONFIGS = ["base_s80_md", "large_s80_md", "base"]
FLAGSHIP = "base_s80_md"


def make_wave(dur_s=120, sr=16000):
    """Synthetic 2-speaker meeting."""
    t = np.arange(dur_s * sr) / sr
    wave = np.zeros_like(t, dtype=np.float32)
    rng = np.random.default_rng(0)
    pos, spk = 0.0, 0
    while pos < dur_s - 2:
        seg = rng.uniform(2.0, 6.0)
        m = (t >= pos) & (t < pos + seg)
        f = 180 + 90 * spk
        wave[m] += 0.2 * np.sin(2 * np.pi * f * t[m]).astype(np.float32)
        wave[m] += 0.01 * rng.standard_normal(int(m.sum())).astype(np.float32)
        pos += seg * rng.uniform(0.6, 1.0)
        spk = 1 - spk
    # quantize like a real PCM16 WAV (AMI/DIHARD distributions) — exercises
    # the int16 tunnel-transfer fast path the way production input does
    wave = np.clip(np.rint(wave * 32767.0), -32768, 32767) / 32768.0
    return wave[None].astype(np.float32)


def build_pipeline(name, rparams, rcfg):
    import jax
    import jax.numpy as jnp

    from diarizen_tpu.cluster import AgglomerativeClustering
    from diarizen_tpu.infer import (
        DiarizationPipeline,
        EmbeddingInference,
        SlidingInference,
    )
    from diarizen_tpu.models.conformer import ConformerConfig
    from diarizen_tpu.models.eend import EendConfig, init_eend_params
    from diarizen_tpu.models.wavlm import WavLMConfig

    wavlm = getattr(WavLMConfig, name)()
    cfg = EendConfig(
        wavlm=wavlm,
        conformer=ConformerConfig(),
        wavlm_feat_dim=wavlm.embed_dim,
        wavlm_layer_num=wavlm.num_layers + 1,
    )
    params, state = jax.jit(lambda k: init_eend_params(k, cfg))(jax.random.PRNGKey(0))
    seg_inf = SlidingInference(params, state, cfg, batch_size=32)
    emb_inf = EmbeddingInference(
        rparams, rcfg, window_size=seg_inf.window_size,
        num_speakers=cfg.max_speakers_per_chunk, batch_size=32,
        compute_dtype=jnp.bfloat16,
    )
    return DiarizationPipeline(
        seg_inference=seg_inf,
        emb_inference=emb_inf,
        clustering=AgglomerativeClustering(threshold=0.7, min_cluster_size=30),
        eend_cfg=cfg,
        max_speakers=8,
    )


def bench_config(name, waveform, sr, dur_s, rparams, rcfg, repeats=3, n_stream=4):
    from diarizen_tpu.hooks import TimingHook

    pipeline = build_pipeline(name, rparams, rcfg)

    t0 = time.perf_counter()
    pipeline(waveform, sr, uri="warmup")
    print(f"[{name}] warmup+compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    best_dt = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        ann = pipeline(waveform, sr, uri="bench")
        dt = time.perf_counter() - t0
        if best_dt is None or dt < best_dt:
            best_dt = dt
    value = dur_s / best_dt

    # per-stage profile: the fused device-stitch path (the measured one)
    # merges segmentation -> counting -> embeddings into one host-sync-free
    # device chain, so stage boundaries are only observable on the host
    # path — profile it separately (fused_stitch=False) for the breakdown
    pipeline.fused_stitch = False
    try:
        hook = TimingHook()
        t0 = time.perf_counter()
        pipeline(waveform, sr, uri="profile", hook=hook)
        host_dt = time.perf_counter() - t0
        hook.finish()
        best_stages = dict(hook.timings)
    finally:
        pipeline.fused_stitch = True
    stages = {
        k: {"seconds": round(v, 3), "audio_s_per_s": round(dur_s / v, 1) if v > 1e-9 else None}
        for k, v in best_stages.items()
    }
    stages["_note"] = (
        "host-path profile (fused_stitch=False, "
        f"{host_dt:.3f}s total); the measured fused path runs "
        "segmentation/counting/embeddings as one device chain"
    )
    print(
        f"[{name}] pipeline: {best_dt:.2f}s for {dur_s}s audio"
        f" = {value:.0f} audio-s/s; labels={ann.labels()}",
        file=sys.stderr,
    )
    for k, v in stages.items():
        if isinstance(v, dict):
            print(f"[{name}]   {k}: {v['seconds']}s (host-path)", file=sys.stderr)

    # streamed full-eval mode: the BASELINE north-star is throughput over a
    # whole test set; stream() hides host stages + transfers behind the next
    # file's device compute (outputs identical to per-file calls)
    best_stream = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        anns = list(pipeline.stream([waveform] * n_stream, sr,
                                    uris=[f"s{i}" for i in range(n_stream)]))
        dt_stream = time.perf_counter() - t0
        if best_stream is None or dt_stream < best_stream:
            best_stream = dt_stream
    # identical output modulo the uri field
    strip = lambda a: [ln.split()[2:] for ln in a.to_rttm().splitlines()]
    assert strip(anns[-1]) == strip(ann)
    stream_value = n_stream * dur_s / best_stream
    print(
        f"[{name}] streamed x{n_stream}: {best_stream:.2f}s"
        f" = {stream_value:.0f} audio-s/s", file=sys.stderr,
    )
    return {
        "audio_s_per_s_streamed": round(stream_value, 1),
        "audio_s_per_s": round(value, 1),
        "seconds": round(best_dt, 3),
        "stages": stages,
    }


def _wait_for_backend(max_wait_s: int = 3600) -> None:
    """The axon TPU tunnel occasionally drops for minutes at a time
    (observed round 5: ~1 h outage where backend init hangs or raises
    Unavailable). Probe device initialization in a subprocess (a hung init
    can't be cancelled in-process) and retry within a budget so a transient
    outage doesn't turn the round's bench into a spurious failure."""
    import subprocess

    # CPU-forced contexts (the driver's virtual-mesh dryrun, unit tests)
    # need no tunnel probe — and the axon sitecustomize would override the
    # subprocess's JAX_PLATFORMS env and probe the tunnel anyway
    plat = (os.environ.get("DIARIZEN_PLATFORM") or
            os.environ.get("JAX_PLATFORMS") or "")
    if "cpu" in plat:
        return

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
                capture_output=True, text=True, timeout=240,
            )
            last = (out.stdout or "").strip().splitlines()
            if out.returncode == 0 and last and last[-1].strip().isdigit():
                return  # judge only the LAST stdout line (banners happen)
            err = (out.stderr or "").strip().splitlines()
            err = err[-1] if err else "backend init failed"
        except subprocess.TimeoutExpired:
            err = "backend init hung (240 s)"
        if time.time() > deadline:
            print(f"bench: device backend unavailable after {attempt} "
                  f"attempts over {max_wait_s}s: {err}", file=sys.stderr)
            return  # let the real run surface the real error
        print(f"bench: waiting for device backend (attempt {attempt}: {err})",
              file=sys.stderr, flush=True)
        time.sleep(60)


def main():
    _wait_for_backend()
    _enable_compile_cache()
    import jax

    from diarizen_tpu.models.resnet import ResNetConfig, init_resnet_params

    dur_s, sr = 120, 16000
    waveform = make_wave(dur_s, sr)
    rcfg = ResNetConfig()
    rparams = jax.jit(lambda k: init_resnet_params(k, rcfg))(jax.random.PRNGKey(1))

    names = [c for c in os.environ.get("BENCH_CONFIGS", ",".join(CONFIGS)).split(",") if c]
    results = {}
    for name in names:
        results[name] = bench_config(name, waveform, sr, dur_s, rparams, rcfg)

    flagship = FLAGSHIP if FLAGSHIP in results else names[0]
    value = results[flagship]["audio_s_per_s_streamed"]
    print(
        json.dumps(
            {
                "metric": (
                    f"full-pipeline audio-seconds/s/chip, flagship {flagship}, "
                    "streamed multi-file eval (WavLM seg 8s/0.8s batch32 + "
                    "ResNet34 bf16 emb + AHC, 4x120s PCM files)"
                ),
                "value": value,
                "unit": "audio-seconds/s",
                # the reference publishes NO hardware throughput numbers
                # (BASELINE.md); this ratio anchors to an INVENTED nominal
                # 40x-realtime rate for the reference stack on one GPU and is
                # labeled as such so the JSON is self-describing.
                "vs_baseline": round(value / 40.0, 2),
                "vs_baseline_note": (
                    "ratio vs an invented nominal 40x-realtime anchor; the "
                    "reference publishes no throughput numbers (BASELINE.md)"
                ),
                "configs": results,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Benchmark driver: audio-seconds/s/chip for the diarization compute path.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no hardware-normalized throughput (BASELINE.md), so
vs_baseline is measured against a fixed nominal reference: DiariZen's
real-time factor budget of ~50x realtime per GPU for WavLM-Base segmentation
(inference batch 32 x 8 s chunks as in core/inference.py:316-326) — i.e.
vs_baseline = value / 400.0 audio-seconds/s.

Currently benches the segmentation forward (WavLM-Base + Conformer + powerset
head, bf16, batch 32 x 8 s) — the device hot loop that dominates pipeline
cost (SURVEY.md section 3.1). Extended to the full pipeline as stages land.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from diarizen_tpu.models.conformer import ConformerConfig
    from diarizen_tpu.models.eend import EendConfig, eend_forward, init_eend_params
    from diarizen_tpu.models.wavlm import WavLMConfig

    cfg = EendConfig(wavlm=WavLMConfig.base(), conformer=ConformerConfig())
    params, state = jax.jit(lambda k: init_eend_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    batch, chunk_s = 32, 8
    wave = jax.random.normal(jax.random.PRNGKey(1), (batch, 1, chunk_s * 16000)) * 0.1

    @jax.jit
    def fwd(params, state, w):
        scores, _ = eend_forward(params, state, cfg, w, compute_dtype=jnp.bfloat16)
        return scores

    # warmup / compile
    np.asarray(fwd(params, state, wave))

    # timed: force a host transfer each iteration so tunnel-async dispatch
    # cannot fake completion (block_until_ready alone has proven unreliable
    # through the axon tunnel)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, state, wave)
    np.asarray(out)
    dt = time.perf_counter() - t0

    audio_seconds = batch * chunk_s * iters
    value = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "segmentation audio-seconds/s/chip (WavLM-Base+Conformer, bf16, 32x8s)",
                "value": round(value, 1),
                "unit": "audio-seconds/s",
                "vs_baseline": round(value / 400.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

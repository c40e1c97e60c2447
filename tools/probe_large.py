"""TPU probe: Large-s80 trunk split (conv FE / attention / FF / waveform
norm / weight-sum), batch 32 x 8 s, bf16, amortized in-model config ablation
(standalone op probes are launch-floor-bound, PERF.md round 4).
Run: python < tools/probe_large.py"""
import time, dataclasses
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diarizen_tpu.models.wavlm import (
    WavLMConfig, init_wavlm_params, wavlm_extract_features, set_flash_attention,
)

ITERS = 20
B, T = 32, 8 * 16000
wave = jax.random.normal(jax.random.PRNGKey(0), (B, T), jnp.float32)

def timeit(label, cfg, params, n=3, ws=True):
    lw = (jnp.ones((cfg.num_layers + 1,)) / (cfg.num_layers + 1)) if ws else None
    fn = jax.jit(lambda p, w: wavlm_extract_features(
        p, cfg, w, compute_dtype=jnp.bfloat16, layer_weights=lw))
    out = fn(params, wave)
    np.asarray((out if ws else out[-1]).reshape(-1)[:1])
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        o = None
        for _ in range(ITERS):
            o = fn(params, wave)
        np.asarray((o if ws else o[-1]).reshape(-1)[:1])
        best = min(best, (time.time() - t0) / ITERS)
    print(f"{label:44s} {best*1e3:7.2f} ms", flush=True)
    return best

cfg = WavLMConfig.large_s80_md()
params = jax.jit(lambda k: init_wavlm_params(k, cfg))(jax.random.PRNGKey(1))

full = timeit("large_s80 full (flash, fused-ws)", cfg, params)
timeit("large_s80 full (stacked hidden states)", cfg, params, ws=False)
set_flash_attention(False)
timeit("large_s80 full (XLA attn)", cfg, params)
set_flash_attention(True)
no_ff = dataclasses.replace(cfg, use_feed_forward=(False,) * cfg.num_layers)
timeit("large_s80 no-FF", no_ff, params)
no_attn = dataclasses.replace(cfg, use_attention=(False,) * cfg.num_layers)
timeit("large_s80 no-attention", no_attn, params)
none = dataclasses.replace(cfg, use_attention=(False,)*cfg.num_layers,
                           use_feed_forward=(False,)*cfg.num_layers)
timeit("large_s80 neither (FE+proj+posconv+LNs)", none, params)
no_norm = dataclasses.replace(none, normalize_waveform=False)
timeit("large_s80 neither, no waveform-norm", no_norm, params)

"""TPU probe: the ~7 ms of s80 trunk overhead beyond the conv FE.
Sections: FE, +proj, +posconv, weight-sum accumulation, LN costs.
Run: python < tools/probe_overhead.py"""
import time, dataclasses
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diarizen_tpu.models.wavlm import (
    WavLMConfig, init_wavlm_params, _feature_extractor, _pos_conv,
    wavlm_extract_features,
)
from diarizen_tpu.models.common import layer_norm, linear

ITERS = 20
B, T = 32, 8 * 16000
wave = jax.random.normal(jax.random.PRNGKey(0), (B, T), jnp.float32)
cfg = WavLMConfig.base_s80_md()
params = jax.jit(lambda k: init_wavlm_params(k, cfg))(jax.random.PRNGKey(1))

def timeit(label, fn, *args, n=3):
    jitted = jax.jit(fn)
    out = jitted(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        o = None
        for _ in range(ITERS):
            o = jitted(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[:1])
        best = min(best, (time.time() - t0) / ITERS)
    print(f"{label:44s} {best*1e3:7.2f} ms", flush=True)
    return best

bf = jnp.bfloat16
timeit("FE only", lambda p, w: _feature_extractor(p, cfg, w, bf), params, wave)

def fe_proj(p, w):
    x = _feature_extractor(p, cfg, w, bf)
    fp = p["feature_projection"]
    return linear(fp["proj"], layer_norm(fp["norm"], x))
timeit("FE + proj", fe_proj, params, wave)

def fe_proj_pc(p, w):
    x = fe_proj(p, w)
    return x + _pos_conv(p, cfg, x)
timeit("FE + proj + posconv", fe_proj_pc, params, wave)

x399 = jax.random.normal(jax.random.PRNGKey(2), (B, 399, 768), bf)
timeit("posconv alone x1", lambda p, x: _pos_conv(p, cfg, x), params, x399)
timeit("posconv alone x4",
       lambda p, x: [x := x + _pos_conv(p, cfg, x) for _ in range(4)][-1],
       params, x399)

def accum_only(x):
    acc = x.astype(jnp.float32)
    for i in range(12):
        acc = acc + (0.1 * i) * x.astype(jnp.float32)
    return acc
timeit("13-term f32 accumulate alone", accum_only, x399)

def ln_chain(p, x):
    for i in range(24):
        x = layer_norm(p["layers"][i % 12]["attn_norm"], x)
    return x
timeit("24x LayerNorm(768) chain", ln_chain, params, x399)

none = dataclasses.replace(cfg, use_attention=(False,)*12, use_feed_forward=(False,)*12)
timeit("neither, fused weight-sum",
       lambda p, w: wavlm_extract_features(p, none, w, compute_dtype=bf,
                                           layer_weights=jnp.ones((13,))/13),
       params, wave)
timeit("neither, hidden-state list",
       lambda p, w: wavlm_extract_features(p, none, w, compute_dtype=bf)[-1],
       params, wave)

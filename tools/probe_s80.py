"""TPU probe: where does the base_s80_md segmentation forward spend time?

Times (batch 32 x 8 s, bf16): conv front-end, full WavLM trunk, full EEND
forward, and each encoder layer in isolation — for `base` vs `base_s80_md`.
Run from repo root:  python < tools/probe_s80.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diarizen_tpu.models.conformer import ConformerConfig
from diarizen_tpu.models.eend import EendConfig, eend_forward, init_eend_params
from diarizen_tpu.models.wavlm import (
    WavLMConfig,
    _encoder_layer,
    _feature_extractor,
    compute_position_bias,
    wavlm_extract_features,
)


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:8])
    return min(ts)


B, T = 32, 8 * 16000
wave = jax.random.normal(jax.random.PRNGKey(1), (B, T), jnp.float32) * 0.1

for name in ["base", "base_s80_md"]:
    wcfg = getattr(WavLMConfig, name)()
    cfg = EendConfig(
        wavlm=wcfg, conformer=ConformerConfig(),
        wavlm_feat_dim=wcfg.embed_dim, wavlm_layer_num=wcfg.num_layers + 1,
    )
    params, state = jax.jit(lambda k, c=cfg: init_eend_params(k, c))(
        jax.random.PRNGKey(0)
    )

    t_fe = timeit(
        jax.jit(lambda p, w, c=wcfg: _feature_extractor(
            p["wavlm"], c, w, jnp.bfloat16)),
        params, wave,
    )
    t_trunk = timeit(
        jax.jit(lambda p, w, c=wcfg: wavlm_extract_features(
            p["wavlm"], c, w, compute_dtype=jnp.bfloat16)[-1]),
        params, wave,
    )
    t_full = timeit(
        jax.jit(lambda p, s, w, c=cfg: eend_forward(
            p, s, c, w[:, None, :], train=False, compute_dtype=jnp.bfloat16)[0]),
        params, state, wave,
    )
    aud = B * 8
    print(f"{name}: conv-FE {t_fe*1e3:.1f} ms | trunk {t_trunk*1e3:.1f} ms | "
          f"full {t_full*1e3:.1f} ms ({aud/t_full:.0f} audio-s/s)", flush=True)

    # per-layer timings at the trunk's frame count
    F = wcfg.num_frames(T)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, F, wcfg.embed_dim),
                          jnp.bfloat16)
    pos = np.asarray(
        compute_position_bias(
            jax.tree_util.tree_map(np.asarray, params["wavlm"]), wcfg, F
        ),
        dtype=np.float32,
    )
    pos_dev = jnp.asarray(pos)
    for i in range(wcfg.num_layers):
        heads = (len(wcfg.remaining_heads[i])
                 if wcfg.use_attention[i] else 0)
        step = jax.jit(functools.partial(
            lambda p, xx, pb, c, li: _encoder_layer(
                p["wavlm"]["layers"][li], c, li, xx, pb, False, None),
            c=wcfg, li=i))
        t_l = timeit(step, params, x, pos_dev, n=3)
        print(f"  layer {i:2d}: {t_l*1e3:6.2f} ms  heads={heads} "
              f"ff={wcfg.ff_interm_features[i]}", flush=True)

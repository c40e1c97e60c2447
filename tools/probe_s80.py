"""TPU probe: where does the base_s80_md segmentation forward spend time?

Timing forces a tiny d2h transfer of each timed output INSIDE the loop —
the axon tunnel's block_until_ready can return before compute drains, so
transfer-of-result is the only trustworthy completion barrier. The ~RTT
overhead is measured separately and reported.

Run from repo root:  python < tools/probe_s80.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diarizen_tpu.models.conformer import ConformerConfig, conformer_forward
from diarizen_tpu.models.common import layer_norm, linear
from diarizen_tpu.models.eend import EendConfig, eend_forward, init_eend_params
from diarizen_tpu.models.wavlm import (
    WavLMConfig,
    _feature_extractor,
    wavlm_extract_features,
)


def timeit(fn, *args, n=5):
    def drain(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:8])

    for _ in range(2):
        drain(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        drain(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


# tunnel round-trip overhead baseline
rtt = timeit(jax.jit(lambda x: x + 1.0), jnp.zeros((8,)))
print(f"tunnel dispatch+transfer baseline: {rtt*1e3:.1f} ms", flush=True)

B, T = 32, 8 * 16000
wave = jax.random.normal(jax.random.PRNGKey(1), (B, T), jnp.float32) * 0.1


def rup(c, m=128):
    return ((c + m - 1) // m) * m


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
        jax.jit(lambda p, w, c=wcfg: _feature_extractor(p["wavlm"], c, w, jnp.bfloat16)),
        params, wave,
    )

    def fe_padded(p, w, c=wcfg):
        x = w[:, :, None].astype(jnp.bfloat16)
        for i, (out_ch, kernel, stride) in enumerate(c.conv_layers):
            wt = p["wavlm"]["feature_extractor"]["conv_layers"][i]["conv"]["w"].astype(jnp.bfloat16)
            wt = jnp.pad(wt, ((0, 0), (0, x.shape[-1] - wt.shape[1]),
                              (0, rup(out_ch) - out_ch)))
            x = jax.lax.conv_general_dilated(
                x, wt, window_strides=(stride,), padding=[(0, 0)],
                dimension_numbers=("NWC", "WIO", "NWC"))
            x = jax.nn.gelu(x)
        return x

    t_fep = timeit(jax.jit(fe_padded), params, wave)

    t_trunk_last = timeit(
        jax.jit(lambda p, w, c=wcfg: wavlm_extract_features(
            p["wavlm"], c, w, compute_dtype=jnp.bfloat16)[-1]),
        params, wave,
    )
    t_trunk_all = timeit(
        jax.jit(lambda p, w, c=wcfg: jnp.stack(wavlm_extract_features(
            p["wavlm"], c, w, compute_dtype=jnp.bfloat16), axis=-1)),
        params, wave,
    )
    t_full = timeit(
        jax.jit(lambda p, s, w, c=cfg: eend_forward(
            p, s, c, w[:, None, :], train=False, compute_dtype=jnp.bfloat16)[0]),
        params, state, wave,
    )

    # head on precomputed states
    hs = jax.jit(lambda p, w, c=wcfg: wavlm_extract_features(
        p["wavlm"], c, w, compute_dtype=jnp.bfloat16))(params, wave)
    jax.block_until_ready(hs)

    def head(p, s, h, c=cfg):
        feat = jnp.stack(h, axis=-1)
        w = p["weight_sum"].astype(feat.dtype)
        feat = jnp.einsum("bfdl,l->bfd", feat, w, preferred_element_type=jnp.float32)
        feat = feat.astype(jnp.bfloat16)
        x = linear(p["proj"], feat)
        x = layer_norm(p["lnorm"], x)
        x, _ = conformer_forward(p["conformer"], s["conformer"], c.conformer, x)
        return jax.nn.log_softmax(linear(p["classifier"], x).astype(jnp.float32), -1)

    t_head = timeit(jax.jit(head), params, state, hs)

    aud = B * 8
    print(
        f"{name}: FE {t_fe*1e3:.1f} | FE-padded {t_fep*1e3:.1f} | "
        f"trunk[-1] {t_trunk_last*1e3:.1f} | trunk-all {t_trunk_all*1e3:.1f} | "
        f"head {t_head*1e3:.1f} | full {t_full*1e3:.1f} ms "
        f"({aud/t_full:.0f} audio-s/s)",
        flush=True,
    )

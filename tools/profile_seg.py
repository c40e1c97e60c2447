"""TPU profile: amortized per-section timing of the segmentation forward.

Each section is dispatched ITERS times back-to-back with one tiny d2h at the
end as the completion barrier (hides the ~28 ms tunnel RTT that makes
single-dispatch probes unreadable — see tools/probe_s80.py history).

Sections per config (batch 32 x 8 s, bf16): conv front-end, trunk last-layer
only, trunk all-layers stacked, conformer+classifier head on precomputed
states, full EEND forward.

Run from repo root:  python tools/profile_seg.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diarizen_tpu.models.common import layer_norm, linear
from diarizen_tpu.models.conformer import ConformerConfig, conformer_forward
from diarizen_tpu.models.eend import EendConfig, eend_forward, init_eend_params
from diarizen_tpu.models.wavlm import (
    WavLMConfig,
    _feature_extractor,
    wavlm_extract_features,
)

ITERS = 20
B, T = 32, 8 * 16000


def timeit(fn, *args, n=3):
    jitted = jax.jit(fn)
    out = jitted(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = jitted(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
        ts.append((time.perf_counter() - t0) / ITERS)
    return min(ts)


def main():
    wave = jax.random.normal(jax.random.PRNGKey(1), (B, T), jnp.float32) * 0.1
    for name in ["base_s80_md", "base"]:
        wcfg = getattr(WavLMConfig, name)()
        cfg = EendConfig(
            wavlm=wcfg,
            conformer=ConformerConfig(),
            wavlm_feat_dim=wcfg.embed_dim,
            wavlm_layer_num=wcfg.num_layers + 1,
        )
        params, state = jax.jit(lambda k, c=cfg: init_eend_params(k, c))(
            jax.random.PRNGKey(0)
        )

        t_fe = timeit(
            lambda p, w, c=wcfg: _feature_extractor(p["wavlm"], c, w, jnp.bfloat16),
            params, wave,
        )
        t_trunk = timeit(
            lambda p, w, c=wcfg: wavlm_extract_features(
                p["wavlm"], c, w, compute_dtype=jnp.bfloat16)[-1],
            params, wave,
        )
        t_trunk_all = timeit(
            lambda p, w, c=wcfg: jnp.stack(wavlm_extract_features(
                p["wavlm"], c, w, compute_dtype=jnp.bfloat16), axis=-1),
            params, wave,
        )

        hs = jax.jit(lambda p, w, c=wcfg: wavlm_extract_features(
            p["wavlm"], c, w, compute_dtype=jnp.bfloat16))(params, wave)
        jax.block_until_ready(hs)

        def head(p, s, h, c=cfg):
            feat = jnp.stack(h, axis=-1)
            w = p["weight_sum"].astype(feat.dtype)
            feat = jnp.einsum("bfdl,l->bfd", feat, w,
                              preferred_element_type=jnp.float32)
            feat = feat.astype(jnp.bfloat16)
            x = linear(p["proj"], feat)
            x = layer_norm(p["lnorm"], x)
            x, _ = conformer_forward(p["conformer"], s["conformer"], c.conformer, x)
            return jax.nn.log_softmax(
                linear(p["classifier"], x).astype(jnp.float32), -1)

        t_head = timeit(head, params, state, hs)
        t_full = timeit(
            lambda p, s, w, c=cfg: eend_forward(
                p, s, c, w[:, None, :], train=False,
                compute_dtype=jnp.bfloat16)[0],
            params, state, wave,
        )
        aud = B * 8
        print(
            f"{name}: FE {t_fe*1e3:.1f} | trunk[-1] {t_trunk*1e3:.1f} | "
            f"trunk-all {t_trunk_all*1e3:.1f} | head {t_head*1e3:.1f} | "
            f"full {t_full*1e3:.1f} ms ({aud/t_full:.0f} audio-s/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()

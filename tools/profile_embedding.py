"""TPU profile: where does the embedding stage (WeSpeaker ResNet34) spend time?

Amortized timing: each section is jitted, then dispatched ITERS times
back-to-back (async queue keeps the device busy); one tiny d2h transfer at
the end is the completion barrier. This hides the axon tunnel RTT (~30 ms)
that made single-dispatch probes unreadable (see tools/probe_s80.py).

Sections: fbank only, conv1+layer1, layer2, layer3, layer4, stats+head,
full embed_waveforms — B=32 x 8 s, bf16 trunk (the bench configuration).

Run from repo root:  python tools/profile_embedding.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diarizen_tpu.models.fbank import wespeaker_fbank
from diarizen_tpu.models.resnet import (
    ResNetConfig,
    _basic_block,
    _bn,
    _conv2d,
    embed_waveforms,
    init_resnet_params,
    stats_pool,
)

ITERS = 20
B, T = 32, 8 * 16000
CD = jnp.bfloat16


def timeit(fn, *args, iters=ITERS, n=3):
    jitted = jax.jit(fn)
    out = jitted(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])  # compile+drain
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def main():
    cfg = ResNetConfig()
    params = jax.jit(lambda k: init_resnet_params(k, cfg))(jax.random.PRNGKey(0))
    wave = jax.random.normal(jax.random.PRNGKey(1), (B, T), jnp.float32) * 0.1
    weights = jnp.ones((B, 4, 399), jnp.float32)

    fbank = jax.jit(lambda w: wespeaker_fbank(w).astype(CD))(wave)
    jax.block_until_ready(fbank)
    t_fbank = timeit(lambda w: wespeaker_fbank(w).astype(CD), wave)

    def stem_l1(p, fb):
        x = jnp.transpose(fb, (0, 2, 1))[..., None]
        x = jax.nn.relu(_bn(p["bn1"], _conv2d(p["conv1"], x)))
        for bp in p["layer1"]:
            x = _basic_block(bp, x, 1)
        return x

    x1 = jax.jit(stem_l1)(params, fbank)
    jax.block_until_ready(x1)
    t_l1 = timeit(stem_l1, params, fbank)

    def layer(name):
        def f(p, x):
            for bi, bp in enumerate(p[name]):
                x = _basic_block(bp, x, 2 if bi == 0 else 1)
            return x
        return f

    x2 = jax.jit(layer("layer2"))(params, x1)
    jax.block_until_ready(x2)
    t_l2 = timeit(layer("layer2"), params, x1)
    x3 = jax.jit(layer("layer3"))(params, x2)
    jax.block_until_ready(x3)
    t_l3 = timeit(layer("layer3"), params, x2)
    x4 = jax.jit(layer("layer4"))(params, x3)
    jax.block_until_ready(x4)
    t_l4 = timeit(layer("layer4"), params, x3)

    def head(p, x, w):
        b, h, wd, c = x.shape
        feats = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c * h, wd)
        stats = stats_pool(feats, w)
        return stats @ p["seg1"]["w"].astype(stats.dtype) + p["seg1"]["b"].astype(stats.dtype)

    t_head = timeit(head, params, x4, weights)

    t_full = timeit(
        lambda p, w, wt: embed_waveforms(p, cfg, w, wt, compute_dtype=CD),
        params, wave, weights,
    )

    aud = B * 8
    gmac = {"l1": 3.5, "l2": 4.7, "l3": 7.1, "l4": 3.5}  # per 8 s chunk, approx
    print(f"B={B} x 8s bf16; amortized over {ITERS} dispatches")
    for name, t in [("fbank", t_fbank), ("conv1+layer1", t_l1), ("layer2", t_l2),
                    ("layer3", t_l3), ("layer4", t_l4), ("stats+head", t_head),
                    ("FULL", t_full)]:
        extra = ""
        key = name.replace("conv1+layer", "l").replace("layer", "l")
        if key in gmac:
            tf = gmac[key] * 2 * B / t / 1e3
            extra = f" | ~{tf:.0f} TFLOP/s"
        print(f"  {name:14s} {t*1e3:7.2f} ms | {aud/t:6.0f} audio-s/s{extra}", flush=True)
    s = t_fbank + t_l1 + t_l2 + t_l3 + t_l4 + t_head
    print(f"  sum-of-parts   {s*1e3:7.2f} ms (vs full {t_full*1e3:.2f})")


if __name__ == "__main__":
    main()

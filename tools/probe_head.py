"""TPU probe: where do the conformer head's 5 ms go? (batch 32, T=399, bf16)

Amortized dispatch timing (same discipline as profile_seg.py).
Run from repo root: python < tools/probe_head.py
"""
import time
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diarizen_tpu.models.conformer import (
    ConformerConfig, init_conformer_params, conformer_forward,
    _ffn, _mha, _conv_module, _batch_norm,
)
from diarizen_tpu.models.common import layer_norm, linear, conv1d

ITERS = 30
cfg = ConformerConfig()
params, state = init_conformer_params(jax.random.PRNGKey(0), cfg)
params = jax.device_put(jax.tree_util.tree_map(lambda x: x, params))

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
    print(f"{label:34s} {best*1e3:7.2f} ms", flush=True)
    return best

for T in (399, 400, 512):
    x = jax.random.normal(jax.random.PRNGKey(1), (32, T, 256), jnp.bfloat16)
    full = timeit(f"full conformer T={T}", lambda p, s, x: conformer_forward(p, s, cfg, x)[0], params, state, x)

T = 399
x = jax.random.normal(jax.random.PRNGKey(1), (32, T, 256), jnp.bfloat16)
blk = params["blocks"][0]
bst = state["blocks"][0]
timeit("ffn x8", lambda p, x: [x := _ffn(p["ffn1"], cfg, x, False, None, 0) for _ in range(8)][-1], params["blocks"][0], x)
timeit("mha x4", lambda p, x: [x := _mha(p["mha"], cfg, x, None, False, None, 0) for _ in range(4)][-1], blk, x)
timeit("conv module x4", lambda p, s, x: [x := _conv_module(p["conv"], s, cfg, x, False, None, 0)[0] for _ in range(4)][-1], blk, bst, x)
timeit("layer_norm x8", lambda p, x: [x := layer_norm(p["final_norm"], x) for _ in range(8)][-1], blk, x)

# conv module internals
timeit("pw1+glu x4", lambda p, x: [x := (lambda h: (lambda a, b: a * jax.nn.sigmoid(b))(*jnp.split(conv1d(p["conv"]["pw1"], h), 2, axis=-1)))(x)[..., :256] for _ in range(4)][-1], blk, x)
timeit("dw conv x4", lambda p, x: [x := conv1d(p["conv"]["dw"], x, padding=15, groups=256) for _ in range(4)][-1], blk, x)
timeit("bn+swish+pw2 x4", lambda p, s, x: [x := conv1d(p["conv"]["pw2"], (lambda h: h * jax.nn.sigmoid(h))(_batch_norm(p["conv"]["bn"], s["bn"], x, False)[0])) for _ in range(4)][-1], blk, bst, x)

# mha internals: qkv+o GEMMs vs attention core
def qkv_only(p, x):
    for _ in range(4):
        h = layer_norm(p["mha"]["norm"], x)
        q = linear(p["mha"]["q"], h); k = linear(p["mha"]["k"], h); v = linear(p["mha"]["v"], h)
        x = x + linear(p["mha"]["o"], q * 0 + v)
    return x
timeit("mha GEMMs only x4", qkv_only, blk, x)

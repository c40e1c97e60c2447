"""TPU probe: pair-packed formulation of the WavLM conv-FE stride-2 layers.

A stride-2 kernel-3 valid conv over C channels equals a stride-1 kernel-2
valid conv over the pair-packed input (B, T/2, 2C) with a block-Toeplitz
weight (3 of 4 blocks dense); the pack is a contiguous row-major reshape
(NOT the strided even/odd phase split that measured slower, wavlm.py:372)
and the output is already in normal (B, T_out, C) layout. The k=2 s=2
layers become kernel-1 convs, i.e. pure GEMMs.

Run from repo root: python < tools/probe_fe_pack.py
"""
import time
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS, CD = 20, jnp.bfloat16
B, C = 32, 512

def timeit(fn, *args, n=3):
    jitted = jax.jit(fn)
    out = jitted(*args); np.asarray(out.reshape(-1)[:1])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = jitted(*args)
        np.asarray(out.reshape(-1)[:1])
        ts.append((time.perf_counter() - t0) / ITERS)
    return min(ts) * 1e3

def conv_plain(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, (stride,), [(0, 0)], dimension_numbers=("NHC", "HIO", "NHC"))

def pack_weights(w):  # (k, C, C) HIO (3,Cin,Cout) -> (2, 2C, C)
    k, ci, co = w.shape
    wp = jnp.zeros((2, 2 * ci, co), w.dtype)
    wp = wp.at[0, :ci].set(w[0]).at[0, ci:].set(w[1])
    if k == 3:
        wp = wp.at[1, :ci].set(w[2])
        return wp
    return wp[:1]

def conv_packed(x, w, stride):
    b, t, ci = x.shape
    xp = x[:, : t // 2 * 2].reshape(b, t // 2, 2 * ci)
    return conv_plain(xp, pack_weights(w), 1)

key = jax.random.PRNGKey(0)
for name, t_in, k in [("L2 k3", 25598, 3), ("L4 k3", 6399, 3), ("L6 k2", 1599, 2)]:
    x = jax.random.normal(key, (B, t_in, C), CD)
    w = (jax.random.normal(key, (k, C, C), CD) * 0.02)
    a = timeit(lambda x, w: conv_plain(x, w, 2), x, w)
    b_ = timeit(lambda x, w: conv_packed(x, w, 2), x, w)
    ya = np.asarray(jax.jit(lambda x, w: conv_plain(x, w, 2))(x, w), np.float32)
    yb = np.asarray(jax.jit(lambda x, w: conv_packed(x, w, 2))(x, w), np.float32)
    nt = min(ya.shape[1], yb.shape[1])
    diff = np.abs(ya[:, :nt] - yb[:, :nt]).max()
    gf = 2 * B * ya.shape[1] * k * C * C / 1e9
    print(f"{name}: xla {a:.2f} ms ({gf/a:.0f} TF/s)  packed {b_:.2f} ms ({gf/b_:.0f} TF/s)  maxdiff {diff:.2e}  shapes {ya.shape[1]}/{yb.shape[1]}")

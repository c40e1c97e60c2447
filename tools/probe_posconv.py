"""TPU probe: pos-conv (k=128, groups=16, 768ch, T=399) formulations.
Run: python < tools/probe_posconv.py"""
import time
import jax, jax.numpy as jnp, numpy as np
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, T, C, G, K = 32, 399, 768, 16, 128
CG = C // G  # 48
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((K, CG, C)) * 0.02, jnp.bfloat16)
ITERS = 20

def timeit(label, fn, *args, n=3):
    jitted = jax.jit(fn)
    out = jitted(*args)
    ref = np.asarray(out, np.float32)
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        o = None
        for _ in range(ITERS):
            o = jitted(*args)
        np.asarray(o.reshape(-1)[:1])
        best = min(best, (time.time() - t0) / ITERS)
    print(f"{label:40s} {best*1e3:7.2f} ms", flush=True)
    return ref, best

def v_loop(x, w):  # current: 16 separate convs
    return jnp.concatenate([
        jax.lax.conv_general_dilated(
            x[..., g*CG:(g+1)*CG], w[:, :, g*CG:(g+1)*CG], (1,), [(K//2, K//2)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        for g in range(G)], axis=-1)[:, :-1]

def v_fgc(x, w):  # native grouped conv
    return jax.lax.conv_general_dilated(
        x, w, (1,), [(K//2, K//2)], feature_group_count=G,
        dimension_numbers=("NWC", "WIO", "NWC"))[:, :-1]

def v_bgc(x, w):  # group into batch, batch_group_count
    xg = x.reshape(B, T, G, CG).transpose(2, 0, 1, 3).reshape(G*B, T, CG)
    wg = w.reshape(K, CG, G, CG)  # out feature o = g*CG+co must map group-major
    wg = jnp.stack([w[:, :, g*CG:(g+1)*CG] for g in range(G)], axis=2).reshape(K, CG, G*CG)
    y = jax.lax.conv_general_dilated(
        xg, wg, (1,), [(K//2, K//2)], batch_group_count=G,
        dimension_numbers=("NWC", "WIO", "NWC"))  # (B, T+1, G*CG)
    return y[:, :-1]

# packed p=2 block-Toeplitz, per group
P = 2
K2 = K // P + 1          # 65
TP = 400                 # padded output length (trim to 399 at the end)
PAD = K // 2

def packed_weights(w):
    # W2[j2, (a, ci), (tau, co)] = w[P*j2 + a - tau, ci, co-slice g]
    j2 = np.arange(K2)[:, None, None]
    a = np.arange(P)[None, :, None]
    tau = np.arange(P)[None, None, :]
    src = P * j2 + a - tau  # (K2, P, P)
    valid = (src >= 0) & (src < K)
    src = np.clip(src, 0, K - 1)
    # (K2, P, CG, P, CG*G) gathered from w (K, CG, C)
    w_np = np.asarray(w, np.float32)
    W2 = w_np[src]  # (K2, P, P, CG, C)
    W2 = np.where(valid[:, :, :, None, None], W2, 0.0)
    W2 = np.transpose(W2, (0, 1, 3, 2, 4))  # (K2, P, CG, P, C)
    return jnp.asarray(W2, jnp.bfloat16)

W2_full = packed_weights(w)  # (K2, P, CG, P, C)

def v_packed_loop(x, W2):
    xp = jnp.pad(x, ((0, 0), (PAD, PAD + (TP - T)), (0, 0)))  # (B, 528, C)
    xb = xp.reshape(B, (T + 2 * PAD + 1) // P, P, C)  # (B, 264, 2, C)
    outs = []
    for g in range(G):
        xg = xb[..., g*CG:(g+1)*CG].reshape(B, -1, P*CG)  # (B, 264, 96)
        wg = W2[:, :, :, :, g*CG:(g+1)*CG].reshape(K2, P*CG, P*CG)
        y = jax.lax.conv_general_dilated(
            xg, wg, (1,), [(0, 0)], dimension_numbers=("NWC", "WIO", "NWC"))
        outs.append(y.reshape(B, TP, CG))  # (B, 400, 48)
    return jnp.concatenate(outs, axis=-1)[:, :T]

def v_packed_fgc(x, W2):
    xp = jnp.pad(x, ((0, 0), (PAD, PAD + (TP - T)), (0, 0)))
    xb = xp.reshape(B, -1, P, G, CG).transpose(0, 1, 3, 2, 4).reshape(B, -1, G*P*CG)
    # weights: group g block (K2, P*CG, P*CG)
    wg = jnp.stack([W2[:, :, :, :, g*CG:(g+1)*CG].reshape(K2, P*CG, P*CG)
                    for g in range(G)], axis=2).reshape(K2, P*CG, G*P*CG)
    y = jax.lax.conv_general_dilated(
        xb, wg, (1,), [(0, 0)], feature_group_count=G,
        dimension_numbers=("NWC", "WIO", "NWC"))  # (B, 264-65+1=200, G*P*CG)
    y = y.reshape(B, TP // P, G, P, CG).transpose(0, 1, 3, 2, 4).reshape(B, TP, C)
    return y[:, :T]

ref, _ = timeit("loop 16 convs (current)", v_loop, x, w)
for label, fn, args in [
    ("feature_group_count=16", v_fgc, (x, w)),
    ("batch_group_count=16", v_bgc, (x, w)),
    ("packed p=2, loop 16", v_packed_loop, (x, W2_full)),
    ("packed p=2, fgc=16", v_packed_fgc, (x, W2_full)),
]:
    try:
        got, _ = timeit(label, fn, *args)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"   rel err vs loop: {err:.2e}", flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)

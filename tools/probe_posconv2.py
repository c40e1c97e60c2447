"""TPU probe: block-Toeplitz packing factor sweep for the pos-conv
(k=128, groups=16, 768ch, T=399). Packing P time steps into channels turns
the grouped conv into dense per-group convs with K/P taps over P*CG lanes.
Run: python tools/probe_posconv2.py"""
import time
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, T, C, G, K = 32, 399, 768, 16, 128
CG = C // G
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((K, CG, C)) * 0.02, jnp.bfloat16)
ITERS = 20
PAD = K // 2


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
    print(f"{label:44s} {best*1e3:7.2f} ms", flush=True)
    return ref, best


def v_loop(x, w):
    return jnp.concatenate([
        jax.lax.conv_general_dilated(
            x[..., g*CG:(g+1)*CG], w[:, :, g*CG:(g+1)*CG], (1,), [(PAD, PAD)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        for g in range(G)], axis=-1)[:, :-1]


def make_packed(P):
    K2 = K // P + 1
    TP = ((T + P - 1) // P) * P  # padded output length, multiple of P

    def packed_weights(w):
        j2 = np.arange(K2)[:, None, None]
        a = np.arange(P)[None, :, None]
        tau = np.arange(P)[None, None, :]
        src = P * j2 + a - tau  # (K2, P, P)
        valid = (src >= 0) & (src < K)
        src = np.clip(src, 0, K - 1)
        w_np = np.asarray(w, np.float32)
        W2 = w_np[src]  # (K2, P, P, CG, C)
        W2 = np.where(valid[:, :, :, None, None], W2, 0.0)
        W2 = np.transpose(W2, (0, 1, 3, 2, 4))  # (K2, P, CG, P, C)
        return jnp.asarray(W2, jnp.bfloat16)

    def v_packed_loop(x, W2):
        xp = jnp.pad(x, ((0, 0), (PAD, PAD + (TP - T) + P), (0, 0)))
        nblk = xp.shape[1] // P
        xb = xp[:, :nblk * P].reshape(B, nblk, P, C)
        outs = []
        for g in range(G):
            xg = xb[..., g*CG:(g+1)*CG].reshape(B, nblk, P*CG)
            wg = W2[:, :, :, :, g*CG:(g+1)*CG].reshape(K2, P*CG, P*CG)
            y = jax.lax.conv_general_dilated(
                xg, wg, (1,), [(0, 0)], dimension_numbers=("NWC", "WIO", "NWC"))
            outs.append(y[:, :TP // P].reshape(B, TP, CG))
        return jnp.concatenate(outs, axis=-1)[:, :T]

    return packed_weights, v_packed_loop


ref, _ = timeit("loop 16 convs (current)", v_loop, x, w)
for P in (2, 4, 8):
    try:
        pw, fn = make_packed(P)
        W2 = pw(w)
        got, _ = timeit(f"packed p={P}, loop 16 (lanes {P*CG})", fn, x, W2)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"   rel err vs loop: {err:.2e}", flush=True)
    except Exception as e:
        print(f"packed p={P}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

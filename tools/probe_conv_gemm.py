"""TPU probe 2: GEMM-based conv for ResNet layer1 (bypass XLA conv lowering).

probe_packed_conv.py showed XLA lowers BOTH plain and lane-packed strided
convs at ~6 TF/s for the 32-channel layer1 shape. This probe expresses the
same packed conv as explicit dot_general:

  S[b,h,w',(wa*Cin+ci)] = xpad[b,h,4w'+wa-1,ci]      (B,H,W/4,192) copy
  out[b,h,w',(j*C+co)]  = sum_dh S_pad[b,h+dh-1,w'] @ Wp[dh]   3 GEMMs K=192
  or one GEMM over P = concat_dh(...)                K=576

plus a raw GEMM ceiling at (M=B*H*W/4, 576) x (576, 128).

Run: python tools/probe_conv_gemm.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 20
CD = jnp.bfloat16
B, H, W, Cin, Cout, p = 32, 80, 800, 32, 32, 4


def timeit(fn, *args, iters=ITERS, n=3):
    jitted = jax.jit(fn)
    out = jitted(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def pack_weight(w, p):
    kh, kw, cin, c = w.shape
    wp = jnp.zeros((kh, p + 2, cin, p, c), w.dtype)
    for j in range(p):
        wp = wp.at[:, j : j + 3, :, j, :].set(w)
    return wp.reshape(kh, (p + 2) * cin, p * c)  # (3, 192, 128)


def conv_plain(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def build_S(x):
    b, h, wdim, c = x.shape
    xpad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    cols = [xpad[:, :, wa : wa + wdim : p, :] for wa in range(p + 2)]
    return jnp.concatenate(cols, axis=-1)  # (B,H,W/p,(p+2)*Cin)


def gemm3(x, wp):
    """3 accumulating GEMMs over dh, K=192 each."""
    b, h, wdim, c = x.shape
    S = build_S(x)
    Sp = jnp.pad(S, ((0, 0), (1, 1), (0, 0), (0, 0)))
    out = None
    for dh in range(3):
        part = jnp.einsum(
            "bhwk,kn->bhwn", Sp[:, dh : dh + h], wp[dh],
            preferred_element_type=jnp.float32,
        )
        out = part if out is None else out + part
    return out.astype(x.dtype).reshape(b, h, wdim // p, p, Cout).reshape(b, h, wdim, Cout)


def gemm1(x, wp):
    """One GEMM, K=576, P materialized."""
    b, h, wdim, c = x.shape
    S = build_S(x)
    Sp = jnp.pad(S, ((0, 0), (1, 1), (0, 0), (0, 0)))
    P = jnp.concatenate([Sp[:, dh : dh + h] for dh in range(3)], axis=-1)
    out = jnp.einsum(
        "bhwk,kn->bhwn", P, wp.reshape(3 * (p + 2) * Cin, p * Cout),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype).reshape(b, h, wdim // p, p, Cout).reshape(b, h, wdim, Cout)


def main():
    print(f"devices: {jax.devices()}")
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, H, W, Cin), CD) * 0.1
    w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, Cin, Cout)) * 0.1).astype(CD)
    wp = pack_weight(w, p)
    flops = 2 * B * H * W * 9 * Cin * Cout

    y_base = jax.jit(conv_plain)(x, w)
    t_base = timeit(conv_plain, x, w)
    print(f"base conv   : {t_base*1e3:7.2f} ms ({flops/t_base/1e12:5.1f} TF/s)")

    for name, fn in [("gemm3 K=192", gemm3), ("gemm1 K=576", gemm1)]:
        y = jax.jit(fn)(x, wp)
        err = float(jnp.max(jnp.abs(y_base.astype(jnp.float32) - y.astype(jnp.float32))))
        t = timeit(fn, x, wp)
        print(f"{name} : {t*1e3:7.2f} ms ({flops/t/1e12:5.1f} TF/s eff) | max|err| {err:.3e}")

    # raw GEMM ceiling at the same M/K/N
    M = B * H * (W // p)
    A = jax.random.normal(k, (M, 576), CD)
    Bm = jax.random.normal(k, (576, 128), CD)
    gf = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(CD)
    t = timeit(gf, A, Bm)
    print(f"raw GEMM {M}x576x128: {t*1e3:7.2f} ms ({2*M*576*128/t/1e12:5.1f} TF/s)")

    # and the S build alone (copy cost)
    t = timeit(lambda x: build_S(x), x)
    print(f"build_S copy: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()

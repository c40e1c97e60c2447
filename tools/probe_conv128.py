"""TPU probe 3: dense 128-channel conv speed (the pack-p target shape).

(B,H,W,C) -> (B,H,W/p,p*C) is a FREE reshape (w-minor-then-channel IS the
memory order). A 3x3 conv at C=32 becomes a 3x3 conv at 128 channels with a
block-Toeplitz weight (25% dense at p=4 -> 4x redundant FLOPs, but full MXU
lanes). This probe measures what XLA achieves on the dense 128-ch shapes and
checks parity of the packed formulation.

Run: python tools/probe_conv128.py
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


def conv(x, w, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, stride) if np.ndim(stride) == 0 else stride,
        [(1, 1), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def pack_weight_grouped(w, p):
    """(3,3,C,C) -> (3,3,pC,pC) block-Toeplitz for the packed-reshape layout.

    Packed input channel (s*C+ci) at group g+go holds unpacked w = 4(g+go)+s.
    Output lane (j*C+co) = unpacked output 4g+j, window 4g+j-1..4g+j+1.
    Nonzero where dw := 4go+s-j+1 in [0,3).
    """
    kh, kw, c, cout = w.shape
    assert kw == 3 and c == cout
    wp = np.zeros((kh, 3, p, c, p, cout), np.float32)
    for go in (-1, 0, 1):
        for s in range(p):
            for j in range(p):
                dw = p * go + s - j + 1
                if 0 <= dw < 3:
                    wp[:, go + 1, s, :, j, :] = np.asarray(w, np.float32)[:, dw]
    return jnp.asarray(wp.reshape(kh, 3, p * c, p * cout), w.dtype)


def run(name, B, H, W, C, p):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, H, W, C), CD) * 0.1
    w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C)) * 0.1).astype(CD)
    flops_useful = 2 * B * H * W * 9 * C * C

    y_base = jax.jit(conv)(x, w)
    t_base = timeit(conv, x, w)

    wp = pack_weight_grouped(w, p)

    def packed(x, wp):
        b, h, wdim, c = x.shape
        x4 = x.reshape(b, h, wdim // p, p * c)
        y4 = conv(x4, wp)
        return y4.reshape(b, h, wdim, c)

    y_p = jax.jit(packed)(x, wp)
    err = float(jnp.max(jnp.abs(y_base.astype(jnp.float32) - y_p.astype(jnp.float32))))
    t_p = timeit(packed, x, wp)

    raw = flops_useful * p
    print(
        f"{name}: base {t_base*1e3:6.2f} ms ({flops_useful/t_base/1e12:5.1f} TF/s) | "
        f"packed {t_p*1e3:6.2f} ms ({flops_useful/t_p/1e12:5.1f} eff / {raw/t_p/1e12:5.1f} raw TF/s) | "
        f"err {err:.2e}"
    )


def main():
    print(f"devices: {jax.devices()}")
    B = 32
    run("layer1 p=4 (C=32, 80x800)", B, 80, 800, 32, 4)
    run("layer2 p=2 (C=64, 40x400)", B, 40, 400, 64, 2)
    # reference point: a genuinely dense 128-ch conv (layer3 geometry)
    k = jax.random.PRNGKey(2)
    x = jax.random.normal(k, (B, 20, 200, 128), CD)
    w = jax.random.normal(k, (3, 3, 128, 128), CD) * 0.05
    t = timeit(conv, x, w)
    fl = 2 * B * 20 * 200 * 9 * 128 * 128
    print(f"dense 128ch 20x200: {t*1e3:6.2f} ms ({fl/t/1e12:5.1f} TF/s)")
    # and the exact packed-layer1 geometry, dense weights
    x = jax.random.normal(k, (B, 80, 200, 128), CD)
    t = timeit(conv, x, w)
    fl = 2 * B * 80 * 200 * 9 * 128 * 128
    print(f"dense 128ch 80x200: {t*1e3:6.2f} ms ({fl/t/1e12:5.1f} TF/s)")


if __name__ == "__main__":
    main()

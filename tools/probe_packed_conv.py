"""TPU probe: lane-packed conv formulations for ResNet34 layer1/layer2.

Problem (PERF.md): layer1 convs have Cout=32 -> only 32/128 MXU lanes used;
XLA measures ~9-15 TFLOP/s regardless of layout. Idea: pack p=128/C output
time-positions into the lane dim by expressing the 3x3 conv as a strided
conv with kernel (3, 2+p), stride (1, p), Cout=p*C and a block-Toeplitz
weight holding p shifted copies of the 3x3 kernel (50% structured zeros at
p=4). 2x redundant MACs but 4x lane utilization -> ceiling ~98 TFLOP/s
effective vs ~49 for lane-padded im2col.

Variants per shape:
  base   : plain XLA conv (current resnet.py path)
  packed : stride-p width-(p+2) conv, reshape back
  packedS: pre-shifted S tensor (B,H,W/p,(p+2)*C) + (3,1) conv  [p=4 only]

Run from repo root: python tools/probe_packed_conv.py
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


def pack_weight(w: jnp.ndarray, p: int) -> jnp.ndarray:
    """(3,3,Cin,C) -> (3, p+2, Cin, p*C) block-Toeplitz packed kernel.

    Output lane (j*C+co) is output time-position p*w'+j; its 3-tap window
    starts at input position p*w'+j-1 = (window start p*w'-1) + j.
    """
    kh, kw, cin, c = w.shape
    wp = jnp.zeros((kh, p + 2, cin, p, c), w.dtype)
    for j in range(p):
        wp = wp.at[:, j : j + 3, :, j, :].set(w)
    return wp.reshape(kh, p + 2, cin, p * c)


def conv_plain(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def run_shape(name, B, H, W, Cin, Cout, p):
    k = jax.random.PRNGKey(0)
    Wdim = W if W % p == 0 else W + (p - W % p)
    x = jax.random.normal(k, (B, H, Wdim, Cin), CD) * 0.1
    w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, Cin, Cout)) * 0.1).astype(CD)
    wp = pack_weight(w, p)

    t_base = timeit(conv_plain, x, w)
    y_base = jax.jit(conv_plain)(x, w)

    def packed(x, wp):
        b, h, wdim, _ = x.shape
        out = jax.lax.conv_general_dilated(
            x, wp, (1, p), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out.reshape(b, h, wdim // p, p, Cout).reshape(b, h, wdim, Cout)

    t_packed = timeit(packed, x, wp)
    y_packed = jax.jit(packed)(x, wp)
    err = float(jnp.max(jnp.abs(y_base.astype(jnp.float32) - y_packed.astype(jnp.float32))))

    flops = 2 * B * H * Wdim * 9 * Cin * Cout
    print(
        f"{name}: base {t_base*1e3:7.2f} ms ({flops/t_base/1e12:5.1f} TF/s) | "
        f"packed {t_packed*1e3:7.2f} ms ({flops/t_packed/1e12:5.1f} TF/s eff) | "
        f"max|err| {err:.3e}"
    )

    if p == 4:
        # K order in S is (wa, ci) -> matches wp's (wa, ci) flattening
        wS = wp.reshape(kh3 := 3, (p + 2) * Cin, p * Cout)[:, None]  # (3,1,K,pC)

        def packedS(x, wS):
            b, h, wdim, c = x.shape
            xpad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
            cols = [xpad[:, :, wa : wa + wdim : p, :] for wa in range(p + 2)]
            S = jnp.concatenate(cols, axis=-1)  # (B,H,W/p,(p+2)*Cin)
            out = jax.lax.conv_general_dilated(
                S, wS, (1, 1), [(1, 1), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return out.reshape(b, h, wdim // p, p, Cout).reshape(b, h, wdim, Cout)

        t_s = timeit(packedS, x, wS)
        y_s = jax.jit(packedS)(x, wS)
        errs = float(jnp.max(jnp.abs(y_base.astype(jnp.float32) - y_s.astype(jnp.float32))))
        print(
            f"{name}: packedS {t_s*1e3:7.2f} ms ({flops/t_s/1e12:5.1f} TF/s eff) | max|err| {errs:.3e}"
        )


def main():
    print(f"devices: {jax.devices()}")
    B = 32
    run_shape("conv1  (1->32,  80x800)", B, 80, 798, 1, 32, 4)
    run_shape("layer1 (32->32, 80x800)", B, 80, 798, 32, 32, 4)
    run_shape("layer2 (64->64, 40x400)", B, 40, 399, 64, 64, 2)


if __name__ == "__main__":
    main()

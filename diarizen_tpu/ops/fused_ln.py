"""Pallas fused residual + LayerNorm (+ weight-sum accumulate) kernels.

The s80 trunk's non-matmul cost is HBM-bound elementwise glue: per post-norm
encoder layer the XLA path runs residual-add, two LayerNorms, and an f32
weighted-sum accumulation as separate HBM passes (~5.2 ms of a 16.65 ms
forward, PERF.md). Fusing each (add -> LN) pair into one kernel — and folding
the per-layer `acc += w * LN(x)` update into the same pass with an aliased
f32 accumulator — reads each activation tile once from HBM instead of 2-3x.

Inference-path only by default (wavlm.set_fused_ln — measured slower than
XLA in-model, see PERF.md round 4; kept as an engineering record). A custom
VJP (XLA math) backs eval-mode gradients, e.g. the TP parity tests. Off-TPU
the kernels run in interpreter mode, so CPU tests exercise the same code
path.

Reference math being fused (unchanged): components.py:879-958 post-norm
EncoderLayer LNs + model_wavlm_conformer.py:252-254 weight_sum.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln_rows(x_f32: jnp.ndarray, gamma, beta, eps: float) -> jnp.ndarray:
    mean = jnp.mean(x_f32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x_f32 - mean), axis=-1, keepdims=True)
    return (x_f32 - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def _residual_ln_kernel(a_ref, b_ref, g_ref, be_ref, out_ref, *, eps):
    x = a_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y = _ln_rows(x, g_ref[...].astype(jnp.float32),
                 be_ref[...].astype(jnp.float32), eps)
    out_ref[...] = y.astype(out_ref.dtype)


def _residual_ln_acc_kernel(a_ref, b_ref, g_ref, be_ref, w_ref, acc_ref,
                            out_ref, acc_out_ref, *, eps):
    x = a_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y = _ln_rows(x, g_ref[...].astype(jnp.float32),
                 be_ref[...].astype(jnp.float32), eps)
    y = y.astype(out_ref.dtype)
    out_ref[...] = y
    # accumulate the ROUNDED output (bf16 in the bf16 path) — exactly what
    # the unfused `acc + w * x.astype(f32)` accumulates from the layer output
    acc_out_ref[...] = acc_ref[...] + w_ref[0] * y.astype(jnp.float32)


def _row_block(n_rows: int, d: int, dtype) -> int:
    """Rows per program: big enough to amortize grid overhead, small enough
    that 2 bf16 inputs + f32 math + f32 accumulator fit comfortably in VMEM."""
    target = max(1, (2 * 1024 * 1024) // (d * 4))  # ~2 MB of f32 rows
    block = 8
    while block * 2 <= min(target, n_rows):
        block *= 2
    return block


def _ln_bwd_math(x32, gamma, dy32, eps):
    """Standard LayerNorm backward in f32 (dx, dgamma, dbeta)."""
    d = x32.shape[-1]
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * rstd
    dyg = dy32 * gamma
    dx = rstd * (dyg - jnp.mean(dyg, axis=-1, keepdims=True)
                 - xhat * jnp.mean(dyg * xhat, axis=-1, keepdims=True))
    axes = tuple(range(x32.ndim - 1))
    return dx, jnp.sum(dy32 * xhat, axis=axes), jnp.sum(dy32, axis=axes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _residual_ln(a, b, gamma, beta, eps):
    return _residual_ln_pallas(a, b, gamma, beta, eps)


def _residual_ln_fwd(a, b, gamma, beta, eps):
    y = _residual_ln_pallas(a, b, gamma, beta, eps)
    return y, (a, b, gamma)


def _residual_ln_bwd(eps, res, dy):
    # rare path (eval-mode gradients, e.g. parity tests) — plain XLA math
    a, b, gamma = res
    x32 = a.astype(jnp.float32) + b.astype(jnp.float32)
    dx, dgamma, dbeta = _ln_bwd_math(x32, gamma.astype(jnp.float32),
                                     dy.astype(jnp.float32), eps)
    return dx.astype(a.dtype), dx.astype(b.dtype), dgamma.astype(gamma.dtype), \
        dbeta.astype(gamma.dtype)


_residual_ln.defvjp(_residual_ln_fwd, _residual_ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _residual_ln_acc(a, b, gamma, beta, w, acc, eps):
    return _residual_ln_acc_pallas(a, b, gamma, beta, w, acc, eps)


def _residual_ln_acc_fwd(a, b, gamma, beta, w, acc, eps):
    y, acc_out = _residual_ln_acc_pallas(a, b, gamma, beta, w, acc, eps)
    return (y, acc_out), (a, b, gamma, w, y)


def _residual_ln_acc_bwd(eps, res, cotangents):
    a, b, gamma, w, y = res
    dy, dacc = cotangents
    dy_full = dy.astype(jnp.float32) + w.astype(jnp.float32) * dacc
    x32 = a.astype(jnp.float32) + b.astype(jnp.float32)
    dx, dgamma, dbeta = _ln_bwd_math(x32, gamma.astype(jnp.float32),
                                     dy_full, eps)
    dw = jnp.sum(dacc * y.astype(jnp.float32)).reshape(w.shape)
    return dx.astype(a.dtype), dx.astype(b.dtype), dgamma.astype(gamma.dtype), \
        dbeta.astype(gamma.dtype), dw.astype(w.dtype), dacc


_residual_ln_acc.defvjp(_residual_ln_acc_fwd, _residual_ln_acc_bwd)


@functools.partial(jax.jit, static_argnames=("eps",))
def residual_ln(a: jnp.ndarray, b: jnp.ndarray, gamma: jnp.ndarray,
                beta: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LN(a + b) over the last axis, one HBM pass. a, b: (..., D)."""
    return _residual_ln(a, b, gamma, beta, eps)


def _residual_ln_pallas(a, b, gamma, beta, eps):
    shape = a.shape
    d = shape[-1]
    a2 = a.reshape(-1, d)
    b2 = b.reshape(-1, d)
    n = a2.shape[0]
    block = _row_block(n, d, a.dtype)
    grid = (pl.cdiv(n, block),)
    out = pl.pallas_call(
        functools.partial(_residual_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0)),
            pl.BlockSpec((block, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), a.dtype),
        interpret=_interpret(),
    )(a2, b2, gamma, beta)
    return out.reshape(shape)


@functools.partial(jax.jit, static_argnames=("eps",))
def residual_ln_acc(
    a: jnp.ndarray, b: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
    w: jnp.ndarray, acc: jnp.ndarray, eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """y = LN(a + b); acc += w * y (acc f32, updated in place via aliasing).

    Returns (y, new_acc). One read of (a, b) and one read-modify-write of the
    f32 accumulator — the separate `acc + w[l] * x` XLA pass disappears."""
    return _residual_ln_acc(a, b, gamma, beta, jnp.asarray(w, jnp.float32),
                            acc, eps)


def _residual_ln_acc_pallas(a, b, gamma, beta, w, acc, eps):
    shape = a.shape
    d = shape[-1]
    a2 = a.reshape(-1, d)
    b2 = b.reshape(-1, d)
    acc2 = acc.reshape(-1, d)
    n = a2.shape[0]
    block = _row_block(n, d, a.dtype)
    grid = (pl.cdiv(n, block),)
    y, new_acc = pl.pallas_call(
        functools.partial(_residual_ln_acc_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0)),
            pl.BlockSpec((block, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((1,), lambda i: (0,)),
            pl.BlockSpec((block, d), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0)),
            pl.BlockSpec((block, d), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), a.dtype),
            jax.ShapeDtypeStruct((n, d), jnp.float32),
        ],
        input_output_aliases={5: 1},  # acc buffer reused for acc_out
        interpret=_interpret(),
    )(a2, b2, gamma, beta, w.reshape(1).astype(jnp.float32), acc2)
    return y.reshape(shape), new_acc.reshape(shape)

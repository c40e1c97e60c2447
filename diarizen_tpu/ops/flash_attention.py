"""Pallas TPU attention kernel with fused WavLM gated relative-position bias.

The XLA path materializes logits + softmax weights as (B, H, T, T) f32 in HBM
(~6 GB of traffic per 32x8s batch for WavLM-Base) — the dominant cost of the
segmentation forward. This kernel computes, per (batch, head-group, q-block):

    s = (q * scale) @ k^T + gate[:, None] * pos_bias_block
    o = softmax(s) @ v

entirely in VMEM: the (T, T) score matrix never touches HBM, and the gated
bias (the reference's query-dependent GRU gate x bucketed rel-pos embedding,
components.py:702-713) is fused instead of materialized per batch.

T <= 799 (16 s windows) so whole (T_pad, D) K/V panels and (BQ, T_pad) score
tiles fit in VMEM — no online-softmax pass needed. Several heads are
processed per program (HB) so grid overhead and DMA latency amortize.
Inference-path kernel; training uses the XLA attention.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_BQ = 512  # q-block rows cap (T <= 799 -> usually one block per head)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


VMEM_BUDGET = 10 * 1024 * 1024  # conservative per-program working-set cap


def _vmem_bytes(hb: int, bq: int, tp: int, dp: int, itemsize: int) -> int:
    """Per-program VMEM: io blocks are DOUBLE-buffered by the Mosaic pipeline
    (measured: actual scoped usage = 2x block bytes + live scores)."""
    qo = 2 * hb * bq * dp * itemsize
    kv = 2 * hb * tp * dp * itemsize
    bias = hb * bq * tp * itemsize
    scores = bq * tp * 4  # f32 s/p live per head sequentially
    return 2 * (qo + kv + bias) + scores


def _pick_blocks(h: int, t: int, dp: int, itemsize: int):
    """Choose (head-block, q-block) so the working set fits VMEM; None if even
    the smallest configuration does not fit (caller falls back to XLA)."""
    for hb in (6, 4, 3, 2, 1):
        if h % hb:
            continue
        for bq in (512, 256, 128):
            tp = _round_up(t, bq)
            if bq > tp:
                continue
            if _vmem_bytes(hb, bq, tp, dp, itemsize) <= VMEM_BUDGET:
                return hb, bq
    return None


def _kernel(q_ref, k_ref, v_ref, p_ref, g_ref, o_ref, *, scale: float, t_valid: int, hb: int):
    # q_ref: (1, HB, BQ, D), k_ref/v_ref: (1, HB, Tp, D), p_ref: (HB, BQ, Tp),
    # g_ref: (1, HB, BQ, 1), o_ref: (1, HB, BQ, D)
    for hh in range(hb):  # static unroll over the head group
        q = q_ref[0, hh].astype(jnp.float32) * scale
        k = k_ref[0, hh].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, Tp)
        gate = g_ref[0, hh].astype(jnp.float32)  # (BQ, 1)
        s = s + gate * p_ref[hh].astype(jnp.float32)

        tp = s.shape[1]
        if t_valid < tp:  # mask padded key columns
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < t_valid, s, -1e30)

        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v_ref.dtype)
        o = jax.lax.dot_general(
            w, v_ref[0, hh], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, hh] = o.astype(o_ref.dtype)


def flash_attention_gated_bias(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    pos_bias: jnp.ndarray,
    gate: jnp.ndarray,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """q, k, v: (B, H, T, D); pos_bias: (H, T, T); gate: (B, H, T).

    Returns (B, H, T, D) = softmax(q k^T / sqrt(D) + gate * pos_bias) v.
    `interpret` defaults to True off-TPU (tests on the CPU mesh).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, t, d = q.shape
    scale = 1.0 / np.sqrt(d)
    # pad head dim to the 128-lane width: measured faster than a 64-wide
    # last dim (MXU tiles at full lanes) despite the extra zero traffic
    dp = _round_up(d, 128)
    blocks = _pick_blocks(h, t, dp, q.dtype.itemsize)
    if blocks is None:  # working set cannot fit VMEM -> XLA path
        return xla_attention_gated_bias(q, k, v, pos_bias, gate)
    hb, bq = blocks
    bq = min(bq, MAX_BQ)
    tp = _round_up(t, bq)

    def pad(x, pads):
        return jnp.pad(x, pads) if any(p0 or p1 for p0, p1 in pads) else x

    pads4 = [(0, 0), (0, 0), (0, tp - t), (0, dp - d)]
    qf = pad(q, pads4)
    kf = pad(k, pads4)
    vf = pad(v, pads4)
    # bias rides in the compute dtype: halves its HBM traffic in bf16 runs
    pf = pad(pos_bias, [(0, 0), (0, tp - t), (0, tp - t)]).astype(q.dtype)
    gf = pad(gate[..., None], [(0, 0), (0, 0), (0, tp - t), (0, 0)]).astype(jnp.float32)

    grid = (b, h // hb, tp // bq)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, t_valid=t, hb=hb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hb, bq, dp), lambda i, g, j: (i, g, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, tp, dp), lambda i, g, j: (i, g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, tp, dp), lambda i, g, j: (i, g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, bq, tp), lambda i, g, j: (g, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, bq, 1), lambda i, g, j: (i, g, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, bq, dp), lambda i, g, j: (i, g, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, tp, dp), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, pf, gf)
    return out[:, :, :t, :d]


def _bwd_kernel(
    q_ref, k_ref, v_ref, p_ref, g_ref, do_ref,
    dq_ref, dk_ref, dv_ref, dp_ref, dg_ref,
    *, scale: float, t_valid: int, hb: int, nb: int,
):
    """Backward: recompute S/w per (head-group, batch) program, emit
    dq/dk/dv/dgate; dP accumulates across the batch grid dimension (batch is
    the INNER grid axis so the dP output block persists between steps)."""
    b = pl.program_id(1)
    for hh in range(hb):
        q = q_ref[0, hh].astype(jnp.float32) * scale
        k = k_ref[0, hh].astype(jnp.float32)
        v = v_ref[0, hh].astype(jnp.float32)
        do = do_ref[0, hh].astype(jnp.float32)
        p_bias = p_ref[hh].astype(jnp.float32)
        gate = g_ref[0, hh].astype(jnp.float32)  # (Tp, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s + gate * p_bias
        tp = s.shape[1]
        if t_valid < tp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < t_valid, s, -1e30)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        w = e / jnp.sum(e, axis=-1, keepdims=True)  # (Tp, Tp)

        dw = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Tp, Tp)
        r = jnp.sum(dw * w, axis=-1, keepdims=True)
        ds = w * (dw - r)
        if t_valid < tp:
            ds = jnp.where(col < t_valid, ds, 0.0)

        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Tp, D); note q already carries `scale`
        dv = jax.lax.dot_general(
            w, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_ref[0, hh] = dq.astype(dq_ref.dtype)
        dk_ref[0, hh] = dk.astype(dk_ref.dtype)
        dv_ref[0, hh] = dv.astype(dv_ref.dtype)
        dg_ref[0, hh] = jnp.sum(ds * p_bias, axis=-1, keepdims=True).astype(dg_ref.dtype)

        contrib = (gate * ds).astype(jnp.float32)

        @pl.when(b == 0)
        def _():
            dp_ref[hh] = contrib

        @pl.when(b > 0)
        def _():
            dp_ref[hh] = dp_ref[hh] + contrib
    del nb


def _flash_bwd(q, k, v, pos_bias, gate, do, interpret: bool):
    b, h, t, d = q.shape
    scale = 1.0 / np.sqrt(d)
    dp_ = _round_up(d, 128)
    # full-T blocks; backward working set ~ (4 io + 3 f32 TpxTp) per head
    tp = _round_up(t, 128)
    hb = 1
    pads4 = [(0, 0), (0, 0), (0, tp - t), (0, dp_ - d)]
    qf, kf, vf, dof = (jnp.pad(x, pads4) for x in (q, k, v, do))
    pf = jnp.pad(pos_bias, [(0, 0), (0, tp - t), (0, tp - t)]).astype(q.dtype)
    gf = jnp.pad(gate[..., None], [(0, 0), (0, 0), (0, tp - t), (0, 0)]).astype(jnp.float32)

    grid = (h // hb, b)  # batch INNER so the dP block persists per head-group
    io = lambda i, j: (j, i, 0, 0)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, t_valid=t, hb=hb, nb=b),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hb, tp, dp_), io, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, tp, dp_), io, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, tp, dp_), io, memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, tp, tp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, tp, 1), io, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, tp, dp_), io, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, hb, tp, dp_), io, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, tp, dp_), io, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, tp, dp_), io, memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, tp, tp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, tp, 1), io, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, tp, dp_), q.dtype),
            jax.ShapeDtypeStruct((b, h, tp, dp_), q.dtype),
            jax.ShapeDtypeStruct((b, h, tp, dp_), q.dtype),
            jax.ShapeDtypeStruct((h, tp, tp), jnp.float32),
            jax.ShapeDtypeStruct((b, h, tp, 1), jnp.float32),
        ),
        interpret=interpret,
    )(qf, kf, vf, pf, gf, dof)
    dq, dk, dv, dp, dg = out
    return (
        dq[:, :, :t, :d],
        dk[:, :, :t, :d],
        dv[:, :, :t, :d],
        dp[:, :t, :t].astype(pos_bias.dtype),
        dg[:, :, :t, 0].astype(gate.dtype),
    )


def _bwd_vmem_ok(h: int, t: int, d: int, itemsize: int) -> bool:
    tp = _round_up(t, 128)
    dp_ = _round_up(d, 128)
    io = 2 * (7 * tp * dp_ * itemsize + tp * tp * itemsize + tp * tp * 4)
    live = 3 * tp * tp * 4  # s/w/ds f32
    return io + live <= 14 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention_gated_bias_trainable(q, k, v, pos_bias, gate):
    """Differentiable fused-bias attention (NO attention dropout — callers
    must fall back to the XLA path when dropout is active)."""
    return flash_attention_gated_bias(q, k, v, pos_bias, gate)


def _trainable_fwd(q, k, v, pos_bias, gate):
    return flash_attention_gated_bias(q, k, v, pos_bias, gate), (q, k, v, pos_bias, gate)


def _trainable_bwd(res, do):
    q, k, v, pos_bias, gate = res
    b, h, t, d = q.shape
    interpret = jax.default_backend() != "tpu"
    if not _bwd_vmem_ok(h, t, d, q.dtype.itemsize):
        # long-T fallback: XLA vjp of the reference formulation
        _, vjp = jax.vjp(xla_attention_gated_bias, q, k, v, pos_bias, gate)
        return vjp(do)
    return _flash_bwd(q, k, v, pos_bias, gate, do, interpret)


flash_attention_gated_bias_trainable.defvjp(_trainable_fwd, _trainable_bwd)


def xla_attention_gated_bias(q, k, v, pos_bias, gate):
    """Reference XLA path (used for training and as kernel fallback/oracle)."""
    d = q.shape[-1]
    scale = 1.0 / np.sqrt(d)
    bias = gate[..., None].astype(jnp.float32) * pos_bias[None].astype(jnp.float32)
    logits = jnp.einsum(
        "bhtd,bhsd->bhts", q.astype(jnp.float32) * scale, k.astype(jnp.float32)
    )
    logits = logits + bias
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", w.astype(q.dtype), v, preferred_element_type=jnp.float32).astype(q.dtype)

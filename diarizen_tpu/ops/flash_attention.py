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

# In-kernel softmax elementwise precision/schedule (inference forward only;
# the backward always recomputes f32). Set via set_softmax_mode():
#   "f32"      — exact f32 softmax
#   "deferred" — unnormalized p @ v, ONE (BQ, D) division at the end instead
#                of a (BQ, Tp) division panel (4x fewer VPU divides; float
#                reassociation only). DEFAULT: measured 45.2 -> 44.5 ms on
#                the Large-s80 forward, neutral on base (PERF.md round 5)
#   "bf16"     — deferred + the exp panel computed/accumulated in bf16 with
#                f32 row-max and f32 output accumulator (measured equal to
#                "deferred" — exp is not bf16-packed on this VPU)
_SOFTMAX_MODE = "deferred"


import contextlib


@contextlib.contextmanager
def softmax_mode_scope(mode: str):
    """Scoped variant of set_softmax_mode: the mode applies to kernels
    TRACED inside the `with` block and the previous mode is restored on
    exit — no process-global leak. Training loops wrap their step calls in
    softmax_mode_scope("f32") so validation forwards share the training
    objective's exact numerics while inference processes keep the
    deferred default."""
    global _SOFTMAX_MODE
    assert mode in ("f32", "deferred", "bf16"), mode
    prev = _SOFTMAX_MODE
    _SOFTMAX_MODE = mode
    try:
        yield
    finally:
        _SOFTMAX_MODE = prev


def set_softmax_mode(mode: str) -> None:
    """Select the flash kernel's softmax schedule ("f32" | "deferred" |
    "bf16"). Global like wavlm.set_fused_ln; inference forward only.

    Read at TRACE time: it affects kernels compiled AFTER the call.
    Executables already compiled for a shape keep their mode (jit caches
    key on shapes, not this global) — set the mode before building/jitting
    the model, or jax.clear_caches() to force a retrace."""
    assert mode in ("f32", "deferred", "bf16"), mode
    global _SOFTMAX_MODE
    _SOFTMAX_MODE = mode


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


def _forward_plan(h: int, t: int, dp: int, itemsize: int, rate: float,
                  need_bwd: bool = False):
    """Single source of truth for fwd/bwd: returns (hb, bq, tp) when the
    Pallas kernel applies, else None (XLA path). Dropout additionally
    requires a single q-block (masks must regenerate identically in
    backward) and — when the call is differentiable — a VMEM-fitting
    backward, so fwd and bwd always share one implementation/mask."""
    if rate > 0.0:
        # dropout needs a SINGLE q-block per head (bq == tp) so the backward
        # regenerates identical masks — search head-blocks at full-T panels
        # (16-sublane rounding, not 128: T=399 panels are 400 not 512).
        # The dropout mask is a pure function of ABSOLUTE (row, col) indices,
        # so the backward's larger 128-rounded panels regenerate the same
        # mask on the valid region.
        tp = _round_up(t, 16)
        if tp > MAX_BQ:
            return None
        if need_bwd and not _bwd_vmem_ok_tp(_bwd_gate_tp(t), dp, itemsize):
            return None
        for hb in (6, 4, 3, 2, 1):
            if h % hb == 0 and _vmem_bytes(hb, tp, tp, dp, itemsize) <= VMEM_BUDGET:
                return hb, tp, tp
        return None
    blocks = _pick_blocks(h, t, dp, itemsize)
    if blocks is None:
        return None
    hb, bq = blocks
    bq = min(bq, MAX_BQ)
    tp = _round_up(t, bq)
    return hb, bq, tp


def _bwd_gate_tp(t: int) -> int:
    """The tp the launched backward kernel ACTUALLY pads to — single source
    of truth for _flash_bwd, _bwd_vmem_ok and _forward_plan's need_bwd
    check (they must all model the same kernel)."""
    return _round_up(t, 128)


def _bwd_vmem_ok_tp(tp: int, dp_: int, itemsize: int) -> bool:
    io = 2 * (7 * tp * dp_ * itemsize + tp * tp * itemsize + tp * tp * 4)
    live = 3 * tp * tp * 4
    return io + live <= 14 * 1024 * 1024


def _pick_blocks(h: int, t: int, dp: int, itemsize: int):
    """Choose (head-block, q-block) so the working set fits VMEM; None if even
    the smallest configuration does not fit (caller falls back to XLA).

    The TIGHT candidate (t rounded to the 16-sublane tile only) goes first:
    power-of-two blocks round T=399 up to 512 — 28% padded query rows and
    padded K/V length in every score panel. bq=400 removes the row waste
    (the lane-dim padding to 128s is hardware tiling either way). Measured
    (PERF.md round 4): large_s80 forward 43.2 -> 41.1 ms."""
    tight = _round_up(t, 16)
    for hb in (6, 4, 3, 2, 1):
        if h % hb:
            continue
        cands = ([tight] if tight <= MAX_BQ else []) + [512, 256, 128]
        for bq in cands:
            tp = _round_up(t, bq)
            if bq > tp:
                continue
            if _vmem_bytes(hb, bq, tp, dp, itemsize) <= VMEM_BUDGET:
                return hb, bq
    return None


def _dropout_mask(seed, b, h_global, shape, rate: float):
    """Deterministic per-(batch, global-head, position) dropout KEEP mask in
    {0, 1/keep}, regenerated identically by the backward kernel. Pure-vector
    murmur3-finalizer hash (portable: pltpu.prng_* has no CPU/interpret
    lowering; hash quality is ample for dropout)."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    # multiply-free mixing: 32-bit integer multiplies are slow on the VPU
    # (measured ~50 ms/step of pure hashing with a murmur-style hash);
    # xorshift rounds on (row, col, seed) are adds/xors/shifts only
    # full murmur avalanche on the SCALAR seed (scalar multiplies are cheap;
    # only the per-element vector ops must avoid 32-bit multiplies)
    s0 = (
        seed.astype(jnp.uint32)
        + jnp.uint32(b).astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        + jnp.uint32(h_global).astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
    )
    s0 = s0 ^ (s0 >> 16)
    s0 = s0 * jnp.uint32(0x85EBCA6B)
    s0 = s0 ^ (s0 >> 13)
    s0 = s0 * jnp.uint32(0xC2B2AE35)
    s1 = s0 ^ (s0 >> 16)
    s2 = s1 * jnp.uint32(0x9E3779B1)  # second independent scalar stream
    x = ((r + s1) << 16) ^ (c + s2)
    x ^= x << 13
    x ^= x >> 17
    x ^= x << 5
    x = x + (r ^ (c << 11)) + s1
    x ^= x << 13
    x ^= x >> 17
    x ^= x << 5
    threshold = jnp.uint32(int(rate * (2**32 - 1)))
    keep = (x >= threshold).astype(jnp.float32)
    return keep / (1.0 - rate)


def _kernel(q_ref, k_ref, v_ref, p_ref, g_ref, seed_ref, o_ref,
            *, scale: float, t_valid: int, hb: int, rate: float,
            softmax_mode: str = "f32"):
    # q_ref: (1, HB, BQ, D), k_ref/v_ref: (1, HB, Tp, D), p_ref: (HB, BQ, Tp),
    # g_ref: (1, HB, BQ, 1), seed_ref: (1, 1) SMEM, o_ref: (1, HB, BQ, D)
    # grid order (head-group, q-block, batch): batch innermost, so the
    # (HB, BQ, Tp) bias block index is unchanged across the B inner steps and
    # Mosaic skips re-fetching it (the bias is shared across the batch)
    b = pl.program_id(2)
    g_idx = pl.program_id(0)
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
        if softmax_mode == "f32":
            p = jnp.exp(s)
            w = p / jnp.sum(p, axis=-1, keepdims=True)
            if rate > 0.0:  # in-kernel attention dropout (rate is static)
                w = w * _dropout_mask(seed_ref[0, 0], b, g_idx * hb + hh, w.shape, rate)
            o = jax.lax.dot_general(
                w.astype(v_ref.dtype), v_ref[0, hh], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            # deferred normalization: unnormalized p @ v, one (BQ, D)
            # division instead of the (BQ, Tp) division panel. "bf16"
            # additionally computes/accumulates the exp panel in bf16 with
            # f32 row-max (above) and an f32 normalizer/output.
            p = jnp.exp(s.astype(jnp.bfloat16) if softmax_mode == "bf16" else s)
            l = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
            if rate > 0.0:  # dropout scales softmax weights -> scales p
                p = p * _dropout_mask(
                    seed_ref[0, 0], b, g_idx * hb + hh, p.shape, rate
                ).astype(p.dtype)
            o = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, hh], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / l
        o_ref[0, hh] = o.astype(o_ref.dtype)


def flash_attention_gated_bias(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    pos_bias: jnp.ndarray,
    gate: jnp.ndarray,
    interpret: Optional[bool] = None,
    dropout_rate: float = 0.0,
    seed: Optional[jnp.ndarray] = None,
    _need_bwd: bool = False,
) -> jnp.ndarray:
    """q, k, v: (B, H, T, D); pos_bias: (H, T, T); gate: (B, H, T).

    Returns (B, H, T, D) = softmax(q k^T / sqrt(D) + gate * pos_bias) v,
    optionally with attention dropout (deterministic per (seed, batch, head)
    in-kernel PRNG; requires a single q-block per head -> falls back to an
    equivalent XLA implementation otherwise).
    `interpret` defaults to True off-TPU (tests on the CPU mesh).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, t, d = q.shape
    scale = 1.0 / np.sqrt(d)
    # pad head dim to the 128-lane width: measured faster than a 64-wide
    # last dim (MXU tiles at full lanes) despite the extra zero traffic
    dp = _round_up(d, 128)
    if dropout_rate > 0.0 and seed is None:
        raise ValueError("dropout_rate > 0 requires a seed")
    plan = _forward_plan(h, t, dp, q.dtype.itemsize, dropout_rate, need_bwd=_need_bwd)
    if plan is None:  # VMEM or dropout-blocking constraint -> XLA path
        return xla_attention_gated_bias(q, k, v, pos_bias, gate,
                                        dropout_rate=dropout_rate, seed=seed)
    hb, bq, tp = plan

    def pad(x, pads):
        return jnp.pad(x, pads) if any(p0 or p1 for p0, p1 in pads) else x

    pads4 = [(0, 0), (0, 0), (0, tp - t), (0, dp - d)]
    qf = pad(q, pads4)
    kf = pad(k, pads4)
    vf = pad(v, pads4)
    # bias rides in the compute dtype: halves its HBM traffic in bf16 runs
    pf = pad(pos_bias, [(0, 0), (0, tp - t), (0, tp - t)]).astype(q.dtype)
    gf = pad(gate[..., None], [(0, 0), (0, 0), (0, tp - t), (0, 0)]).astype(jnp.float32)

    seed_arr = jnp.reshape(
        (seed if seed is not None else jnp.zeros((), jnp.int32)).astype(jnp.int32), (1, 1)
    )
    grid = (h // hb, tp // bq, b)
    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, t_valid=t, hb=hb, rate=dropout_rate,
            # reduced-precision/deferred softmax is inference-only: the
            # custom-vjp backward recomputes exact f32, so a non-f32 forward
            # under _need_bwd would make fwd/bwd subtly inconsistent
            softmax_mode="f32" if _need_bwd else _SOFTMAX_MODE,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hb, bq, dp), lambda g, j, i: (i, g, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, tp, dp), lambda g, j, i: (i, g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, tp, dp), lambda g, j, i: (i, g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, bq, tp), lambda g, j, i: (g, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, bq, 1), lambda g, j, i: (i, g, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda g, j, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, bq, dp), lambda g, j, i: (i, g, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, tp, dp), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, pf, gf, seed_arr)
    return out[:, :, :t, :d]


def _bwd_kernel(
    q_ref, k_ref, v_ref, p_ref, g_ref, do_ref, seed_ref,
    dq_ref, dk_ref, dv_ref, dp_ref, dg_ref,
    *, scale: float, t_valid: int, hb: int, nb: int, rate: float,
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
        if rate > 0.0:  # regenerate the forward's mask (same seed derivation)
            h_global = pl.program_id(0) * hb + hh
            m = _dropout_mask(seed_ref[0, 0], b, h_global, w.shape, rate)
            w_used = w * m
        else:
            w_used = w

        dw = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Tp, Tp)
        if rate > 0.0:
            dw = dw * m
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
            w_used, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
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


def _flash_bwd(q, k, v, pos_bias, gate, do, interpret: bool,
               rate: float = 0.0, seed=None):
    b, h, t, d = q.shape
    scale = 1.0 / np.sqrt(d)
    dp_ = _round_up(d, 128)
    # full-T blocks; backward working set ~ (4 io + 3 f32 TpxTp) per head.
    # tp rounds to 128, NOT the forward's tight 16: tp is also a LANE dim of
    # the square score/dP panels here, and a 400-lane panel forces masked
    # lane handling — measured on-chip (round 5, within-session A/B, full
    # train step): tp=512 159.9 ms/step vs tp=400 173.1 ms/step despite 64%
    # more panel area. _bwd_gate_tp keeps the VMEM gates in sync with this.
    tp = _bwd_gate_tp(t)
    hb = 1
    pads4 = [(0, 0), (0, 0), (0, tp - t), (0, dp_ - d)]
    qf, kf, vf, dof = (jnp.pad(x, pads4) for x in (q, k, v, do))
    pf = jnp.pad(pos_bias, [(0, 0), (0, tp - t), (0, tp - t)]).astype(q.dtype)
    gf = jnp.pad(gate[..., None], [(0, 0), (0, 0), (0, tp - t), (0, 0)]).astype(jnp.float32)

    seed_arr = jnp.reshape(
        (seed if seed is not None else jnp.zeros((), jnp.int32)).astype(jnp.int32), (1, 1)
    )
    grid = (h // hb, b)  # batch INNER so the dP block persists per head-group
    io = lambda i, j: (j, i, 0, 0)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, t_valid=t, hb=hb, nb=b, rate=rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hb, tp, dp_), io, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, tp, dp_), io, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, tp, dp_), io, memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, tp, tp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, tp, 1), io, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, tp, dp_), io, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
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
    )(qf, kf, vf, pf, gf, dof, seed_arr)
    dq, dk, dv, dp, dg = out
    return (
        dq[:, :, :t, :d],
        dk[:, :, :t, :d],
        dv[:, :, :t, :d],
        dp[:, :t, :t].astype(pos_bias.dtype),
        dg[:, :, :t, 0].astype(gate.dtype),
    )


def _bwd_vmem_ok(h: int, t: int, d: int, itemsize: int) -> bool:
    # MUST round tp exactly like _flash_bwd's padding (128): if the gate
    # under-estimates (the round-4 bug rounded to 16 here while the kernel
    # padded to 128), it can pass a kernel whose real working set overflows
    # VMEM — a Mosaic failure instead of the intended XLA fallback. The
    # forward plan's need_bwd check routes through _bwd_gate_tp too, so a
    # dropout forward can never run the Pallas kernel (murmur mask) while
    # the backward falls to the XLA vjp (bernoulli mask) — that split would
    # mean silently wrong attention-dropout gradients.
    tp = _bwd_gate_tp(t)
    dp_ = _round_up(d, 128)
    return _bwd_vmem_ok_tp(tp, dp_, itemsize)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _trainable(rate, q, k, v, pos_bias, gate, seed_f):
    seed = jax.lax.bitcast_convert_type(seed_f, jnp.int32)
    return flash_attention_gated_bias(
        q, k, v, pos_bias, gate, dropout_rate=rate, seed=seed, _need_bwd=True
    )


def _trainable_fwd(rate, q, k, v, pos_bias, gate, seed_f):
    out = _trainable(rate, q, k, v, pos_bias, gate, seed_f)
    return out, (q, k, v, pos_bias, gate, seed_f)


def _trainable_bwd(rate, res, do):
    q, k, v, pos_bias, gate, seed_f = res
    b, h, t, d = q.shape
    seed = jax.lax.bitcast_convert_type(seed_f, jnp.int32)
    interpret = jax.default_backend() != "tpu"
    dp_ = _round_up(d, 128)
    fwd_used_pallas = (
        _forward_plan(h, t, dp_, q.dtype.itemsize, rate, need_bwd=True) is not None
    )
    if not fwd_used_pallas or not _bwd_vmem_ok(h, t, d, q.dtype.itemsize):
        # must mirror the forward implementation exactly (same dropout mask)
        _, vjp = jax.vjp(
            lambda *a: xla_attention_gated_bias(*a, dropout_rate=rate, seed=seed),
            q, k, v, pos_bias, gate,
        )
        return (*vjp(do), jnp.zeros_like(seed_f))
    grads = _flash_bwd(q, k, v, pos_bias, gate, do, interpret, rate=rate, seed=seed)
    return (*grads, jnp.zeros_like(seed_f))


_trainable.defvjp(_trainable_fwd, _trainable_bwd)


def flash_attention_gated_bias_trainable(
    q, k, v, pos_bias, gate, dropout_rate: float = 0.0, seed=None
):
    """Differentiable fused-bias attention with optional in-kernel attention
    dropout (deterministic from `seed`, an int32 scalar array)."""
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    seed_f = jax.lax.bitcast_convert_type(seed.astype(jnp.int32), jnp.float32)
    return _trainable(float(dropout_rate), q, k, v, pos_bias, gate, seed_f)


def xla_attention_gated_bias(q, k, v, pos_bias, gate,
                             dropout_rate: float = 0.0, seed=None):
    """Reference XLA path (used for training and as kernel fallback/oracle).
    Dropout (when requested) is deterministic from `seed` so a custom-vjp
    backward can replay the identical forward."""
    d = q.shape[-1]
    scale = 1.0 / np.sqrt(d)
    bias = gate[..., None].astype(jnp.float32) * pos_bias[None].astype(jnp.float32)
    logits = jnp.einsum(
        "bhtd,bhsd->bhts", q.astype(jnp.float32) * scale, k.astype(jnp.float32)
    )
    logits = logits + bias
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    w = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and seed is not None:
        key = jax.random.key(seed.astype(jnp.uint32))
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, w.shape)
        w = jnp.where(keep, w / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhts,bhsd->bhtd", w.astype(q.dtype), v, preferred_element_type=jnp.float32).astype(q.dtype)

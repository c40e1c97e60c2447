"""Shared functional NN primitives for diarizen_tpu models.

Design: models are pure functions over explicit parameter pytrees (nested
dicts of jnp arrays). Parameters are stored in float32; forward passes run in
a caller-chosen ``compute_dtype`` (bfloat16 on TPU for MXU throughput), with
layer norms and softmax statistics kept in float32 for stability. All matmuls
pass ``preferred_element_type=float32`` so the MXU accumulates in f32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = dict

# ---------------------------------------------------------------------------
# initializers


def lecun_normal(rng, shape, fan_in, dtype=jnp.float32):
    return jax.random.normal(rng, shape, dtype) * (1.0 / np.sqrt(fan_in))


def kaiming_uniform(rng, shape, fan_in, dtype=jnp.float32):
    # matches torch nn.Linear / nn.Conv1d default reset_parameters
    bound = np.sqrt(1.0 / fan_in) * np.sqrt(3.0)
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def init_linear(rng, in_features: int, out_features: int, bias: bool = True) -> Params:
    kw, kb = jax.random.split(rng)
    p = {"w": kaiming_uniform(kw, (in_features, out_features), in_features)}
    if bias:
        bound = np.sqrt(1.0 / in_features)
        p["b"] = jax.random.uniform(kb, (out_features,), jnp.float32, -bound, bound)
    return p


def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def init_conv1d(
    rng, in_channels: int, out_channels: int, kernel: int, bias: bool = True, groups: int = 1
) -> Params:
    """Weight layout (K, Cin//groups, Cout) — XLA 'WIO'."""
    kw, kb = jax.random.split(rng)
    fan_in = (in_channels // groups) * kernel
    p = {"w": kaiming_uniform(kw, (kernel, in_channels // groups, out_channels), fan_in)}
    if bias:
        bound = np.sqrt(1.0 / fan_in)
        p["b"] = jax.random.uniform(kb, (out_channels,), jnp.float32, -bound, bound)
    return p


# ---------------------------------------------------------------------------
# forward primitives


def linear(p: Params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    dtype = compute_dtype or x.dtype
    y = jnp.dot(x.astype(dtype), p["w"].astype(dtype), preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(dtype)


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis; f32 statistics WITHOUT materializing an
    f32 copy of x (reductions accumulate in f32 via dtype=), so bf16
    activations stay bf16 in HBM."""
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    var = jnp.mean(
        jnp.square(x.astype(jnp.float32) - mean), axis=-1, keepdims=True
    ) if x.dtype == jnp.float32 else (
        jnp.mean(jnp.square(x), axis=-1, keepdims=True, dtype=jnp.float32)
        - jnp.square(mean)
    )
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    scale = (inv * p["scale"].astype(jnp.float32)).astype(jnp.float32)
    y = (x.astype(jnp.float32) - mean) * scale + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def group_norm(p: Params, x: jnp.ndarray, num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over (B, T, C) with channel-last layout, stats per (group, batch)
    over (T, C//G). Affine params shaped (C,)."""
    b, t, c = x.shape
    xg = x.reshape(b, t, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    var = (
        jnp.mean(jnp.square(xg), axis=(1, 3), keepdims=True, dtype=jnp.float32)
        - jnp.square(mean)
    )
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    y = (xg.astype(jnp.float32) - mean) * inv
    y = y.reshape(b, t, c) * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def conv1d(
    p: Params,
    x: jnp.ndarray,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
    compute_dtype=None,
) -> jnp.ndarray:
    """1-D convolution on (B, T, C) channel-last input, weight (K, Cin//g, Cout).

    groups > 1 is NOT lowered through `feature_group_count`: XLA's SPMD
    partitioner (jax 0.9.0) miscompiles the weight gradient of grouped convs
    on a 2-D mesh — when the input is batch-sharded and the weight replicated,
    grad_w comes back multiplied by the size of the OTHER mesh axis (minimal
    repro pinned in tests/test_tp_parity.py::test_grouped_conv_grad_spmd).
    Instead:
      * depthwise (groups == Cin == Cout): K shifted scale-adds — pure VPU
        elementwise work, which is also how depthwise convs map best to TPU
        (1 input channel per group leaves the MXU idle anyway);
      * general grouped: `groups` per-group dense convs (identical FLOPs,
        dense-conv SPMD rules are correct).
    """
    dtype = compute_dtype or x.dtype
    # no preferred_element_type here: its conv transpose (backward) rule
    # rejects the resulting f32-cotangent x low-precision-kernel mix; the TPU
    # conv unit accumulates in f32 internally regardless of output dtype.
    w = p["w"].astype(dtype)
    xd = x.astype(dtype)
    if groups == 1:
        y = jax.lax.conv_general_dilated(
            xd,
            w,
            window_strides=(stride,),
            padding=[(padding, padding)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
    elif w.shape[1] == 1 and groups == x.shape[-1] == w.shape[2]:
        k = w.shape[0]
        t_out = (x.shape[1] + 2 * padding - k) // stride + 1
        xp = jnp.pad(xd, ((0, 0), (padding, padding), (0, 0)))
        span = (t_out - 1) * stride + 1
        y = sum(
            xp[:, i : i + span : stride, :] * w[i, 0, :] for i in range(k)
        )
    else:
        cg = w.shape[1]
        cog = w.shape[2] // groups
        y = jnp.concatenate(
            [
                jax.lax.conv_general_dilated(
                    xd[..., g * cg : (g + 1) * cg],
                    w[:, :, g * cog : (g + 1) * cog],
                    window_strides=(stride,),
                    padding=[(padding, padding)],
                    dimension_numbers=("NWC", "WIO", "NWC"),
                )
                for g in range(groups)
            ],
            axis=-1,
        )
    if "b" in p:
        y = y + p["b"].astype(dtype)
    return y


def init_lstm_layer(rng: jax.Array, in_dim: int, hidden: int,
                    bidirectional: bool = True) -> Params:
    """Per-layer BiLSTM parameters (torch nn.LSTM layout: i,f,g,o gates)."""
    layer: Params = {}
    bound = 1.0 / np.sqrt(hidden)
    for d, direction in enumerate(("fwd", "bwd") if bidirectional else ("fwd",)):
        k1, k2 = jax.random.split(jax.random.fold_in(rng, d))
        layer[direction] = {
            "w_ih": jax.random.uniform(k1, (in_dim, 4 * hidden), minval=-bound, maxval=bound),
            "w_hh": jax.random.uniform(k2, (hidden, 4 * hidden), minval=-bound, maxval=bound),
            "b": jnp.zeros((4 * hidden,)),
        }
    return layer


def lstm_direction(p: Params, x: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """(B, T, D) -> (B, T, H) single-direction LSTM via lax.scan
    (torch nn.LSTM gate math: i,f,g,o; used by the PyanNet baseline and
    SSeRiouSS heads — sequence lengths are a few hundred frames, so a scan
    over time with batched GEMM gates is the right TPU shape)."""
    b, t, _ = x.shape
    h_dim = p["w_hh"].shape[0]
    xs = jnp.flip(x, axis=1) if reverse else x
    gates_x = jnp.einsum("btd,dg->btg", xs, p["w_ih"]) + p["b"]

    def step(carry, gx):
        h, c = carry
        g = gx + h @ p["w_hh"].astype(h.dtype)
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        c = f * c + i * jnp.tanh(gg)
        h = o * jnp.tanh(c)
        return (h, c), h

    # carry dtype must match the promoted gate dtype (bf16 input x f32
    # weights -> f32 gates), or lax.scan rejects the carry signature
    init = (
        jnp.zeros((b, h_dim), gates_x.dtype),
        jnp.zeros((b, h_dim), gates_x.dtype),
    )
    _, hs = jax.lax.scan(step, init, jnp.swapaxes(gates_x, 0, 1))
    hs = jnp.swapaxes(hs, 0, 1)  # (B, T, H)
    return jnp.flip(hs, axis=1) if reverse else hs


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch default, required for checkpoint parity."""
    return jax.nn.gelu(x, approximate=False)


def grad_multiply(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Identity forward, gradient scaled by `scale`
    (reference: wav2vec2/model.py:116-117 GradMultiply 0.1 on conv output)."""
    return x * scale + jax.lax.stop_gradient(x * (1.0 - scale))


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    train: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention.

    q, k, v: (B, H, T, D). bias: broadcastable to (B, H, T, T), added to logits
    pre-softmax. Logits and softmax in f32 (max-subtraction stabilization as in
    reference components.py:449-486); output cast back to q.dtype.

    T <= 799 for all diarization chunks, so full T x T materialization is fine
    on TPU (SURVEY.md section 7 'hard parts'); a Pallas flash kernel is an
    optional optimization, not needed for correctness.
    """
    d = q.shape[-1]
    scale = 1.0 / np.sqrt(d)
    logits = jnp.einsum(
        "bhtd,bhsd->bhts", q * scale, k, preferred_element_type=jnp.float32
    ).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    weights = jax.nn.softmax(logits, axis=-1)
    weights = dropout(dropout_rng, weights, dropout_rate, train)
    out = jnp.einsum(
        "bhts,bhsd->bhtd", weights.astype(q.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)

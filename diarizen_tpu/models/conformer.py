"""Conformer encoder in pure functional JAX.

Capability parity with the reference encoder (diarizen/models/module/
conformer.py:259-325): N blocks of macaron FFN (half-residual) -> MHSA
(optional relative-position key embedding) -> depthwise ConvModule
(GLU + depthwise k=31 + BatchNorm + Swish) -> FFN -> final LayerNorm,
optionally followed by an output activation.

TPU-first notes: channel-last layouts, all matmuls accumulate f32 on the MXU,
BatchNorm carries explicit running-stat state (functional — train mode
returns the updated state pytree instead of mutating).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diarizen_tpu.models.common import (
    Params,
    attention,
    conv1d,
    dropout,
    init_conv1d,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    dim: int = 256
    ffn_hidden: int = 1024
    num_heads: int = 4
    num_layers: int = 4
    kernel_size: int = 31
    dropout: float = 0.1
    use_posi: bool = False
    posi_maxlen: int = 1000
    output_activation: Optional[str] = None  # None | "relu" | "tanh" | "sigmoid"


def init_conformer_params(rng: jax.Array, cfg: ConformerConfig) -> Tuple[Params, Params]:
    """Returns (params, state); state carries BatchNorm running stats."""
    keys = iter(jax.random.split(rng, 16 * cfg.num_layers + 4))
    d, h = cfg.dim, cfg.ffn_hidden
    blocks, states = [], []
    for _ in range(cfg.num_layers):
        block = {
            "ffn1": {
                "norm": init_layer_norm(d),
                "w1": init_linear(next(keys), d, h),
                "w2": init_linear(next(keys), h, d),
            },
            "mha": {
                "norm": init_layer_norm(d),
                "q": init_linear(next(keys), d, d),
                "k": init_linear(next(keys), d, d),
                "v": init_linear(next(keys), d, d),
                "o": init_linear(next(keys), d, d),
            },
            "conv": {
                "norm": init_layer_norm(d),
                "pw1": init_conv1d(next(keys), d, 2 * d, 1),
                "dw": init_conv1d(next(keys), d, d, cfg.kernel_size, groups=d),
                "bn": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
                "pw2": init_conv1d(next(keys), d, d, 1),
            },
            "ffn2": {
                "norm": init_layer_norm(d),
                "w1": init_linear(next(keys), d, h),
                "w2": init_linear(next(keys), h, d),
            },
            "final_norm": init_layer_norm(d),
        }
        blocks.append(block)
        states.append({"bn": {"mean": jnp.zeros((d,)), "var": jnp.ones((d,))}})
    params: Params = {"blocks": blocks}
    if cfg.use_posi:
        params["pos_emb"] = 0.02 * jax.random.normal(
            next(keys), (2 * cfg.posi_maxlen, d // cfg.num_heads)
        )
    return params, {"blocks": states}


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def _batch_norm(
    p: Params, s: Params, x: jnp.ndarray, train: bool, momentum: float = 0.1, eps: float = 1e-5
) -> Tuple[jnp.ndarray, Params]:
    """BatchNorm1d over (B, T, C) with per-channel stats; torch semantics
    (biased batch var for normalization, unbiased for the running update)."""
    xf = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(xf, axis=(0, 1))
        var = jnp.var(xf, axis=(0, 1))
        n = x.shape[0] * x.shape[1]
        unbiased = var * n / max(n - 1, 1)
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(x.dtype), new_s


def _ffn(p: Params, cfg: ConformerConfig, x, train, rng, salt):
    h = layer_norm(p["norm"], x)
    h = swish(linear(p["w1"], h))
    if train and rng is not None:
        h = dropout(jax.random.fold_in(rng, salt), h, cfg.dropout, train)
    h = linear(p["w2"], h)
    if train and rng is not None:
        h = dropout(jax.random.fold_in(rng, salt + 1), h, cfg.dropout, train)
    return x + 0.5 * h


def _mha(p: Params, cfg: ConformerConfig, x, pos_k, train, rng, salt):
    b, t, d = x.shape
    h = layer_norm(p["norm"], x)
    nh, hd = cfg.num_heads, d // cfg.num_heads

    def split(z):
        return z.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)

    q, k, v = split(linear(p["q"], h)), split(linear(p["k"], h)), split(linear(p["v"], h))
    bias = None
    if pos_k is not None:
        # additive relative-position key scores (conformer.py:57-62):
        # (B, H, T, hd) x (T, T, hd) -> (B, H, T, T), same 1/sqrt(d) scale
        bias = jnp.einsum(
            "bhtd,tsd->bhts", q, pos_k.astype(q.dtype), preferred_element_type=jnp.float32
        ) / np.sqrt(hd)
    drop_rng = jax.random.fold_in(rng, salt) if (train and rng is not None) else None
    out = attention(q, k, v, bias=bias, dropout_rng=drop_rng, dropout_rate=cfg.dropout, train=train)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    out = linear(p["o"], out)
    if train and rng is not None:
        out = dropout(jax.random.fold_in(rng, salt + 1), out, cfg.dropout, train)
    return x + out


def _conv_module(p: Params, s: Params, cfg: ConformerConfig, x, train, rng, salt):
    h = layer_norm(p["norm"], x)
    h = conv1d(p["pw1"], h)  # (B, T, 2C)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)  # GLU over channels
    h = conv1d(p["dw"], h, padding=(cfg.kernel_size - 1) // 2, groups=cfg.dim)
    h, new_bn = _batch_norm(p["bn"], s["bn"], h, train)
    h = swish(h)
    h = conv1d(p["pw2"], h)
    if train and rng is not None:
        h = dropout(jax.random.fold_in(rng, salt), h, cfg.dropout, train)
    return x + h, {"bn": new_bn}


def conformer_forward(
    params: Params,
    state: Params,
    cfg: ConformerConfig,
    x: jnp.ndarray,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Params]:
    """(B, T, dim) -> (B, T, dim); returns (output, new_state)."""
    pos_k = None
    if cfg.use_posi:
        t = x.shape[1]
        pos = np.arange(t)[:, None] - np.arange(t)[None, :]
        pos = np.clip(pos, -cfg.posi_maxlen, cfg.posi_maxlen - 1) + cfg.posi_maxlen
        pos_k = params["pos_emb"][jnp.asarray(pos)]  # (T, T, hd)

    new_states = []
    for i, (block, bstate) in enumerate(zip(params["blocks"], state["blocks"])):
        x = _ffn(block["ffn1"], cfg, x, train, rng, 100 * i)
        x = _mha(block["mha"], cfg, x, pos_k, train, rng, 100 * i + 10)
        x, ns = _conv_module(block["conv"], bstate, cfg, x, train, rng, 100 * i + 20)
        x = _ffn(block["ffn2"], cfg, x, train, rng, 100 * i + 30)
        x = layer_norm(block["final_norm"], x)
        new_states.append(ns)

    if cfg.output_activation == "relu":
        x = jax.nn.relu(x)
    elif cfg.output_activation == "tanh":
        x = jnp.tanh(x)
    elif cfg.output_activation == "sigmoid":
        x = jax.nn.sigmoid(x)
    elif cfg.output_activation is not None:
        raise ValueError(f"unknown output activation {cfg.output_activation}")
    return x, {"blocks": new_states}

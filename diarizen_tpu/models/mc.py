"""Multi-channel front-end: cross-channel fusion + MC WavLM feature extraction
+ the MC EEND segmentation model.

Capability parity with the reference MC stack:
  * `CrossChannelAttention` — attention ACROSS microphones per (batch, time)
    with a near-zero-initialized LayerNorm residual gate
    (diarizen/models/module/utils_mc.py:13-62);
  * `TACFusion` — transform-average-concatenate alternative (:64-120);
  * `wavlm_extract_features_mc` — conv front-end per channel (B*C streams),
    fusion modules injected after WavLM layers 0..N-1, channel mean at layer
    N, single-stream afterwards (wav2vec2/model.py:121-145 +
    components.py:1026-1070); the rel-pos bias is shared across channels (it
    is channel-independent), so the reference's explicit bias averaging at
    the merge point is a no-op here;
  * MC EEND model — random channel-count truncation in training, returns
    (powerset scores, spatial attention (B, L, F, C, C))
    (models/eend/model_wavlm_conformer_mc.py:250-281);
  * `attention_weighted_embeddings` — per-channel embedding fusion using
    layer spatial attention (recipes/diar_ssl_mc/infer_avg.py:29-41).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diarizen_tpu.models.common import (
    Params,
    dropout,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)
from diarizen_tpu.models.conformer import ConformerConfig, conformer_forward
from diarizen_tpu.models.eend import EendConfig
from diarizen_tpu.models.wavlm import (
    WavLMConfig,
    _encoder_layer,
    _feature_extractor,
    _pos_conv,
    compute_position_bias,
    grad_multiply,
)
from diarizen_tpu.models.common import gelu  # noqa: F401  (parity imports)


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    kind: str = "cross_attention"  # "cross_attention" | "tac"
    num_fusion_layers: int = 4  # fusion modules after WavLM layers 0..N-1
    hidden: int = 256  # h_units (cross-attn) / hidden_dim (tac)
    num_heads: int = 8
    dropout: float = 0.1
    init_mult: float = 1e-2


@dataclasses.dataclass(frozen=True)
class McEendConfig(EendConfig):
    """EEND config + channel-fusion config: the single object the Trainer /
    builders / recipes pass around for the MC model (the reference's MC Model
    carries its fusion modules the same way,
    model_wavlm_conformer_mc.py:26-88)."""

    fusion: FusionConfig = FusionConfig()
    num_channels: int = 8  # dataset channel padding target


def init_cross_channel_attention(rng, n_units: int, fcfg: FusionConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    norm = init_layer_norm(n_units)
    norm["scale"] = norm["scale"] * fcfg.init_mult  # near-zero residual gate
    return {
        "q": init_linear(k1, n_units, fcfg.hidden),
        "k": init_linear(k2, n_units, fcfg.hidden),
        "v": init_linear(k3, n_units, fcfg.hidden),
        "o": init_linear(k4, fcfg.hidden, n_units),
        "norm": norm,
    }


def cross_channel_attention(
    p: Params, fcfg: FusionConfig, x: jnp.ndarray,
    train: bool = False, rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, C, T, D) -> (fused (B, C, T, D), attention (B, T, H, C, C))."""
    b, c, t, d = x.shape
    res = x
    h = jnp.einsum("bctd->btcd", x)
    nh, hd = fcfg.num_heads, fcfg.hidden // fcfg.num_heads

    def split(z):  # (B, T, C, hidden) -> (B*T, H, C, hd)
        return z.reshape(b * t, c, nh, hd).transpose(0, 2, 1, 3)

    q, k, v = split(linear(p["q"], h)), split(linear(p["k"], h)), split(linear(p["v"], h))
    scores = jnp.einsum("xhcd,xhed->xhce", q, k, preferred_element_type=jnp.float32)
    scores = scores.astype(jnp.float32) / np.sqrt(hd)
    att = jax.nn.softmax(scores, axis=-1)  # (B*T, H, C, C)
    p_att = dropout(rng, att, fcfg.dropout, train) if train else att
    out = jnp.einsum("xhce,xhed->xhcd", p_att.astype(v.dtype), v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, c, nh * hd)
    out = jnp.einsum("btcd->bctd", out)
    out = linear(p["o"], out)
    fused = layer_norm(p["norm"], out) + res
    return fused, att.reshape(b, t, nh, c, c)


def init_tac_fusion(rng, input_dim: int, fcfg: FusionConfig) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    norm = init_layer_norm(input_dim)
    norm["scale"] = norm["scale"] * fcfg.init_mult
    return {
        "input_tf": init_linear(k1, input_dim, fcfg.hidden),
        "input_prelu": jnp.full((1,), 0.25),
        "avg_tf": init_linear(k2, fcfg.hidden, fcfg.hidden),
        "avg_prelu": jnp.full((1,), 0.25),
        "concat_tf": init_linear(k3, 2 * fcfg.hidden, input_dim),
        "concat_prelu": jnp.full((1,), 0.25),
        "norm": norm,
    }


def _prelu(alpha: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


def tac_fusion(p: Params, fcfg: FusionConfig, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, C, T, D) -> fused; returns uniform attention for API parity."""
    b, c, t, d = x.shape
    out = _prelu(p["input_prelu"], linear(p["input_tf"], x))
    mean = _prelu(p["avg_prelu"], linear(p["avg_tf"], out.mean(axis=1)))
    mean = jnp.broadcast_to(mean[:, None], out.shape)
    out = jnp.concatenate([out, mean], axis=-1)
    out = _prelu(p["concat_prelu"], linear(p["concat_tf"], out))
    out = layer_norm(p["norm"], out) + x
    att = jnp.full((b, t, 1, c, c), 1.0 / c, dtype=jnp.float32)
    return out, att


def apply_fusion(p: Params, fcfg: FusionConfig, x, train=False, rng=None):
    if fcfg.kind == "cross_attention":
        return cross_channel_attention(p, fcfg, x, train=train, rng=rng)
    if fcfg.kind == "tac":
        return tac_fusion(p, fcfg, x)
    raise ValueError(fcfg.kind)


def init_fusions(rng, n_units: int, fcfg: FusionConfig) -> List[Params]:
    keys = jax.random.split(rng, fcfg.num_fusion_layers)
    if fcfg.kind == "cross_attention":
        return [init_cross_channel_attention(k, n_units, fcfg) for k in keys]
    return [init_tac_fusion(k, n_units, fcfg) for k in keys]


# ---------------------------------------------------------------------------
# MC feature extraction


def wavlm_extract_features_mc(
    params: Params,
    cfg: WavLMConfig,
    fusion_params: List[Params],
    fcfg: FusionConfig,
    waveforms: jnp.ndarray,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    feature_grad_mult: float = 0.1,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """(B, C, num_samples) -> (hidden_states, spatial_attentions).

    hidden_states: L+1 tensors — entries 0..N-1 are channel means of the
    fused (B, C, F, D) states, the rest are single-stream (B, F, D) (the MC
    model averages the 4-D entries, model_wavlm_conformer_mc.py:242-247).
    spatial_attentions: one (B, F, H, C, C) per fusion module.
    """
    b, c, t = waveforms.shape
    n_fuse = len(fusion_params)

    if cfg.normalize_waveform:
        mean = jnp.mean(waveforms, axis=-1, keepdims=True)
        var = jnp.var(waveforms, axis=-1, keepdims=True)
        waveforms = (waveforms - mean) * jax.lax.rsqrt(var + 1e-5)

    x = _feature_extractor(params, cfg, waveforms.reshape(b * c, t), compute_dtype)
    if feature_grad_mult != 1.0 and train:
        x = grad_multiply(x, feature_grad_mult)

    fp = params["feature_projection"]
    x = layer_norm(fp["norm"], x)
    x = linear(fp["proj"], x)
    if train and rng is not None:
        x = dropout(jax.random.fold_in(rng, 10_000), x, cfg.projection_dropout, train)

    x = x + _pos_conv(params, cfg, x)
    if not cfg.layer_norm_first:
        x = layer_norm(params["encoder_norm"], x)
    if train and rng is not None:
        x = dropout(jax.random.fold_in(rng, 10_001), x, cfg.dropout, train)

    f = x.shape[1]
    position_bias = compute_position_bias(params, cfg, f).astype(jnp.float32)

    # fusion 0 on the preprocessed input (components.py:1040-1043)
    x4 = x.reshape(b, c, f, -1)
    fuse_rng = jax.random.fold_in(rng, 30_000) if rng is not None else None
    x4, att0 = apply_fusion(fusion_params[0], fcfg, x4, train=train, rng=fuse_rng)
    hidden_states: List[jnp.ndarray] = [x4.mean(axis=1)]
    attentions: List[jnp.ndarray] = [att0]

    x = x4.reshape(b * c, f, -1)
    merged = False
    for i, layer in enumerate(params["layers"]):
        idx = i + 1
        x, _ = _encoder_layer(layer, cfg, i, x, position_bias, train, rng)
        if idx < n_fuse:
            x4 = x.reshape(b, c, f, -1)
            fr = jax.random.fold_in(rng, 30_000 + idx) if rng is not None else None
            x4, att = apply_fusion(fusion_params[idx], fcfg, x4, train=train, rng=fr)
            hidden_states.append(x4.mean(axis=1))
            attentions.append(att)
            x = x4.reshape(b * c, f, -1)
        elif idx == n_fuse and not merged:
            # merge: channel mean (rel-pos bias is channel-independent here)
            x = x.reshape(b, c, f, -1).mean(axis=1)
            merged = True
            hidden_states.append(x)
        else:
            hidden_states.append(x)
    return hidden_states, attentions


# ---------------------------------------------------------------------------
# MC EEND model


def init_eend_mc_params(rng: jax.Array, cfg: EendConfig, fcfg: FusionConfig):
    from diarizen_tpu.models.eend import init_eend_params

    k1, k2 = jax.random.split(rng)
    params, state = init_eend_params(k1, cfg)
    params["channel_fusions"] = init_fusions(k2, cfg.wavlm.embed_dim, fcfg)
    return params, state


def eend_mc_forward(
    params: Params,
    state: Params,
    cfg: EendConfig,
    fcfg: FusionConfig,
    waveforms: jnp.ndarray,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    num_train_channels: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Params]:
    """(B, C, T) -> (log-powerset scores (B, F, P), spatial attention
    (B, L, F, C, C), new_state).

    Train-time random channel truncation (k in [1, C]) must be done by the
    CALLER via `num_train_channels` (static under jit — pick k on host per
    step, reference model_wavlm_conformer_mc.py:262-265).
    """
    if num_train_channels is not None:
        waveforms = waveforms[:, :num_train_channels]

    wavlm_rng = jax.random.fold_in(rng, 0) if rng is not None else None
    hidden, atts = wavlm_extract_features_mc(
        params["wavlm"], cfg.wavlm, params["channel_fusions"], fcfg, waveforms,
        train=train, rng=wavlm_rng, compute_dtype=compute_dtype,
    )
    feat = jnp.stack(hidden, axis=-1)  # (B, F, D, L)
    w = params["weight_sum"].astype(feat.dtype)
    feat = jnp.einsum("bfdl,l->bfd", feat, w, preferred_element_type=jnp.float32)
    feat = feat.astype(compute_dtype)

    x = linear(params["proj"], feat)
    x = layer_norm(params["lnorm"], x)
    conf_rng = jax.random.fold_in(rng, 1) if rng is not None else None
    x, conformer_state = conformer_forward(
        params["conformer"], state["conformer"], cfg.conformer, x,
        train=train, rng=conf_rng,
    )
    logits = linear(params["classifier"], x).astype(jnp.float32)
    scores = jax.nn.log_softmax(logits, axis=-1)

    # (B, L, F, C, C): head-mean per fusion (model_wavlm_conformer_mc.py:279-281)
    att_out = jnp.stack([a.mean(axis=2) for a in atts], axis=1)
    return scores, att_out, {"conformer": conformer_state}


def attention_weighted_embeddings(
    per_channel_embeddings: np.ndarray, spatial_attention: np.ndarray,
    fusion_layer: int = 3,
) -> np.ndarray:
    """Fuse per-channel embeddings with spatial-attention channel weights
    (recipes/diar_ssl_mc/infer_avg.py:29-41 `att_enhanced_emb`).

    per_channel_embeddings : (num_chunks, C, S, D)
    spatial_attention : (num_chunks, L, F, C, C) — uses `fusion_layer`,
        averaged over frames and source channels -> per-channel weight.
    Returns (num_chunks, S, D).
    """
    att = spatial_attention[:, fusion_layer]  # (chunks, F, C, C)
    # raw means, NOT re-normalized: the reference uses them as-is
    # (infer_avg.py:35-37), and softmax attention rows already make the
    # per-chunk weights sum to 1 (mean over frames and source channels of
    # row-stochastic rows) — pinned by the live-reference oracle test
    weights = att.mean(axis=(1, 2))  # (chunks, C)
    return np.einsum("ncsd,nc->nsd", per_channel_embeddings, weights)

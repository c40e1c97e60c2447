"""WavLM / wav2vec2 speech encoder in pure functional JAX.

Capability parity with the reference factory (`diarizen/models/module/wav2vec2/
model.py:215,779` + `components.py`): 7-layer conv front-end (stride 320),
feature projection, convolutional positional embedding, transformer encoder
with WavLM gated relative-position bias, per-layer heterogeneous head subsets /
FF widths (pruned s80 checkpoints), LayerDrop, GradMultiply on conv output,
waveform layer-norm for Large, and `extract_features` returning all
intermediate hidden states (num_layers + 1 including the projected input).

TPU-first design notes:
  * channel-last (B, T, C) layouts throughout so XLA convs/matmuls tile onto
    the MXU without transposes;
  * layers are unrolled at trace time (12/24 layers) — this natively supports
    the heterogeneous per-layer shapes of pruned checkpoints where a stacked
    `lax.scan` could not without padding (SURVEY.md section 7 'hard parts');
  * the relative-position bucket matrix is a static numpy computation cached
    per sequence length, so only an (T, T) gather + gating runs on device;
  * attention materializes the (H, T, T) bias — T <= 799 for all diarization
    chunks, well within VMEM-friendly sizes.

The gated rel-pos bias is always derived from layer 0's embedding table and
shared by all layers (each layer applies its own query-dependent gate), which
matches reference eval semantics (components.py:668-725); the reference's
train-time LayerDrop quirk of losing the bias when layer 0 is dropped is not
replicated (we always compute the bias).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diarizen_tpu.models.common import (
    Params,
    attention,
    conv1d,
    dropout,
    gelu,
    grad_multiply,
    group_norm,
    init_conv1d,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)

_FLASH_OVERRIDE: Optional[bool] = None


def set_flash_attention(enabled: Optional[bool]) -> None:
    """Override the fused-bias Pallas attention toggle (None = auto: TPU only)."""
    global _FLASH_OVERRIDE
    _FLASH_OVERRIDE = enabled


def use_flash_attention() -> bool:
    if _FLASH_OVERRIDE is not None:
        return _FLASH_OVERRIDE
    return jax.default_backend() == "tpu"


_FUSED_LN_OVERRIDE: Optional[bool] = None


def set_fused_ln(enabled: Optional[bool]) -> None:
    """Override the Pallas fused residual+LN(+acc) toggle.

    Default OFF: measured s80 forward 16.4 -> 19.1 ms with the kernels ON
    (PERF.md round-4 "fused-LN negative result") — XLA's own fusion of the
    post-norm glue beats the hand-written kernels on this stack, which also
    sever fusion with the adjacent matmuls. Kept (parity- and grad-tested,
    ops/fused_ln.py) as the engineering record, same standard as
    ops/conv_chain.py."""
    global _FUSED_LN_OVERRIDE
    _FUSED_LN_OVERRIDE = enabled


def use_fused_ln() -> bool:
    return _FUSED_LN_OVERRIDE if _FUSED_LN_OVERRIDE is not None else False


# default conv stack: 16 kHz -> 50 Hz, 512 channels (components.py:1219-1221)
DEFAULT_CONV_LAYERS: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 2, 2),
    (512, 2, 2),
)


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    """Static architecture description (hashable; usable as a jit static arg)."""

    extractor_mode: str = "group_norm"  # "group_norm" (Base) | "layer_norm" (Large)
    conv_layers: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_LAYERS
    conv_bias: bool = False
    embed_dim: int = 768
    projection_dropout: float = 0.1
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    num_layers: int = 12
    use_attention: Tuple[bool, ...] = (True,) * 12
    use_feed_forward: Tuple[bool, ...] = (True,) * 12
    total_num_heads: Tuple[int, ...] = (12,) * 12
    remaining_heads: Tuple[Tuple[int, ...], ...] = tuple(tuple(range(12)) for _ in range(12))
    num_buckets: int = 320
    max_distance: int = 800
    attention_dropout: float = 0.1
    ff_interm_features: Tuple[int, ...] = (3072,) * 12
    ff_interm_dropout: float = 0.0
    dropout: float = 0.1
    layer_norm_first: bool = False  # False = post-LN (Base), True = pre-LN (Large)
    layer_drop: float = 0.05
    normalize_waveform: bool = False

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.total_num_heads[0]

    @property
    def conv_out_channels(self) -> int:
        return self.conv_layers[-1][0]

    @property
    def frame_stride(self) -> int:
        s = 1
        for _, _, stride in self.conv_layers:
            s *= stride
        return s

    def num_frames(self, num_samples: int) -> int:
        n = num_samples
        for _, kernel, stride in self.conv_layers:
            n = max(0, (n - kernel) // stride + 1)
        return n

    @staticmethod
    def base() -> "WavLMConfig":
        return WavLMConfig()

    @staticmethod
    def large() -> "WavLMConfig":
        n = 24
        return WavLMConfig(
            extractor_mode="layer_norm",
            conv_bias=False,
            embed_dim=1024,
            num_layers=n,
            use_attention=(True,) * n,
            use_feed_forward=(True,) * n,
            total_num_heads=(16,) * n,
            remaining_heads=tuple(tuple(range(16)) for _ in range(n)),
            ff_interm_features=(4096,) * n,
            layer_norm_first=True,
            layer_drop=0.1,
            normalize_waveform=True,
        )

    @staticmethod
    def base_s80_md() -> "WavLMConfig":
        """DiariZen-Base-s80 multi-domain pruned architecture (released
        checkpoint shapes; data from reference wavlm_config.py:114-168)."""
        return WavLMConfig(
            extractor_mode="group_norm",
            conv_layers=((90, 10, 5), (161, 3, 2), (173, 3, 2), (181, 3, 2),
                         (351, 3, 2), (155, 2, 2), (137, 2, 2)),
            embed_dim=768,
            num_layers=12,
            use_attention=(True, True, True, True, True, True, True, True,
                           False, False, True, True),
            use_feed_forward=(True,) * 12,
            total_num_heads=(12,) * 12,
            remaining_heads=(
                (1, 6), (5, 7, 8), (0, 3, 9), (0, 1, 4, 8, 11), (6, 8), (0,),
                (7, 8, 10, 11), (0, 1, 4, 8), (), (), (4, 7), (5,),
            ),
            ff_interm_features=(666, 660, 649, 1080, 237, 299, 437, 573, 53,
                                80, 211, 334),
            layer_norm_first=False,
            layer_drop=0.05,
            normalize_waveform=False,
        )

    @staticmethod
    def large_s80_md() -> "WavLMConfig":
        """DiariZen-Large-s80 multi-domain pruned architecture
        (reference wavlm_config.py:170-239)."""
        return WavLMConfig(
            extractor_mode="layer_norm",
            conv_layers=((512, 10, 5), (153, 3, 2), (224, 3, 2), (255, 3, 2),
                         (302, 3, 2), (368, 2, 2), (211, 2, 2)),
            embed_dim=1024,
            num_layers=24,
            use_attention=(True, True, True, True, True, True, True, True,
                           True, False, True, True, False, True, True, True,
                           False, False, True, True, True, True, True, True),
            use_feed_forward=(True,) * 24,
            total_num_heads=(16,) * 24,
            remaining_heads=(
                (1, 2, 4, 5, 6), (9, 10, 14), (0, 1, 2, 4, 5, 7),
                (1, 4, 7, 12, 13, 14), (0, 2, 3, 4, 13), (1, 7, 13, 14, 15),
                (11, 13, 15), (2, 3, 4, 8, 15), (2, 5, 6, 15), (), (0, 1),
                (1, 3, 5, 12), (), (4, 7, 11), (6, 9), (11,), (), (), (14,),
                (5, 15), (0, 2, 8, 11, 13, 15), (0, 1, 3, 4, 5, 6, 7, 10, 13),
                (0, 1, 3, 6, 7, 9, 10, 11, 12, 14), (1, 2, 3, 4, 7, 13, 14, 15),
            ),
            ff_interm_features=(1092, 925, 759, 646, 745, 615, 684, 958, 286,
                                294, 406, 377, 463, 542, 298, 236, 96, 104,
                                134, 211, 473, 1011, 1770, 1316),
            layer_norm_first=True,
            layer_drop=0.1,
            normalize_waveform=True,
        )

    @staticmethod
    def from_preset(name: str) -> "WavLMConfig":
        """Preset registry (reference wavlm_config.py get_config)."""
        presets = {
            "wavlm_base": WavLMConfig.base,
            "wavlm_base_plus": WavLMConfig.base,
            "wavlm_large": WavLMConfig.large,
            "wavlm_base_s80_md": WavLMConfig.base_s80_md,
            "wavlm_large_s80_md": WavLMConfig.large_s80_md,
        }
        if name.lower() not in presets:
            raise ValueError(f"unknown preset {name}; options: {sorted(presets)}")
        return presets[name.lower()]()

    @staticmethod
    def from_dict(d: dict) -> "WavLMConfig":
        """Rebuild from dataclasses.asdict JSON (lists -> tuples)."""
        d = dict(d)
        for k in ("conv_layers", "remaining_heads"):
            d[k] = tuple(tuple(x) for x in d[k])
        for k in ("use_attention", "use_feed_forward", "total_num_heads", "ff_interm_features"):
            d[k] = tuple(d[k])
        return WavLMConfig(**d)

    @staticmethod
    def from_reference_dict(cfg: dict) -> "WavLMConfig":
        """Build from the reference factory-kwargs dict format
        (`wavlm_config.py` presets / pruned checkpoint `config` payloads)."""
        n = cfg["encoder_num_layers"]
        return WavLMConfig(
            extractor_mode=cfg["extractor_mode"],
            conv_layers=tuple(tuple(l) for l in cfg["extractor_conv_layer_config"]),
            conv_bias=cfg["extractor_conv_bias"],
            embed_dim=cfg["encoder_embed_dim"],
            projection_dropout=cfg.get("encoder_projection_dropout", 0.1),
            pos_conv_kernel=cfg["encoder_pos_conv_kernel"],
            pos_conv_groups=cfg["encoder_pos_conv_groups"],
            num_layers=n,
            use_attention=tuple(cfg.get("encoder_use_attention", [True] * n)),
            use_feed_forward=tuple(cfg.get("encoder_use_feed_forward", [True] * n)),
            total_num_heads=tuple(cfg["encoder_total_num_heads"]),
            remaining_heads=tuple(tuple(h) for h in cfg["encoder_remaining_heads"]),
            num_buckets=cfg["encoder_num_buckets"],
            max_distance=cfg["encoder_max_distance"],
            attention_dropout=cfg.get("encoder_attention_dropout", 0.1),
            ff_interm_features=tuple(cfg["encoder_ff_interm_features"]),
            ff_interm_dropout=cfg.get("encoder_ff_interm_dropout", 0.0),
            dropout=cfg.get("encoder_dropout", 0.1),
            layer_norm_first=cfg["encoder_layer_norm_first"],
            layer_drop=cfg.get("encoder_layer_drop", 0.05),
            normalize_waveform=cfg["normalize_waveform"],
        )


# ---------------------------------------------------------------------------
# init


def init_wavlm_params(rng: jax.Array, cfg: WavLMConfig) -> Params:
    keys = iter(jax.random.split(rng, 64 + 8 * cfg.num_layers))

    conv_blocks = []
    in_ch = 1
    for i, (out_ch, kernel, stride) in enumerate(cfg.conv_layers):
        block: Params = {"conv": init_conv1d(next(keys), in_ch, out_ch, kernel, bias=cfg.conv_bias)}
        if (cfg.extractor_mode == "group_norm" and i == 0) or cfg.extractor_mode == "layer_norm":
            block["norm"] = init_layer_norm(out_ch)
        conv_blocks.append(block)
        in_ch = out_ch

    def trunc_normal(key, shape, std=0.02):
        return std * jax.random.normal(key, shape)

    d = cfg.embed_dim
    # pos-conv weight-norm split: w = g * v / ||v|| with the norm over (K, Cin)
    # per output position of dim=2 in torch layout (out, in, k) -> norm per k.
    k = cfg.pos_conv_kernel
    pos_v = init_conv1d(next(keys), d, d, k, bias=True, groups=cfg.pos_conv_groups)
    # torch weight_norm(dim=2) on (out, in/g, k): norm over (out, in/g) per k
    g = jnp.linalg.norm(pos_v["w"].reshape(k, -1), axis=-1)  # (k,)

    params: Params = {
        "feature_extractor": {"conv_layers": conv_blocks},
        "feature_projection": {
            "norm": init_layer_norm(cfg.conv_out_channels),
            "proj": init_linear(next(keys), cfg.conv_out_channels, d),
        },
        "pos_conv": {"v": pos_v["w"], "g": g, "b": pos_v["b"]},
        "encoder_norm": init_layer_norm(d),
        "rel_attn_embed": trunc_normal(next(keys), (cfg.num_buckets, cfg.total_num_heads[0])),
        "layers": [],
    }

    hd = cfg.head_dim
    for i in range(cfg.num_layers):
        layer: Params = {
            "attn_norm": init_layer_norm(d),
            "final_norm": init_layer_norm(d),
        }
        if cfg.use_attention[i]:
            nh = len(cfg.remaining_heads[i])
            layer["attn"] = {
                "q": init_linear(next(keys), d, nh * hd),
                "k": init_linear(next(keys), d, nh * hd),
                "v": init_linear(next(keys), d, nh * hd),
                "out": init_linear(next(keys), nh * hd, d),
                "gru_linear": init_linear(next(keys), hd, 8),
                "gru_const": jnp.ones((1, cfg.total_num_heads[i], 1, 1)),
            }
        if cfg.use_feed_forward[i]:
            ff = cfg.ff_interm_features[i]
            layer["ff"] = {
                "in": init_linear(next(keys), d, ff),
                "out": init_linear(next(keys), ff, d),
            }
        params["layers"].append(layer)
    return params


# ---------------------------------------------------------------------------
# relative position bias


@lru_cache(maxsize=32)
def _rel_pos_buckets(seq_len: int, num_buckets: int, max_distance: int) -> np.ndarray:
    """Static (T, T) bucket index matrix (reference components.py:629-666)."""
    context = np.arange(seq_len, dtype=np.int64)[:, None]
    memory = np.arange(seq_len, dtype=np.int64)[None, :]
    rel = memory - context
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1).astype(np.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets


def compute_position_bias(params: Params, cfg: WavLMConfig, seq_len: int) -> jnp.ndarray:
    """(H_total, T, T) additive attention bias from layer 0's bucket embedding."""
    buckets = jnp.asarray(_rel_pos_buckets(seq_len, cfg.num_buckets, cfg.max_distance))
    values = params["rel_attn_embed"][buckets]  # (T, T, H)
    return jnp.transpose(values, (2, 0, 1))


# ---------------------------------------------------------------------------
# forward


def _feature_extractor(
    params: Params, cfg: WavLMConfig, x: jnp.ndarray, compute_dtype, gates=None
) -> jnp.ndarray:
    """(B, num_samples) -> (B, F, conv_out). Conv stack + GN/LN + GELU.
    `gates["conv"][i]`, when present, is a HardConcrete channel mask applied
    after the activation (reference components.py:125-128)."""
    x = x[:, :, None].astype(compute_dtype)  # (B, T, 1)
    conv_gates = (gates or {}).get("conv")
    for i, (block, (out_ch, kernel, stride)) in enumerate(
        zip(params["feature_extractor"]["conv_layers"], cfg.conv_layers)
    ):
        # NOTE: a GEMM (even/odd phase) decomposition of these stride-2 convs
        # was measured SLOWER than XLA's conv lowering (the (T, C) -> (T/2, 2C)
        # relayout crosses the lane tiling); XLA conv it stays.
        x = conv1d(block["conv"], x, stride=stride)
        if "norm" in block:
            if cfg.extractor_mode == "group_norm" and i == 0:
                x = group_norm(block["norm"], x, num_groups=out_ch)
            else:
                x = layer_norm(block["norm"], x)
        x = gelu(x)
        if conv_gates is not None and conv_gates[i] is not None:
            x = x * conv_gates[i].astype(x.dtype)
    # the reference's `dummy_weight` (components.py:176-209): a per-channel
    # scale on the extractor output carrying the last conv layer's soft prune
    # mask — must be applied here, after GELU and before the projection LN
    # (folding it elsewhere is not numerically equivalent)
    if "output_scale" in params["feature_extractor"]:
        x = x * params["feature_extractor"]["output_scale"].astype(x.dtype)
    return x


def _packed_grouped_conv(
    w: jnp.ndarray, b: jnp.ndarray, x: jnp.ndarray, k: int, groups: int
) -> jnp.ndarray:
    """'same'-padded grouped conv via P=2 block-Toeplitz packing, trimmed to T.

    The grouped conv (k=128, g=16 for the pos-conv) is reformulated by packing
    P consecutive time steps into the channel dim: each group's conv becomes a
    DENSE conv with k/P+1 taps over P*(C/g) lanes. Measured on the v5e chip at
    (B=32, T=399, C=768): 5.9 ms for the per-group loop of thin convs,
    4.1 ms for feature_group_count, 2.9 ms packed (tools/probe_posconv2.py).
    Dense convs also sidestep the XLA SPMD grouped-conv gradient miscompile
    (see common.conv1d). FLOP overhead of packing: (k/P+1)*P/k = +1.6%.
    """
    P = 2
    assert k % P == 0
    kb = k // P + 1
    batch, t, c = x.shape
    cg = c // groups
    pad = k // 2
    # W2[j2, (a, ci), (tau, co)] = w[P*j2 + a - tau, ci, co] (zero when the
    # tap index leaves [0, k)); static index plan, one gather at trace time.
    j2 = np.arange(kb)[:, None, None]
    a = np.arange(P)[None, :, None]
    tau = np.arange(P)[None, None, :]
    src = P * j2 + a - tau  # (kb, P, P)
    valid = (src >= 0) & (src < k)
    src = np.where(valid, np.clip(src, 0, k - 1), k)  # k -> zero row
    w_ext = jnp.concatenate([w, jnp.zeros((1, cg, c), w.dtype)], axis=0)
    w2 = jnp.take(w_ext, jnp.asarray(src.reshape(-1)), axis=0)
    w2 = w2.reshape(kb, P, P, cg, c).transpose(0, 1, 3, 2, 4)  # (kb,P,ci,P,co)

    tp = -(-t // P) * P  # output length rounded up to a multiple of P
    xp = jnp.pad(x, ((0, 0), (pad, pad + (tp - t) + P), (0, 0)))
    nblk = xp.shape[1] // P
    xb = xp[:, : nblk * P].reshape(batch, nblk, P, c)
    outs = []
    for g in range(groups):
        xg = xb[..., g * cg:(g + 1) * cg].reshape(batch, nblk, P * cg)
        wg = w2[:, :, :, :, g * cg:(g + 1) * cg].reshape(kb, P * cg, P * cg)
        y = jax.lax.conv_general_dilated(
            xg, wg, (1,), [(0, 0)], dimension_numbers=("NWC", "WIO", "NWC"))
        outs.append(y[:, : tp // P].reshape(batch, tp, cg))
    return jnp.concatenate(outs, axis=-1)[:, :t] + b.astype(x.dtype)


def _pos_conv(params: Params, cfg: WavLMConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Weight-normed grouped conv positional embedding (components.py:317-380)."""
    p = params["pos_conv"]
    k = cfg.pos_conv_kernel
    g = cfg.pos_conv_groups
    v = p["v"].astype(jnp.float32)  # (K, Cin/g, Cout)
    norm = jnp.linalg.norm(v.reshape(k, -1), axis=-1, keepdims=True)  # per-k
    w = (p["g"].astype(jnp.float32)[:, None] * v.reshape(k, -1) / jnp.maximum(norm, 1e-12)).reshape(v.shape)
    if k % 2 == 0 and g > 1 and x.shape[-1] % g == 0:
        # even k: torch's symmetric k//2 pad yields T+1 frames and the
        # reference trims the last (components.py:368-374) — the packed form
        # computes frames [0, T) directly.
        y = _packed_grouped_conv(w.astype(x.dtype), p["b"], x, k, g)
    else:
        y = conv1d({"w": w.astype(x.dtype), "b": p["b"]}, x, padding=k // 2, groups=g)
        if k % 2 == 0:
            y = y[:, :-1]
    return gelu(y)


def _self_attention(
    layer: Params,
    cfg: WavLMConfig,
    i: int,
    x: jnp.ndarray,
    position_bias: Optional[jnp.ndarray],
    train: bool,
    rng: Optional[jax.Array],
    hc_gate=None,
) -> jnp.ndarray:
    """WavLM gated rel-pos self-attention (components.py:668-725)."""
    p = layer["attn"]
    b, t, d = x.shape
    total_heads = cfg.total_num_heads[i]
    remaining = cfg.remaining_heads[i]
    nh = len(remaining)
    hd = cfg.head_dim

    def split_heads(h):
        return h.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)

    # ONE fused qkv+gate GEMM instead of three thin projections plus a
    # per-head gate projection: reads the (B, T, D) activation once. The
    # GRU gate's per-head Linear(hd, 8) over ALL total_num_heads (reference
    # components.py:702-713 — it consumes raw x per head, not the pruned q)
    # becomes a block-diagonal (D, 8*Ht) column block, which also removes a
    # (B, T, D) -> (B, Ht, T, hd) transpose of the full activation per layer.
    parts_w = [p["q"]["w"], p["k"]["w"], p["v"]["w"]]
    parts_b = [p["q"]["b"], p["k"]["b"], p["v"]["b"]]
    if position_bias is not None:
        gw = p["gru_linear"]["w"].astype(jnp.float32)  # (hd, 8)
        blocks = jax.scipy.linalg.block_diag(*([gw] * total_heads))  # (D, 8*Ht)
        parts_w.append(blocks.astype(parts_w[0].dtype))
        parts_b.append(jnp.tile(p["gru_linear"]["b"], total_heads))
    wqkv = jnp.concatenate(parts_w, axis=1)
    bqkv = jnp.concatenate(parts_b)
    fused = linear({"w": wqkv, "b": bqkv}, x)
    q, k, v = (split_heads(h)
               for h in jnp.split(fused[..., : 3 * nh * hd], 3, axis=-1))

    bias = None
    gate_sel = None
    if position_bias is not None:
        # query-dependent GRU-style gate over ALL total_num_heads
        gates = fused[..., 3 * nh * hd :].reshape(b, t, total_heads, 8)
        gates = gates.transpose(0, 2, 1, 3)  # (B, Ht, T, 8)
        gates = jax.nn.sigmoid(gates.astype(jnp.float32).reshape(b, total_heads, t, 2, 4).sum(-1))
        gate_a, gate_b = gates[..., 0], gates[..., 1]  # (B, Ht, T)
        gate = gate_a * (gate_b * p["gru_const"].astype(jnp.float32)[:, :, :, 0] - 1.0) + 2.0
        rem_idx = np.asarray(remaining, dtype=np.int64)
        gate_sel = gate[:, rem_idx]  # (B, nh, T)
    # Pallas fused-bias flash kernel: the (B, H, T, T) gated bias and score
    # matrices never reach HBM. Train path uses the custom-VJP variant (flash
    # backward) with in-kernel deterministic attention dropout.
    use_flash = use_flash_attention() and gate_sel is not None
    if use_flash:
        from diarizen_tpu.ops.flash_attention import (
            flash_attention_gated_bias_trainable,
        )

        pos_sel = position_bias[np.asarray(remaining, dtype=np.int64)]  # (nh, T, T)
        rate = cfg.attention_dropout if (train and rng is not None) else 0.0
        seed = None
        if rate > 0.0:
            seed = jax.random.randint(
                jax.random.fold_in(rng, 2 * i), (), 0, np.iinfo(np.int32).max,
                dtype=jnp.int32,
            )
        if train:
            out = flash_attention_gated_bias_trainable(
                q, k, v, pos_sel, gate_sel, dropout_rate=rate, seed=seed
            )
        else:
            # inference path: skip the custom-vjp wrapper (which forces the
            # exact-f32 kernel for fwd/bwd consistency) so the configured
            # softmax schedule applies; nothing differentiates a
            # train=False forward, and Pallas would fail loudly if one did
            from diarizen_tpu.ops.flash_attention import (
                flash_attention_gated_bias,
            )

            out = flash_attention_gated_bias(q, k, v, pos_sel, gate_sel)
    else:
        if gate_sel is not None:
            bias = gate_sel[:, :, :, None] * position_bias[
                None, np.asarray(remaining, dtype=np.int64)
            ].astype(jnp.float32)  # (B, nh, T, T)
        drop_rng = jax.random.fold_in(rng, 2 * i) if (train and rng is not None) else None
        out = attention(q, k, v, bias=bias, dropout_rng=drop_rng,
                        dropout_rate=cfg.attention_dropout, train=train)
    if hc_gate is not None and hc_gate.get("heads") is not None:
        # HardConcrete head mask (components.py:520-523)
        out = out * hc_gate["heads"].astype(out.dtype)[None, :, None, None]
    out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
    out = linear(p["out"], out)
    if hc_gate is not None and hc_gate.get("attn_layer") is not None:
        out = out * hc_gate["attn_layer"].astype(out.dtype)
    return out


def _feed_forward(layer: Params, cfg: WavLMConfig, x: jnp.ndarray, train: bool,
                  rng: Optional[jax.Array], i: int, gate=None) -> jnp.ndarray:
    p = layer["ff"]
    h = gelu(linear(p["in"], x))
    if train and rng is not None:
        h = dropout(jax.random.fold_in(rng, 1000 + i), h, cfg.ff_interm_dropout, train)
    if gate is not None and gate.get("ff_interm") is not None:
        # HardConcrete intermediate mask (components.py:809-811)
        h = h * gate["ff_interm"].astype(h.dtype)
    y = linear(p["out"], h)
    if train and rng is not None:
        y = dropout(jax.random.fold_in(rng, 2000 + i), y, cfg.dropout, train)
    if gate is not None and gate.get("ff_layer") is not None:
        y = y * gate["ff_layer"].astype(y.dtype)
    return y


def _encoder_layer(
    layer: Params,
    cfg: WavLMConfig,
    i: int,
    x: jnp.ndarray,
    position_bias: Optional[jnp.ndarray],
    train: bool,
    rng: Optional[jax.Array],
    gate=None,
    ws_acc=None,
) -> jnp.ndarray:
    """Pre-LN (Large) or post-LN (Base) encoder layer (components.py:879-958).

    `ws_acc`: optional (w_scalar, acc_f32) for the fused weighted-sum mode —
    when the Pallas fused path is active, the final post-norm LN also folds
    `acc += w * x` into its HBM pass. Returns (x, acc_or_None)."""
    w_i, acc = ws_acc if ws_acc is not None else (None, None)
    # Pallas fused residual+LN glue: inference-path only (no custom VJP),
    # post-norm stacks, no HardConcrete gating
    fused = use_fused_ln() and not train and not cfg.layer_norm_first and gate is None
    if fused:
        from diarizen_tpu.ops.fused_ln import residual_ln, residual_ln_acc

    has_attn = cfg.use_attention[i] and "attn" in layer
    has_ff = cfg.use_feed_forward[i] and "ff" in layer
    if has_attn:
        residual = x
        h = layer_norm(layer["attn_norm"], x) if cfg.layer_norm_first else x
        h = _self_attention(layer, cfg, i, h, position_bias, train, rng, hc_gate=gate)
        if train and rng is not None:
            h = dropout(jax.random.fold_in(rng, 3000 + i), h, cfg.dropout, train)
        if fused:
            # fold the residual add into the post-norm attn LN pass
            x = residual_ln(residual, h, layer["attn_norm"]["scale"],
                            layer["attn_norm"]["bias"])
        else:
            x = residual + h

    if cfg.layer_norm_first:
        if has_ff:
            x = x + _feed_forward(
                layer, cfg, layer_norm(layer["final_norm"], x), train, rng, i, gate=gate
            )
        if acc is not None:
            acc = acc + w_i * x.astype(jnp.float32)
        return x, acc

    # post-norm: LNs always applied even when sublayers are pruned away
    if not (has_attn and fused):
        x = layer_norm(layer["attn_norm"], x)
    if has_ff:
        ff_out = _feed_forward(layer, cfg, x, train, rng, i, gate=gate)
        if fused and acc is not None:
            x, acc = residual_ln_acc(
                x, ff_out, layer["final_norm"]["scale"],
                layer["final_norm"]["bias"], w_i, acc,
            )
            return x, acc
        if fused:
            x = residual_ln(x, ff_out, layer["final_norm"]["scale"],
                            layer["final_norm"]["bias"])
            return x, acc
        x = x + ff_out
    x = layer_norm(layer["final_norm"], x)
    if acc is not None:
        acc = acc + w_i * x.astype(jnp.float32)
    return x, acc


def wavlm_extract_features(
    params: Params,
    cfg: WavLMConfig,
    waveforms: jnp.ndarray,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    feature_grad_mult: float = 0.1,
    gates=None,
    layer_weights: Optional[jnp.ndarray] = None,
) -> List[jnp.ndarray]:
    """(B, num_samples) -> list of num_layers+1 hidden states (B, F, D).

    Mirrors reference `Wav2Vec2Model.extract_features` (model.py:67-119):
    waveform layer-norm (Large), conv front-end, GradMultiply, projection,
    pos-conv, per-layer intermediate collection.

    `layer_weights` (num_layers+1,) switches to the fused weighted-sum mode:
    returns a single f32 (B, F, D) tensor == einsum("bfdl,l->bfd",
    stack(hidden, -1), layer_weights) without materializing the stack.
    """
    if cfg.num_frames(waveforms.shape[-1]) < 1:
        raise ValueError(
            f"input of {waveforms.shape[-1]} samples is shorter than the conv "
            f"receptive field ({cfg.frame_stride + 80} samples) — zero output frames"
        )
    if cfg.normalize_waveform:
        mean = jnp.mean(waveforms, axis=-1, keepdims=True)
        var = jnp.var(waveforms, axis=-1, keepdims=True)
        waveforms = (waveforms - mean) * jax.lax.rsqrt(var + 1e-5)

    x = _feature_extractor(params, cfg, waveforms, compute_dtype, gates=gates)
    if feature_grad_mult != 1.0 and train:
        x = grad_multiply(x, feature_grad_mult)

    # feature projection
    fp = params["feature_projection"]
    x = layer_norm(fp["norm"], x)
    x = linear(fp["proj"], x)
    if train and rng is not None:
        x = dropout(jax.random.fold_in(rng, 10_000), x, cfg.projection_dropout, train)

    # transformer preprocess: pos conv (+ LN for post-norm stacks) + dropout
    x = x + _pos_conv(params, cfg, x)
    if not cfg.layer_norm_first:
        # Transformer is built with layer_norm_first = not encoder flag
        # (components.py:1594-1599): Base applies LN after pos-conv here.
        x = layer_norm(params["encoder_norm"], x)
    if train and rng is not None:
        x = dropout(jax.random.fold_in(rng, 10_001), x, cfg.dropout, train)

    position_bias = compute_position_bias(params, cfg, x.shape[1]).astype(jnp.float32)

    layer_gates = (gates or {}).get("layers")
    if layer_weights is not None:
        # fused weighted sum: accumulate w[l] * hidden_l inside the loop so
        # the (B, F, D, L) stack never materializes in HBM (~1.2 ms/batch on
        # the s80 forward, PERF.md) — math-identical to stacking then
        # einsum'ing in f32, and the gradient w.r.t. layer_weights is the
        # same per-layer inner product.
        w = layer_weights.astype(jnp.float32)
        acc = w[0] * x.astype(jnp.float32)
    hidden_states = [x]
    for i, layer in enumerate(params["layers"]):
        gate = layer_gates[i] if layer_gates is not None else None
        # the per-layer acc update rides inside the layer's final-LN Pallas
        # pass when the fused path is active (ws_acc); layer_drop (train) is
        # incompatible with in-layer accumulation -> keep it external there
        fuse_acc = (
            layer_weights is not None
            and not (train and cfg.layer_drop > 0.0 and rng is not None)
        )
        new_x, new_acc = _encoder_layer(
            layer, cfg, i, x, position_bias, train, rng, gate=gate,
            ws_acc=(w[i + 1], acc) if fuse_acc else None,
        )
        if train and cfg.layer_drop > 0.0 and rng is not None:
            keep = jax.random.bernoulli(
                jax.random.fold_in(rng, 20_000 + i), 1.0 - cfg.layer_drop
            )
            new_x = jnp.where(keep, new_x, x)
        x = new_x
        if layer_weights is not None:
            acc = new_acc if fuse_acc else acc + w[i + 1] * x.astype(jnp.float32)
        else:
            hidden_states.append(x)
    if layer_weights is not None:
        return acc
    return hidden_states


def wavlm_forward(
    params: Params,
    cfg: WavLMConfig,
    waveforms: jnp.ndarray,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Final-layer features (B, F, D), with final LN for pre-norm stacks."""
    hs = wavlm_extract_features(
        params, cfg, waveforms, train=train, rng=rng, compute_dtype=compute_dtype
    )
    x = hs[-1]
    if cfg.layer_norm_first:
        x = layer_norm(params["encoder_norm"], x)
    return x


# ---------------------------------------------------------------------------
# analytics (reference: get_num_params/get_num_macs counters threaded through
# components.py — used by the pruning recipe's sparsity objective)


def count_params(params: Params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))


def count_macs(cfg: WavLMConfig, num_samples: int = 16000) -> int:
    """Analytic MAC count for 1 s of audio (parity with components.py counters)."""
    macs = 0
    t = num_samples
    in_ch = 1
    for out_ch, kernel, stride in cfg.conv_layers:
        t = (t - kernel) // stride + 1
        macs += t * kernel * in_ch * out_ch
        in_ch = out_ch
    d = cfg.embed_dim
    macs += t * in_ch * d  # projection
    macs += t * cfg.pos_conv_kernel * d * d // cfg.pos_conv_groups  # pos conv
    hd = cfg.head_dim
    for i in range(cfg.num_layers):
        if cfg.use_attention[i]:
            nh = len(cfg.remaining_heads[i])
            macs += 4 * t * nh * d * hd + 2 * t * t * nh * hd
        if cfg.use_feed_forward[i]:
            macs += 2 * t * d * cfg.ff_interm_features[i]
    return macs

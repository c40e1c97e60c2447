"""WeSpeaker ResNet34 speaker-embedding model in JAX (inference path).

Capability parity with the reference
(pyannote-audio/pyannote/audio/models/embedding/wespeaker/resnet.py:213-398 +
blocks/pooling.py:32-129): fbank (80 mel) treated as a 1-channel 2-D image,
ResNet34 (m_channels 32, blocks [3,4,6,3]), masked weighted statistics
pooling (mean + unbiased std), Linear -> 256-d embedding
(two_emb_layer=False — the wespeaker-voxceleb-resnet34-LM configuration,
whose forward returns the first segment embedding, wespeaker/__init__.py:204).

TPU-first: NHWC layout with (H=mel, W=time) so convs tile onto the MXU;
BatchNorm is eval-mode (running stats) — the embedding model is used
pretrained and frozen in every reference recipe.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diarizen_tpu.models.fbank import num_fbank_frames, wespeaker_fbank

Params = dict


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    m_channels: int = 32
    num_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    feat_dim: int = 80
    embed_dim: int = 256
    two_emb_layer: bool = False
    # Lane-packed stem: run conv1/layer1 at p=4 and layer2 at p=2 packed
    # time-positions per 128-lane register (see _packed_conv). Math-identical
    # to the plain path (same MAC set, XLA f32 re-association only); ~3x
    # faster on TPU where C=32/64 channel dims waste MXU lanes and pad HBM
    # tiles. Disable for debugging only.
    packed_stem: bool = True

    @property
    def stats_dim(self) -> int:
        return (self.feat_dim // 8) * self.m_channels * 8

    def num_frames(self, num_samples: int) -> int:
        """Output frames for raw-audio input (fbank + 3 stride-2 stages)."""
        t = num_fbank_frames(num_samples)
        for _ in range(3):
            t = (t + 1) // 2  # conv k=3 s=2 p=1
        return t


def _conv2d(p: Params, x: jnp.ndarray, stride: int = 1, padding: int = 1) -> jnp.ndarray:
    """NHWC conv; weight stored HWIO."""
    return jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Eval-mode BatchNorm2d over the channel (last) axis."""
    scale = (p["scale"] * jax.lax.rsqrt(p["var"] + eps)).astype(x.dtype)
    bias = (p["bias"] - p["mean"] * p["scale"] * jax.lax.rsqrt(p["var"] + eps)).astype(x.dtype)
    return x * scale + bias


def _basic_block(p: Params, x: jnp.ndarray, stride: int, mask=None) -> jnp.ndarray:
    out = jax.nn.relu(_bn(p["bn1"], _conv2d(p["conv1"], x, stride=stride)))
    if mask is not None:
        out = out * mask.astype(out.dtype)
    out = _bn(p["bn2"], _conv2d(p["conv2"], out))
    if "shortcut_conv" in p:
        sc = _bn(p["shortcut_bn"], _conv2d(p["shortcut_conv"], x, stride=stride, padding=0))
    else:
        sc = x
    return jax.nn.relu(out + sc)


# ---------------------------------------------------------------------------
# Lane-packed stem.
#
# TPU vector registers are (8, 128): an NHWC array with C=32 is physically
# lane-padded 32 -> 128 by XLA (4x wasted HBM tiles and MXU lanes), which is
# why the early ResNet layers measure ~6 TF/s while the same conv at C=128
# measures ~131 TF/s on the same chip (tools/probe_conv128.py). Fix: keep
# the stem in a packed layout (B, H, W/p, p*C) — a pure row-major reshape of
# (B, H, W, C) since W is immediately major to C — and convolve with a
# block-Toeplitz kernel holding p shifted copies of the 3x3 weights. Same
# MAC set as the plain conv (plus structured zeros), full lane utilization.
#
# p_in == stride * p_out for every conv in the stem, so one packed group of
# the input maps to exactly one packed group of the output and the conv over
# groups always has stride 1 along W (H keeps its native stride).


@functools.lru_cache(maxsize=None)
def _toeplitz_sel(kw: int, p_in: int, p_out: int, stride: int):
    """0/1 scatter tensor (G, p_in, p_out, kw) + W-axis group padding.

    sel[g, s, j, dw] = 1 iff packed output slot j's tap dw reads packed
    input slot s of group offset g (relative to the output group).
    """
    pad = (kw - 1) // 2
    taps = [(j, dw) for j in range(p_out) for dw in range(kw)]
    gs = [(stride * j + dw - pad) // p_in for j, dw in taps]
    lo, hi = min(gs), max(gs)
    sel = np.zeros((hi - lo + 1, p_in, p_out, kw), np.float32)
    for (j, dw), g in zip(taps, gs):
        s = (stride * j + dw - pad) - g * p_in
        sel[g - lo, s, j, dw] = 1.0
    return sel, -lo, hi


def _packed_conv(
    x4: jnp.ndarray, w: jnp.ndarray, p_in: int, p_out: int, stride: int
) -> jnp.ndarray:
    """Packed conv: x4 (B, H, W', p_in*Cin) -> (B, H/stride, W', p_out*Cout).

    w is the PLAIN (kh, kw, Cin, Cout) kernel; the block-Toeplitz packed
    kernel is built in-graph (tiny einsum with a constant 0/1 tensor, so the
    param pytree and checkpoint converters are untouched).
    """
    kh, kw, ci, co = w.shape
    sel, pad_lo, pad_hi = _toeplitz_sel(kw, p_in, p_out, stride)
    wp = jnp.einsum("gsjd,hdio->hgsijo", jnp.asarray(sel, w.dtype), w)
    wp = wp.reshape(kh, sel.shape[0], p_in * ci, p_out * co)
    pad_h = (kh - 1) // 2
    return jax.lax.conv_general_dilated(
        x4,
        wp.astype(x4.dtype),
        (stride, 1),
        [(pad_h, pad_h), (pad_lo, pad_hi)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn_packed(p: Params, x4: jnp.ndarray, p_out: int) -> jnp.ndarray:
    if p_out == 1:
        return _bn(p, x4)
    return _bn({k: jnp.tile(v, p_out) for k, v in p.items()}, x4)


def _tail_mask(groups: int, p: int, c: int, valid: int) -> Optional[jnp.ndarray]:
    """Lane mask zeroing packed time-positions >= valid (conv pad-0 parity:
    a plain conv's window past the true width reads zero padding, so any
    tail garbage — BN bias after ReLU — must be re-zeroed before the next
    conv consumes it)."""
    if valid >= groups * p:
        return None
    m = (np.arange(groups * p) < valid).astype(np.float32)
    m = np.repeat(m.reshape(groups, p, 1), c, axis=2).reshape(groups, p * c)
    return jnp.asarray(m)


def _apply_mask(x4: jnp.ndarray, m: Optional[jnp.ndarray]) -> jnp.ndarray:
    return x4 if m is None else x4 * m.astype(x4.dtype)


def _packed_block(
    p: Params, x4: jnp.ndarray, p_in: int, p_out: int, mask_out
) -> jnp.ndarray:
    """Basic block in packed space. stride = p_in // p_out (1 when p_in ==
    p_out, else the entry block's 2). mask_out re-zeroes tail positions at
    the block's output width."""
    stride = p_in // p_out
    out = jax.nn.relu(_bn_packed(p["bn1"], _packed_conv(x4, p["conv1"]["w"], p_in, p_out, stride), p_out))
    out = _apply_mask(out, mask_out)
    out = _bn_packed(p["bn2"], _packed_conv(out, p["conv2"]["w"], p_out, p_out, 1), p_out)
    if "shortcut_conv" in p:
        sc = _bn_packed(
            p["shortcut_bn"], _packed_conv(x4, p["shortcut_conv"]["w"], p_in, p_out, stride), p_out
        )
    else:
        sc = x4
    return _apply_mask(jax.nn.relu(out + sc), mask_out)


def _packed_stem(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """conv1 + layer1 (p=4) + layer2 (p=2) + layer3/4 (native) on
    (B, H, T, 1) fbank images; returns (B, H/8, ceil(T/2/2/2), C*8) with
    tail columns past the true output width zeroed-equivalent (they are
    sliced by the caller before pooling)."""
    b, h, t, _ = x.shape
    c = 32  # m_channels — packed path requires 4*c == 128
    t4 = -(-t // 4) * 4
    if t4 != t:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, t4 - t), (0, 0)))
    x4 = x.reshape(b, h, t4 // 4, 4)

    # conv1: Cin=1 image is just a p_in=4 packed conv with ci=1
    m1 = _tail_mask(t4 // 4, 4, c, t)
    x4 = jax.nn.relu(_bn_packed(params["bn1"], _packed_conv(x4, params["conv1"]["w"], 4, 4, 1), 4))
    x4 = _apply_mask(x4, m1)
    for bp in params["layer1"]:
        x4 = _packed_block(bp, x4, 4, 4, m1)

    v2 = -(-t // 2)  # valid width after the stride-2 entry conv
    m2 = _tail_mask(t4 // 4, 2, 2 * c, v2)
    x4 = _packed_block(params["layer2"][0], x4, 4, 2, m2)
    for bp in params["layer2"][1:]:
        x4 = _packed_block(bp, x4, 2, 2, m2)

    v3 = -(-v2 // 2)
    m3 = _tail_mask(t4 // 4, 1, 4 * c, v3)
    x = _packed_block(params["layer3"][0], x4, 2, 1, m3)  # native from here
    for bp in params["layer3"][1:]:
        x = _apply_mask(_basic_block(bp, x, 1, mask=m3), m3)

    v4 = -(-v3 // 2)
    m4 = _tail_mask(-(-(t4 // 4) // 2), 1, 8 * c, v4)
    x = _apply_mask(_basic_block(params["layer4"][0], x, 2, mask=m4), m4)
    for bp in params["layer4"][1:]:
        x = _apply_mask(_basic_block(bp, x, 1, mask=m4), m4)
    return x[:, :, :v4]


def stats_pool(
    features: jnp.ndarray, weights: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Weighted statistics pooling (reference blocks/pooling.py:44-75).

    features : (B, D, T)
    weights : (B, T) or (B, S, T) — nearest-interpolated to T if needed
    returns (B, 2D) or (B, S, 2D)
    """
    if weights is None:
        mean = jnp.mean(features, axis=-1)
        std = jnp.std(features, axis=-1, ddof=1)
        return jnp.concatenate([mean, std], axis=-1)

    squeeze = weights.ndim == 2
    if squeeze:
        weights = weights[:, None, :]  # (B, 1, T)

    t = features.shape[-1]
    tw = weights.shape[-1]
    if tw != t:
        # nearest interpolation (torch F.interpolate mode='nearest')
        src = np.floor(np.arange(t) * (tw / t)).astype(np.int64)
        weights = weights[..., src]

    w = weights[:, :, None, :].astype(jnp.float32)  # (B, S, 1, T)
    f = features[:, None, :, :].astype(jnp.float32)  # (B, 1, D, T)
    v1 = jnp.sum(w, axis=-1) + 1e-8  # (B, S, 1)
    mean = jnp.sum(f * w, axis=-1) / v1  # (B, S, D)
    dx2 = jnp.square(f - mean[..., None])
    v2 = jnp.sum(jnp.square(w), axis=-1)
    var = jnp.sum(dx2 * w, axis=-1) / (v1 - v2 / v1 + 1e-8)
    # gradient-safe sqrt: sqrt'(0) is inf, and a masked dead channel (all
    # zeros under the mask) has var exactly 0 — forward values are unchanged
    # beyond the 1e-12 floor (<=1e-6 absolute, far below oracle tolerances)
    # but the embedding trunk becomes trainable through the masked pool
    std = jnp.where(var > 0, jnp.sqrt(jnp.maximum(var, 1e-12)), 0.0)
    out = jnp.concatenate([mean, std], axis=-1)  # (B, S, 2D)
    return out[:, 0] if squeeze else out


def resnet_forward(
    params: Params,
    cfg: ResNetConfig,
    fbank: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, T, F=80) fbank [+ optional (B, T') or (B, S, T') weights] ->
    (B, embed) or (B, S, embed) speaker embeddings."""
    x = jnp.transpose(fbank, (0, 2, 1))[..., None]  # (B, F, T, 1)
    if cfg.packed_stem and cfg.m_channels == 32:
        x = _packed_stem(params, x)
    else:
        x = jax.nn.relu(_bn(params["bn1"], _conv2d(params["conv1"], x)))
        for li, blocks in enumerate([params["layer1"], params["layer2"], params["layer3"], params["layer4"]]):
            for bi, bp in enumerate(blocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                x = _basic_block(bp, x, stride)
    # (B, F/8, T/8, C) -> (B, D = C * F/8, T/8) matching torch
    # rearrange 'batch dimension channel frames' where torch layout is NCHW
    # (B, C, F/8, T/8) -> (B, (F/8 * C)? ) — torch TSTP rearranges
    # "batch dimension channel frames" from (B, C, H, W): dimension=C,
    # channel=H -> (B, C*H, W)
    b, h, w, c = x.shape
    feats = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c * h, w)  # (B, C*H, T/8)
    stats = stats_pool(feats, weights)  # (..., 2*C*H)
    emb = stats @ params["seg1"]["w"].astype(stats.dtype) + params["seg1"]["b"].astype(stats.dtype)
    if cfg.two_emb_layer:
        out = jax.nn.relu(emb)
        # seg_bn_1 is affine=False BatchNorm1d
        out = (out - params["seg_bn1"]["mean"]) * jax.lax.rsqrt(params["seg_bn1"]["var"] + 1e-5)
        emb = out @ params["seg2"]["w"].astype(out.dtype) + params["seg2"]["b"].astype(out.dtype)
    return emb


def embed_waveforms(
    params: Params,
    cfg: ResNetConfig,
    waveforms: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Raw (B, num_samples) waveforms -> embeddings; weights at any frame
    resolution (nearest-interpolated), reference wespeaker/__init__.py:190-204.

    `compute_dtype=jnp.bfloat16` runs the conv trunk in bf16 on the MXU
    (~2x throughput); the stats pool and embedding head stay f32
    (stats_pool upcasts internally). Default None = full f32 — bit-parity
    with the torch oracle for the DER gate."""
    fbank = wespeaker_fbank(waveforms)
    if compute_dtype is not None:
        fbank = fbank.astype(compute_dtype)
    return resnet_forward(params, cfg, fbank, weights)


# ---------------------------------------------------------------------------
# converter


def _conv_p(sd: Dict, key: str) -> Params:
    # torch OIHW -> HWIO
    return {"w": np.ascontiguousarray(np.asarray(sd[f"{key}.weight"]).transpose(2, 3, 1, 0))}


def _bn_p(sd: Dict, key: str) -> Params:
    return {
        "scale": np.asarray(sd[f"{key}.weight"]),
        "bias": np.asarray(sd[f"{key}.bias"]),
        "mean": np.asarray(sd[f"{key}.running_mean"]),
        "var": np.asarray(sd[f"{key}.running_var"]),
    }


def resnet_params_from_torch(state_dict: Dict, cfg: ResNetConfig) -> Params:
    """Reference WeSpeaker ResNet torch state dict ('resnet.'-stripped or
    raw 'conv1.' keys) -> params pytree."""
    sd = {}
    for k, v in state_dict.items():
        k = k[len("resnet."):] if k.startswith("resnet.") else k
        sd[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    params: Params = {"conv1": _conv_p(sd, "conv1"), "bn1": _bn_p(sd, "bn1")}
    in_planes = cfg.m_channels
    for li, n_blocks in enumerate(cfg.num_blocks, start=1):
        planes = cfg.m_channels * (2 ** (li - 1))
        blocks: List[Params] = []
        for bi in range(n_blocks):
            key = f"layer{li}.{bi}"
            bp: Params = {
                "conv1": _conv_p(sd, f"{key}.conv1"),
                "bn1": _bn_p(sd, f"{key}.bn1"),
                "conv2": _conv_p(sd, f"{key}.conv2"),
                "bn2": _bn_p(sd, f"{key}.bn2"),
            }
            stride = 2 if (li > 1 and bi == 0) else 1
            if stride != 1 or in_planes != planes:
                bp["shortcut_conv"] = _conv_p(sd, f"{key}.shortcut.0")
                bp["shortcut_bn"] = _bn_p(sd, f"{key}.shortcut.1")
            blocks.append(bp)
            in_planes = planes
        params[f"layer{li}"] = blocks

    params["seg1"] = {
        "w": np.ascontiguousarray(np.asarray(sd["seg_1.weight"]).T),
        "b": np.asarray(sd["seg_1.bias"]),
    }
    if cfg.two_emb_layer:
        params["seg_bn1"] = {
            "mean": np.asarray(sd["seg_bn_1.running_mean"]),
            "var": np.asarray(sd["seg_bn_1.running_var"]),
        }
        params["seg2"] = {
            "w": np.ascontiguousarray(np.asarray(sd["seg_2.weight"]).T),
            "b": np.asarray(sd["seg_2.bias"]),
        }
    return params


def init_resnet_params(rng: jax.Array, cfg: ResNetConfig) -> Params:
    """Random init (for tests; production uses pretrained WeSpeaker weights)."""
    keys = iter(jax.random.split(rng, 256))

    def conv(k, cin, cout, ksize=3):
        fan = cin * ksize * ksize
        return {"w": jax.random.normal(next(keys), (ksize, ksize, cin, cout)) / np.sqrt(fan)}

    def bn(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}

    params: Params = {"conv1": conv(next(keys), 1, cfg.m_channels), "bn1": bn(cfg.m_channels)}
    in_planes = cfg.m_channels
    for li, n_blocks in enumerate(cfg.num_blocks, start=1):
        planes = cfg.m_channels * (2 ** (li - 1))
        blocks = []
        for bi in range(n_blocks):
            stride = 2 if (li > 1 and bi == 0) else 1
            bp = {
                "conv1": conv(next(keys), in_planes, planes),
                "bn1": bn(planes),
                "conv2": conv(next(keys), planes, planes),
                "bn2": bn(planes),
            }
            if stride != 1 or in_planes != planes:
                bp["shortcut_conv"] = conv(next(keys), in_planes, planes, 1)
                bp["shortcut_bn"] = bn(planes)
            blocks.append(bp)
            in_planes = planes
        params[f"layer{li}"] = blocks
    d = cfg.stats_dim * 2
    params["seg1"] = {
        "w": jax.random.normal(next(keys), (d, cfg.embed_dim)) / np.sqrt(d),
        "b": jnp.zeros((cfg.embed_dim,)),
    }
    return params

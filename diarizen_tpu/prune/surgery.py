"""Prune surgery: collapse compiled HardConcrete masks into a smaller WavLM.

Host-side numpy pytree reshaping — parity with the reference in-place
`prune()` chain (components.py ConvLayerBlock/SelfAttention/FeedForward
.prune() + model.py:159-168): kept units' soft mask values are FOLDED into
the downstream weight matrix, pruned units' rows/columns are dropped, and a
new static `WavLMConfig` is emitted (per-layer remaining-head subsets,
heterogeneous FF widths, use_attention / use_feed_forward flags).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

from diarizen_tpu.models.wavlm import WavLMConfig
from diarizen_tpu.prune.hardconcrete import compiled_mask


def _np(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def apply_pruning(
    params: Dict, cfg: WavLMConfig, log_alphas: Dict
) -> Tuple[Dict, WavLMConfig]:
    """(gated params, cfg, log_alphas) -> (pruned params, pruned cfg)."""
    params = _np(params)
    masks = {}
    if "conv" in log_alphas:
        masks["conv"] = [compiled_mask(np.asarray(la)) for la in _np(log_alphas)["conv"]]
    layer_masks = [
        {k: compiled_mask(np.asarray(la)) for k, la in layer.items()}
        for layer in _np(log_alphas).get("layers", [{}] * cfg.num_layers)
    ]

    new_conv_layers = list(cfg.conv_layers)
    conv_blocks = params["feature_extractor"]["conv_layers"]

    if "conv" in masks:
        for i, mask in enumerate(masks["conv"]):
            keep = np.nonzero(mask)[0]
            assert len(keep) > 0, f"conv layer {i} pruned to zero channels"
            block = conv_blocks[i]
            block["conv"]["w"] = block["conv"]["w"][:, :, keep]  # (K, Cin, Cout)
            if "b" in block["conv"]:
                block["conv"]["b"] = block["conv"]["b"][keep]
            if "norm" in block:
                block["norm"]["scale"] = block["norm"]["scale"][keep]
                block["norm"]["bias"] = block["norm"]["bias"][keep]
            out_ch, kernel, stride = new_conv_layers[i]
            new_conv_layers[i] = (len(keep), kernel, stride)
            # fold mask into the consumer of these channels
            if i + 1 < len(conv_blocks):
                nxt = conv_blocks[i + 1]["conv"]
                nxt["w"] = (nxt["w"] * mask[None, :, None])[:, keep, :]
            else:
                # last layer: the mask must stay a post-GELU output scale
                # (the reference's dummy_weight — NOT foldable through the
                # projection LayerNorm); shrink the projection input dims
                prev = params["feature_extractor"].get(
                    "output_scale", np.ones_like(mask)
                )
                params["feature_extractor"]["output_scale"] = (prev * mask)[keep]
                fp = params["feature_projection"]
                fp["norm"]["scale"] = fp["norm"]["scale"][keep]
                fp["norm"]["bias"] = fp["norm"]["bias"][keep]
                fp["proj"]["w"] = fp["proj"]["w"][keep, :]

    hd = cfg.head_dim
    new_remaining = []
    new_use_attention = []
    new_use_ff = []
    new_ff_interm = []

    for i, layer in enumerate(params["layers"]):
        g = layer_masks[i] if i < len(layer_masks) else {}
        use_attn = cfg.use_attention[i] and "attn" in layer
        remaining = list(cfg.remaining_heads[i])

        if use_attn:
            a = layer["attn"]
            if "attn_layer" in g:
                lm = g["attn_layer"][0]
                a["out"]["w"] = a["out"]["w"] * lm
                if "b" in a["out"]:
                    a["out"]["b"] = a["out"]["b"] * lm
                if lm == 0.0:
                    use_attn = False
            if use_attn and "heads" in g:
                head_mask = g["heads"]
                keep_heads = np.nonzero(head_mask)[0]
                if len(keep_heads) == 0:
                    use_attn = False
                else:
                    full_mask = np.repeat(head_mask, hd)
                    full_keep = np.nonzero(full_mask)[0]
                    for proj in ("q", "k", "v"):
                        a[proj]["w"] = a[proj]["w"][:, full_keep]
                        a[proj]["b"] = a[proj]["b"][full_keep]
                    a["out"]["w"] = (a["out"]["w"] * full_mask[:, None])[full_keep, :]
                    remaining = [remaining[j] for j in keep_heads]
            if not use_attn:
                layer.pop("attn", None)
                remaining = []

        use_ff = cfg.use_feed_forward[i] and "ff" in layer
        ff_dim = cfg.ff_interm_features[i]
        if use_ff:
            f = layer["ff"]
            if "ff_layer" in g:
                lm = g["ff_layer"][0]
                f["out"]["w"] = f["out"]["w"] * lm
                if "b" in f["out"]:
                    f["out"]["b"] = f["out"]["b"] * lm
                if lm == 0.0:
                    use_ff = False
            if use_ff and "ff_interm" in g:
                im = g["ff_interm"]
                keep = np.nonzero(im)[0]
                if len(keep) == 0:
                    use_ff = False
                else:
                    f["in"]["w"] = f["in"]["w"][:, keep]
                    f["in"]["b"] = f["in"]["b"][keep]
                    f["out"]["w"] = (f["out"]["w"] * im[:, None])[keep, :]
                    ff_dim = len(keep)
            if not use_ff:
                layer.pop("ff", None)
                ff_dim = 0

        new_remaining.append(tuple(remaining))
        new_use_attention.append(use_attn)
        new_use_ff.append(use_ff)
        new_ff_interm.append(ff_dim)

    new_cfg = dataclasses.replace(
        cfg,
        conv_layers=tuple(new_conv_layers),
        remaining_heads=tuple(new_remaining),
        use_attention=tuple(new_use_attention),
        use_feed_forward=tuple(new_use_ff),
        ff_interm_features=tuple(new_ff_interm),
    )
    return params, new_cfg


def count_params_pytree(params) -> int:
    import jax

    return int(sum(np.prod(np.asarray(p).shape) for p in jax.tree_util.tree_leaves(params)))

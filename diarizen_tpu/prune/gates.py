"""Prunable-unit gate sets for WavLM + analytic parameter counting.

Mirrors which units the reference makes prunable
(components.py factories + wavlm `prune()` chain):
  * conv front-end channels (per conv layer),
  * attention heads (per encoder layer) + whole attention layers,
  * FF intermediate features (per layer) + whole FF layers,
  * optional `layerwise_prune` range restricting layer-level gates to layers
    [start, end] (1-based, components.py:1540-1551).

`log_alphas` is the trainable pytree; `sample_gates` / `compile_gates` turn
it into the concrete mask pytree consumed by `wavlm_extract_features(gates=)`.
`expected_num_params` is the differentiable parameter count used by the
Lagrangian sparsity objective (parity with the get_num_params counters
threaded through components.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diarizen_tpu.models.wavlm import WavLMConfig
from diarizen_tpu.prune.hardconcrete import (
    compiled_mask,
    init_log_alpha,
    l0_norm,
    sample_mask,
)


@dataclasses.dataclass(frozen=True)
class PruneConfig:
    prune_conv_channels: bool = False
    prune_attention_heads: bool = True
    prune_attention_layer: bool = True
    prune_feed_forward_intermediate: bool = True
    prune_feed_forward_layer: bool = True
    layerwise_prune_range: Optional[Tuple[int, int]] = None  # 1-based inclusive

    def layer_gates_enabled(self, i: int) -> Tuple[bool, bool]:
        """(attn_layer, ff_layer) gate enablement for 0-based layer i: inside
        the layerwise range both layer gates are forced on; outside it the
        global flags apply (components.py:1540-1551)."""
        if self.layerwise_prune_range is not None:
            lo, hi = self.layerwise_prune_range
            if lo - 1 <= i <= hi - 1:
                return True, True
        return self.prune_attention_layer, self.prune_feed_forward_layer


def init_gates(rng: jax.Array, cfg: WavLMConfig, pcfg: PruneConfig) -> Dict:
    """Trainable log_alpha pytree. init_mean 0.01 for layer/head gates, 0.5
    for FF intermediates (reference component defaults)."""
    keys = iter(jax.random.split(rng, 4 * cfg.num_layers + len(cfg.conv_layers) + 4))
    gates: Dict = {}
    if pcfg.prune_conv_channels:
        gates["conv"] = [
            init_log_alpha(next(keys), out_ch, init_mean=0.01)
            for out_ch, _, _ in cfg.conv_layers
        ]
    layers = []
    for i in range(cfg.num_layers):
        attn_l, ff_l = pcfg.layer_gates_enabled(i)
        layer: Dict = {}
        if cfg.use_attention[i]:
            if pcfg.prune_attention_heads:
                layer["heads"] = init_log_alpha(
                    next(keys), len(cfg.remaining_heads[i]), init_mean=0.01
                )
            if attn_l:
                layer["attn_layer"] = init_log_alpha(next(keys), 1, init_mean=0.01)
        if cfg.use_feed_forward[i]:
            if pcfg.prune_feed_forward_intermediate:
                layer["ff_interm"] = init_log_alpha(
                    next(keys), cfg.ff_interm_features[i], init_mean=0.5
                )
            if ff_l:
                layer["ff_layer"] = init_log_alpha(next(keys), 1, init_mean=0.01)
        layers.append(layer)
    gates["layers"] = layers
    return gates


def sample_gates(log_alphas: Dict, rng: jax.Array) -> Dict:
    """Train-time stochastic masks (same tree structure)."""
    leaves, treedef = jax.tree_util.tree_flatten(log_alphas)
    keys = jax.random.split(rng, len(leaves))
    masks = [sample_mask(la, k) for la, k in zip(leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, masks)


def compile_gates(log_alphas: Dict) -> Dict:
    """Deterministic eval masks (host numpy, hardconcrete.py:110-123)."""
    return jax.tree_util.tree_map(lambda la: jnp.asarray(compiled_mask(np.asarray(la))), log_alphas)


def expected_num_params(cfg: WavLMConfig, log_alphas: Dict) -> jnp.ndarray:
    """Differentiable WavLM parameter count under the gate distribution —
    mirrors the reference get_num_params chain (components.py counters):
    conv chain threads expected channel counts; attention/FF counts scale
    with expected heads/intermediates and layer gate l0s."""

    def l0_or(key_tree, path_default):
        return l0_norm(key_tree) if key_tree is not None else path_default

    total = jnp.asarray(0.0)
    conv_gates = log_alphas.get("conv")
    in_ch = jnp.asarray(1.0)
    for i, (out_ch, kernel, _) in enumerate(cfg.conv_layers):
        ch = l0_norm(conv_gates[i]) if conv_gates is not None else jnp.asarray(float(out_ch))
        n = in_ch * ch * kernel
        if cfg.conv_bias:
            n = n + ch
        if (cfg.extractor_mode == "group_norm" and i == 0) or cfg.extractor_mode == "layer_norm":
            n = n + 2 * ch
        total = total + n
        in_ch = ch
    total = total + in_ch  # dummy weight slot in the reference counter

    d = float(cfg.embed_dim)
    # feature projection: LN(in) + Linear(in -> d)
    total = total + in_ch * 2 + (in_ch + 1) * d
    # pos conv (never pruned): grouped conv + bias
    total = total + cfg.pos_conv_kernel * d * d / cfg.pos_conv_groups + d
    # transformer final LN
    total = total + 2 * d

    hd = float(cfg.head_dim)
    layer_gates = log_alphas.get("layers", [None] * cfg.num_layers)
    for i in range(cfg.num_layers):
        g = layer_gates[i] or {}
        total = total + 4 * d  # two layer norms
        if cfg.use_attention[i]:
            nh = (
                l0_norm(g["heads"])
                if g.get("heads") is not None
                else jnp.asarray(float(len(cfg.remaining_heads[i])))
            )
            attn = (d + 1) * nh * hd * 3 + (nh * hd + 1) * d
            if g.get("attn_layer") is not None:
                attn = attn * l0_norm(g["attn_layer"])
            total = total + attn
        if cfg.use_feed_forward[i]:
            ff = (
                l0_norm(g["ff_interm"])
                if g.get("ff_interm") is not None
                else jnp.asarray(float(cfg.ff_interm_features[i]))
            )
            ffn = (d + 1) * ff + (ff + 1) * d
            if g.get("ff_layer") is not None:
                ffn = ffn * l0_norm(g["ff_layer"])
            total = total + ffn
    # rel_attn_embed + gru gates are small and unpruned; include for accuracy
    total = total + cfg.num_buckets * cfg.total_num_heads[0]
    for i in range(cfg.num_layers):
        if cfg.use_attention[i]:
            total = total + (hd + 1) * 8 + cfg.total_num_heads[i]
    return total

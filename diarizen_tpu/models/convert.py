"""Torch checkpoint -> JAX pytree converters.

Supports the three torch formats the reference ecosystem produces:
  * HF `transformers.WavLMModel` state dicts (oracle for parity tests; also
    the upstream source of WavLM-Base+/Large weights);
  * the reference's custom WavLM format `{"config": dict, "state_dict": ...}`
    (diarizen/models/pruning/utils.py:103-138), incl. pruned s80 checkpoints
    with heterogeneous per-layer head subsets / FF widths;
  * full EEND segmentation model checkpoints (`pytorch_model.bin`).

torch is imported lazily and only used as a file reader — all conversion math
is numpy.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from diarizen_tpu.models.wavlm import WavLMConfig

Array = np.ndarray


def _to_numpy(t) -> Array:
    if isinstance(t, np.ndarray):
        return t
    # .copy(): torch .numpy() shares memory with the live tensor — without it,
    # later in-place updates (e.g. BatchNorm running stats) would corrupt the
    # converted params.
    return t.detach().cpu().numpy().copy()


def _linear(sd: Dict[str, Array], key: str) -> dict:
    p = {"w": np.ascontiguousarray(_to_numpy(sd[f"{key}.weight"]).T)}
    if f"{key}.bias" in sd:
        p["b"] = _to_numpy(sd[f"{key}.bias"])
    return p


def _norm(sd: Dict[str, Array], key: str) -> dict:
    return {"scale": _to_numpy(sd[f"{key}.weight"]), "bias": _to_numpy(sd[f"{key}.bias"])}


def _conv(sd: Dict[str, Array], key: str) -> dict:
    # torch (out, in/g, k) -> WIO (k, in/g, out)
    p = {"w": np.ascontiguousarray(_to_numpy(sd[f"{key}.weight"]).transpose(2, 1, 0))}
    if f"{key}.bias" in sd:
        p["b"] = _to_numpy(sd[f"{key}.bias"])
    return p


def _pos_conv(sd: Dict[str, Array], key: str) -> dict:
    """Weight-normed pos-conv: handle both parametrization key styles."""
    if f"{key}.parametrizations.weight.original0" in sd:
        g = _to_numpy(sd[f"{key}.parametrizations.weight.original0"])  # (1, 1, K)
        v = _to_numpy(sd[f"{key}.parametrizations.weight.original1"])  # (out, in/g, K)
    else:
        g = _to_numpy(sd[f"{key}.weight_g"])
        v = _to_numpy(sd[f"{key}.weight_v"])
    return {
        "g": np.ascontiguousarray(g.reshape(-1)),  # (K,)
        "v": np.ascontiguousarray(v.transpose(2, 1, 0)),  # (K, in/g, out)
        "b": _to_numpy(sd[f"{key}.bias"]),
    }


def wavlm_params_from_torch(state_dict: Dict, cfg: WavLMConfig) -> dict:
    """Map a torch WavLM state dict (HF `WavLMModel` layout or the reference
    custom layout) onto the `wavlm.py` parameter pytree."""
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}

    if any(k.startswith("encoder.transformer.") for k in sd):
        enc, layers_key = "encoder.feature_projection", "encoder.transformer.layers"
        pos_key = "encoder.transformer.pos_conv_embed.conv"
        enc_norm_key = "encoder.transformer.layer_norm"
    else:  # HF layout
        enc, layers_key = "feature_projection", "encoder.layers"
        pos_key = "encoder.pos_conv_embed.conv"
        enc_norm_key = "encoder.layer_norm"

    conv_blocks = []
    for i in range(len(cfg.conv_layers)):
        key = f"feature_extractor.conv_layers.{i}"
        block = {"conv": _conv(sd, f"{key}.conv")}
        if f"{key}.layer_norm.weight" in sd:
            block["norm"] = _norm(sd, f"{key}.layer_norm")
        conv_blocks.append(block)

    feature_extractor: dict = {"conv_layers": conv_blocks}
    # the reference's dummy_weight multiplies the extractor output AFTER the
    # conv GELU (components.py:176-209); for pruned checkpoints it carries
    # the last conv layer's soft mask values — keep it as an explicit
    # post-activation scale (identity ones for unpruned models)
    if "feature_extractor.dummy_weight" in sd:
        dummy = sd["feature_extractor.dummy_weight"]
        if not np.allclose(dummy, 1.0):
            feature_extractor["output_scale"] = dummy

    params = {
        "feature_extractor": feature_extractor,
        "feature_projection": {
            "norm": _norm(sd, f"{enc}.layer_norm"),
            "proj": _linear(sd, f"{enc}.projection"),
        },
        "pos_conv": _pos_conv(sd, pos_key),
        "encoder_norm": _norm(sd, enc_norm_key),
        "layers": [],
    }

    for i in range(cfg.num_layers):
        key = f"{layers_key}.{i}"
        layer = {
            "attn_norm": _norm(sd, f"{key}.layer_norm"),
            "final_norm": _norm(sd, f"{key}.final_layer_norm"),
        }
        if cfg.use_attention[i]:
            a = f"{key}.attention"
            layer["attn"] = {
                "q": _linear(sd, f"{a}.q_proj"),
                "k": _linear(sd, f"{a}.k_proj"),
                "v": _linear(sd, f"{a}.v_proj"),
                "out": _linear(sd, f"{a}.out_proj"),
                "gru_linear": _linear(sd, f"{a}.gru_rel_pos_linear"),
                "gru_const": _to_numpy(sd[f"{a}.gru_rel_pos_const"]),
            }
            if f"{a}.rel_attn_embed.weight" in sd:
                params["rel_attn_embed"] = _to_numpy(sd[f"{a}.rel_attn_embed.weight"])
        if cfg.use_feed_forward[i]:
            f = f"{key}.feed_forward"
            layer["ff"] = {
                "in": _linear(sd, f"{f}.intermediate_dense"),
                "out": _linear(sd, f"{f}.output_dense"),
            }
        params["layers"].append(layer)

    if "rel_attn_embed" not in params:
        raise ValueError("no rel_attn_embed found in state dict (layer 0 pruned?)")
    return params


def wavlm_config_from_hf(hf_config) -> WavLMConfig:
    """Build a WavLMConfig from a `transformers.WavLMConfig`
    (parity with diarizen/models/module/wav2vec2/utils/import_huggingface_wavlm.py:43-67)."""
    n = hf_config.num_hidden_layers
    heads = hf_config.num_attention_heads
    norm_mode = "layer_norm" if hf_config.feat_extract_norm == "layer" else "group_norm"
    conv_layers = tuple(
        (dim, k, s)
        for dim, k, s in zip(hf_config.conv_dim, hf_config.conv_kernel, hf_config.conv_stride)
    )
    return WavLMConfig(
        extractor_mode=norm_mode,
        conv_layers=conv_layers,
        conv_bias=hf_config.conv_bias,
        embed_dim=hf_config.hidden_size,
        projection_dropout=hf_config.feat_proj_dropout,
        pos_conv_kernel=hf_config.num_conv_pos_embeddings,
        pos_conv_groups=hf_config.num_conv_pos_embedding_groups,
        num_layers=n,
        use_attention=(True,) * n,
        use_feed_forward=(True,) * n,
        total_num_heads=(heads,) * n,
        remaining_heads=tuple(tuple(range(heads)) for _ in range(n)),
        num_buckets=hf_config.num_buckets,
        max_distance=hf_config.max_bucket_distance,
        attention_dropout=hf_config.attention_dropout,
        ff_interm_features=(hf_config.intermediate_size,) * n,
        ff_interm_dropout=hf_config.activation_dropout,
        dropout=hf_config.hidden_dropout,
        layer_norm_first=hf_config.do_stable_layer_norm,
        layer_drop=hf_config.layerdrop,
        normalize_waveform=hf_config.feat_extract_norm == "layer",
    )


def load_reference_wavlm_checkpoint(path: str) -> Tuple[WavLMConfig, dict]:
    """Load a reference-format `{"config": dict, "state_dict": ...}` WavLM
    checkpoint (incl. pruned s80 models)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    cfg = WavLMConfig.from_reference_dict(ckpt["config"])
    params = wavlm_params_from_torch(ckpt["state_dict"], cfg)
    return cfg, params


def strip_prefix(state_dict: Dict, prefix: str) -> Dict:
    """Select the sub-dict under `prefix.` and strip it."""
    plen = len(prefix) + 1
    return {k[plen:]: v for k, v in state_dict.items() if k.startswith(prefix + ".")}


def conformer_params_from_torch(state_dict: Dict, cfg) -> Tuple[dict, dict]:
    """Reference `ConformerEncoder` state dict -> (params, state).

    Key layout: conformer_layer.{i}.{ffn1,mha,conv,ffn2,ln_norm}.*
    (diarizen/models/module/conformer.py:259-325)."""
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    blocks, states = [], []
    for i in range(cfg.num_layers):
        key = f"conformer_layer.{i}"
        block = {
            "ffn1": {
                "norm": _norm(sd, f"{key}.ffn1.ln_norm"),
                "w1": _linear(sd, f"{key}.ffn1.w_1"),
                "w2": _linear(sd, f"{key}.ffn1.w_2"),
            },
            "mha": {
                "norm": _norm(sd, f"{key}.mha.ln_norm"),
                "q": _linear(sd, f"{key}.mha.mha.linearQ"),
                "k": _linear(sd, f"{key}.mha.mha.linearK"),
                "v": _linear(sd, f"{key}.mha.mha.linearV"),
                "o": _linear(sd, f"{key}.mha.mha.linearO"),
            },
            "conv": {
                "norm": _norm(sd, f"{key}.conv.ln_norm"),
                "pw1": _conv(sd, f"{key}.conv.pointwise_conv1"),
                "dw": _conv(sd, f"{key}.conv.depthwise_conv"),
                "bn": _norm(sd, f"{key}.conv.bn_norm"),
                "pw2": _conv(sd, f"{key}.conv.pointwise_conv2"),
            },
            "ffn2": {
                "norm": _norm(sd, f"{key}.ffn2.ln_norm"),
                "w1": _linear(sd, f"{key}.ffn2.w_1"),
                "w2": _linear(sd, f"{key}.ffn2.w_2"),
            },
            "final_norm": _norm(sd, f"{key}.ln_norm"),
        }
        blocks.append(block)
        states.append(
            {
                "bn": {
                    "mean": _to_numpy(sd[f"{key}.conv.bn_norm.running_mean"]),
                    "var": _to_numpy(sd[f"{key}.conv.bn_norm.running_var"]),
                }
            }
        )
    params = {"blocks": blocks}
    if "pos_emb.pe_k.weight" in sd:
        params["pos_emb"] = _to_numpy(sd["pos_emb.pe_k.weight"])
    return params, {"blocks": states}


def eend_params_from_torch(state_dict: Dict, cfg) -> Tuple[dict, dict]:
    """Reference WavLM+Conformer EEND model state dict (`pytorch_model.bin`)
    -> (params, state) for `eend.py` (model_wavlm_conformer.py:26-264)."""
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    conformer_params, conformer_state = conformer_params_from_torch(
        strip_prefix(sd, "conformer"), cfg.conformer
    )
    params = {
        "wavlm": wavlm_params_from_torch(strip_prefix(sd, "wavlm_model"), cfg.wavlm),
        "weight_sum": _to_numpy(sd["weight_sum.weight"]).reshape(-1),  # (1, L) -> (L,)
        "proj": _linear(sd, "proj"),
        "lnorm": _norm(sd, "lnorm"),
        "conformer": conformer_params,
        "classifier": _linear(sd, "classifier"),
    }
    return params, {"conformer": conformer_state}


def fusion_params_from_torch(state_dict: Dict, kind: str = "cross_attention") -> dict:
    """Reference `CrossChannelAttention` / `TACFusion` state dict -> params
    (diarizen/models/module/utils_mc.py:13-120)."""
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    if kind == "cross_attention":
        return {
            "q": _linear(sd, "linearQ"),
            "k": _linear(sd, "linearK"),
            "v": _linear(sd, "linearV"),
            "o": _linear(sd, "linearO"),
            "norm": _norm(sd, "ln_norm"),
        }
    return {
        "input_tf": _linear(sd, "input_tf.0"),
        "input_prelu": _to_numpy(sd["input_tf.1.weight"]),
        "avg_tf": _linear(sd, "avg_tf.0"),
        "avg_prelu": _to_numpy(sd["avg_tf.1.weight"]),
        "concat_tf": _linear(sd, "concat_tf.0"),
        "concat_prelu": _to_numpy(sd["concat_tf.1.weight"]),
        "norm": _norm(sd, "norm"),
    }


def eend_mc_params_from_torch(state_dict: Dict, cfg, num_fusions: int = 4,
                              fusion_kind: str = "cross_attention") -> Tuple[dict, dict]:
    """Reference MC EEND checkpoint -> (params, state); adds channel_fusions
    (model_wavlm_conformer_mc.py)."""
    params, state = eend_params_from_torch(state_dict, cfg)
    params["channel_fusions"] = [
        fusion_params_from_torch(
            strip_prefix(state_dict, f"channel_fusions.{i}"), fusion_kind
        )
        for i in range(num_fusions)
    ]
    return params, state


def load_eend_checkpoint(path: str, cfg):
    """Load a reference EEND diarization checkpoint (`pytorch_model.bin` or an
    averaged-checkpoint file) into (params, state)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return eend_params_from_torch(sd, cfg)

"""Model builders for the TOML config system.

Each builder mirrors a reference model class constructor signature
(`[model] path=... [model.args] ...` sections) and returns
`(config, params, state)` ready for training/inference.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from diarizen_tpu.models.conformer import ConformerConfig
from diarizen_tpu.models.eend import EendConfig, init_eend_params
from diarizen_tpu.models.wavlm import WavLMConfig


def _load_wavlm(wavlm_src: str, seed: int = 0):
    """Preset name ('wavlm_base'/'wavlm_large', random init) or a reference
    `{config, state_dict}` checkpoint path (incl. pruned s80 models)
    (reference model_wavlm_conformer.py:192-228 `load_wavlm`)."""
    try:
        return WavLMConfig.from_preset(wavlm_src), None
    except ValueError:
        pass
    from diarizen_tpu.models.convert import load_reference_wavlm_checkpoint

    return load_reference_wavlm_checkpoint(wavlm_src)


def wavlm_conformer(
    wavlm_src: str = "wavlm_base",
    wavlm_layer_num: int = 13,
    wavlm_feat_dim: int = 768,
    attention_in: int = 256,
    ffn_hidden: int = 1024,
    num_head: int = 4,
    num_layer: int = 4,
    kernel_size: int = 31,
    dropout: float = 0.1,
    use_posi: bool = False,
    output_activate_function=False,
    max_speakers_per_chunk: int = 4,
    max_speakers_per_frame: int = 2,
    chunk_size: float = 8,
    num_channels: int = 8,
    selected_channel: int = 0,
    sample_rate: int = 16000,
    seed: int = 0,
) -> Tuple[EendConfig, dict, dict]:
    """The main WavLM+Conformer EEND model
    (reference models/eend/model_wavlm_conformer.py:26)."""
    del num_channels
    wavlm_cfg, wavlm_params = _load_wavlm(wavlm_src, seed)
    cfg = EendConfig(
        wavlm=wavlm_cfg,
        conformer=ConformerConfig(
            dim=attention_in,
            ffn_hidden=ffn_hidden,
            num_heads=num_head,
            num_layers=num_layer,
            kernel_size=kernel_size,
            dropout=dropout,
            use_posi=use_posi,
            output_activation=output_activate_function or None,
        ),
        wavlm_layer_num=wavlm_layer_num,
        wavlm_feat_dim=wavlm_feat_dim,
        attention_in=attention_in,
        max_speakers_per_chunk=max_speakers_per_chunk,
        max_speakers_per_frame=max_speakers_per_frame,
        chunk_size=float(chunk_size),
        sample_rate=sample_rate,
        selected_channel=selected_channel,
    )
    params, state = init_eend_params(jax.random.PRNGKey(seed), cfg)
    if wavlm_params is not None:
        params["wavlm"] = wavlm_params
    return cfg, params, state


def fbank_conformer(
    attention_in: int = 256,
    ffn_hidden: int = 1024,
    num_head: int = 4,
    num_layer: int = 4,
    kernel_size: int = 31,
    dropout: float = 0.1,
    use_posi: bool = False,
    output_activate_function=False,
    max_speakers_per_chunk: int = 4,
    max_speakers_per_frame: int = 2,
    chunk_size: float = 5,
    num_channels: int = 8,
    selected_channel: int = 0,
    sample_rate: int = 16000,
    n_fft: int = 400,
    n_mels: int = 80,
    win_length: int = 25,
    hop_length: int = 10,
    seed: int = 0,
):
    """Fbank-Conformer EEND (reference models/eend/model_fbank_conformer.py)."""
    del num_channels, n_fft, win_length, hop_length
    from diarizen_tpu.models.fbank_eend import FbankEendConfig, init_fbank_eend_params

    cfg = FbankEendConfig(
        conformer=ConformerConfig(
            dim=attention_in, ffn_hidden=ffn_hidden, num_heads=num_head,
            num_layers=num_layer, kernel_size=kernel_size, dropout=dropout,
            use_posi=use_posi, output_activation=output_activate_function or None,
        ),
        n_mels=n_mels,
        attention_in=attention_in,
        max_speakers_per_chunk=max_speakers_per_chunk,
        max_speakers_per_frame=max_speakers_per_frame,
        chunk_size=float(chunk_size),
        sample_rate=sample_rate,
        selected_channel=selected_channel,
    )
    params, state = init_fbank_eend_params(jax.random.PRNGKey(seed), cfg)
    return cfg, params, state


def pyannote_baseline(
    max_speakers_per_chunk: int = 4,
    chunk_size: float = 8,
    num_channels: int = 8,
    selected_channel: int = 0,
    seed: int = 0,
):
    """SincNet-BiLSTM baseline (reference models/eend/model_pyannote.py)."""
    del num_channels
    from diarizen_tpu.models.sincnet_eend import (
        SincNetEendConfig,
        init_sincnet_eend_params,
    )

    cfg = SincNetEendConfig(
        max_speakers_per_chunk=max_speakers_per_chunk,
        chunk_size=float(chunk_size),
        selected_channel=selected_channel,
    )
    params = init_sincnet_eend_params(jax.random.PRNGKey(seed), cfg)
    return cfg, params, {}


def wavlm_conformer_mc(
    wavlm_src: str = "wavlm_base",
    fusion_kind: str = "cross_attention",
    num_fusion_layers: int = 4,
    fusion_hidden: int = 256,
    fusion_heads: int = 8,
    num_channels: int = 8,
    seed: int = 0,
    **kwargs,
):
    """Multi-channel WavLM+Conformer EEND
    (reference models/eend/model_wavlm_conformer_mc.py).

    Returns (McEendConfig, params, state) — one config object the Trainer and
    the MC recipe runner consume directly."""
    import dataclasses

    from diarizen_tpu.models.mc import FusionConfig, McEendConfig, init_fusions

    cfg, params, state = wavlm_conformer(
        wavlm_src=wavlm_src, num_channels=num_channels, seed=seed, **kwargs
    )
    fcfg = FusionConfig(
        kind=fusion_kind, num_fusion_layers=num_fusion_layers,
        hidden=fusion_hidden, num_heads=fusion_heads,
    )
    # shallow field copy (asdict would recurse into the nested configs)
    fields = {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)}
    mc_cfg = McEendConfig(**fields, fusion=fcfg, num_channels=num_channels)
    params["channel_fusions"] = init_fusions(
        jax.random.PRNGKey(seed + 1), mc_cfg.wavlm.embed_dim, fcfg
    )
    return mc_cfg, params, state

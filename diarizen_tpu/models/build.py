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


def _load_wavlm(wavlm_src: str, seed: int = 0, allow_missing: bool = False):
    """Preset name ('wavlm_base'/'wavlm_large', random init) or a reference
    `{config, state_dict}` checkpoint path (incl. pruned s80 models)
    (reference model_wavlm_conformer.py:192-228 `load_wavlm`).

    `allow_missing=True` (ONLY the `from_pretrained` snapshot loader sets
    it): a NON-existent checkpoint path — released artifacts ship
    training-time configs like `wavlm_src = "/YOUR_PATH/WavLM-Base+.pt"`
    (recipes/diar_ssl/conf/wavlm_updated_conformer.toml:38) — falls back to
    the preset architecture inferred from the filename, because
    `from_pretrained` overwrites every weight from the snapshot's own
    `pytorch_model.bin` right after the build. TRAINING entry points keep
    the default False and fail loudly, matching the reference `get_config`:
    a typo'd teacher path must never silently become random init."""
    try:
        return WavLMConfig.from_preset(wavlm_src), None
    except ValueError:
        pass
    import os

    if not os.path.isfile(wavlm_src):
        name = os.path.basename(str(wavlm_src)).lower()
        inferred = None
        if "large" in name:
            inferred = "wavlm_large_s80_md" if "s80" in name else "wavlm_large"
        elif "base" in name:
            inferred = "wavlm_base_s80_md" if "s80" in name else "wavlm_base"
        if allow_missing and inferred is not None:
            import warnings

            warnings.warn(
                f"wavlm_src {wavlm_src!r} does not exist; using the "
                f"{inferred!r} preset architecture (random init — load the "
                "real weights from the model checkpoint afterwards)",
                stacklevel=2,
            )
            return WavLMConfig.from_preset(inferred), None
        raise FileNotFoundError(
            f"wavlm_src {wavlm_src!r} is neither a preset name nor an "
            "existing checkpoint file"
        )
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
    _allow_missing_wavlm_src: bool = False,
) -> Tuple[EendConfig, dict, dict]:
    """The main WavLM+Conformer EEND model
    (reference models/eend/model_wavlm_conformer.py:26).
    `_allow_missing_wavlm_src` is set only by `pipelines.from_pretrained`
    (see _load_wavlm)."""
    del num_channels
    wavlm_cfg, wavlm_params = _load_wavlm(
        wavlm_src, seed, allow_missing=_allow_missing_wavlm_src
    )
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


def distill_prune(
    teacher_ckpt: str,
    student_ckpt: str = None,
    pruning_units: str = "conv,head,interm",
    distill_layers: str = "0,4,8,12",
    seed: int = 0,
):
    """Distill-prune "model": frozen teacher + gated student WavLM
    (reference models/pruning/model_distill_prune.py:11-55). Mirrors the
    reference constructor arg-for-arg; `student_ckpt` defaults to the
    teacher's (the reference recipes pass the same file for both).

    Returns (wavlm_cfg, params, state) like every builder; params holds
    {"teacher", "student", "log_alphas"} and state carries the PruneConfig +
    distill layer list the pruning runner consumes."""
    from diarizen_tpu.models.wavlm import init_wavlm_params
    from diarizen_tpu.prune.gates import PruneConfig, init_gates

    units = [u.strip() for u in str(pruning_units).split(",") if u.strip()]
    pcfg = PruneConfig(
        prune_conv_channels="conv" in units,
        prune_attention_heads="head" in units,
        prune_attention_layer="attlayer" in units,
        prune_feed_forward_intermediate="interm" in units,
        prune_feed_forward_layer="ffnlayer" in units,
    )
    wavlm_cfg, teacher = _load_wavlm(teacher_ckpt, seed)
    if teacher is None:
        teacher = init_wavlm_params(jax.random.PRNGKey(seed), wavlm_cfg)
    if student_ckpt is None or student_ckpt == teacher_ckpt:
        student = jax.tree_util.tree_map(lambda x: x.copy(), teacher)
    else:
        _, student = _load_wavlm(student_ckpt, seed)
        if student is None:
            student = jax.tree_util.tree_map(lambda x: x.copy(), teacher)
    gates = init_gates(jax.random.PRNGKey(seed + 1), wavlm_cfg, pcfg)
    layers = tuple(int(x) for x in str(distill_layers).split(","))
    params = {"teacher": teacher, "student": student, "log_alphas": gates}
    return wavlm_cfg, params, {"prune_config": pcfg, "distill_layers": layers}

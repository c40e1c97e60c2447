"""EEND segmentation models: WavLM + Conformer + powerset head.

Capability parity with the reference's main segmentation model
(diarizen/models/eend/model_wavlm_conformer.py:26-264): channel select ->
WavLM `extract_features` (L+1 hidden states) -> learned layer-weight sum
(Linear(L+1, 1) no bias) -> Linear(feat, attention_in) + LayerNorm ->
Conformer -> Linear(attention_in, num_powerset_classes) -> LogSoftmax.

Pure function over (params, state); `state` carries the Conformer's BatchNorm
running stats. The whole forward is jit-able at fixed chunk length.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from diarizen_tpu.models.common import Params, init_layer_norm, init_linear, layer_norm, linear
from diarizen_tpu.models.conformer import ConformerConfig, conformer_forward, init_conformer_params
from diarizen_tpu.models.wavlm import WavLMConfig, init_wavlm_params, wavlm_extract_features
from diarizen_tpu.ops.powerset import Powerset, num_powerset_classes
from diarizen_tpu.ops.receptive_field import (
    multi_conv_num_frames,
    multi_conv_receptive_field_center,
    multi_conv_receptive_field_size,
)


@dataclasses.dataclass(frozen=True)
class EendConfig:
    """Static config for the WavLM+Conformer segmentation model."""

    wavlm: WavLMConfig = WavLMConfig()
    conformer: ConformerConfig = ConformerConfig()
    wavlm_layer_num: int = 13  # num hidden states incl. conv output
    wavlm_feat_dim: int = 768
    attention_in: int = 256
    max_speakers_per_chunk: int = 4
    max_speakers_per_frame: int = 2
    chunk_size: float = 8.0  # seconds
    sample_rate: int = 16000
    selected_channel: int = 0

    @property
    def num_powerset_classes(self) -> int:
        return num_powerset_classes(self.max_speakers_per_chunk, self.max_speakers_per_frame)

    @property
    def powerset(self) -> Powerset:
        return Powerset(self.max_speakers_per_chunk, self.max_speakers_per_frame)

    def num_frames(self, num_samples: int) -> int:
        return self.wavlm.num_frames(num_samples)

    def rf_info(self) -> Tuple[float, float]:
        """(frame step seconds, frame duration seconds) of the model's output
        resolution — feeds the dataset rasterizer and the stitching engine
        (reference model_wavlm_conformer.py:178-190 `get_rf_info`)."""
        kernels = [k for _, k, _ in self.wavlm.conv_layers]
        strides = [s for _, _, s in self.wavlm.conv_layers]
        num_samples = int(self.chunk_size * self.sample_rate)
        nf = multi_conv_num_frames(num_samples, kernels, strides)
        rf_size = multi_conv_receptive_field_size(1, kernels, strides)
        c0 = multi_conv_receptive_field_center(0, kernels, strides)
        c1 = multi_conv_receptive_field_center(1, kernels, strides)
        step = (c1 - c0) / self.sample_rate
        duration = rf_size / self.sample_rate
        del nf
        return step, duration


def init_eend_params(rng: jax.Array, cfg: EendConfig) -> Tuple[Params, Params]:
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    conformer_params, conformer_state = init_conformer_params(k2, cfg.conformer)
    params: Params = {
        "wavlm": init_wavlm_params(k1, cfg.wavlm),
        # Linear(L, 1, bias=False) -> stored as an (L,) weight vector
        "weight_sum": jnp.full((cfg.wavlm_layer_num,), 1.0 / cfg.wavlm_layer_num),
        "proj": init_linear(k3, cfg.wavlm_feat_dim, cfg.attention_in),
        "lnorm": init_layer_norm(cfg.attention_in),
        "conformer": conformer_params,
        "classifier": init_linear(k5, cfg.attention_in, cfg.num_powerset_classes),
    }
    return params, {"conformer": conformer_state}


def eend_forward(
    params: Params,
    state: Params,
    cfg: EendConfig,
    waveforms: jnp.ndarray,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, Params]:
    """(B, C, num_samples) or (B, num_samples) -> log-powerset scores (B, F, P).

    Returns (scores, new_state).
    """
    if waveforms.ndim == 3:
        waveforms = waveforms[:, cfg.selected_channel, :]

    wavlm_rng = jax.random.fold_in(rng, 0) if rng is not None else None
    feat = wavlm_extract_features(
        params["wavlm"], cfg.wavlm, waveforms,
        train=train, rng=wavlm_rng, compute_dtype=compute_dtype,
        layer_weights=params["weight_sum"],  # fused in-loop (B, F, D) f32
    )
    feat = feat.astype(compute_dtype)

    x = linear(params["proj"], feat)
    x = layer_norm(params["lnorm"], x)

    conf_rng = jax.random.fold_in(rng, 1) if rng is not None else None
    x, conformer_state = conformer_forward(
        params["conformer"], state["conformer"], cfg.conformer, x, train=train, rng=conf_rng
    )

    logits = linear(params["classifier"], x).astype(jnp.float32)
    scores = jax.nn.log_softmax(logits, axis=-1)
    return scores, {"conformer": conformer_state}


def non_wavlm_param_labels(params: Params) -> Params:
    """Pytree of {'wavlm','other'} labels for optax.multi_transform — the
    dual-LR optimizer split (reference run_dual_opt.py:38-49 trains
    `wavlm_model.parameters()` at a small LR, everything else at a big LR)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "wavlm" if (path and getattr(path[0], "key", None) == "wavlm") else "other",
        params,
    )

"""SSeRiouSS: Self-Supervised Representation for Speaker Segmentation.

Reference parity: pyannote models/segmentation/SSeRiouSS.py (upstream
segmentation family retained by the fork): frozen wav2vec/WavLM features
(under no_grad, SSeRiouSS.py:291-295) -> softmax-weighted sum over the
transformer layers (or a single chosen layer) -> 4-layer bidirectional
LSTM(128) -> 2x Linear(128)+leaky_relu -> powerset classifier + LogSoftmax
(SSeRiouSS.py:278-317).

TPU-first: the trunk reuses this repo's WavLM (`wavlm_extract_features` with
the fused in-loop weighted sum when all layers are used), the LSTM is the
shared lax.scan head from models/common.py, and the frozen-trunk semantics
are `jax.lax.stop_gradient` on the features (gradients never flow into
WavLM, exactly like the reference's no_grad context).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from diarizen_tpu.models.common import (
    Params,
    dropout,
    init_linear,
    init_lstm_layer,
    linear,
    lstm_direction,
)
from diarizen_tpu.models.wavlm import WavLMConfig, init_wavlm_params, wavlm_extract_features
from diarizen_tpu.ops.powerset import Powerset, num_powerset_classes


@dataclasses.dataclass(frozen=True)
class SSeRiouSSConfig:
    wavlm: WavLMConfig = WavLMConfig()
    # -1: learned softmax weights over all transformer layer outputs
    # (reference wav2vec_layer<0, SSeRiouSS.py:124-127); >=1: that layer only.
    wav2vec_layer: int = -1
    lstm_hidden: int = 128
    lstm_layers: int = 4
    bidirectional: bool = True
    lstm_dropout: float = 0.0
    linear_hidden: int = 128
    linear_layers: int = 2
    max_speakers_per_chunk: int = 4
    max_speakers_per_frame: int = 2
    chunk_size: float = 8.0
    sample_rate: int = 16000
    selected_channel: int = 0

    @property
    def num_powerset_classes(self) -> int:
        return num_powerset_classes(
            self.max_speakers_per_chunk, self.max_speakers_per_frame
        )

    @property
    def powerset(self) -> Powerset:
        return Powerset(self.max_speakers_per_chunk, self.max_speakers_per_frame)

    def num_frames(self, num_samples: int) -> int:
        return self.wavlm.num_frames(num_samples)

    def rf_info(self) -> Tuple[float, float]:
        from diarizen_tpu.ops.receptive_field import (
            multi_conv_receptive_field_center,
            multi_conv_receptive_field_size,
        )

        kernels = [k for _, k, _ in self.wavlm.conv_layers]
        strides = [s for _, _, s in self.wavlm.conv_layers]
        size = multi_conv_receptive_field_size(1, kernels, strides)
        c0 = multi_conv_receptive_field_center(0, kernels, strides)
        c1 = multi_conv_receptive_field_center(1, kernels, strides)
        return (c1 - c0) / self.sample_rate, size / self.sample_rate


def init_sserious_params(rng: jax.Array, cfg: SSeRiouSSConfig) -> Params:
    keys = iter(jax.random.split(rng, cfg.lstm_layers + 8))
    lstm_out = cfg.lstm_hidden * (2 if cfg.bidirectional else 1)
    params: Params = {
        "wavlm": init_wavlm_params(next(keys), cfg.wavlm),
        # raw logits, softmax-normalized in the forward (SSeRiouSS.py:124-127)
        "wav2vec_weights": jnp.ones((cfg.wavlm.num_layers,)),
        "lstm": [],
        "linears": [],
        "classifier": None,
    }
    in_dim = cfg.wavlm.embed_dim
    for _ in range(cfg.lstm_layers):
        params["lstm"].append(
            init_lstm_layer(next(keys), in_dim, cfg.lstm_hidden, cfg.bidirectional)
        )
        in_dim = lstm_out
    in_features = lstm_out
    for _ in range(cfg.linear_layers):
        params["linears"].append(init_linear(next(keys), in_features, cfg.linear_hidden))
        in_features = cfg.linear_hidden
    params["classifier"] = init_linear(next(keys), in_features, cfg.num_powerset_classes)
    return params


def sserious_forward(
    params: Params,
    cfg: SSeRiouSSConfig,
    waveforms: jnp.ndarray,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """(B, C, T) or (B, T) -> log-powerset scores (B, F, P)."""
    if waveforms.ndim == 3:
        waveforms = waveforms[:, cfg.selected_channel, :]

    wavlm_rng = jax.random.fold_in(rng, 0) if rng is not None else None
    if cfg.wav2vec_layer < 0 and not train:
        # eval: gradients don't matter, so use the fused in-loop weighted sum
        # (never materializes the (B, F, D, L) stack) — softmax weights over
        # the *transformer* layer outputs only (torchaudio extract_features
        # excludes the projection output; SSeRiouSS.py:291-301), zero weight
        # on hidden state 0.
        w = jax.nn.softmax(params["wav2vec_weights"].astype(jnp.float32))
        x = wavlm_extract_features(
            params["wavlm"], cfg.wavlm, waveforms,
            train=False, rng=wavlm_rng, compute_dtype=compute_dtype,
            layer_weights=jnp.concatenate([jnp.zeros((1,)), w]),
        )
    else:
        # frozen trunk: the reference runs wav2vec under torch.no_grad and
        # applies the layer-weight sum OUTSIDE it (SSeRiouSS.py:291-301) —
        # stop gradients on every hidden state, then weight-sum so gradients
        # reach wav2vec_weights but never WavLM.
        hs = wavlm_extract_features(
            params["wavlm"], cfg.wavlm, waveforms,
            train=train, rng=wavlm_rng, compute_dtype=compute_dtype,
        )
        hs = [jax.lax.stop_gradient(h.astype(jnp.float32)) for h in hs]
        if cfg.wav2vec_layer < 0:
            w = jax.nn.softmax(params["wav2vec_weights"].astype(jnp.float32))
            stacked = jnp.stack(hs[1:], axis=-1)  # (B, F, D, L)
            x = jnp.einsum("bfdl,l->bfd", stacked, w)
        else:
            x = hs[cfg.wav2vec_layer]
    x = x.astype(compute_dtype)

    for li, layer in enumerate(params["lstm"]):
        fwd = lstm_direction(layer["fwd"], x, reverse=False)
        if cfg.bidirectional:
            bwd = lstm_direction(layer["bwd"], x, reverse=True)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            x = fwd
        if train and rng is not None and li < len(params["lstm"]) - 1:
            x = dropout(jax.random.fold_in(rng, 100 + li), x, cfg.lstm_dropout, train)

    for lin in params["linears"]:
        x = jax.nn.leaky_relu(linear(lin, x))
    logits = linear(params["classifier"], x).astype(jnp.float32)
    return jax.nn.log_softmax(logits, axis=-1)

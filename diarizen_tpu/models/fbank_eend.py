"""Fbank -> Conformer EEND segmentation model.

Capability parity with the reference fbank model
(diarizen/models/eend/model_fbank_conformer.py:20-184): SpeechBrain-style
80-mel log filterbank (25 ms / 10 ms centered STFT, n_fft 400) -> Linear(80,
attention_in) + LayerNorm -> Conformer -> powerset head -> LogSoftmax.

This architecture is always trained from scratch (the reference publishes no
fbank checkpoints), so the filterbank matches SpeechBrain's conventions
(hamming window, centered frames, HTK mel, dB log with top_db clamp) without
bit-level parity requirements. Like the kaldi fbank it is two MXU matmuls.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diarizen_tpu.models.common import Params, init_layer_norm, init_linear, layer_norm, linear
from diarizen_tpu.models.conformer import ConformerConfig, conformer_forward, init_conformer_params
from diarizen_tpu.ops.powerset import num_powerset_classes

SAMPLE_RATE = 16000
N_FFT = 400
WIN = 400  # 25 ms
HOP = 160  # 10 ms
N_MELS = 80
TOP_DB = 80.0


@lru_cache(maxsize=1)
def _sb_mel_banks() -> np.ndarray:
    """(n_fft//2+1, n_mels) HTK-mel triangular filters, f in [0, 8000]."""
    def mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def imel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    n_bins = N_FFT // 2 + 1
    pts = imel(np.linspace(mel(0.0), mel(SAMPLE_RATE / 2), N_MELS + 2))
    freqs = np.linspace(0, SAMPLE_RATE / 2, n_bins)
    banks = np.zeros((n_bins, N_MELS), dtype=np.float32)
    for m in range(N_MELS):
        left, center, right = pts[m], pts[m + 1], pts[m + 2]
        up = (freqs - left) / max(center - left, 1e-9)
        down = (right - freqs) / max(right - center, 1e-9)
        banks[:, m] = np.maximum(0.0, np.minimum(up, down))
    return banks


@lru_cache(maxsize=1)
def _dft() -> Tuple[np.ndarray, np.ndarray]:
    n = np.arange(WIN)[:, None]
    k = np.arange(N_FFT // 2 + 1)[None, :]
    angle = 2.0 * np.pi * n * k / N_FFT
    win = np.hamming(WIN)[:, None]
    return (np.cos(angle) * win).astype(np.float32), (np.sin(angle) * win).astype(np.float32)


def num_fbank_frames_centered(num_samples: int) -> int:
    return 1 + num_samples // HOP


def speechbrain_fbank(waveforms: jnp.ndarray) -> jnp.ndarray:
    """(B, num_samples) -> (B, 1 + n//hop, 80) log-mel (dB, top_db clamp)."""
    b, n = waveforms.shape
    pad = N_FFT // 2
    x = jnp.pad(waveforms, ((0, 0), (pad, pad)))
    t = num_fbank_frames_centered(n)
    frames = jax.lax.conv_general_dilated_patches(
        x[:, :, None].astype(jnp.float32),
        filter_shape=(WIN,),
        window_strides=(HOP,),
        padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[:, :t]  # (B, T, WIN)
    cos_m, sin_m = _dft()
    re = jnp.einsum("btn,nk->btk", frames, jnp.asarray(cos_m))
    im = jnp.einsum("btn,nk->btk", frames, jnp.asarray(sin_m))
    power = re * re + im * im
    mel = power @ jnp.asarray(_sb_mel_banks())
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    # SpeechBrain clamps at max - top_db per batch item
    peak = jnp.max(db, axis=(1, 2), keepdims=True)
    return jnp.maximum(db, peak - TOP_DB)


@dataclasses.dataclass(frozen=True)
class FbankEendConfig:
    conformer: ConformerConfig = ConformerConfig()
    n_mels: int = N_MELS
    attention_in: int = 256
    max_speakers_per_chunk: int = 4
    max_speakers_per_frame: int = 2
    chunk_size: float = 5.0
    sample_rate: int = SAMPLE_RATE
    selected_channel: int = 0

    @property
    def num_powerset_classes(self) -> int:
        return num_powerset_classes(self.max_speakers_per_chunk, self.max_speakers_per_frame)

    @property
    def powerset(self):
        from diarizen_tpu.ops.powerset import Powerset

        return Powerset(self.max_speakers_per_chunk, self.max_speakers_per_frame)

    def num_frames(self, num_samples: int) -> int:
        return num_fbank_frames_centered(num_samples)

    def rf_info(self) -> Tuple[float, float]:
        """(step s, duration s) — centered STFT frames
        (model_fbank_conformer.py:87-145)."""
        return HOP / self.sample_rate, N_FFT / self.sample_rate


def init_fbank_eend_params(rng: jax.Array, cfg: FbankEendConfig):
    k1, k2, k3 = jax.random.split(rng, 3)
    conformer_params, conformer_state = init_conformer_params(k1, cfg.conformer)
    params: Params = {
        "proj": init_linear(k2, cfg.n_mels, cfg.attention_in),
        "lnorm": init_layer_norm(cfg.attention_in),
        "conformer": conformer_params,
        "classifier": init_linear(k3, cfg.attention_in, cfg.num_powerset_classes),
    }
    return params, {"conformer": conformer_state}


def fbank_eend_forward(
    params: Params,
    state: Params,
    cfg: FbankEendConfig,
    waveforms: jnp.ndarray,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
):
    """(B, C, T) or (B, T) -> (log-powerset scores (B, F, P), new_state)."""
    if waveforms.ndim == 3:
        waveforms = waveforms[:, cfg.selected_channel, :]
    feats = speechbrain_fbank(waveforms).astype(compute_dtype)
    x = linear(params["proj"], feats)
    x = layer_norm(params["lnorm"], x)
    x, conformer_state = conformer_forward(
        params["conformer"], state["conformer"], cfg.conformer, x, train=train, rng=rng
    )
    logits = linear(params["classifier"], x).astype(jnp.float32)
    return jax.nn.log_softmax(logits, axis=-1), {"conformer": conformer_state}

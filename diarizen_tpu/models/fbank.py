"""Kaldi-compatible log-mel filterbank features in JAX.

Replicates `torchaudio.compliance.kaldi.fbank` with the WeSpeaker settings
(reference wespeaker/__init__.py:69-103: 80 mels, 25 ms frame, 10 ms shift,
dither 0, hamming window, no energy, snip_edges, x(1<<15) scaling, then CMN)
— the front-end of the speaker-embedding model.

TPU-first: framing is a gather, the DFT is a precomputed (frame_len, 2*nbins)
matmul (512-point FFT as an MXU matmul beats XLA FFT at this size), mel
projection is another matmul — the whole feature extractor is two GEMMs.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
FRAME_LENGTH = 400  # 25 ms
FRAME_SHIFT = 160  # 10 ms
N_FFT = 512
NUM_MEL_BINS = 80
PREEMPH = 0.97
LOW_FREQ = 20.0
HIGH_FREQ = 0.0  # offset from nyquist
EPS = 1.1920928955078125e-07  # float32 eps (torchaudio _get_epsilon)


def num_fbank_frames(num_samples: int) -> int:
    """snip_edges frame count: 1 + (N - frame_length) // shift."""
    if num_samples < FRAME_LENGTH:
        return 0
    return 1 + (num_samples - FRAME_LENGTH) // FRAME_SHIFT


def _mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


@lru_cache(maxsize=1)
def _mel_banks() -> np.ndarray:
    """(n_bins_fft=257, num_mel) kaldi triangular mel filterbank
    (torchaudio get_mel_banks; last fft bin column zero-padded)."""
    num_fft_bins = N_FFT // 2
    nyquist = 0.5 * SAMPLE_RATE
    high_freq = HIGH_FREQ if HIGH_FREQ > 0 else nyquist + HIGH_FREQ

    low_mel = _mel_scale(LOW_FREQ)
    high_mel = _mel_scale(high_freq)
    mel_delta = (high_mel - low_mel) / (NUM_MEL_BINS + 1)

    bins = np.arange(NUM_MEL_BINS)[:, None]
    left_mel = low_mel + bins * mel_delta
    center_mel = low_mel + (bins + 1.0) * mel_delta
    right_mel = low_mel + (bins + 2.0) * mel_delta

    fft_bin_width = SAMPLE_RATE / N_FFT
    mel = _mel_scale(fft_bin_width * np.arange(num_fft_bins))[None, :]

    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    banks = np.maximum(0.0, np.minimum(up_slope, down_slope))  # (80, 256)
    banks = np.pad(banks, ((0, 0), (0, 1)))  # (80, 257)
    return banks.T.astype(np.float32)  # (257, 80)


@lru_cache(maxsize=1)
def _dft_matrices() -> Tuple[np.ndarray, np.ndarray]:
    """(frame_len, n_bins) cos/sin DFT matrices for the zero-padded FFT —
    only the first frame_len rows matter (zero padding contributes nothing)."""
    n_bins = N_FFT // 2 + 1
    n = np.arange(FRAME_LENGTH)[:, None]
    k = np.arange(n_bins)[None, :]
    angle = 2.0 * np.pi * n * k / N_FFT
    return np.cos(angle).astype(np.float32), np.sin(angle).astype(np.float32)


@lru_cache(maxsize=1)
def _hamming_window() -> np.ndarray:
    n = np.arange(FRAME_LENGTH)
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * n / (FRAME_LENGTH - 1))).astype(np.float32)


def kaldi_fbank(waveforms: jnp.ndarray) -> jnp.ndarray:
    """(B, num_samples) float waveforms (kaldi 16-bit range) ->
    (B, num_frames, 80) log-mel features. Fully jit-able, static shapes."""
    b, n = waveforms.shape
    t = num_fbank_frames(n)

    # frame extraction as extract-patches (a gather with a (T, 400) index
    # matrix takes minutes to compile on TPU)
    frames = jax.lax.conv_general_dilated_patches(
        waveforms[:, :, None].astype(jnp.float32),
        filter_shape=(FRAME_LENGTH,),
        window_strides=(FRAME_SHIFT,),
        padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[:, :t]  # (B, T, 400)

    # remove DC offset per frame
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # preemphasis with first-sample duplication (torchaudio semantics)
    offset = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - PREEMPH * offset
    frames = frames * jnp.asarray(_hamming_window())

    cos_m, sin_m = _dft_matrices()
    re = jnp.einsum("btn,nk->btk", frames, jnp.asarray(cos_m))
    im = jnp.einsum("btn,nk->btk", frames, jnp.asarray(sin_m))
    power = re * re + im * im  # (B, T, 257)

    mel = power @ jnp.asarray(_mel_banks())  # (B, T, 80)
    return jnp.log(jnp.maximum(mel, EPS))


def wespeaker_fbank(waveforms: jnp.ndarray) -> jnp.ndarray:
    """WeSpeaker front-end: x * 2^15 -> kaldi fbank -> per-utterance CMN
    (reference wespeaker/__init__.py:94-103)."""
    feats = kaldi_fbank(waveforms * 32768.0)
    return feats - jnp.mean(feats, axis=1, keepdims=True)

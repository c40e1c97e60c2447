"""TDNN x-vector speaker embedding models (MFCC and SincNet front-ends).

Reference parity: pyannote models/embedding/xvector.py — `XVectorMFCC`
(xvector.py:45-218: torchaudio MFCC(40) front-end) and `XVectorSincNet`
(xvector.py:220-364: SincNet(stride=10) front-end), both followed by the
classic 5-layer TDNN (channels 512/512/512/512/1500, kernels 5/3/3/1/1,
dilations 1/2/3/1/1, LeakyReLU + BatchNorm each), weighted statistics
pooling, and a 3000 -> `dimension` embedding head. These are the upstream
embedding capabilities the fork retains alongside the WeSpeaker ResNet34
DiariZen actually ships.

TPU-first: the MFCC front-end is two GEMMs (a 400-point DFT as an MXU
matmul + mel/DCT projections, same construction as models/fbank.py), the
TDNN is a chain of `conv_general_dilated` NWC convolutions, and the stats
pool reuses the masked einsum pooling from models/resnet.py. BatchNorm is
eval-mode (running stats): like the ResNet embedding model, x-vectors are an
inference-time component of the diarization pipeline.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diarizen_tpu.models.common import Params, init_linear, linear
from diarizen_tpu.models.resnet import stats_pool
from diarizen_tpu.models.sincnet_eend import (
    SINCNET_KERNELS,
    SINCNET_STRIDES,
    init_sincnet_frontend_params,
    sincnet_frontend,
)
from diarizen_tpu.ops.receptive_field import multi_conv_num_frames

SAMPLE_RATE = 16000

# torchaudio MFCC defaults (reference xvector.py:46 MFCC_DEFAULTS +
# torchaudio MelSpectrogram defaults): n_fft 400, hop 200, centered
# reflect-pad, periodic hann, power 2, 128 HTK mels (norm=None), power-dB,
# DCT-II ortho -> 40 coefficients.
MFCC_N_FFT = 400
MFCC_HOP = 200
MFCC_N_MELS = 128
MFCC_N_COEFFS = 40

TDNN_CHANNELS = (512, 512, 512, 512, 1500)
TDNN_KERNELS = (5, 3, 3, 1, 1)
TDNN_DILATIONS = (1, 2, 3, 1, 1)


@lru_cache(maxsize=1)
def _mfcc_matrices() -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(cos, sin) 400-point DFT matrices, (201, 128) HTK mel filterbank
    (torchaudio melscale_fbanks norm=None), and the (128, 40) ortho DCT-II
    matrix (torchaudio create_dct)."""
    n_bins = MFCC_N_FFT // 2 + 1
    n = np.arange(MFCC_N_FFT)[:, None]
    k = np.arange(n_bins)[None, :]
    angle = 2.0 * np.pi * n * k / MFCC_N_FFT
    cos_m = np.cos(angle).astype(np.float32)
    sin_m = np.sin(angle).astype(np.float32)

    # HTK mel scale, triangular filters over the rfft bin frequencies
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    all_freqs = np.linspace(0.0, SAMPLE_RATE / 2, n_bins)
    m_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(SAMPLE_RATE / 2), MFCC_N_MELS + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_bins, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up)).astype(np.float32)  # (201, 128)

    # DCT-II with ortho norm (torchaudio functional.create_dct)
    mels = np.arange(MFCC_N_MELS)[:, None]
    coeffs = np.arange(MFCC_N_COEFFS)[None, :]
    dct = np.cos(np.pi / MFCC_N_MELS * (mels + 0.5) * coeffs)
    dct[:, 0] *= 1.0 / np.sqrt(2.0)
    dct = (dct * np.sqrt(2.0 / MFCC_N_MELS)).astype(np.float32)  # (128, 40)
    return cos_m, sin_m, fb, dct


@lru_cache(maxsize=1)
def _hann_window() -> np.ndarray:
    n = np.arange(MFCC_N_FFT)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / MFCC_N_FFT)).astype(np.float32)


def num_mfcc_frames(num_samples: int) -> int:
    """Centered STFT frame count: 1 + num_samples // hop."""
    return 1 + num_samples // MFCC_HOP


def mfcc(waveforms: jnp.ndarray) -> jnp.ndarray:
    """(B, num_samples) -> (B, num_frames, 40) MFCC features, jit-able."""
    b, n = waveforms.shape
    x = jnp.pad(waveforms.astype(jnp.float32),
                ((0, 0), (MFCC_N_FFT // 2, MFCC_N_FFT // 2)), mode="reflect")
    t = num_mfcc_frames(n)
    frames = jax.lax.conv_general_dilated_patches(
        x[:, :, None],
        filter_shape=(MFCC_N_FFT,),
        window_strides=(MFCC_HOP,),
        padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[:, :t]  # (B, T, 400)
    cos_m, sin_m, fb, dct = _mfcc_matrices()
    frames = frames * jnp.asarray(_hann_window())
    re = jnp.einsum("btn,nk->btk", frames, jnp.asarray(cos_m))
    im = jnp.einsum("btn,nk->btk", frames, jnp.asarray(sin_m))
    power = re * re + im * im  # (B, T, 201)
    mel = power @ jnp.asarray(fb)  # (B, T, 128)
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))  # AmplitudeToDB, top_db=None
    return db @ jnp.asarray(dct)  # (B, T, 40)


@dataclasses.dataclass(frozen=True)
class XVectorConfig:
    frontend: str = "mfcc"  # "mfcc" | "sincnet"
    dimension: int = 512
    sample_rate: int = SAMPLE_RATE

    @property
    def frontend_dim(self) -> int:
        return MFCC_N_COEFFS if self.frontend == "mfcc" else 60

    def num_frames(self, num_samples: int) -> int:
        if self.frontend == "mfcc":
            n = num_mfcc_frames(num_samples)
        else:
            n = multi_conv_num_frames(num_samples, SINCNET_KERNELS, SINCNET_STRIDES)
        return multi_conv_num_frames(
            n, TDNN_KERNELS, [1] * 5, dilation=TDNN_DILATIONS
        )


def init_xvector_params(rng: jax.Array, cfg: XVectorConfig) -> Params:
    keys = iter(jax.random.split(rng, 16))
    params: Params = {"tdnn": []}
    if cfg.frontend == "sincnet":
        params["sincnet"] = init_sincnet_frontend_params(next(keys), cfg.sample_rate)
    in_ch = cfg.frontend_dim
    for out_ch, k in zip(TDNN_CHANNELS, TDNN_KERNELS):
        params["tdnn"].append({
            "w": jax.random.normal(next(keys), (k, in_ch, out_ch))
            / np.sqrt(k * in_ch),
            "b": jnp.zeros((out_ch,)),
            "bn": {
                "scale": jnp.ones((out_ch,)),
                "bias": jnp.zeros((out_ch,)),
                "mean": jnp.zeros((out_ch,)),
                "var": jnp.ones((out_ch,)),
            },
        })
        in_ch = out_ch
    params["embedding"] = init_linear(next(keys), 2 * TDNN_CHANNELS[-1], cfg.dimension)
    return params


def _bn_eval(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def xvector_forward(
    params: Params,
    cfg: XVectorConfig,
    waveforms: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, T) or (B, C, T) waveforms (+ optional (B, frames) or (B, S, frames)
    pooling weights) -> (B, dimension) or (B, S, dimension) embeddings."""
    if waveforms.ndim == 3:
        waveforms = waveforms[:, 0, :]
    if cfg.frontend == "mfcc":
        x = mfcc(waveforms)  # (B, T, 40)
    else:
        x = sincnet_frontend(params["sincnet"], waveforms)  # (B, T, 60)
    for layer, (k, d) in zip(params["tdnn"], zip(TDNN_KERNELS, TDNN_DILATIONS)):
        x = jax.lax.conv_general_dilated(
            x, layer["w"].astype(x.dtype), (1,), [(0, 0)],
            rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + layer["b"]
        x = _bn_eval(layer["bn"], jax.nn.leaky_relu(x))
    stats = stats_pool(jnp.swapaxes(x, 1, 2), weights)  # (B, [S,] 3000)
    return linear(params["embedding"], stats)

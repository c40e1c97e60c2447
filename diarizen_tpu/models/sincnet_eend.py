"""SincNet -> BiLSTM EEND baseline (PyanNet reimplementation).

Capability parity with the reference baseline
(diarizen/models/eend/model_pyannote.py:24-180 + pyannote
models/blocks/sincnet.py:42-183): waveform InstanceNorm -> parameterized
sinc filterbank (80 filters, k=251, stride 10, |.|) -> 2x (conv k=5 ->
maxpool 3 -> InstanceNorm -> leaky_relu) -> 4-layer BiLSTM(128) -> 2x
Linear+leaky_relu -> powerset head.

This model family is trained from scratch in every reference recipe, so the
sinc filterbank follows the original SincNet construction (mel-spaced
band-pass filters, hamming window) rather than matching asteroid bit-by-bit.
The LSTM is a lax.scan over time (T <= 293 frames for 8 s chunks).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diarizen_tpu.models.common import Params, init_linear, linear, lstm_direction
from diarizen_tpu.ops.powerset import num_powerset_classes
from diarizen_tpu.ops.receptive_field import multi_conv_num_frames

SINC_FILTERS = 80
SINC_KERNEL = 251
SINC_STRIDE = 10
MIN_LOW_HZ = 50.0
MIN_BAND_HZ = 50.0
SAMPLE_RATE = 16000

SINCNET_KERNELS = [251, 3, 5, 3, 5, 3]
SINCNET_STRIDES = [SINC_STRIDE, 3, 1, 3, 1, 3]


def _mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _imel(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@dataclasses.dataclass(frozen=True)
class SincNetEendConfig:
    hidden_size: int = 128
    num_lstm_layers: int = 4
    lstm_dropout: float = 0.5
    max_speakers_per_chunk: int = 4
    max_speakers_per_frame: int = 2
    chunk_size: float = 8.0
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
        return multi_conv_num_frames(num_samples, SINCNET_KERNELS, SINCNET_STRIDES)

    def rf_info(self):
        """(step s, duration s) from the SincNet conv stack receptive field
        (reference model_pyannote.py receptive-field math)."""
        from diarizen_tpu.ops.receptive_field import multi_conv_receptive_field_size

        size1 = multi_conv_receptive_field_size(1, SINCNET_KERNELS, SINCNET_STRIDES)
        size2 = multi_conv_receptive_field_size(2, SINCNET_KERNELS, SINCNET_STRIDES)
        return (size2 - size1) / self.sample_rate, size1 / self.sample_rate


def init_sincnet_frontend_params(rng: jax.Array, sample_rate: int = SAMPLE_RATE) -> Params:
    """SincNet block parameters (waveform InstanceNorm + sinc filterbank +
    two conv/pool/norm stages -> 60 channels); shared by the PyanNet EEND
    baseline and the XVectorSincNet embedding model (reference
    models/blocks/sincnet.py:42-183)."""
    k1, k2 = jax.random.split(rng)
    # mel-spaced sinc band init (original SincNet)
    low = _imel(np.linspace(_mel(30.0), _mel(sample_rate / 2 - MIN_LOW_HZ - MIN_BAND_HZ),
                            SINC_FILTERS + 1))
    return {
        "wav_norm": {"scale": jnp.ones((1,)), "bias": jnp.zeros((1,))},
        "sinc": {
            "low_hz": jnp.asarray(low[:-1], jnp.float32),
            "band_hz": jnp.asarray(np.diff(low), jnp.float32),
        },
        "norm0": {"scale": jnp.ones((SINC_FILTERS,)), "bias": jnp.zeros((SINC_FILTERS,))},
        "conv1": {
            "w": jax.random.normal(k1, (5, SINC_FILTERS, 60)) / np.sqrt(5 * 80),
            "b": jnp.zeros((60,)),
        },
        "norm1": {"scale": jnp.ones((60,)), "bias": jnp.zeros((60,))},
        "conv2": {
            "w": jax.random.normal(k2, (5, 60, 60)) / np.sqrt(5 * 60),
            "b": jnp.zeros((60,)),
        },
        "norm2": {"scale": jnp.ones((60,)), "bias": jnp.zeros((60,))},
    }


def init_sincnet_eend_params(rng: jax.Array, cfg: SincNetEendConfig) -> Params:
    keys = iter(jax.random.split(rng, 32))
    params: Params = init_sincnet_frontend_params(next(keys), cfg.sample_rate)
    params.update({
        "lstm": [],
        "linear1": init_linear(next(keys), 2 * cfg.hidden_size, 128),
        "linear2": init_linear(next(keys), 128, 128),
        "classifier": init_linear(next(keys), 128, cfg.num_powerset_classes),
    })
    in_dim = 60
    for _ in range(cfg.num_lstm_layers):
        layer = {}
        for direction in ("fwd", "bwd"):
            k1, k2 = jax.random.split(next(keys))
            h = cfg.hidden_size
            bound = 1.0 / np.sqrt(h)
            layer[direction] = {
                "w_ih": jax.random.uniform(k1, (in_dim, 4 * h), minval=-bound, maxval=bound),
                "w_hh": jax.random.uniform(k2, (h, 4 * h), minval=-bound, maxval=bound),
                "b": jnp.zeros((4 * h,)),
            }
        params["lstm"].append(layer)
        in_dim = 2 * cfg.hidden_size
    return params


def _sinc_filters(p: Params) -> jnp.ndarray:
    """Build (kernel, 1, n_filters) band-pass sinc kernels from the low/band
    parameters (SincNet construction, hamming-windowed)."""
    low = MIN_LOW_HZ + jnp.abs(p["low_hz"])
    high = jnp.clip(low + MIN_BAND_HZ + jnp.abs(p["band_hz"]), MIN_LOW_HZ, SAMPLE_RATE / 2)
    half = (SINC_KERNEL - 1) // 2
    n = (jnp.arange(1, half + 1, dtype=jnp.float32)) / SAMPLE_RATE  # (125,)
    window = jnp.asarray(np.hamming(SINC_KERNEL)[:half].astype(np.float32))

    f_times_t = 2.0 * jnp.pi * n[:, None]  # (125, 1)
    band_pass_left = (
        (jnp.sin(f_times_t * high[None, :]) - jnp.sin(f_times_t * low[None, :]))
        / (f_times_t / 2.0)
    ) * window[:, None]
    band_center = 2.0 * (high - low)[None, :]
    filters = jnp.concatenate(
        [band_pass_left, band_center, band_pass_left[::-1]], axis=0
    )  # (251, F)
    filters = filters / (2.0 * (high - low))[None, :]
    return filters[:, None, :]  # (K, 1, F)


def _instance_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm1d on (B, T, C): per (batch, channel) stats over T."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.var(xf, axis=1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _max_pool(x: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    """MaxPool1d(kernel=stride=3) on (B, T, C)."""
    t = (x.shape[1] // size) * size
    x = x[:, :t].reshape(x.shape[0], t // size, size, x.shape[2])
    return jnp.max(x, axis=2)


_lstm_direction = lstm_direction  # shared scan LSTM (models/common.py)


def sincnet_frontend(params: Params, waveforms: jnp.ndarray) -> jnp.ndarray:
    """SincNet feature block: (B, T) waveforms -> (B, frames, 60)."""
    x = waveforms[:, :, None]  # (B, T, 1)
    x = _instance_norm(params["wav_norm"], x)

    # sinc conv, |.|, pool, norm, leaky_relu
    filters = _sinc_filters(params["sinc"])
    x = jax.lax.conv_general_dilated(
        x, filters.astype(x.dtype), (SINC_STRIDE,), [(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    x = jnp.abs(x)
    x = jax.nn.leaky_relu(_instance_norm(params["norm0"], _max_pool(x)))

    for conv, norm in [(params["conv1"], params["norm1"]), (params["conv2"], params["norm2"])]:
        x = jax.lax.conv_general_dilated(
            x, conv["w"].astype(x.dtype), (1,), [(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + conv["b"]
        x = jax.nn.leaky_relu(_instance_norm(norm, _max_pool(x)))
    return x


def sincnet_eend_forward(
    params: Params,
    cfg: SincNetEendConfig,
    waveforms: jnp.ndarray,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """(B, C, T) or (B, T) -> log-powerset scores (B, F, P)."""
    from diarizen_tpu.models.common import dropout

    if waveforms.ndim == 3:
        waveforms = waveforms[:, cfg.selected_channel, :]
    x = sincnet_frontend(params, waveforms)

    for li, layer in enumerate(params["lstm"]):
        fwd = _lstm_direction(layer["fwd"], x, reverse=False)
        bwd = _lstm_direction(layer["bwd"], x, reverse=True)
        x = jnp.concatenate([fwd, bwd], axis=-1)
        if train and rng is not None and li < len(params["lstm"]) - 1:
            x = dropout(jax.random.fold_in(rng, li), x, cfg.lstm_dropout, train)

    x = jax.nn.leaky_relu(linear(params["linear1"], x))
    x = jax.nn.leaky_relu(linear(params["linear2"], x))
    logits = linear(params["classifier"], x).astype(jnp.float32)
    return jax.nn.log_softmax(logits, axis=-1)

"""x-vector embedding models (reference models/embedding/xvector.py).

The TDNN + BatchNorm + stats-pool + embedding head is oracle-tested against
a torch composition (torch-core Conv1d/BatchNorm1d + the reference
StatsPool module loaded from /root/reference); the MFCC front-end's
framing/window/FFT is cross-checked against torch.stft (an independent FFT
implementation) with the documented torchaudio settings.
"""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from diarizen_tpu.models.xvector import (
    MFCC_HOP,
    MFCC_N_FFT,
    TDNN_CHANNELS,
    TDNN_DILATIONS,
    TDNN_KERNELS,
    XVectorConfig,
    _mfcc_matrices,
    init_xvector_params,
    mfcc,
    num_mfcc_frames,
    xvector_forward,
)

from ref_shim import install_shim

REF_PA = "/root/reference/pyannote-audio/pyannote/audio"


def _ref_stats_pool():
    install_shim()
    name = "pyannote.audio.models.blocks.pooling"
    if name not in sys.modules or not hasattr(sys.modules[name], "StatsPool"):
        spec = importlib.util.spec_from_file_location(
            name, f"{REF_PA}/models/blocks/pooling.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    return sys.modules[name].StatsPool()


def test_mfcc_against_torch_stft():
    rng = np.random.default_rng(0)
    wave = rng.standard_normal((2, 16000)).astype(np.float32)
    got = np.asarray(mfcc(jnp.asarray(wave)))
    assert got.shape == (2, num_mfcc_frames(16000), 40)

    spec = torch.stft(
        torch.from_numpy(wave), n_fft=MFCC_N_FFT, hop_length=MFCC_HOP,
        win_length=MFCC_N_FFT, window=torch.hann_window(MFCC_N_FFT),
        center=True, pad_mode="reflect", normalized=False,
        onesided=True, return_complex=True,
    )
    power = spec.abs().pow(2).numpy()  # (B, 201, T)
    _, _, fb, dct = _mfcc_matrices()
    mel = np.einsum("bft,fm->btm", power, fb)
    db = 10.0 * np.log10(np.maximum(mel, 1e-10))
    want = db @ dct
    np.testing.assert_allclose(got, want, atol=2e-3)


@pytest.mark.parametrize("frontend", ["mfcc", "sincnet"])
def test_xvector_forward_shapes(frontend):
    cfg = XVectorConfig(frontend=frontend)
    params = init_xvector_params(jax.random.PRNGKey(0), cfg)
    wave = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 32000))
    emb = np.asarray(xvector_forward(params, cfg, wave))
    assert emb.shape == (2, 512)
    assert np.isfinite(emb).all()
    # per-speaker weighted pooling
    nf = cfg.num_frames(32000)
    weights = jax.random.uniform(jax.random.PRNGKey(2), (2, 3, nf))
    emb_s = np.asarray(xvector_forward(params, cfg, wave, weights))
    assert emb_s.shape == (2, 3, 512)
    assert np.isfinite(emb_s).all()


@pytest.mark.parametrize("frontend", ["mfcc", "sincnet"])
def test_num_frames_matches_reference_formula(frontend):
    """num_frames must equal the reference's receptive-field arithmetic
    (xvector.py:96-131, 274-296): STFT/SincNet frame count pushed through
    the dilated TDNN convolutions."""
    cfg = XVectorConfig(frontend=frontend)
    for num_samples in (16000, 32000, 48000):
        nf = cfg.num_frames(num_samples)
        assert nf > 0
        # actual pooled tensor length: run the conv stack symbolically
        if frontend == "mfcc":
            n = 1 + num_samples // MFCC_HOP
        else:
            from diarizen_tpu.models.sincnet_eend import SincNetEendConfig

            n = SincNetEendConfig().num_frames(num_samples)
        for k, d in zip(TDNN_KERNELS, TDNN_DILATIONS):
            n = n - d * (k - 1)
        assert nf == n


def test_tdnn_head_matches_torch_oracle():
    """Full x-vector pipe on shared MFCC features: JAX TDNN/BN/pool/linear vs
    torch Conv1d/BatchNorm1d(eval) + reference StatsPool + Linear."""
    cfg = XVectorConfig(frontend="mfcc")
    params = init_xvector_params(jax.random.PRNGKey(3), cfg)
    # randomize BN running stats + biases so the oracle is non-trivial
    key = jax.random.PRNGKey(4)
    for layer in params["tdnn"]:
        key, k1, k2, k3 = jax.random.split(key, 4)
        layer["bn"]["mean"] = 0.3 * jax.random.normal(k1, layer["bn"]["mean"].shape)
        layer["bn"]["var"] = jnp.exp(
            0.2 * jax.random.normal(k2, layer["bn"]["var"].shape)
        )
        layer["b"] = 0.1 * jax.random.normal(k3, layer["b"].shape)

    wave = jax.random.normal(jax.random.PRNGKey(5), (2, 24000))
    got = np.asarray(xvector_forward(params, cfg, wave))

    feats = torch.from_numpy(np.asarray(mfcc(wave))).transpose(1, 2)  # (B, 40, T)
    x = feats
    for layer, k, d in zip(params["tdnn"], TDNN_KERNELS, TDNN_DILATIONS):
        conv = torch.nn.Conv1d(x.shape[1], layer["w"].shape[-1], k, dilation=d)
        with torch.no_grad():
            conv.weight.copy_(
                torch.from_numpy(np.asarray(layer["w"])).permute(2, 1, 0)
            )
            conv.bias.copy_(torch.from_numpy(np.asarray(layer["b"])))
        bn = torch.nn.BatchNorm1d(layer["w"].shape[-1]).eval()
        with torch.no_grad():
            bn.weight.copy_(torch.from_numpy(np.asarray(layer["bn"]["scale"])))
            bn.bias.copy_(torch.from_numpy(np.asarray(layer["bn"]["bias"])))
            bn.running_mean.copy_(torch.from_numpy(np.asarray(layer["bn"]["mean"])))
            bn.running_var.copy_(torch.from_numpy(np.asarray(layer["bn"]["var"])))
        with torch.no_grad():
            x = bn(torch.nn.functional.leaky_relu(conv(x)))

    pool = _ref_stats_pool()
    with torch.no_grad():
        stats = pool(x)  # (B, 3000)
        w = torch.from_numpy(np.asarray(params["embedding"]["w"]))
        b = torch.from_numpy(np.asarray(params["embedding"]["b"]))
        want = (stats @ w + b).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_tdnn_head_weighted_matches_torch_oracle():
    cfg = XVectorConfig(frontend="mfcc")
    params = init_xvector_params(jax.random.PRNGKey(7), cfg)
    wave = jax.random.normal(jax.random.PRNGKey(8), (2, 16000))
    nf = cfg.num_frames(16000)
    weights = jax.random.uniform(jax.random.PRNGKey(9), (2, nf))
    got = np.asarray(xvector_forward(params, cfg, wave, weights))

    feats = torch.from_numpy(np.asarray(mfcc(wave))).transpose(1, 2)
    x = feats
    for layer, k, d in zip(params["tdnn"], TDNN_KERNELS, TDNN_DILATIONS):
        w_t = torch.from_numpy(np.asarray(layer["w"])).permute(2, 1, 0)
        b_t = torch.from_numpy(np.asarray(layer["b"]))
        with torch.no_grad():
            x = torch.nn.functional.conv1d(x, w_t, b_t, dilation=d)
            x = torch.nn.functional.leaky_relu(x)
            mean = torch.from_numpy(np.asarray(layer["bn"]["mean"]))
            var = torch.from_numpy(np.asarray(layer["bn"]["var"]))
            scale = torch.from_numpy(np.asarray(layer["bn"]["scale"]))
            bias = torch.from_numpy(np.asarray(layer["bn"]["bias"]))
            x = (x - mean[:, None]) / torch.sqrt(var[:, None] + 1e-5)
            x = x * scale[:, None] + bias[:, None]

    pool = _ref_stats_pool()
    with torch.no_grad():
        stats = pool(x, weights=torch.from_numpy(np.asarray(weights)))
        w = torch.from_numpy(np.asarray(params["embedding"]["w"]))
        b = torch.from_numpy(np.asarray(params["embedding"]["b"]))
        want = (stats @ w + b).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)

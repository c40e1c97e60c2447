"""Fbank-Conformer and SincNet-BiLSTM EEND model family tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diarizen_tpu.models.conformer import ConformerConfig
from diarizen_tpu.models.fbank_eend import (
    FbankEendConfig,
    fbank_eend_forward,
    init_fbank_eend_params,
    num_fbank_frames_centered,
    speechbrain_fbank,
)
from diarizen_tpu.models.sincnet_eend import (
    SincNetEendConfig,
    init_sincnet_eend_params,
    sincnet_eend_forward,
)


def test_speechbrain_fbank_invariants():
    # centered STFT: 1 s -> 101 frames (speechbrain Fbank docstring example)
    assert num_fbank_frames_centered(16000) == 101
    wave = np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32) * 0.1
    f = np.asarray(speechbrain_fbank(jnp.asarray(wave)))
    assert f.shape == (2, 101, 80)
    assert np.isfinite(f).all()
    # top_db clamp: dynamic range bounded by 80 dB
    assert (f.max(axis=(1, 2)) - f.min(axis=(1, 2)) <= 80.0 + 1e-4).all()

    # 1 kHz tone peaks in the mel bin containing 1 kHz (HTK mel)
    t = np.arange(16000) / 16000
    tone = 0.3 * np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    ft = np.asarray(speechbrain_fbank(jnp.asarray(tone[None])))[0]
    peak = int(np.median(np.argmax(ft, axis=-1)))

    def mel(x):
        return 2595 * np.log10(1 + x / 700)

    def imel(m):
        return 700 * (10 ** (m / 2595) - 1)

    centers = imel(np.linspace(mel(0), mel(8000), 82))[1:-1]
    assert abs(centers[peak] - 1000) < 150, centers[peak]


def test_fbank_eend_forward():
    cfg = FbankEendConfig(
        conformer=ConformerConfig(dim=32, ffn_hidden=64, num_heads=4, num_layers=1),
        attention_in=32,
    )
    params, state = init_fbank_eend_params(jax.random.PRNGKey(0), cfg)
    wave = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16000)) * 0.1
    scores, _ = fbank_eend_forward(params, state, cfg, wave)
    assert scores.shape == (2, 101, 11)
    np.testing.assert_allclose(np.exp(np.asarray(scores)).sum(-1), 1.0, rtol=1e-5)


def test_sincnet_num_frames():
    cfg = SincNetEendConfig()
    # pyannote SincNet stride 10: 8 s -> 471 frames
    # ((128000-251)//10+1 -> /3 -> conv5 -> /3 -> conv5 -> /3)
    assert cfg.num_frames(8 * 16000) == 471


def test_sincnet_eend_forward():
    cfg = SincNetEendConfig()
    params = init_sincnet_eend_params(jax.random.PRNGKey(0), cfg)
    wave = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 32000)) * 0.1
    scores = sincnet_eend_forward(params, cfg, wave)
    assert scores.shape[0] == 2 and scores.shape[2] == 11
    assert scores.shape[1] == cfg.num_frames(32000)
    np.testing.assert_allclose(np.exp(np.asarray(scores)).sum(-1), 1.0, rtol=1e-4)

    # gradient flows through the sinc filter parameters
    def loss(p):
        return jnp.sum(sincnet_eend_forward(p, cfg, wave[:1, :, :8000]))

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["sinc"]["low_hz"]).sum()) > 0
    assert float(jnp.abs(g["lstm"][0]["fwd"]["w_ih"]).sum()) > 0


def test_sincnet_train_dropout_rng():
    cfg = SincNetEendConfig()
    params = init_sincnet_eend_params(jax.random.PRNGKey(0), cfg)
    wave = jax.random.normal(jax.random.PRNGKey(1), (1, 8000)) * 0.1
    a = sincnet_eend_forward(params, cfg, wave, train=True, rng=jax.random.PRNGKey(1))
    b = sincnet_eend_forward(params, cfg, wave, train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(a), np.asarray(b))  # dropout active

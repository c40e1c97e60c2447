"""SSeRiouSS segmentation model (reference models/segmentation/SSeRiouSS.py).

The BiLSTM + linear head is oracle-tested against torch nn.LSTM with shared
weights; the frozen-trunk semantics (gradients reach the layer weights and
the head, never WavLM — the reference's no_grad placement) are asserted on
actual gradients.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from diarizen_tpu.models.common import lstm_direction
from diarizen_tpu.models.sserious import (
    SSeRiouSSConfig,
    init_sserious_params,
    sserious_forward,
)
from diarizen_tpu.models.wavlm import WavLMConfig


def tiny_wavlm(n=2):
    return WavLMConfig(
        conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
        embed_dim=64,
        num_layers=n,
        use_attention=(True,) * n,
        use_feed_forward=(True,) * n,
        total_num_heads=(4,) * n,
        remaining_heads=(tuple(range(4)),) * n,
        ff_interm_features=(128,) * n,
        num_buckets=40,
        max_distance=100,
        layer_drop=0.0,
    )


def test_forward_shape_and_normalization():
    cfg = SSeRiouSSConfig(wavlm=tiny_wavlm(), lstm_layers=2, lstm_hidden=32,
                          linear_hidden=32, chunk_size=2.0)
    params = init_sserious_params(jax.random.PRNGKey(0), cfg)
    wave = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 32000))
    scores = np.asarray(sserious_forward(params, cfg, wave))
    assert scores.shape == (2, cfg.num_frames(32000), cfg.num_powerset_classes)
    np.testing.assert_allclose(np.exp(scores).sum(-1), 1.0, rtol=1e-5)


def test_single_layer_mode():
    cfg = SSeRiouSSConfig(wavlm=tiny_wavlm(), wav2vec_layer=1, lstm_layers=1,
                          lstm_hidden=16, linear_hidden=16)
    params = init_sserious_params(jax.random.PRNGKey(0), cfg)
    wave = jax.random.normal(jax.random.PRNGKey(1), (1, 16000))
    scores = np.asarray(sserious_forward(params, cfg, wave))
    assert np.isfinite(scores).all()


def test_eval_fused_path_matches_train_path():
    """The eval-only fused weighted sum must equal the train-path stacked
    einsum (train=True with rng=None disables dropout/LayerDrop)."""
    cfg = SSeRiouSSConfig(wavlm=tiny_wavlm(), lstm_layers=1, lstm_hidden=16,
                          linear_hidden=16)
    params = init_sserious_params(jax.random.PRNGKey(2), cfg)
    # non-uniform layer weights make the check non-trivial
    params["wav2vec_weights"] = jnp.asarray([0.3, 1.7])
    wave = jax.random.normal(jax.random.PRNGKey(3), (1, 16000))
    eval_scores = np.asarray(sserious_forward(params, cfg, wave, train=False))
    train_scores = np.asarray(sserious_forward(params, cfg, wave, train=True))
    np.testing.assert_allclose(eval_scores, train_scores, atol=1e-5)


def test_wavlm_frozen_layer_weights_trainable():
    cfg = SSeRiouSSConfig(wavlm=tiny_wavlm(), lstm_layers=1, lstm_hidden=16,
                          linear_hidden=16)
    params = init_sserious_params(jax.random.PRNGKey(4), cfg)
    wave = jax.random.normal(jax.random.PRNGKey(5), (1, 16000))

    def loss(p):
        return jnp.mean(sserious_forward(p, cfg, wave, train=True) ** 2)

    grads = jax.grad(loss)(params)
    wavlm_norm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads["wavlm"])
    )
    assert wavlm_norm == 0.0  # reference no_grad: WavLM never receives grads
    assert float(jnp.sum(jnp.abs(grads["wav2vec_weights"]))) > 0.0
    head_norm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree_util.tree_leaves([grads["lstm"], grads["linears"],
                                            grads["classifier"]])
    )
    assert head_norm > 0.0


def test_bilstm_head_matches_torch_lstm():
    """Stacked scan BiLSTM == torch monolithic nn.LSTM with shared weights
    (the head construction the reference uses, SSeRiouSS.py:135-161)."""
    cfg = SSeRiouSSConfig(wavlm=tiny_wavlm(), lstm_layers=3, lstm_hidden=24)
    params = init_sserious_params(jax.random.PRNGKey(6), cfg)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 50, cfg.wavlm.embed_dim))

    out = x
    for layer in params["lstm"]:
        fwd = lstm_direction(layer["fwd"], out, reverse=False)
        bwd = lstm_direction(layer["bwd"], out, reverse=True)
        out = jnp.concatenate([fwd, bwd], axis=-1)
    got = np.asarray(out)

    lstm = torch.nn.LSTM(cfg.wavlm.embed_dim, 24, num_layers=3,
                         bidirectional=True, batch_first=True)
    with torch.no_grad():
        for li, layer in enumerate(params["lstm"]):
            for suffix, d in (("", "fwd"), ("_reverse", "bwd")):
                p = layer[d]
                getattr(lstm, f"weight_ih_l{li}{suffix}").copy_(
                    torch.from_numpy(np.asarray(p["w_ih"]).T.copy())
                )
                getattr(lstm, f"weight_hh_l{li}{suffix}").copy_(
                    torch.from_numpy(np.asarray(p["w_hh"]).T.copy())
                )
                getattr(lstm, f"bias_ih_l{li}{suffix}").copy_(
                    torch.from_numpy(np.asarray(p["b"]).copy())
                )
                getattr(lstm, f"bias_hh_l{li}{suffix}").zero_()
        want, _ = lstm(torch.from_numpy(np.asarray(x)))
    np.testing.assert_allclose(got, want.numpy(), atol=2e-5)

"""WavLM numerical parity vs HF transformers WavLMModel (torch CPU oracle).

The reference model (diarizen wav2vec2/components.py) is weight-compatible
with HF WavLM (see reference import_huggingface_wavlm.py), so matching HF
activations layer-by-layer validates our conv front-end, gated rel-pos
attention, and pre/post-LN encoder numerics end-to-end.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from diarizen_tpu.models.convert import wavlm_config_from_hf, wavlm_params_from_torch
from diarizen_tpu.models.wavlm import (
    WavLMConfig,
    count_macs,
    init_wavlm_params,
    wavlm_extract_features,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _make_hf_model(stable_layer_norm: bool):
    hf_cfg = transformers.WavLMConfig(
        hidden_size=96,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=192,
        conv_dim=[32] * 7,
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        num_buckets=40,
        max_bucket_distance=100,
        do_stable_layer_norm=stable_layer_norm,
        feat_extract_norm="layer" if stable_layer_norm else "group",
        conv_bias=stable_layer_norm,
        layerdrop=0.0,
    )
    torch.manual_seed(3407)
    model = transformers.WavLMModel(hf_cfg).eval()
    return hf_cfg, model


@pytest.mark.parametrize("stable_layer_norm", [False, True], ids=["base-postln", "large-preln"])
def test_wavlm_matches_hf(stable_layer_norm):
    import dataclasses

    hf_cfg, hf_model = _make_hf_model(stable_layer_norm)
    cfg = wavlm_config_from_hf(hf_cfg)
    # HF does waveform normalization in the processor, not the model (the
    # reference does it in-model, model.py:106-113) — disable for comparison.
    cfg = dataclasses.replace(cfg, normalize_waveform=False)
    params = wavlm_params_from_torch(hf_model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    wave = rng.standard_normal((2, 4000)).astype(np.float32) * 0.1

    with torch.no_grad():
        wave_t = torch.from_numpy(wave)
        # HF applies zero-mean-unit-var waveform norm in the processor for
        # "layer" models; the model itself does not, so feed identical input.
        hf_out = hf_model(wave_t, output_hidden_states=True)
    hf_hidden = [h.numpy() for h in hf_out.hidden_states]

    ours = wavlm_extract_features(params, cfg, jnp.asarray(wave), train=False)
    assert len(ours) == len(hf_hidden) == cfg.num_layers + 1

    # For pre-LN (stable_layer_norm) HF applies the final encoder LN before
    # recording the LAST hidden state; the reference's get_intermediate_outputs
    # does not (components.py:1004-1024) and we follow the reference. Compare
    # the final state through wavlm_forward (which applies the LN) instead.
    n_cmp = cfg.num_layers if stable_layer_norm else cfg.num_layers + 1
    for i in range(n_cmp):
        np.testing.assert_allclose(
            np.asarray(ours[i]), hf_hidden[i], rtol=2e-4, atol=2e-4,
            err_msg=f"hidden state {i}",
        )
    if stable_layer_norm:
        from diarizen_tpu.models.wavlm import wavlm_forward

        final = wavlm_forward(params, cfg, jnp.asarray(wave), train=False)
        np.testing.assert_allclose(
            np.asarray(final), hf_hidden[-1], rtol=2e-4, atol=2e-4,
            err_msg="final hidden state (post-LN)",
        )


def test_wavlm_num_frames_matches_conv_stack():
    cfg = WavLMConfig.base()
    # 8 s @ 16 kHz -> 399 frames (SURVEY.md section 2: model_wavlm_conformer.py rf math)
    assert cfg.num_frames(8 * 16000) == 399
    assert cfg.frame_stride == 320


def test_wavlm_init_and_forward_shapes():
    cfg = WavLMConfig(
        num_layers=2,
        use_attention=(True, True),
        use_feed_forward=(True, True),
        total_num_heads=(12, 12),
        remaining_heads=(tuple(range(12)), tuple(range(6))),  # heterogeneous
        ff_interm_features=(256, 128),
        conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
    )
    import jax

    params = init_wavlm_params(jax.random.PRNGKey(0), cfg)
    hs = wavlm_extract_features(params, cfg, jnp.zeros((2, 2000)))
    assert len(hs) == 3
    assert hs[0].shape == (2, cfg.num_frames(2000), 768)


def test_wavlm_macs_base():
    # WavLM Base+: ~6.9 GMACs per second of audio (BASELINE.md pruning table)
    macs = count_macs(WavLMConfig.base(), 16000)
    assert 6.0e9 < macs < 7.5e9


def test_packed_grouped_posconv_matches_loop_conv():
    """The P=2 block-Toeplitz pos-conv (wavlm._packed_grouped_conv) must equal
    the padded grouped conv it replaces — forward AND gradients (it runs in
    the training path too). tools/probe_posconv2.py has the TPU timings."""
    import jax

    from diarizen_tpu.models.common import conv1d
    from diarizen_tpu.models.wavlm import _packed_grouped_conv

    rng = np.random.default_rng(0)
    for k, g, c, t in [(128, 16, 768, 399), (128, 16, 96, 57), (64, 8, 256, 64)]:
        cg = c // g
        w = jnp.asarray(rng.standard_normal((k, cg, c)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, t, c)), jnp.float32)

        ref = conv1d({"w": w, "b": b}, x, padding=k // 2, groups=g)[:, :-1]
        got = _packed_grouped_conv(w, b, x, k, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

        def loss_ref(w, x):
            return jnp.sum(jnp.sin(conv1d({"w": w, "b": b}, x, padding=k // 2, groups=g)[:, :-1]))

        def loss_got(w, x):
            return jnp.sum(jnp.sin(_packed_grouped_conv(w, b, x, k, g)))

        gr = jax.grad(loss_ref, argnums=(0, 1))(w, x)
        gg = jax.grad(loss_got, argnums=(0, 1))(w, x)
        for a, e in zip(gg, gr):
            scale = float(jnp.max(jnp.abs(e))) + 1e-9
            assert float(jnp.max(jnp.abs(a - e))) / scale < 5e-3

"""Conformer + EEND glue parity vs torch oracles.

The Conformer oracle is the reference implementation itself, imported from
/root/reference (read-only) — used ONLY as a test oracle, never as source.
The EEND glue test builds a synthetic torch state dict (HF WavLM + reference
Conformer + plain linears), converts it, and compares the full forward.
"""

import importlib.util
import os

import numpy as np
import pytest

import jax.numpy as jnp

from diarizen_tpu.models.conformer import ConformerConfig, conformer_forward
from diarizen_tpu.models.convert import (
    conformer_params_from_torch,
    eend_params_from_torch,
    wavlm_config_from_hf,
)
from diarizen_tpu.models.eend import EendConfig, eend_forward, init_eend_params

torch = pytest.importorskip("torch")

REF_CONFORMER = "/root/reference/diarizen/models/module/conformer.py"
needs_reference = pytest.mark.skipif(
    not os.path.exists(REF_CONFORMER), reason="reference checkout not available"
)


def _load_ref_conformer():
    spec = importlib.util.spec_from_file_location("ref_conformer", REF_CONFORMER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@needs_reference
@pytest.mark.parametrize("use_posi", [False, True], ids=["nopos", "relpos"])
def test_conformer_matches_reference(use_posi):
    mod = _load_ref_conformer()
    torch.manual_seed(0)
    ref = mod.ConformerEncoder(
        attention_in=64,
        ffn_hidden=128,
        num_head=4,
        num_layer=2,
        kernel_size=31,
        dropout=0.1,
        use_posi=use_posi,
        output_activate_function=False,
    ).eval()

    cfg = ConformerConfig(
        dim=64, ffn_hidden=128, num_heads=4, num_layers=2, kernel_size=31,
        use_posi=use_posi, output_activation=None,
    )
    params, state = conformer_params_from_torch(ref.state_dict(), cfg)

    x = np.random.default_rng(1).standard_normal((3, 50, 64)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    got, _ = conformer_forward(params, state, cfg, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-4)


@needs_reference
def test_conformer_batchnorm_train_state():
    """Train mode must update running stats the torch way."""
    mod = _load_ref_conformer()
    torch.manual_seed(0)
    ref = mod.ConformerEncoder(
        attention_in=32, ffn_hidden=64, num_head=4, num_layer=1,
        use_posi=False, output_activate_function=False,
    )
    ref.train()
    for m in ref.modules():  # disable dropout for determinism, keep BN training
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    cfg = ConformerConfig(dim=32, ffn_hidden=64, num_heads=4, num_layers=1,
                          dropout=0.0, use_posi=False, output_activation=None)
    params, state = conformer_params_from_torch(ref.state_dict(), cfg)

    x = np.random.default_rng(2).standard_normal((2, 40, 32)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    got, new_state = conformer_forward(params, state, cfg, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-4)

    bn = dict(ref.named_buffers())
    np.testing.assert_allclose(
        np.asarray(new_state["blocks"][0]["bn"]["mean"]),
        bn["conformer_layer.0.conv.bn_norm.running_mean"].numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_state["blocks"][0]["bn"]["var"]),
        bn["conformer_layer.0.conv.bn_norm.running_var"].numpy(),
        rtol=1e-4, atol=1e-5,
    )


@needs_reference
def test_eend_forward_matches_torch_composition():
    """Full EEND glue: HF tiny WavLM + reference Conformer + linears, composed
    in torch exactly as model_wavlm_conformer.py:238-264, vs our eend_forward."""
    transformers = pytest.importorskip("transformers")
    mod = _load_ref_conformer()

    hf_cfg = transformers.WavLMConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=[24] * 7,
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
        num_buckets=40, max_bucket_distance=100,
        do_stable_layer_norm=False, feat_extract_norm="group",
        conv_bias=False, layerdrop=0.0,
    )
    torch.manual_seed(7)
    wavlm_t = transformers.WavLMModel(hf_cfg).eval()
    conformer_t = mod.ConformerEncoder(
        attention_in=32, ffn_hidden=64, num_head=4, num_layer=2,
        use_posi=False, output_activate_function=False,
    ).eval()
    n_layers = hf_cfg.num_hidden_layers + 1
    weight_sum_t = torch.nn.Linear(n_layers, 1, bias=False)
    proj_t = torch.nn.Linear(64, 32)
    lnorm_t = torch.nn.LayerNorm(32)
    classifier_t = torch.nn.Linear(32, 11)

    wave = np.random.default_rng(3).standard_normal((2, 1, 4000)).astype(np.float32) * 0.1
    with torch.no_grad():
        w = torch.from_numpy(wave)[:, 0, :]
        hs = wavlm_t(w, output_hidden_states=True).hidden_states
        feat = torch.stack(list(hs), dim=-1)
        feat = weight_sum_t(feat).squeeze(-1)
        out = lnorm_t(proj_t(feat))
        out = conformer_t(out)
        expected = torch.log_softmax(classifier_t(out), dim=-1).numpy()

    # assemble a reference-style flat state dict and convert
    sd = {}
    for k, v in wavlm_t.state_dict().items():
        sd[f"wavlm_model.{k}"] = v
    for k, v in conformer_t.state_dict().items():
        sd[f"conformer.{k}"] = v
    for mod_name, m in [("weight_sum", weight_sum_t), ("proj", proj_t),
                        ("lnorm", lnorm_t), ("classifier", classifier_t)]:
        for k, v in m.state_dict().items():
            sd[f"{mod_name}.{k}"] = v

    cfg = EendConfig(
        wavlm=wavlm_config_from_hf(hf_cfg),
        conformer=ConformerConfig(dim=32, ffn_hidden=64, num_heads=4, num_layers=2,
                                  use_posi=False, output_activation=None),
        wavlm_layer_num=n_layers, wavlm_feat_dim=64, attention_in=32,
    )
    params, state = eend_params_from_torch(sd, cfg)
    got, _ = eend_forward(params, state, cfg, jnp.asarray(wave), train=False)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=5e-4, atol=5e-4)


def test_eend_init_shapes():
    import jax

    cfg = EendConfig(
        wavlm=wavlm_config_from_tiny(),
        conformer=ConformerConfig(dim=32, ffn_hidden=64, num_heads=4, num_layers=1),
        wavlm_layer_num=3, wavlm_feat_dim=768, attention_in=32,
    )
    params, state = init_eend_params(jax.random.PRNGKey(0), cfg)
    scores, _ = eend_forward(params, state, cfg, jnp.zeros((2, 1, 4000)))
    assert scores.shape == (2, cfg.num_frames(4000), 11)
    # log-probs sum to 1
    np.testing.assert_allclose(np.exp(np.asarray(scores)).sum(-1), 1.0, rtol=1e-5)


def wavlm_config_from_tiny():
    from diarizen_tpu.models.wavlm import WavLMConfig

    return WavLMConfig(
        num_layers=2,
        use_attention=(True, True),
        use_feed_forward=(True, True),
        total_num_heads=(4, 4),
        remaining_heads=(tuple(range(4)), tuple(range(4))),
        ff_interm_features=(128, 128),
        num_buckets=40,
        max_distance=100,
    )

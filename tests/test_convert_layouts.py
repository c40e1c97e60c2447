"""Released-checkpoint layout hardening.

The flagship configs load checkpoints produced by the REFERENCE modules
(`diarizen/models/module/wav2vec2/*` custom WavLM layout with
`wavlm_model.encoder.transformer.*` keys, pruned s80 head subsets, a
non-identity `feature_extractor.dummy_weight`; WeSpeaker `resnet.*`-prefixed
ResNet34). A single drifted key name aborts inference, so these tests build
state dicts with the ACTUAL reference torch modules (loaded from
/root/reference as oracles) and round-trip them through our converters,
comparing full-forward numerics.

Reference: diarizen/models/eend/model_wavlm_conformer.py:192-228 (layout),
models/module/wavlm_config.py (presets), models/pruning/utils.py:103-138
(custom WavLM checkpoint format), pyannote wespeaker/convert.py (resnet.*).
"""

import importlib
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from diarizen_tpu.models.conformer import ConformerConfig
from diarizen_tpu.models.convert import (
    eend_params_from_torch,
    wavlm_params_from_torch,
)
from diarizen_tpu.models.eend import EendConfig, eend_forward
from diarizen_tpu.models.wavlm import WavLMConfig, wavlm_extract_features

torch = pytest.importorskip("torch")

REF = "/root/reference/diarizen/models/module"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def _ref_pkg():
    """Import the reference wav2vec2 torch package under an isolated name
    (refdiarizen.*) so relative imports resolve without touching the
    `diarizen` stub that ref_shim registers for VBx."""
    roots = {
        "refdiarizen": "/root/reference/diarizen",
        "refdiarizen.models": "/root/reference/diarizen/models",
        "refdiarizen.models.module": REF,
    }
    for name, path in roots.items():
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod
    return importlib.import_module("refdiarizen.models.module.wav2vec2.model")


def _load_file(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# tiny config in the exact reference factory-kwargs format, with the s80
# pruning structure: full layer, head-subset layer, attention-pruned-out layer
REF_TINY_CONFIG = {
    "extractor_mode": "group_norm",
    "extractor_conv_layer_config": [(32, 10, 5), (32, 3, 2), (32, 2, 2)],
    "extractor_conv_bias": False,
    "encoder_embed_dim": 64,
    "encoder_projection_dropout": 0.0,
    "encoder_pos_conv_kernel": 128,
    "encoder_pos_conv_groups": 16,
    "encoder_num_layers": 3,
    "encoder_use_attention": [True, True, False],
    "encoder_use_feed_forward": [True, True, True],
    "encoder_total_num_heads": [4, 4, 4],
    "encoder_remaining_heads": [[0, 1, 2, 3], [1, 3], []],
    "encoder_num_buckets": 40,
    "encoder_max_distance": 100,
    "encoder_attention_dropout": 0.0,
    "encoder_ff_interm_features": [128, 96, 112],
    "encoder_ff_interm_dropout": 0.0,
    "encoder_dropout": 0.0,
    "encoder_layer_norm_first": False,
    "encoder_layer_drop": 0.0,
    "aux_num_out": None,
    "normalize_waveform": False,
    "extractor_prune_conv_channels": False,
    "encoder_prune_attention_heads": False,
    "encoder_prune_attention_layer": False,
    "encoder_prune_feed_forward_intermediate": False,
    "encoder_prune_feed_forward_layer": False,
}


def _build_ref_wavlm(dummy_scale=False):
    model_mod = _ref_pkg()
    torch.manual_seed(11)
    wavlm_t = model_mod.wav2vec2_model(**REF_TINY_CONFIG).eval()
    if dummy_scale:
        # pruned checkpoints carry the last conv layer's soft mask here
        # (components.py:254-257) — must be applied post-GELU
        g = torch.Generator().manual_seed(5)
        wavlm_t.feature_extractor.dummy_weight.data = (
            0.5 + torch.rand(32, generator=g)
        )
    return wavlm_t


@needs_reference
@pytest.mark.parametrize("dummy_scale", [False, True], ids=["unit", "pruned-mask"])
def test_reference_custom_wavlm_layout_roundtrip(dummy_scale):
    """State dict from the ACTUAL reference wav2vec2 module (pruned s80
    structure) -> our converter -> forward parity on every extract_features
    layer output."""
    wavlm_t = _build_ref_wavlm(dummy_scale)
    cfg = WavLMConfig.from_reference_dict(REF_TINY_CONFIG)
    params = wavlm_params_from_torch(wavlm_t.state_dict(), cfg)
    assert ("output_scale" in params["feature_extractor"]) == dummy_scale

    wave = np.random.default_rng(3).standard_normal((2, 4000)).astype(np.float32) * 0.1
    with torch.no_grad():
        layer_reps, _ = wavlm_t.extract_features(torch.from_numpy(wave))

    ours = wavlm_extract_features(params, cfg, jnp.asarray(wave), train=False)
    assert len(ours) == len(layer_reps)
    for i, (got, exp) in enumerate(zip(ours, layer_reps)):
        np.testing.assert_allclose(
            np.asarray(got), exp.numpy(), rtol=5e-4, atol=5e-4,
            err_msg=f"layer rep {i}",
        )


@needs_reference
def test_eend_reference_layout_roundtrip():
    """Full reference-layout EEND `pytorch_model.bin`: custom WavLM under
    `wavlm_model.` + reference Conformer under `conformer.` + weight_sum/
    proj/lnorm/classifier — exactly the attribute names of
    model_wavlm_conformer.py:57-76 — loaded through our converter and
    compared against the torch composition of model_wavlm_conformer.py
    forward (:237-264)."""
    wavlm_t = _build_ref_wavlm(dummy_scale=True)
    conformer_mod = _load_file("ref_conformer_layout", f"{REF}/conformer.py")
    torch.manual_seed(13)
    conformer_t = conformer_mod.ConformerEncoder(
        attention_in=32, ffn_hidden=64, num_head=4, num_layer=2,
        use_posi=False, output_activate_function=False,
    ).eval()

    n_layers = REF_TINY_CONFIG["encoder_num_layers"] + 1

    class RefEend(torch.nn.Module):
        # attribute names ARE the checkpoint key prefixes
        def __init__(self):
            super().__init__()
            self.wavlm_model = wavlm_t
            self.weight_sum = torch.nn.Linear(n_layers, 1, bias=False)
            self.proj = torch.nn.Linear(64, 32)
            self.lnorm = torch.nn.LayerNorm(32)
            self.conformer = conformer_t
            self.classifier = torch.nn.Linear(32, 11)

        def forward(self, waveforms):
            waveforms = waveforms[:, 0, :]
            layer_reps, _ = self.wavlm_model.extract_features(waveforms)
            feat = torch.stack(layer_reps, dim=-1)
            feat = self.weight_sum(feat).squeeze(-1)
            out = self.lnorm(self.proj(feat))
            out = self.conformer(out)
            return torch.log_softmax(self.classifier(out), dim=-1)

    torch.manual_seed(17)
    ref = RefEend().eval()
    sd = ref.state_dict()
    # the exact key names our converter banks on
    for key in (
        "wavlm_model.encoder.transformer.layers.0.attention.q_proj.weight",
        "wavlm_model.encoder.transformer.layers.1.attention.gru_rel_pos_const",
        "wavlm_model.feature_extractor.dummy_weight",
        "wavlm_model.encoder.feature_projection.projection.weight",
        "weight_sum.weight",
        "conformer.conformer_layer.0.mha.mha.linearQ.weight",
        "classifier.bias",
    ):
        assert key in sd, f"reference layout drifted: {key}"
    # layer 2 has attention pruned away entirely — no q_proj keys at all
    assert not any(k.startswith("wavlm_model.encoder.transformer.layers.2.attention") for k in sd)

    wave = np.random.default_rng(29).standard_normal((2, 1, 4000)).astype(np.float32) * 0.1
    with torch.no_grad():
        expected = ref(torch.from_numpy(wave)).numpy()

    cfg = EendConfig(
        wavlm=WavLMConfig.from_reference_dict(REF_TINY_CONFIG),
        conformer=ConformerConfig(dim=32, ffn_hidden=64, num_heads=4,
                                  num_layers=2, use_posi=False,
                                  output_activation=None),
        wavlm_layer_num=n_layers, wavlm_feat_dim=64, attention_in=32,
    )
    params, state = eend_params_from_torch(sd, cfg)
    got, _ = eend_forward(params, state, cfg, jnp.asarray(wave), train=False)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=5e-4, atol=5e-4)


@needs_reference
@pytest.mark.parametrize(
    "preset,name",
    [
        ("base", "wavlm_base"),
        ("large", "wavlm_large"),
        ("base_s80_md", "wavlm_base_s80_md"),
        ("large_s80_md", "wavlm_large_s80_md"),
    ],
)
def test_wavlm_presets_match_reference_configs(preset, name):
    """Our named presets must equal from_reference_dict(get_config(name)) —
    pins every per-layer head subset / FF width of the s80 checkpoints."""
    _ref_pkg()
    cfg_mod = importlib.import_module("refdiarizen.models.module.wavlm_config")
    expected = WavLMConfig.from_reference_dict(cfg_mod.get_config(name))
    got = getattr(WavLMConfig, preset)()
    assert got == expected


@needs_reference
def test_wespeaker_prefixed_layout():
    """The released pyannote WeSpeaker checkpoint carries `resnet.*` keys and
    a stray `projection.weight` (wespeaker/convert.py pops it before loading;
    ours must tolerate it). Prefixed conversion must equal stripped
    conversion leaf-for-leaf."""
    from diarizen_tpu.models.resnet import ResNetConfig, resnet_params_from_torch
    from test_embedding import _load_ref_resnet

    resnet_mod = _load_ref_resnet()
    torch.manual_seed(23)
    resnet_t = resnet_mod.ResNet(
        resnet_mod.BasicBlock, [1, 1, 1, 1], m_channels=8, feat_dim=80,
        embed_dim=32, two_emb_layer=False,
    ).eval()
    raw_sd = resnet_t.state_dict()
    prefixed = {f"resnet.{k}": v for k, v in raw_sd.items()}
    prefixed["projection.weight"] = torch.zeros(5994, 32)

    cfg = ResNetConfig(m_channels=8, num_blocks=(1, 1, 1, 1), embed_dim=32)
    p_prefixed = resnet_params_from_torch(prefixed, cfg)
    p_raw = resnet_params_from_torch(raw_sd, cfg)

    import jax

    flat_a = jax.tree_util.tree_leaves_with_path(p_prefixed)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(p_raw))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(leaf, flat_b[path])

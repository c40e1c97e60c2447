"""Multi-channel tests: fusion-module parity vs the reference torch
implementation, MC feature extraction shapes/semantics, MC EEND forward."""

import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diarizen_tpu.models.convert import fusion_params_from_torch
from diarizen_tpu.models.mc import (
    FusionConfig,
    attention_weighted_embeddings,
    cross_channel_attention,
    eend_mc_forward,
    init_eend_mc_params,
    init_fusions,
    tac_fusion,
    wavlm_extract_features_mc,
)
from diarizen_tpu.models.wavlm import init_wavlm_params, wavlm_extract_features

torch = pytest.importorskip("torch")

REF_MC = "/root/reference/diarizen/models/module/utils_mc.py"
needs_reference = pytest.mark.skipif(not os.path.exists(REF_MC), reason="no reference")


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_mc", REF_MC)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def tiny_wavlm(n=4):
    from diarizen_tpu.models.wavlm import WavLMConfig

    return WavLMConfig(
        conv_layers=((16, 10, 5), (16, 3, 2), (16, 2, 2)),
        embed_dim=32,
        num_layers=n,
        use_attention=(True,) * n,
        use_feed_forward=(True,) * n,
        total_num_heads=(4,) * n,
        remaining_heads=(tuple(range(4)),) * n,
        ff_interm_features=(64,) * n,
        num_buckets=16,
        max_distance=20,
        layer_drop=0.0,
        dropout=0.0,
        attention_dropout=0.0,
        projection_dropout=0.0,
    )


@needs_reference
def test_cross_channel_attention_matches_reference():
    mod = _load_ref()
    torch.manual_seed(0)
    ref = mod.CrossChannelAttention(n_units=32, h_units=16, h=4, dropout=0.0).eval()
    fcfg = FusionConfig(kind="cross_attention", hidden=16, num_heads=4, dropout=0.0)
    params = fusion_params_from_torch(ref.state_dict(), "cross_attention")

    x = np.random.default_rng(1).standard_normal((2, 3, 10, 32)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
        ref_att = ref.att.numpy()  # (B*T, h, C, C)
    got, att = cross_channel_attention(params, fcfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(att).reshape(-1, 4, 3, 3), ref_att, rtol=1e-4, atol=1e-5
    )


@needs_reference
def test_tac_fusion_matches_reference():
    mod = _load_ref()
    torch.manual_seed(0)
    ref = mod.TACFusion(input_dim=32, hidden_dim=48).eval()
    fcfg = FusionConfig(kind="tac", hidden=48)
    params = fusion_params_from_torch(ref.state_dict(), "tac")
    x = np.random.default_rng(2).standard_normal((2, 4, 6, 32)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    got, _ = tac_fusion(params, fcfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


def test_mc_extract_shapes_and_stream_merge():
    cfg = tiny_wavlm(n=4)
    fcfg = FusionConfig(hidden=16, num_heads=4, num_fusion_layers=2)
    params = init_wavlm_params(jax.random.PRNGKey(0), cfg)
    fusions = init_fusions(jax.random.PRNGKey(1), cfg.embed_dim, fcfg)

    wave = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 2000)) * 0.1
    hidden, atts = wavlm_extract_features_mc(params, cfg, fusions, fcfg, wave)
    f = cfg.num_frames(2000)
    assert len(hidden) == cfg.num_layers + 1
    for h in hidden:
        assert h.shape == (2, f, 32)  # all returned as channel means / merged
    assert len(atts) == 2
    assert atts[0].shape == (2, f, 4, 3, 3)

    # with the fusion residual gate EXACTLY zero, the fused stream is the
    # identity and C=1 MC extraction must equal the single-channel path
    zeroed = [
        {**fp, "norm": {"scale": jnp.zeros_like(fp["norm"]["scale"]),
                        "bias": jnp.zeros_like(fp["norm"]["bias"])}}
        for fp in fusions
    ]
    wave1 = wave[:, :1]
    hidden1, _ = wavlm_extract_features_mc(params, cfg, zeroed, fcfg, wave1)
    ref = wavlm_extract_features(params, cfg, wave1[:, 0])
    np.testing.assert_allclose(
        np.asarray(hidden1[-1]), np.asarray(ref[-1]), rtol=1e-4, atol=1e-5
    )


def test_eend_mc_forward():
    from diarizen_tpu.models.conformer import ConformerConfig
    from diarizen_tpu.models.eend import EendConfig

    cfg = EendConfig(
        wavlm=tiny_wavlm(n=4),
        conformer=ConformerConfig(dim=32, ffn_hidden=64, num_heads=4, num_layers=1),
        wavlm_layer_num=5,
        wavlm_feat_dim=32,
        attention_in=32,
        chunk_size=0.125,
    )
    fcfg = FusionConfig(hidden=16, num_heads=4, num_fusion_layers=2)
    params, state = init_eend_mc_params(jax.random.PRNGKey(0), cfg, fcfg)
    wave = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 2000)) * 0.1
    scores, att, _ = eend_mc_forward(params, state, cfg, fcfg, wave)
    f = cfg.num_frames(2000)
    assert scores.shape == (2, f, 11)
    assert att.shape == (2, 2, f, 4, 4)
    np.testing.assert_allclose(np.exp(np.asarray(scores)).sum(-1), 1.0, rtol=1e-5)

    # train-time channel truncation is static: k=2 restricts the channel dim
    scores2, att2, _ = eend_mc_forward(
        params, state, cfg, fcfg, wave, num_train_channels=2
    )
    assert att2.shape == (2, 2, f, 2, 2)


def test_attention_weighted_embeddings():
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((5, 3, 4, 16))  # chunks, C, S, D
    att = np.zeros((5, 4, 10, 3, 3))
    att[:, 3, :, :, 0] = 1.0  # all attention mass on channel 0
    fused = attention_weighted_embeddings(emb, att, fusion_layer=3)
    np.testing.assert_allclose(fused, emb[:, 0], rtol=1e-6)


def test_mc_pipeline_end_to_end():
    """MC pipeline mechanics: 3-channel synthetic audio -> RTTM."""
    from diarizen_tpu.cluster import AgglomerativeClustering
    from diarizen_tpu.infer.mc_pipeline import McDiarizationPipeline, McSlidingInference
    from diarizen_tpu.infer.pipeline import EmbeddingInference
    from diarizen_tpu.models.conformer import ConformerConfig
    from diarizen_tpu.models.eend import EendConfig
    from diarizen_tpu.models.resnet import ResNetConfig, init_resnet_params

    cfg = EendConfig(
        wavlm=tiny_wavlm(n=4),
        conformer=ConformerConfig(dim=32, ffn_hidden=64, num_heads=4, num_layers=1),
        wavlm_layer_num=5, wavlm_feat_dim=32, attention_in=32, chunk_size=1.0,
    )
    fcfg = FusionConfig(hidden=16, num_heads=4, num_fusion_layers=2)
    params, state = init_eend_mc_params(jax.random.PRNGKey(0), cfg, fcfg)
    seg_inf = McSlidingInference(params, state, cfg, fcfg, num_channels=3, batch_size=4)

    rcfg = ResNetConfig(m_channels=8, num_blocks=(1, 1, 1, 1), embed_dim=32)
    rparams = init_resnet_params(jax.random.PRNGKey(1), rcfg)
    emb_inf = EmbeddingInference(
        rparams, rcfg, window_size=seg_inf.window_size, num_speakers=4, batch_size=4,
    )
    pipe = McDiarizationPipeline(
        seg_inference=seg_inf, emb_inference=emb_inf,
        clustering=AgglomerativeClustering(threshold=0.7, min_cluster_size=2),
        eend_cfg=cfg, max_speakers=4, fusion_layer=1,
    )
    rng = np.random.default_rng(0)
    wave = (0.1 * rng.standard_normal((3, 16000 * 4))).astype(np.float32)
    ann = pipe(wave, 16000, uri="mc")
    assert ann.uri == "mc"
    for line in ann.to_rttm().splitlines():
        assert line.startswith("SPEAKER mc")


def test_attention_weighted_embeddings_reference_oracle():
    """attention_weighted_embeddings vs the LIVE reference att_enhanced_emb
    (recipes/diar_ssl_mc/infer_avg.py:29-41) on random inputs — layer
    selection, mean axes, and einsum order all pinned."""
    import sys
    import types

    import ref_shim

    pytest.importorskip("torch")
    ref_shim.install_shim()
    # infer_avg.py imports torchaudio (absent in this env) and a few
    # pipeline symbols at module scope; none are used by att_enhanced_emb
    sys.modules.setdefault("torchaudio", types.ModuleType("torchaudio"))
    sys.modules.setdefault("toml", types.ModuleType("toml"))
    m = sys.modules["pyannote.metrics"]
    seg_mod = types.ModuleType("pyannote.metrics.segmentation")
    seg_mod.Annotation = ref_shim.Annotation
    seg_mod.Segment = ref_shim.Segment
    sys.modules["pyannote.metrics.segmentation"] = seg_mod
    pa_pipelines = sys.modules["pyannote.audio.pipelines"]
    if not hasattr(pa_pipelines, "SpeakerDiarization"):
        pa_pipelines.SpeakerDiarization = object
    sig = ref_shim.load_ref_signal()
    ckpt_mod = types.ModuleType("diarizen.ckpt_utils")
    ckpt_mod.load_metric_summary = lambda *a, **k: None
    sys.modules["diarizen.ckpt_utils"] = ckpt_mod

    ref = ref_shim._load(
        "ref_mc_infer_avg", "/root/reference/recipes/diar_ssl_mc/infer_avg.py"
    )

    rng = np.random.default_rng(3)
    B, L, T, C, S, D = 6, 4, 11, 3, 4, 16
    att = rng.random((B, L, T, C, C))
    emb_cbsd = rng.standard_normal((C, B, S, D))
    expected = ref.att_enhanced_emb(att, emb_cbsd.copy())

    # ours takes (chunks, C, S, D) and the (B, L, T, C, C) attention
    got = attention_weighted_embeddings(
        np.transpose(emb_cbsd, (1, 0, 2, 3)), att, fusion_layer=3
    )
    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)

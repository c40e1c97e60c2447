"""Multi-device sharded inference on the virtual 8-device CPU mesh: windows
fan out over the 'data' axis; results must be identical to single-device."""

import os

import numpy as np
import pytest

import jax

from diarizen_tpu.infer import DiarizationPipeline, EmbeddingInference, SlidingInference
from diarizen_tpu.cluster import AgglomerativeClustering
from diarizen_tpu.core.audio import read_wav
from diarizen_tpu.models.eend import init_eend_params
from diarizen_tpu.models.resnet import ResNetConfig, init_resnet_params
from diarizen_tpu.parallel.mesh import make_mesh

EXAMPLE_WAV = "/root/reference/example/EN2002a_30s.wav"


def tiny_cfg():
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import tiny_eend_cfg

    return tiny_eend_cfg(chunk_size=2.0)


@pytest.mark.skipif(not os.path.exists(EXAMPLE_WAV), reason="example wav missing")
def test_sharded_segmentation_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg = tiny_cfg()
    params, state = init_eend_params(jax.random.PRNGKey(0), cfg)

    wave, sr = read_wav(EXAMPLE_WAV)
    wave = wave[:, : 16000 * 12]

    single = SlidingInference(params, state, cfg, batch_size=8)
    out_single = single(wave, sr)

    mesh = make_mesh(n_data=8, n_model=1)
    sharded = SlidingInference(params, state, cfg, batch_size=8, mesh=mesh)
    out_sharded = sharded(wave, sr)

    assert out_single.data.shape == out_sharded.data.shape
    np.testing.assert_allclose(out_sharded.data, out_single.data, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(EXAMPLE_WAV), reason="example wav missing")
def test_sharded_full_pipeline():
    cfg = tiny_cfg()
    params, state = init_eend_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=8, n_model=1)
    seg_inf = SlidingInference(params, state, cfg, batch_size=8, mesh=mesh)

    rcfg = ResNetConfig(m_channels=8, num_blocks=(1, 1, 1, 1), embed_dim=32)
    rparams = init_resnet_params(jax.random.PRNGKey(1), rcfg)
    emb_inf = EmbeddingInference(
        rparams, rcfg, window_size=seg_inf.window_size,
        num_speakers=cfg.max_speakers_per_chunk, batch_size=8, mesh=mesh,
    )
    pipeline = DiarizationPipeline(
        seg_inference=seg_inf, emb_inference=emb_inf,
        clustering=AgglomerativeClustering(threshold=0.7, min_cluster_size=3),
        eend_cfg=cfg, max_speakers=4,
    )
    wave, sr = read_wav(EXAMPLE_WAV)
    ann = pipeline(wave[:, : 16000 * 8], sr, uri="sharded")
    assert ann.uri == "sharded"
    for line in ann.to_rttm().splitlines():
        assert line.startswith("SPEAKER sharded")

"""Capability-inventory tests: s80 presets, Noam schedule, oracle clustering,
aggregated inference mode, local from_pretrained loader."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diarizen_tpu.models.wavlm import WavLMConfig, init_wavlm_params, wavlm_extract_features


def test_s80_presets_build_and_run():
    for name, n_layers, dim in [("wavlm_base_s80_md", 12, 768), ("wavlm_large_s80_md", 24, 1024)]:
        cfg = WavLMConfig.from_preset(name)
        assert cfg.num_layers == n_layers and cfg.embed_dim == dim
        # heterogeneous: some layers have no attention at all
        assert not all(cfg.use_attention)
    # run the (small-ish) base preset forward
    cfg = WavLMConfig.from_preset("wavlm_base_s80_md")
    params = init_wavlm_params(jax.random.PRNGKey(0), cfg)
    hs = wavlm_extract_features(params, cfg, jnp.zeros((1, 4000)))
    assert len(hs) == 13
    assert hs[-1].shape == (1, cfg.num_frames(4000), 768)


def test_noam_schedule():
    from diarizen_tpu.train.optim import noam_schedule

    sched = noam_schedule(model_size=256, warmup=1000)
    # reference formula: d^-0.5 * min(s^-0.5, s * warmup^-1.5), 1-based step
    for step in [0, 99, 999, 9999]:
        s = step + 1
        expected = 256 ** -0.5 * min(s ** -0.5, s * 1000 ** -1.5)
        assert float(sched(step)) == pytest.approx(expected, rel=1e-5)
    # warms up then decays
    assert float(sched(10)) < float(sched(999))
    assert float(sched(9999)) < float(sched(999))


def test_oracle_clustering():
    from diarizen_tpu.cluster.oracle import OracleClustering
    from diarizen_tpu.core.segments import Annotation, Segment, SlidingWindow

    # reference: A in [0, 2], B in [2, 4]
    ref = Annotation(uri="x")
    ref[Segment(0.0, 2.0), 0] = "A"
    ref[Segment(2.0, 4.0), 1] = "B"

    window = SlidingWindow(start=0.0, duration=2.0, step=2.0)
    frames = SlidingWindow(start=0.0, duration=0.1, step=0.1)
    nf = 20
    # local segmentations: chunk0 speaker1 active (=A), chunk1 speaker0 (=B)
    seg = np.zeros((2, nf, 2), dtype=np.float32)
    seg[0, :, 1] = 1.0
    seg[1, :, 0] = 1.0

    clustering = OracleClustering(ref, frames)
    emb = np.random.default_rng(0).standard_normal((2, 2, 8))
    hard, soft, centroids = clustering(emb, seg, window=window)
    assert hard[0, 1] == 0  # chunk0 local speaker1 -> cluster A
    assert hard[1, 0] == 1  # chunk1 local speaker0 -> cluster B
    assert centroids.shape == (2, 8)


def test_aggregated_inference_mode():
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import tiny_eend_cfg
    from diarizen_tpu.infer import SlidingInference
    from diarizen_tpu.models.eend import init_eend_params

    cfg = tiny_eend_cfg(chunk_size=1.0)
    params, state = init_eend_params(jax.random.PRNGKey(0), cfg)
    inf = SlidingInference(params, state, cfg, batch_size=4)
    wave = np.random.default_rng(0).standard_normal((1, 16000 * 3)).astype(np.float32) * 0.1
    agg = inf.aggregated(wave, 16000, soft=True)
    # single global frame sequence at model resolution covering ~3 s
    assert agg.data.ndim == 2 and agg.data.shape[1] == cfg.max_speakers_per_chunk
    step, _ = cfg.rf_info()
    assert abs(agg.data.shape[0] * step - 3.0) < 0.2
    assert np.isfinite(agg.data).all()
    assert agg.data.min() >= 0.0 and agg.data.max() <= 1.0 + 1e-5


def test_from_pretrained_local_dir(tmp_path):
    import dataclasses

    from diarizen_tpu import pipelines
    from diarizen_tpu.train.checkpoint import save_pytree

    # assemble a local "pretrained" dir with the tiny model
    (tmp_path / "config.toml").write_text("""
[model]
path = "test_recipes_tiny.tiny_builder"
[inference]
[inference.args]
seg_duration = 1
batch_size = 4
[clustering]
[clustering.args]
method = "AgglomerativeClustering"
min_cluster_size = 2
max_speakers = 4
""")
    # register a tiny builder importable by the config system
    import sys, os

    sys.path.insert(0, str(tmp_path))
    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import tiny_eend_cfg
    from diarizen_tpu.models.eend import init_eend_params

    builder = f'''
import sys
sys.path.insert(0, {os.path.dirname(__file__)!r})
import jax
from test_pipeline import tiny_eend_cfg
from diarizen_tpu.models.eend import init_eend_params

def tiny_builder(**kw):
    cfg = tiny_eend_cfg(chunk_size=1.0)
    params, state = init_eend_params(jax.random.PRNGKey(0), cfg)
    return cfg, params, state
'''
    (tmp_path / "test_recipes_tiny.py").write_text(builder)

    cfg = tiny_eend_cfg(chunk_size=1.0)
    params, _ = init_eend_params(jax.random.PRNGKey(7), cfg)
    save_pytree(tmp_path / "params.npz", params)

    pipe = pipelines.from_pretrained(tmp_path, rttm_out_dir=tmp_path / "rttm")
    from diarizen_tpu.core.audio import write_wav

    wav = tmp_path / "x.wav"
    write_wav(wav, (0.1 * np.random.default_rng(0).standard_normal((1, 16000 * 3))).astype(np.float32), 16000)
    ann = pipelines.diarize_file(pipe, wav)
    assert (tmp_path / "rttm" / "x.rttm").exists()
    assert ann.uri == "x"


def test_resolve_model_dir_hub_fallback(tmp_path, monkeypatch):
    """Local dirs pass through; a hub repo id that is neither cached nor
    reachable raises an actionable FileNotFoundError (offline-safe hub path,
    reference DiariZenPipeline.from_pretrained)."""
    from diarizen_tpu import pipelines

    assert pipelines.resolve_model_dir(tmp_path) == tmp_path
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")  # fail fast, no network attempt
    with pytest.raises(FileNotFoundError, match="huggingface-cli download"):
        pipelines.resolve_model_dir("BUT-FIT/definitely-not-cached-model")


def test_vad_osd_pipelines():
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import tiny_eend_cfg
    from diarizen_tpu.infer import SlidingInference
    from diarizen_tpu.infer.vad import OverlappedSpeechDetection, VoiceActivityDetection
    from diarizen_tpu.models.eend import init_eend_params

    cfg = tiny_eend_cfg(chunk_size=1.0)
    params, state = init_eend_params(jax.random.PRNGKey(0), cfg)
    inf = SlidingInference(params, state, cfg, batch_size=4)
    wave = (0.1 * np.random.default_rng(0).standard_normal((1, 16000 * 3))).astype(np.float32)

    vad = VoiceActivityDetection(inf)(wave, 16000, uri="v")
    assert set(vad.labels()) <= {"SPEECH"}
    osd = OverlappedSpeechDetection(inf)(wave, 16000, uri="o")
    assert set(osd.labels()) <= {"OVERLAP"}


def test_gradient_accumulation_and_plateau():
    import optax

    from diarizen_tpu.train.optim import reduce_on_plateau, with_gradient_accumulation

    opt = with_gradient_accumulation(optax.sgd(1.0), every_k=3)
    params = {"w": jnp.zeros(())}
    state = opt.init(params)
    g = {"w": jnp.ones(())}
    # the first k-1 updates are zero; the k-th applies the mean gradient
    for i in range(2):
        updates, state = opt.update(g, state, params)
        assert float(updates["w"]) == 0.0
    updates, state = opt.update(g, state, params)
    assert float(updates["w"]) == pytest.approx(-1.0)

    plateau = reduce_on_plateau(factor=0.5, patience=1)
    pstate = plateau.init(params)
    u = {"w": jnp.asarray(1.0)}
    # non-improving values shrink the scale after `patience` steps
    scales = []
    for v in [1.0, 1.0, 1.0, 1.0]:
        out, pstate = plateau.update(u, pstate, params, value=v)
        scales.append(float(out["w"]))
    assert scales[-1] < scales[0]


def test_pipelines_cli_wav_scp(tmp_path):
    """The user-facing wav.scp CLI (reference DiariZenPipeline __main__,
    diarizen/pipelines/inference.py:195-368): one RTTM per recording, with
    inference/clustering overrides layered over config.toml."""
    import os as _os
    import subprocess
    import sys as _sys

    # reuse the local-pretrained-dir fixture layout
    (tmp_path / "config.toml").write_text("""
[model]
path = "test_recipes_tiny2.tiny_builder"
[inference]
[inference.args]
seg_duration = 1
batch_size = 4
[clustering]
[clustering.args]
method = "AgglomerativeClustering"
min_cluster_size = 2
max_speakers = 4
""")
    builder = f'''
import sys
sys.path.insert(0, {_os.path.dirname(__file__)!r})
import jax
from test_pipeline import tiny_eend_cfg
from diarizen_tpu.models.eend import init_eend_params

def tiny_builder(**kw):
    cfg = tiny_eend_cfg(chunk_size=1.0)
    params, state = init_eend_params(jax.random.PRNGKey(0), cfg)
    return cfg, params, state
'''
    (tmp_path / "test_recipes_tiny2.py").write_text(builder)

    from diarizen_tpu.core.audio import write_wav

    rng = np.random.default_rng(0)
    scp_lines = []
    for rec in ("a", "b"):
        wav = tmp_path / f"{rec}.wav"
        write_wav(wav, (0.1 * rng.standard_normal((1, 16000 * 2))).astype(np.float32), 16000)
        scp_lines.append(f"{rec} {wav}")
    (tmp_path / "wav.scp").write_text("\n".join(scp_lines) + "\n")

    env = dict(_os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=str(tmp_path) + _os.pathsep + _os.path.dirname(__file__))
    r = subprocess.run(
        [_sys.executable, "-m", "diarizen_tpu.pipelines",
         "--in_wav_scp", str(tmp_path / "wav.scp"),
         "--model_dir", str(tmp_path),
         "--rttm_out_dir", str(tmp_path / "rttm"),
         "--min_cluster_size", "1",
         "--clustering_method", "AgglomerativeClustering"],
        cwd=str(Path(__file__).resolve().parents[1]),
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    for rec in ("a", "b"):
        rttm = tmp_path / "rttm" / f"{rec}.rttm"
        assert rttm.exists()
        for line in rttm.read_text().splitlines():
            assert line.startswith(f"SPEAKER {rec} 1 ")

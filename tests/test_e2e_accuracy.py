"""End-to-end accuracy gate on synthetic data.

Trains the tiny WavLM+Conformer segmentation model on synthetic 2-speaker
audio, then runs the FULL diarization pipeline (sliding-window inference,
speaker counting, masked per-speaker embeddings, AHC with constrained
assignment, reconstruction, binarization) on a held-out file and asserts
low DER against the ground truth.

The embedding model is a masked linear-mel-power mean (the pretrained
WeSpeaker weights are unavailable offline; random ResNet weights do not
separate speakers — verified experimentally). The embedder goes through the
SAME EmbeddingInference contract (device waveform + window starts + masks),
so the whole pipeline surface is exercised; reached 0.5% DER in 8-epoch
calibration runs (threshold here leaves margin for seed/backend variance).

Runtime: ~7 min on CPU. Set DIARIZEN_SKIP_SLOW=1 to skip.
"""

import os
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    os.environ.get("DIARIZEN_SKIP_SLOW") == "1", reason="slow test disabled"
)


def synth(rec, dur, seed, sr=16000):
    from diarizen_tpu.core.segments import Annotation, Segment

    r = np.random.default_rng(seed)
    t = np.arange(dur * sr) / sr
    wave = np.zeros_like(t, dtype=np.float32)
    ann = Annotation(uri=rec)
    rttm = []
    pos, spk = 0.5, 0
    specs = [(180, 320, 470), (2200, 2900, 3600)]
    while pos < dur - 2:
        seg = r.uniform(1.5, 4.0)
        end = min(pos + seg, dur - 0.2)
        m = (t >= pos) & (t < end)
        for f in specs[spk]:
            wave[m] += 0.12 * np.sin(2 * np.pi * (f + r.uniform(-10, 10)) * t[m]).astype(np.float32)
        wave[m] *= (1 + 0.3 * np.sin(2 * np.pi * 3.1 * t[m])).astype(np.float32)
        rttm.append(f"SPEAKER {rec} 1 {pos:.2f} {end - pos:.2f} <NA> <NA> SPK{spk} <NA> <NA>")
        ann[Segment(pos, end), len(rttm)] = f"SPK{spk}"
        pos = end + r.uniform(0.2, 0.8)
        spk = 1 - spk
    wave += 0.005 * r.standard_normal(len(t)).astype(np.float32)
    return wave, rttm, ann


def test_full_pipeline_der_on_synthetic(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import tiny_eend_cfg

    from diarizen_tpu.cluster import AgglomerativeClustering
    from diarizen_tpu.core.audio import write_wav
    from diarizen_tpu.infer import DiarizationPipeline, SlidingInference
    from diarizen_tpu.models.eend import init_eend_params, non_wavlm_param_labels
    from diarizen_tpu.ops.der import der_report
    from diarizen_tpu.train.dataset import DataLoader, DiarizationDataset
    from diarizen_tpu.train.optim import dual_lr_optimizer
    from diarizen_tpu.train.trainer import Trainer, TrainerConfig

    sr = 16000
    scp, rttms = [], []
    for i in range(4):
        rec = f"train{i}"
        w, rt, _ = synth(rec, 30, 100 + i)
        p = tmp_path / f"{rec}.wav"
        write_wav(p, w[None], sr)
        scp.append(f"{rec} {p}")
        rttms += rt
    (tmp_path / "wav.scp").write_text("\n".join(scp) + "\n")
    (tmp_path / "rttm").write_text("\n".join(rttms) + "\n")
    (tmp_path / "all.uem").write_text(
        "\n".join(f"train{i} 1 0.0 30.0" for i in range(4)) + "\n"
    )
    test_wave, _, test_ann = synth("test0", 40, 999)

    cfg = tiny_eend_cfg(chunk_size=2.0)
    step_s, dur_rf = cfg.rf_info()
    ds = DiarizationDataset(
        str(tmp_path / "wav.scp"), str(tmp_path / "rttm"), str(tmp_path / "all.uem"),
        model_num_frames=cfg.num_frames(32000), model_rf_duration=dur_rf,
        model_rf_step=step_s, chunk_size=2.0, chunk_shift=1.25,
    )
    params, ms = init_eend_params(jax.random.PRNGKey(0), cfg)
    opt = dual_lr_optimizer(
        non_wavlm_param_labels(jax.tree_util.tree_map(np.asarray, params)),
        lr_small=3e-4, lr_big=3e-3,
    )
    tc = TrainerConfig(exp_dir=str(tmp_path / "exp"), max_epochs=5,
                       compute_dtype="float32", log_every=100,
                       validation_interval=5)
    trainer = Trainer(cfg, tc, opt, params, ms)
    final = trainer.train(DataLoader(ds, batch_size=8, shuffle=True),
                          DataLoader(ds, batch_size=8, shuffle=False))
    assert final["der"] < 0.15, f"segmentation failed to train: {final}"

    seg_inf = SlidingInference(
        trainer.state.params, trainer.state.model_state, cfg,
        batch_size=8, compute_dtype=jnp.float32,
    )

    class SpectralEmbedder:
        """Masked linear-mel-power mean through the EmbeddingInference contract."""

        min_num_samples = 400

        def __call__(self, wave_device, starts, weights, hook=None):
            from diarizen_tpu.models.fbank import kaldi_fbank

            outs = []
            for b0 in range(0, len(starts), 8):
                sb = np.asarray(starts[b0 : b0 + 8])
                wb = weights[b0 : b0 + 8]
                chunks = np.stack(
                    [np.asarray(wave_device[s : s + seg_inf.window_size]) for s in sb]
                )
                f = np.exp(np.asarray(kaldi_fbank(jnp.asarray(chunks) * 32768.0)))
                tw, tf = wb.shape[-1], f.shape[1]
                src = np.floor(np.arange(tf) * (tw / tf)).astype(int)
                w = wb[:, :, src]
                num = np.einsum("btd,bst->bsd", f, w)
                outs.append(num / np.maximum(w.sum(-1), 1e-6)[..., None])
            return np.concatenate(outs)

    pipeline = DiarizationPipeline(
        seg_inference=seg_inf,
        emb_inference=SpectralEmbedder(),
        clustering=AgglomerativeClustering(threshold=0.5, min_cluster_size=3),
        eend_cfg=cfg, max_speakers=4,
    )
    hyp = pipeline(test_wave[None], sr, uri="test0")
    rep = der_report(test_ann, hyp)
    assert len(hyp.labels()) == 2, f"expected 2 speakers, got {hyp.labels()}"
    assert rep.der < 0.15, (
        f"pipeline DER {rep.der:.3f} (fa {rep.false_alarm / rep.total:.3f} "
        f"miss {rep.missed_detection / rep.total:.3f} "
        f"conf {rep.confusion / rep.total:.3f})"
    )

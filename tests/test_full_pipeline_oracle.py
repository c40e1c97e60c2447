"""Full file->RTTM oracle: the reference pipeline, stages 1-7 COMPOSED, with
a live torch model and shared converted weights (VERDICT r3 missing #1).

This drives the reference's OWN code end-to-end:
  * `Inference.slide()` — unfold chunk grid, batching, tail-chunk zero-pad,
    per-batch powerset->multilabel conversion
    (pyannote-audio/pyannote/audio/core/inference.py:237-409)
  * the DiariZen chain: get_segmentations -> median_filter -> speaker_count
    -> get_embeddings (masked torch-WeSpeaker crops, exclude-overlap
    fallback, batchify) -> AHC/VBx -> count cap -> inactive=-2 ->
    reconstruct -> Binarize (diarizen/pipelines/inference.py:121-192,
    speaker_diarization.py:228-425)
against `SlidingInference` and `DiarizationPipeline.__call__` running the
SAME weights converted through `eend_params_from_torch` /
`resnet_params_from_torch`. Final RTTMs must be identical (both AHC and VBx,
fused and host stitching paths).

Environment note: torchaudio is absent, so the kaldi fbank is the one piece
of shared math — BOTH sides consume `wespeaker_fbank` (pinned independently
by tests/test_embedding.py invariants). Everything else on the reference
side is reference code.
"""

import math
import sys
import types

import numpy as np
import pytest

import ref_shim

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from scipy.ndimage import median_filter

from test_convert_layouts import REF_TINY_CONFIG, _load_file, _ref_pkg, needs_reference
from test_embedding import _load_ref_resnet
from test_ref_oracles import _make_ref_ahc, make_plda_dir

from diarizen_tpu.cluster import AgglomerativeClustering, VBxClustering
from diarizen_tpu.infer.pipeline import DiarizationPipeline, EmbeddingInference
from diarizen_tpu.infer.sliding import SlidingInference, receptive_field_window
from diarizen_tpu.models.conformer import ConformerConfig
from diarizen_tpu.models.convert import eend_params_from_torch
from diarizen_tpu.models.eend import EendConfig
from diarizen_tpu.models.fbank import wespeaker_fbank
from diarizen_tpu.models.resnet import ResNetConfig, resnet_params_from_torch
from diarizen_tpu.models.wavlm import WavLMConfig

SR = 16000
DURATION = 2.0  # seconds per chunk
STEP = 0.4  # 6400 samples — lands on the 160-sample fbank hop (shared-fbank path)
MAX_SPEAKERS = 6

# stride-80 conv stack (399 frames / 2 s chunk — the flagship's frame rate at
# a quarter of the duration) with the s80 pruning structure of
# REF_TINY_CONFIG: full layer, head-subset layer, attention-pruned-out layer
TINY80_CONFIG = dict(
    REF_TINY_CONFIG,
    extractor_conv_layer_config=[(32, 10, 5), (32, 5, 4), (32, 4, 4)],
)


# --------------------------------------------------------------------------
# reference-side interop wrappers (shim-grade: faithful subsets of the
# reference classes that Inference/get_embeddings interact with)
# --------------------------------------------------------------------------


class RefAudio:
    """Faithful in-memory Audio subset (core/io.py:254-266, 328-436):
    floor-rounded crop with 'pad' mode."""

    def __init__(self, sample_rate=SR):
        self.sample_rate = sample_rate

    def __call__(self, file):
        return file["waveform"], file["sample_rate"]

    def get_num_samples(self, duration):
        return math.floor(duration * self.sample_rate)

    def crop(self, file, segment, duration=None, mode="pad"):
        assert mode == "pad"
        waveform = file["waveform"]
        sr = file["sample_rate"]
        frames = waveform.shape[1]
        start_frame = math.floor(segment.start * sr)
        if duration:
            num_frames = math.floor(duration * sr)
            end_frame = start_frame + num_frames
        else:
            end_frame = math.floor(segment.end * sr)
        pad_start = -min(0, start_frame)
        pad_end = max(end_frame, frames) - frames
        data = waveform[:, max(0, start_frame) : min(end_frame, frames)]
        return torch.nn.functional.pad(data, (pad_start, pad_end)), sr


class RefWeSpeakerEmbedding:
    """Faithful PyannoteAudioPretrainedSpeakerEmbedding subset
    (speaker_verification.py:660-705): bisection-probed min_num_samples and
    `__call__(waveforms[B,1,T], masks[B,F]) -> np[B,D]` through the
    reference torch WeSpeaker ResNet with masked stats pooling. fbank is the
    shared `wespeaker_fbank` (torchaudio absent — see module docstring)."""

    sample_rate = SR

    def __init__(self, resnet_t):
        self.resnet_t = resnet_t

    @property
    def dimension(self):
        return self.resnet_t.embed_dim

    def _forward(self, waveforms, masks=None):
        wave = waveforms[:, 0, :].numpy()
        if wave.shape[1] < 400:
            raise ValueError("waveform shorter than one fbank window")
        feats = torch.from_numpy(np.asarray(wespeaker_fbank(jnp.asarray(wave))))
        with torch.no_grad():
            return self.resnet_t(feats, weights=masks)[1]

    @property
    def min_num_samples(self):
        # exact reference bisection (speaker_verification.py:677-691)
        lower, upper = 2, round(0.5 * self.sample_rate)
        middle = (lower + upper) // 2
        while lower + 1 < upper:
            try:
                _ = self._forward(torch.randn(1, 1, middle))
            except Exception:
                lower = middle
            else:
                upper = middle
            middle = (lower + upper) // 2
        return upper

    def __call__(self, waveforms, masks=None):
        return self._forward(waveforms, masks=masks).numpy()


def _reference_rf_window(conv_config):
    """model._receptive_field computed with the REFERENCE's own
    receptive-field module (core/model.py:180-195 over
    utils/receptive_field.py)."""
    rf = _load_file(
        "ref_receptive_field",
        "/root/reference/pyannote-audio/pyannote/audio/utils/receptive_field.py",
    )
    kernels = [k for _, k, _ in conv_config]
    strides = [s for _, _, s in conv_config]
    ones = [1] * len(kernels)
    zeros = [0] * len(kernels)
    size = rf.multi_conv_receptive_field_size(
        num_frames=1, kernel_size=kernels, stride=strides, dilation=ones
    )
    size2 = rf.multi_conv_receptive_field_size(
        num_frames=2, kernel_size=kernels, stride=strides, dilation=ones
    )
    center = rf.multi_conv_receptive_field_center(
        frame=0, kernel_size=kernels, stride=strides,
        padding=zeros, dilation=ones,
    )
    return ref_shim.SlidingWindow(
        start=(center - (size - 1) / 2) / SR,
        duration=size / SR,
        step=(size2 - size) / SR,
    )


def _build_torch_models():
    """Reference torch EEND composition (model_wavlm_conformer.py:57-76
    attribute layout) + reference WeSpeaker ResNet, both at tiny sizes."""
    model_mod = _ref_pkg()
    torch.manual_seed(11)
    wavlm_t = model_mod.wav2vec2_model(**TINY80_CONFIG).eval()
    g = torch.Generator().manual_seed(5)
    wavlm_t.feature_extractor.dummy_weight.data = 0.5 + torch.rand(32, generator=g)

    conformer_mod = _load_file(
        "ref_conformer_oracle",
        "/root/reference/diarizen/models/module/conformer.py",
    )
    torch.manual_seed(13)
    conformer_t = conformer_mod.ConformerEncoder(
        attention_in=32, ffn_hidden=64, num_head=4, num_layer=2,
        use_posi=False, output_activate_function=False,
    ).eval()

    n_layers = TINY80_CONFIG["encoder_num_layers"] + 1

    class RefEend(torch.nn.Module):
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
    eend_t = RefEend().eval()

    resnet_mod = _load_ref_resnet()
    torch.manual_seed(23)
    resnet_t = resnet_mod.ResNet(
        resnet_mod.BasicBlock, [1, 1, 1, 1], m_channels=8, feat_dim=80,
        embed_dim=32, two_emb_layer=False,
    ).eval()
    return eend_t, resnet_t


class TorchSegModel(torch.nn.Module):
    """The torch EEND wrapped with the attributes the reference Inference
    engine reads (core/inference.py:84-145, 264-278)."""

    def __init__(self, eend_t, rf_window):
        super().__init__()
        self.eend = eend_t
        self.audio = RefAudio(SR)
        self._receptive_field = rf_window
        self.specifications = ref_shim.Specifications(
            problem=ref_shim.Problem.MONO_LABEL_CLASSIFICATION,
            resolution=ref_shim.Resolution.FRAME,
            duration=DURATION,
            classes=["0", "1", "2", "3"],
            powerset_max_classes=2,
            permutation_invariant=True,
        )

    @property
    def device(self):
        return torch.device("cpu")

    def forward(self, chunks):
        return self.eend(chunks)


def _make_wave():
    """7.3 s 2-speaker synthetic meeting, PCM16-quantized (tail-chunk case:
    (116800 - 32000) % 6400 = 1600 > 0)."""
    dur_s = 7.3
    t = np.arange(int(dur_s * SR)) / SR
    wave = np.zeros_like(t, dtype=np.float64)
    rng = np.random.default_rng(0)
    pos, spk = 0.0, 0
    while pos < dur_s - 0.5:
        seg = rng.uniform(0.8, 2.0)
        m = (t >= pos) & (t < pos + seg)
        f = 200 + 150 * spk
        wave[m] += 0.3 * np.sin(2 * np.pi * f * t[m])
        wave[m] += 0.02 * rng.standard_normal(int(m.sum()))
        pos += seg * rng.uniform(0.5, 0.9)
        spk = 1 - spk
    wave = np.clip(np.rint(wave * 32767.0), -32768, 32767) / 32768.0
    return wave[None].astype(np.float32)


EXAMPLE_WAV = "/root/reference/example/EN2002a_30s.wav"


def _load_example_wave():
    """The real 30 s AMI clip the reference ships — genuine silences,
    overlap, channel noise (everything the synthetic tones lack). Trimmed to
    29.5 s so the chunk grid keeps an orphan tail chunk
    ((472000 - 32000) % 6400 = 4800 != 0)."""
    from diarizen_tpu.core.audio import read_wav

    wave, sr = read_wav(EXAMPLE_WAV)
    assert sr == SR
    return np.ascontiguousarray(wave[:, : int(29.5 * SR)]).astype(np.float32)


@pytest.fixture(scope="module", params=["synthetic", "ami"])
def setup(request):
    sd_mod = ref_shim.load_ref_speaker_diarization()
    inference_mod = sys.modules["pyannote.audio.core.inference"]
    clustering_mod = sys.modules["pyannote.audio.pipelines.clustering"]

    eend_t, resnet_t = _build_torch_models()

    conv_config = TINY80_CONFIG["extractor_conv_layer_config"]
    ref_rf = _reference_rf_window(conv_config)

    cfg = EendConfig(
        wavlm=WavLMConfig.from_reference_dict(TINY80_CONFIG),
        conformer=ConformerConfig(dim=32, ffn_hidden=64, num_heads=4,
                                  num_layers=2, use_posi=False,
                                  output_activation=None),
        wavlm_layer_num=TINY80_CONFIG["encoder_num_layers"] + 1,
        wavlm_feat_dim=64, attention_in=32, chunk_size=DURATION,
    )
    # our receptive-field math must agree with the reference's before either
    # side stitches a single frame
    mine_rf = receptive_field_window(cfg)
    assert np.isclose(mine_rf.start, ref_rf.start)
    assert np.isclose(mine_rf.duration, ref_rf.duration)
    assert np.isclose(mine_rf.step, ref_rf.step)

    params, state = eend_params_from_torch(eend_t.state_dict(), cfg)
    rcfg = ResNetConfig(m_channels=8, num_blocks=(1, 1, 1, 1), embed_dim=32)
    rparams = resnet_params_from_torch(resnet_t.state_dict(), rcfg)

    seg_model = TorchSegModel(eend_t, ref_rf)
    ref_inference = inference_mod.Inference(
        seg_model, duration=DURATION, step=STEP, skip_aggregation=True,
        batch_size=5, device=torch.device("cpu"),
    )

    ref_pipeline = object.__new__(sd_mod.SpeakerDiarization)
    ref_pipeline._segmentation = ref_inference
    ref_pipeline._embedding = RefWeSpeakerEmbedding(resnet_t)
    ref_pipeline._audio = RefAudio(SR)
    ref_pipeline.embedding_batch_size = 7
    ref_pipeline.training = False

    wave = _make_wave() if request.param == "synthetic" else _load_example_wave()
    file = {"waveform": torch.from_numpy(wave), "sample_rate": SR,
            "uri": "oracle"}

    # expected chunk grid (both waves keep an orphan tail chunk)
    step_size, win = round(STEP * SR), round(DURATION * SR)
    n_complete = (wave.shape[1] - win) // step_size + 1
    n_chunks = n_complete + ((wave.shape[1] - win) % step_size > 0)

    seg_inf = SlidingInference(
        params, state, cfg, duration=DURATION, step=STEP, batch_size=5,
        compute_dtype=jnp.float32,
    )
    emb_inf = EmbeddingInference(
        rparams, rcfg, window_size=seg_inf.window_size,
        num_speakers=cfg.max_speakers_per_chunk, batch_size=7,
        compute_dtype=None,
    )
    return types.SimpleNamespace(
        clustering_mod=clustering_mod, ref_pipeline=ref_pipeline,
        ref_inference=ref_inference, file=file, wave=wave, cfg=cfg,
        seg_inf=seg_inf, emb_inf=emb_inf, ref_rf=ref_rf, n_chunks=n_chunks,
    )


@needs_reference
def test_slide_engine_matches_reference(setup):
    """(a) The reference Inference.slide() engine vs SlidingInference on the
    same waveform: identical chunk grid, identical hard multilabel output
    (tail chunk included), soft scores allclose."""
    ref_hard = setup.ref_pipeline.get_segmentations(setup.file, soft=False)
    got_hard = setup.seg_inf(setup.wave, SR, soft=False)

    # identical chunk grid: (window, step) and chunk count with the orphan
    # tail chunk (e.g. 116800 samples -> 14 complete + 1 padded tail)
    assert ref_hard.data.shape == got_hard.data.shape == (setup.n_chunks, 399, 4)
    assert ref_hard.sliding_window.duration == got_hard.sliding_window.duration
    assert ref_hard.sliding_window.step == got_hard.sliding_window.step

    # hard outputs are argmax-rounded: compare them on frames where the
    # reference's top-2 margin is comfortably above cross-framework f32
    # noise (~1e-5), and require those frames to be >=99% of all frames —
    # near-tie frames are covered by the soft allclose below instead of
    # making the bit comparison machine-dependent
    step_size = round(STEP * SR)
    win = round(DURATION * SR)
    n = setup.n_chunks
    padded = np.zeros((1, n * step_size + win), np.float32)
    padded[:, : setup.wave.shape[1]] = setup.wave
    chunks = np.stack([padded[0, i * step_size : i * step_size + win]
                       for i in range(n)])
    with torch.no_grad():
        scores = setup.ref_inference.model(torch.from_numpy(chunks[:, None]))
    top2 = np.sort(scores.numpy(), axis=-1)[..., -2:]
    confident = (top2[..., 1] - top2[..., 0]) > 1e-3  # (chunks, frames)
    assert confident.mean() > 0.99, f"only {confident.mean():.1%} confident"

    got_arr = np.asarray(got_hard.data, dtype=np.float32)
    np.testing.assert_array_equal(got_arr[confident], ref_hard.data[confident])

    ref_soft = setup.ref_pipeline.get_segmentations(setup.file, soft=True)
    got_soft = setup.seg_inf(setup.wave, SR, soft=True)
    np.testing.assert_allclose(
        np.asarray(got_soft.data), ref_soft.data, rtol=5e-4, atol=5e-4
    )


def _run_reference_chain(setup, ref_clustering, num_speakers=None,
                         min_speakers=None, max_speakers=None):
    """The composed DiariZen chain, reference code end-to-end
    (diarizen/pipelines/inference.py:121-192). num/min/max follow the
    reference apply()'s set_num_speakers override semantics
    (speaker_diarization.py:471-476, utils/diarization.py:62-64)."""
    diar = ref_shim.load_ref_diarization()
    signal = ref_shim.load_ref_signal()
    min_speakers = num_speakers or min_speakers or 1
    max_speakers = num_speakers or max_speakers or MAX_SPEAKERS

    segmentations = setup.ref_pipeline.get_segmentations(setup.file, soft=False)
    segmentations.data = median_filter(
        segmentations.data, size=(1, 11, 1), mode="reflect"
    )
    binarized = segmentations
    count = diar.SpeakerDiarizationMixin.speaker_count(
        binarized, setup.ref_rf, warm_up=(0.0, 0.0)
    )
    embeddings = setup.ref_pipeline.get_embeddings(
        setup.file, binarized, exclude_overlap=True
    )
    hard_clusters, _, centroids = ref_clustering(
        embeddings=embeddings.copy(), segmentations=binarized,
        num_clusters=num_speakers,
        min_clusters=min_speakers, max_clusters=max_speakers,
    )
    raw_hard = hard_clusters.copy()
    count.data = np.minimum(count.data, max_speakers).astype(np.int8)
    inactive = np.sum(binarized.data, axis=1) == 0
    hard_clusters[inactive] = -2
    discrete, _ = setup.ref_pipeline.reconstruct(segmentations, hard_clusters, count)
    annotation = signal.Binarize(onset=0.5, offset=0.5)(discrete)
    return types.SimpleNamespace(
        binarized=binarized, count=count, embeddings=embeddings,
        hard_clusters=raw_hard, annotation=annotation, centroids=centroids,
    )


def _speaker_partition(ann):
    """Label-name-independent comparison form: the set of per-speaker
    segment sets (our pipeline renames labels to SPEAKER_xx, the reference
    chain keeps integer cluster ids)."""
    by_label = {}
    for seg, _track, label in ann.itertracks(yield_label=True):
        by_label.setdefault(str(label), set()).add(
            (round(seg.start, 9), round(seg.end, 9))
        )
    return sorted(frozenset(v) for v in by_label.values())


def _capture_hook():
    artifacts = {}

    def hook(name, artifact, total=None, completed=None):
        if artifact is not None:
            # snapshot: the pipeline later mutates hard_clusters in place
            # (inactive-speaker -2 marking)
            artifacts[name] = (
                artifact.copy() if isinstance(artifact, np.ndarray) else artifact
            )

    return hook, artifacts


@needs_reference
@pytest.mark.parametrize("fused", [False, True], ids=["host", "fused"])
def test_full_chain_rttm_oracle_ahc(setup, fused):
    """(b) Composed reference chain vs DiarizationPipeline.__call__, AHC."""
    ref_ahc = _make_ref_ahc(setup.clustering_mod, 0.7, "centroid", 2)
    ref_ahc.constrained_assignment = True
    expected = _run_reference_chain(setup, ref_ahc)

    pipeline = DiarizationPipeline(
        seg_inference=setup.seg_inf,
        emb_inference=setup.emb_inf,
        clustering=AgglomerativeClustering(
            threshold=0.7, method="centroid", min_cluster_size=2,
            constrained_assignment=True,
        ),
        eend_cfg=setup.cfg, min_speakers=1, max_speakers=MAX_SPEAKERS,
        fused_stitch=fused,
    )
    hook, artifacts = _capture_hook()
    ann, aligned_centroids = pipeline(
        setup.wave, SR, uri="oracle", hook=hook, return_embeddings=True
    )

    # return_embeddings: row i of the aligned centroids corresponds to
    # annotation.labels()[i]; labels are SPEAKER_ii renamed from the sorted
    # surviving cluster ids, so rows must equal the reference centroids at
    # those ids (apply() surface, speaker_diarization.py:600-636)
    final_ids = sorted({int(c) for c in artifacts["clustering"].reshape(-1)
                        if c >= 0})
    active_ids = [i for i in final_ids if i < expected.centroids.shape[0]]
    assert aligned_centroids.shape[0] == len(ann.labels())
    for row, cid in zip(aligned_centroids, final_ids):
        if cid in active_ids:
            np.testing.assert_allclose(
                row, expected.centroids[cid], rtol=2e-4, atol=2e-4
            )

    # stage-by-stage parity through the hook artifacts
    np.testing.assert_array_equal(
        np.asarray(artifacts["segmentation"].data, np.float32),
        expected.binarized.data,
    )
    np.testing.assert_array_equal(
        np.asarray(artifacts["speaker_counting"].data).squeeze(-1),
        np.asarray(expected.count.data).squeeze(-1),
    )
    np.testing.assert_allclose(
        artifacts["embeddings"], expected.embeddings, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_array_equal(artifacts["clustering"], expected.hard_clusters)

    assert len(_speaker_partition(ann)) > 1  # non-degenerate: >1 speaker found
    assert _speaker_partition(ann) == _speaker_partition(expected.annotation)


@needs_reference
@pytest.mark.parametrize("fused", [False, True], ids=["host", "fused"])
def test_full_chain_rttm_oracle_vbx(setup, fused, tmp_path_factory):
    """(b) Composed reference chain vs DiarizationPipeline.__call__, VBx."""
    rng = np.random.default_rng(7)
    plda_dir = make_plda_dir(tmp_path_factory.mktemp("plda"), rng)

    ref_vbx = setup.clustering_mod.VBxClustering(
        plda_dir=plda_dir, lda_dim=8, maxIters=10
    )
    ref_vbx.ahc_criterion = "distance"
    ref_vbx.ahc_threshold = 0.6
    ref_vbx.Fa = 0.3
    ref_vbx.Fb = 4.0
    expected = _run_reference_chain(setup, ref_vbx)

    pipeline = DiarizationPipeline(
        seg_inference=setup.seg_inf,
        emb_inference=setup.emb_inf,
        clustering=VBxClustering(
            plda_dir=plda_dir, ahc_criterion="distance", ahc_threshold=0.6,
            fa=0.3, fb=4.0, lda_dim=8, max_iters=10,
            constrained_assignment=True,
        ),
        eend_cfg=setup.cfg, min_speakers=1, max_speakers=MAX_SPEAKERS,
        fused_stitch=fused,
    )
    hook, artifacts = _capture_hook()
    ann = pipeline(setup.wave, SR, uri="oracle", hook=hook)

    np.testing.assert_array_equal(artifacts["clustering"], expected.hard_clusters)
    assert _speaker_partition(ann) == _speaker_partition(expected.annotation)


def _assert_hard_clusters_match(got, want, embeddings):
    """Exact raw-hard-cluster equality, except within genuine symmetric
    ties: two speakers of one chunk with bit-identical binary masks get
    bit-identical embeddings, so the constrained Hungarian assignment
    (clustering.py:159-177) may break the tie either way — the final
    partition is unaffected. Real audio (EN2002a) produces such chunks;
    the synthetic tones never did."""
    for c, s in np.argwhere(got != want):
        tied = np.all(embeddings[c] == embeddings[c, s], axis=1)  # bit-equal
        assert tied.sum() > 1, (
            f"chunk {c} speaker {s}: {got[c, s]} != {want[c, s]} and the "
            "embedding row is unique — a real divergence"
        )
        assert sorted(got[c][tied].tolist()) == sorted(want[c][tied].tolist())


@needs_reference
@pytest.mark.parametrize("forced", [2, 3])
def test_full_chain_forced_num_speakers(setup, forced):
    """Composed oracle for the forced `num_speakers` branch of the reference
    apply() (speaker_diarization.py:427-530: set_num_speakers collapses
    min=max=num, the count cap uses num) — previously oracle-tested only at
    the clustering layer."""
    ref_ahc = _make_ref_ahc(setup.clustering_mod, 0.7, "centroid", 2)
    ref_ahc.constrained_assignment = True
    expected = _run_reference_chain(setup, ref_ahc, num_speakers=forced)

    pipeline = DiarizationPipeline(
        seg_inference=setup.seg_inf,
        emb_inference=setup.emb_inf,
        clustering=AgglomerativeClustering(
            threshold=0.7, method="centroid", min_cluster_size=2,
            constrained_assignment=True,
        ),
        eend_cfg=setup.cfg, min_speakers=1, max_speakers=MAX_SPEAKERS,
    )
    hook, artifacts = _capture_hook()
    ann = pipeline(setup.wave, SR, uri="oracle", num_speakers=forced, hook=hook)

    _assert_hard_clusters_match(
        artifacts["clustering"], expected.hard_clusters, artifacts["embeddings"]
    )
    # forced count binds the cluster ids: exactly `forced` clusters exist
    assert int(artifacts["clustering"].max()) + 1 == forced
    assert _speaker_partition(ann) == _speaker_partition(expected.annotation)


@needs_reference
def test_full_chain_min_speakers_floor(setup):
    """Composed oracle for min_speakers > 1 (the reference apply()'s
    min_clusters floor forces AHC to keep at least that many clusters,
    clustering.py set_num_clusters + best_iteration selection)."""
    ref_ahc = _make_ref_ahc(setup.clustering_mod, 0.7, "centroid", 2)
    ref_ahc.constrained_assignment = True
    expected = _run_reference_chain(setup, ref_ahc, min_speakers=3)

    pipeline = DiarizationPipeline(
        seg_inference=setup.seg_inf,
        emb_inference=setup.emb_inf,
        clustering=AgglomerativeClustering(
            threshold=0.7, method="centroid", min_cluster_size=2,
            constrained_assignment=True,
        ),
        eend_cfg=setup.cfg, min_speakers=3, max_speakers=MAX_SPEAKERS,
    )
    hook, artifacts = _capture_hook()
    ann = pipeline(setup.wave, SR, uri="oracle", hook=hook)

    _assert_hard_clusters_match(
        artifacts["clustering"], expected.hard_clusters, artifacts["embeddings"]
    )
    assert int(artifacts["clustering"].max()) + 1 >= 3
    assert _speaker_partition(ann) == _speaker_partition(expected.annotation)


@needs_reference
def test_whole_file_inference_matches_reference(setup):
    """window='whole' mode: one forward over the full waveform, no sliding
    (reference core/inference.py:237-260 + __call__ whole branch :411-442)."""
    import warnings

    inference_mod = sys.modules["pyannote.audio.core.inference"]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref_whole = inference_mod.Inference(
            setup.ref_inference.model, window="whole",
            duration=DURATION, batch_size=5, device=torch.device("cpu"),
        )
    short = setup.wave[:, : SR * 3]
    file = {"waveform": torch.from_numpy(short), "sample_rate": SR,
            "uri": "whole"}
    expected_hard = ref_whole(file, soft=False)
    got_hard = setup.seg_inf.whole(short, SR, soft=False)
    assert got_hard.shape == expected_hard.shape  # (num_frames, 4)
    np.testing.assert_array_equal(got_hard.astype(np.float32), expected_hard)

    expected_soft = ref_whole(file, soft=True)
    got_soft = setup.seg_inf.whole(short, SR, soft=True)
    np.testing.assert_allclose(got_soft, expected_soft, rtol=5e-4, atol=5e-4)


# --------------------------------------------------------------------------
# pre-norm (Large-style) slide parity: layer_norm extractor + waveform norm
# + layer_norm_first encoder — the other model family's code paths
# --------------------------------------------------------------------------

TINY_PRENORM_CONFIG = dict(
    TINY80_CONFIG,
    extractor_mode="layer_norm",
    encoder_layer_norm_first=True,
    normalize_waveform=True,
    # pre-norm family keeps attention everywhere in the tiny config
    encoder_use_attention=[True, True, True],
    encoder_remaining_heads=[[0, 1, 2, 3], [1, 3], [0, 2]],
)


@needs_reference
def test_slide_engine_matches_reference_prenorm(setup):
    """Large-family (pre-norm) model through the reference engine vs
    SlidingInference: waveform layer-norm (model.py:106-113), per-conv-layer
    LN extractor, pre-LN encoder layers."""
    model_mod = _ref_pkg()
    torch.manual_seed(31)
    wavlm_t = model_mod.wav2vec2_model(**TINY_PRENORM_CONFIG).eval()

    conformer_mod = _load_file(
        "ref_conformer_oracle2",
        "/root/reference/diarizen/models/module/conformer.py",
    )
    torch.manual_seed(33)
    conformer_t = conformer_mod.ConformerEncoder(
        attention_in=32, ffn_hidden=64, num_head=4, num_layer=2,
        use_posi=False, output_activate_function=False,
    ).eval()
    n_layers = TINY_PRENORM_CONFIG["encoder_num_layers"] + 1

    class RefEend(torch.nn.Module):
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

    torch.manual_seed(37)
    eend_t = RefEend().eval()

    cfg = EendConfig(
        wavlm=WavLMConfig.from_reference_dict(TINY_PRENORM_CONFIG),
        conformer=ConformerConfig(dim=32, ffn_hidden=64, num_heads=4,
                                  num_layers=2, use_posi=False,
                                  output_activation=None),
        wavlm_layer_num=n_layers, wavlm_feat_dim=64, attention_in=32,
        chunk_size=DURATION,
    )
    params, state = eend_params_from_torch(eend_t.state_dict(), cfg)
    seg_inf = SlidingInference(params, state, cfg, duration=DURATION,
                               step=STEP, batch_size=5,
                               compute_dtype=jnp.float32)

    inference_mod = sys.modules["pyannote.audio.core.inference"]
    rf = _reference_rf_window(TINY_PRENORM_CONFIG["extractor_conv_layer_config"])
    ref_inference = inference_mod.Inference(
        TorchSegModel(eend_t, rf), duration=DURATION, step=STEP,
        skip_aggregation=True, batch_size=5, device=torch.device("cpu"),
    )
    file = dict(setup.file)
    ref_soft = ref_inference(file, soft=True)
    got_soft = seg_inf(setup.wave, SR, soft=True)
    assert ref_soft.data.shape == got_soft.data.shape == (setup.n_chunks, 399, 4)
    np.testing.assert_allclose(
        np.asarray(got_soft.data), ref_soft.data, rtol=7e-4, atol=7e-4
    )

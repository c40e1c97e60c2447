"""Multi-channel diarization pipeline.

Capability parity with the MC recipe inference (recipes/diar_ssl_mc/
infer_avg.py): the MC segmentation model consumes all channels and returns
(scores, spatial attention); embeddings are extracted PER CHANNEL and fused
with attention-derived channel weights (`att_enhanced_emb`, infer_avg.py:
29-41, 68-80); everything downstream (count, clustering, reconstruct) is the
single-channel pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import median_filter

from diarizen_tpu.core.segments import Annotation, SlidingWindowFeature
from diarizen_tpu.infer.pipeline import (
    DiarizationPipeline,
    EmbeddingInference,
    reconstruct,
    speaker_count,
)
from diarizen_tpu.infer.sliding import SlidingWindow, receptive_field_window
from diarizen_tpu.models.eend import EendConfig
from diarizen_tpu.models.mc import FusionConfig, attention_weighted_embeddings, eend_mc_forward
from diarizen_tpu.ops.binarize import Binarize
from diarizen_tpu.ops.powerset import Powerset


class McSlidingInference:
    """Sliding-window inference for the MC model: (C, num_samples) ->
    (binary multilabel SWF, per-chunk spatial attention (chunks, L, F, C, C))."""

    def __init__(
        self,
        params,
        state,
        cfg: EendConfig,
        fcfg: FusionConfig,
        num_channels: int,
        duration: Optional[float] = None,
        step: Optional[float] = None,
        batch_size: int = 8,
        compute_dtype=jnp.bfloat16,
    ):
        self.cfg = cfg
        self.fcfg = fcfg
        self.num_channels = num_channels
        self.duration = duration if duration is not None else cfg.chunk_size
        self.step = step if step is not None else 0.1 * self.duration
        self.batch_size = batch_size
        self.sample_rate = cfg.sample_rate
        self.window_size = round(self.duration * self.sample_rate)
        self.step_size = round(self.step * self.sample_rate)
        self.powerset = cfg.powerset

        mapping = jnp.asarray(self.powerset.mapping)
        self._params = jax.device_put(params)
        self._state = jax.device_put(state)

        def fwd(params, state, wave_device, starts):
            # wave_device: (C, padded); starts: (B,)
            chunks = jax.vmap(
                lambda s: jax.lax.dynamic_slice(
                    wave_device, (0, s), (num_channels, self.window_size)
                )
            )(starts)  # (B, C, window)
            scores, att, _ = eend_mc_forward(
                params, state, cfg, fcfg, chunks, train=False,
                compute_dtype=compute_dtype,
            )
            one_hot = jax.nn.one_hot(
                jnp.argmax(scores, axis=-1), self.powerset.num_powerset_classes,
                dtype=scores.dtype,
            )
            return (one_hot @ mapping).astype(jnp.uint8), att

        jitted = jax.jit(fwd)
        self._fwd = lambda wave, starts: jitted(self._params, self._state, wave, starts)

    def prepare_wave(self, waveform: np.ndarray):
        c, num_samples = waveform.shape
        assert c == self.num_channels, f"expected {self.num_channels} channels, got {c}"
        if num_samples >= self.window_size:
            n_complete = 1 + (num_samples - self.window_size) // self.step_size
        else:
            n_complete = 0
        has_last = (num_samples < self.window_size) or (
            (num_samples - self.window_size) % self.step_size > 0
        )
        total = n_complete + has_last
        starts = np.arange(total, dtype=np.int64) * self.step_size
        pad_to = starts[-1] + self.window_size if total else self.window_size
        wave = np.zeros((c, max(pad_to, self.window_size)), dtype=np.float32)
        wave[:, :num_samples] = waveform
        return jax.device_put(wave), starts

    def __call__(
        self, waveform: np.ndarray, sample_rate: Optional[int] = None,
        hook: Optional[Callable] = None,
    ):
        sample_rate = sample_rate or self.sample_rate
        assert sample_rate == self.sample_rate
        wave_device, starts = self.prepare_wave(waveform)
        total = len(starts)

        pending = []
        for b0 in range(0, total, self.batch_size):
            sb = starts[b0 : b0 + self.batch_size]
            n_real = len(sb)
            if n_real < self.batch_size:
                sb = np.pad(sb, (0, self.batch_size - n_real))
            out, att = self._fwd(wave_device, jnp.asarray(sb, jnp.int32))
            pending.append((out, att, n_real))
            if hook is not None:
                hook("segmentation", None, total=total, completed=b0 + n_real)
        seg = np.vstack([np.asarray(o[:n], dtype=np.float32) for o, _, n in pending])
        att = np.vstack([np.asarray(a[:n], dtype=np.float32) for _, a, n in pending])

        chunks = SlidingWindow(start=0.0, duration=self.duration, step=self.step)
        return SlidingWindowFeature(seg, chunks), att


@dataclass
class McDiarizationPipeline:
    """MC end-to-end: per-channel masked embeddings fused by spatial
    attention, then the standard global clustering + reconstruction."""

    seg_inference: McSlidingInference
    emb_inference: EmbeddingInference
    clustering: Callable
    eend_cfg: EendConfig
    min_speakers: int = 1
    max_speakers: int = 8
    apply_median_filtering: bool = True
    fusion_layer: int = 3

    def __call__(
        self,
        waveform: np.ndarray,
        sample_rate: int = 16000,
        uri: Optional[str] = None,
        num_speakers: Optional[int] = None,
        hook: Optional[Callable] = None,
    ) -> Annotation:
        segmentations, att = self.seg_inference(waveform, sample_rate, hook=hook)
        if self.apply_median_filtering:
            segmentations.data = median_filter(
                segmentations.data, size=(1, 11, 1), mode="reflect"
            )
        binarized = segmentations
        if hook is not None:
            hook("segmentation", binarized)

        frames = receptive_field_window(self.eend_cfg)
        count = speaker_count(binarized, frames, warm_up=(0.0, 0.0))
        if hook is not None:
            hook("speaker_counting", count)
        ann = Annotation(uri=uri)
        if count.data.size == 0 or np.nanmax(count.data) == 0:
            return ann

        embeddings = self.get_embeddings(waveform, binarized, att)
        if hook is not None:
            hook("embeddings", embeddings)

        min_clusters = num_speakers or self.min_speakers
        max_clusters = num_speakers or self.max_speakers
        hard_clusters, _, _ = self.clustering(
            embeddings, binarized.data,
            min_clusters=min_clusters, max_clusters=max_clusters,
        )
        if hook is not None:
            hook("clustering", hard_clusters)
        count.data = np.minimum(count.data, max_clusters).astype(np.int8)
        inactive = np.sum(binarized.data, axis=1) == 0
        hard_clusters[inactive] = -2
        discrete = reconstruct(segmentations, hard_clusters, count)
        if hook is not None:
            hook("discrete_diarization", discrete)
        result = Binarize(onset=0.5, offset=0.5)(discrete)
        result.uri = uri
        return result.rename_labels(
            {label: f"SPEAKER_{i:02d}" for i, label in enumerate(result.labels())}
        )

    def get_embeddings(
        self, waveform: np.ndarray, binarized: SlidingWindowFeature, att: np.ndarray
    ) -> np.ndarray:
        """Per-channel embeddings, attention-weight fused
        (infer_avg.py:29-41, 68-80)."""
        num_chunks, num_frames, num_speakers = binarized.data.shape
        seg_inf = self.seg_inference
        masks = np.nan_to_num(binarized.data, nan=0.0).astype(np.float32)
        weights = np.transpose(masks, (0, 2, 1))  # (chunks, S, frames)

        per_channel: List[np.ndarray] = []
        for c in range(waveform.shape[0]):
            wave_device, starts = self.emb_prepare(waveform[c])
            emb = self.emb_inference(wave_device, starts[:num_chunks], weights)
            per_channel.append(emb)
        per_channel = np.stack(per_channel, axis=1)  # (chunks, C, S, D)
        # reference uses fusion layer 3 of 4; clamp for smaller fusion stacks
        fusion_layer = min(self.fusion_layer, att.shape[1] - 1)
        return attention_weighted_embeddings(per_channel, att, fusion_layer)

    def emb_prepare(self, channel_wave: np.ndarray):
        """Single-channel device waveform + the SAME window starts as the MC
        segmentation engine (incl. the orphan last chunk)."""
        seg = self.seg_inference
        num_samples = channel_wave.shape[0]
        if num_samples >= seg.window_size:
            n_complete = 1 + (num_samples - seg.window_size) // seg.step_size
        else:
            n_complete = 0
        has_last = (num_samples < seg.window_size) or (
            (num_samples - seg.window_size) % seg.step_size > 0
        )
        total = n_complete + has_last
        starts = np.arange(total, dtype=np.int64) * seg.step_size
        pad_to = (starts[-1] + seg.window_size) if total else seg.window_size
        wave = np.zeros(max(pad_to, seg.window_size), dtype=np.float32)
        wave[:num_samples] = channel_wave
        return jax.device_put(wave), starts

"""Full speaker-diarization pipeline: segment -> count -> embed -> cluster ->
reconstruct -> RTTM.

Capability parity with the reference orchestration
(diarizen/pipelines/inference.py:121-192 + pyannote
pipelines/speaker_diarization.py:427-636 + pipelines/utils/diarization.py):
  1. force SDM channel 0;
  2. sliding-window segmentation (hard powerset multilabel, skip-aggregation);
  3. optional median filter (size (1, 11, 1), reflect);
  4. frame-level speaker count (trim warm-up, overlap-add, rint);
  5. per-(chunk, speaker) masked embeddings with exclude-overlap fallback;
  6. global clustering (AHC or VBx);
  7. cap count, mark inactive speakers (-2), reconstruct, keep top-count
     speakers per frame, binarize at 0.5 -> Annotation -> RTTM.

TPU-first deltas (numerics preserved):
  * the embedding model runs ONCE per chunk with an (S, frames) weight matrix
    instead of once per (chunk, speaker) — the reference recomputes the whole
    ResNet34 S times per chunk (speaker_diarization.py:295-356); masked stats
    pooling makes the two mathematically identical;
  * fixed batch shapes everywhere -> one compile per model.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import median_filter

from diarizen_tpu.core.segments import (
    Annotation,
    SlidingWindow,
    SlidingWindowFeature,
)
from diarizen_tpu.infer.sliding import SlidingInference, receptive_field_window
from diarizen_tpu.models.eend import EendConfig
from diarizen_tpu.models.resnet import ResNetConfig, embed_waveforms
from diarizen_tpu.ops.aggregate import aggregate, trim
from diarizen_tpu.ops.binarize import Binarize


def speaker_count(
    binarized: SlidingWindowFeature,
    frames: SlidingWindow,
    warm_up: Tuple[float, float] = (0.1, 0.1),
) -> SlidingWindowFeature:
    """Frame-level instantaneous speaker count
    (pipelines/utils/diarization.py:121-157)."""
    trimmed = trim(binarized, warm_up=warm_up)
    count = aggregate(
        SlidingWindowFeature(
            np.sum(trimmed.data, axis=-1, keepdims=True), trimmed.sliding_window
        ),
        frames,
        hamming=False,
        missing=0.0,
        skip_average=False,
    )
    count.data = np.rint(count.data).astype(np.uint8)
    return count


def to_diarization(
    segmentations: SlidingWindowFeature,
    count: SlidingWindowFeature,
) -> SlidingWindowFeature:
    """Aggregate clustered segmentations and keep the top-count[t] speakers
    per frame (pipelines/utils/diarization.py:192-239)."""
    activations = aggregate(
        segmentations,
        count.sliding_window,
        hamming=False,
        missing=0.0,
        skip_average=True,
    )
    _, num_speakers = activations.data.shape
    max_speakers_per_frame = int(np.max(count.data)) if count.data.size else 0
    if num_speakers < max_speakers_per_frame:
        activations.data = np.pad(
            activations.data, ((0, 0), (0, max_speakers_per_frame - num_speakers))
        )

    # align on the common extent with loose-mode crops: the reference's crop
    # keeps every frame window *overlapping* the extent, so the activation
    # side can carry a couple of trailing frames past the count (they stay 0
    # in the output; oracle-pinned in tests/test_ref_oracles.py)
    extent = activations.extent & count.extent
    activations = activations.crop(extent)
    count = count.crop(extent)

    act = activations.data
    # zip(count, sorted) in the reference truncates to the shorter stream
    n = min(len(count.data), len(act))
    cnt = count.data[:n, 0]

    # vectorized top-count[t] selection (reference loops over frames,
    # diarization.py:233-238): speaker ranked i at frame t is active iff
    # i < count[t]
    order = np.argsort(-act, axis=-1)
    binary = np.zeros_like(act)
    keep = (np.arange(act.shape[1])[None, :] < cnt[:, None]).astype(act.dtype)
    np.put_along_axis(binary[:n], order[:n], keep, axis=1)
    return SlidingWindowFeature(binary, activations.sliding_window)


def reconstruct(
    segmentations: SlidingWindowFeature,
    hard_clusters: np.ndarray,
    count: SlidingWindowFeature,
) -> SlidingWindowFeature:
    """Map local speakers to clusters: NaN-init (chunks, frames, clusters),
    max over same-cluster locals (speaker_diarization.py:377-425)."""
    num_chunks, num_frames, _ = segmentations.data.shape
    num_clusters = int(np.max(hard_clusters)) + 1
    # vectorized over chunks (the reference double-loops chunks x clusters,
    # speaker_diarization.py:404-414 — quadratic host time on multi-hour files)
    clustered = np.full(
        (num_chunks, num_frames, num_clusters), np.nan, dtype=np.float32
    )
    data = segmentations.data
    for k in range(num_clusters):
        member = hard_clusters == k  # (chunks, S)
        has = member.any(axis=1)
        if not has.any():
            continue
        vals = np.max(
            np.where(member[:, None, :], data, -np.inf), axis=2
        )  # (chunks, frames)
        clustered[has, :, k] = vals[has]
    return to_diarization(
        SlidingWindowFeature(clustered, segmentations.sliding_window), count
    )


class EmbeddingInference:
    """Batched per-chunk masked speaker embeddings.

    One compiled forward at fixed (batch, window) shape; each chunk produces
    S embeddings via the (S, frames) weight matrix of the masked stats pool.
    """

    def __init__(
        self,
        params,
        cfg: ResNetConfig,
        window_size: int,
        num_speakers: int,
        batch_size: int = 16,
        mesh=None,
        compute_dtype=None,
        shared_fbank: bool = True,
    ):
        """`compute_dtype=jnp.bfloat16` runs the ResNet trunk in bf16 (MXU
        rate doubles; stats pool stays f32). Default None = f32 for exact
        torch-oracle parity.

        `shared_fbank` computes the log-mel filterbank ONCE over the whole
        file and gathers per-window frame slices from it on device — windows
        overlap 90%, so per-window fbank recomputes ~9.4x the frames. Exact:
        every fbank frame is an independent function of its 400 samples, the
        window grid lands on the 160-sample frame hop, and the per-window CMN
        (wespeaker_fbank) is applied after the gather. Verified bit-equal to
        the per-window path in tests/test_embedding.py."""
        self.cfg = cfg
        self.window_size = window_size
        self.batch_size = batch_size
        self.num_speakers = num_speakers
        self.mesh = mesh
        self.shared_fbank = shared_fbank

        from diarizen_tpu.models.fbank import (
            FRAME_SHIFT,
            kaldi_fbank,
            num_fbank_frames,
        )
        from diarizen_tpu.models.resnet import resnet_forward

        self._frame_shift = FRAME_SHIFT
        frames_per_window = num_fbank_frames(window_size)

        # params as jit args, not closure constants (see sliding.py note)
        self._params = jax.device_put(params)

        def fwd(params, wave_device, starts, weights):
            # device-side window gather (wave shipped once per file; chunks
            # overlap 90% so per-chunk host crops would be ~10x the traffic)
            chunks = jax.vmap(
                lambda s: jax.lax.dynamic_slice(wave_device, (s,), (window_size,))
            )(starts)  # (B, window)
            if chunks.dtype == jnp.int16:  # PCM shipped at half the bytes
                chunks = chunks.astype(jnp.float32) * (1.0 / 32768.0)
            return embed_waveforms(
                params, cfg, chunks, weights, compute_dtype=compute_dtype
            )

        def prep(wave_device):
            # whole-file log-mel, pre-CMN (kaldi expects 16-bit-range floats;
            # int16 PCM is already on that scale)
            w = wave_device.astype(jnp.float32)
            if wave_device.dtype != jnp.int16:
                w = w * 32768.0
            return kaldi_fbank(w[None])[0]  # (T_frames, 80) f32

        def fwd_feats(params, feats, frame_starts, weights):
            windows = jax.vmap(
                lambda s: jax.lax.dynamic_slice(
                    feats, (s, 0), (frames_per_window, feats.shape[1])
                )
            )(frame_starts)  # (B, frames, 80)
            # per-window CMN (wespeaker_fbank's mean subtraction)
            windows = windows - jnp.mean(windows, axis=1, keepdims=True)
            if compute_dtype is not None:
                windows = windows.astype(compute_dtype)
            return resnet_forward(params, cfg, windows, weights)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            shard = NamedSharding(mesh, P("data"))
            assert batch_size % mesh.shape["data"] == 0
            self._params = jax.device_put(params, repl)
            jitted = jax.jit(
                fwd, in_shardings=(None, repl, shard, shard), out_shardings=shard
            )
            self.shared_fbank = False  # window-sharded path gathers from wave
        else:
            jitted = jax.jit(fwd)
        self._fwd = lambda wave, starts, weights: jitted(self._params, wave, starts, weights)
        self._prep = jax.jit(prep)
        _jit_feats = jax.jit(fwd_feats)
        self._fwd_feats = lambda feats, starts, weights: _jit_feats(
            self._params, feats, starts, weights
        )

        # bucket-buffer accumulation variants (zero per-exact-length
        # compiles — see SlidingInference.dispatch)
        def acc(base):
            def fwd_acc(params, buf, src, starts, weights, offset):
                out = base(params, src, starts, weights)
                return jax.lax.dynamic_update_slice(
                    buf, out.astype(buf.dtype), (offset, 0, 0)
                )

            j = jax.jit(fwd_acc, donate_argnums=(1,))
            return lambda buf, src, starts, weights, offset: j(
                self._params, buf, src, starts, weights, offset
            )

        self._fwd_acc = acc(fwd)
        self._fwd_feats_acc = acc(fwd_feats)
        self._embed_dim = int(getattr(cfg, "embed_dim", 0) or 256)

    @property
    def min_num_samples(self) -> int:
        """Smallest crop yielding >= 1 embedding frame (the reference probes
        this by bisection, speaker_verification.py:677-691; analytic here)."""
        from diarizen_tpu.models.fbank import FRAME_LENGTH

        return FRAME_LENGTH

    def __call__(
        self, wave_device, starts: np.ndarray, weights: np.ndarray,
        hook: Optional[Callable] = None,
    ) -> np.ndarray:
        """Device waveform + (N,) window starts + (N, S, F) weights -> (N, S, D)."""
        from diarizen_tpu.utils import halve_batch_or_raise

        while True:
            try:
                outs = self._infer_batches(wave_device, starts, weights, hook)
                break
            except Exception as e:  # noqa: BLE001 — filtered by the helper
                self.batch_size = halve_batch_or_raise(
                    e, self.batch_size, "embedding inference"
                )
                if self.mesh is not None:
                    assert self.batch_size % self.mesh.shape["data"] == 0, (
                        "OOM backoff broke data-axis divisibility; shrink the "
                        "mesh or start from a smaller batch_size"
                    )
        return np.concatenate(outs) if outs else np.zeros((0, self.num_speakers, 256))

    def _tail_size(self, n_real: int) -> int:
        q = 8
        if self.mesh is not None:
            data = self.mesh.shape["data"]
            q = q * data // math.gcd(q, data)
        return min(self.batch_size, ((n_real + q - 1) // q) * q)

    def dispatch(self, wave_device, starts, weights, hook=None):
        """Enqueue all batches; returns one device-side result (no host
        sync). Single-device path accumulates into a bucket-shaped buffer
        (DeviceRows) so no compiled program keys on the exact chunk count
        — see SlidingInference.dispatch; mesh path keeps the sharded
        per-batch concat."""
        n = len(starts)
        if n == 0:
            return None
        starts = np.asarray(starts)
        fwd, fwd_acc = self._fwd, self._fwd_acc
        src = wave_device
        if (
            self.shared_fbank
            and (starts % self._frame_shift == 0).all()
        ):
            # one full-file fbank on device; batches gather frame windows
            src = self._prep(wave_device)
            starts = starts // self._frame_shift
            fwd, fwd_acc = self._fwd_feats, self._fwd_feats_acc

        if self.mesh is not None:
            pending = []
            for b0 in range(0, n, self.batch_size):
                sb = starts[b0 : b0 + self.batch_size]
                wb = weights[b0 : b0 + self.batch_size]
                n_real = len(sb)
                if n_real < self.batch_size:
                    padded = self._tail_size(n_real)
                    sb = np.pad(sb, (0, padded - n_real))
                    pad_spec = ((0, padded - n_real), (0, 0), (0, 0))
                    wb = (
                        jnp.pad(wb, pad_spec)
                        if isinstance(wb, jnp.ndarray)
                        else np.pad(wb, pad_spec)
                    )
                out = fwd(src, jnp.asarray(sb, jnp.int32), jnp.asarray(wb))
                pending.append((out, n_real))
                if hook is not None:
                    hook("embeddings", None, total=n, completed=b0 + n_real)
            return (
                pending[0][0][: pending[0][1]]
                if len(pending) == 1
                else jnp.concatenate([o[:nr] for o, nr in pending])
            )

        from diarizen_tpu.infer.sliding import (
            DeviceRows,
            _slice_rows,
            _zero_rows,
            batch_row_spans,
            chunk_length_bucket,
        )

        weights_on_device = isinstance(weights, jnp.ndarray)
        n_rows = chunk_length_bucket(n)
        buf = _zero_rows(
            (n_rows, self.num_speakers, self._embed_dim), jnp.float32
        )
        for off, blen, pad in batch_row_spans(n, self.batch_size, self._tail_size):
            sb = np.pad(starts[off : off + blen], (0, pad))
            if weights_on_device:
                if blen + pad <= weights.shape[0]:
                    wb = _slice_rows(weights, np.int32(off), blen + pad)
                else:
                    # zero-pad span on an exactly-n-row device array (public
                    # interface; the fused stitch always hands bucket-padded
                    # weights): a per-length pad on this degenerate tiny
                    # file is fine
                    wb = jnp.pad(
                        weights[off : off + blen],
                        ((0, pad), (0, 0), (0, 0)),
                    )
            else:
                wb = jnp.asarray(np.pad(
                    weights[off : off + blen],
                    ((0, pad), (0, 0), (0, 0)),
                ))
            buf = fwd_acc(buf, src, jnp.asarray(sb, jnp.int32), wb, np.int32(off))
            if hook is not None:
                hook("embeddings", None, total=n,
                     completed=min(off + blen + pad, n))
        return DeviceRows(buf, n)

    @staticmethod
    def collect(merged):
        """One d2h of the dispatched result (clustering consumes float64 on
        host; the cast happens host-side after a f32 transfer)."""
        if merged is None:
            return []
        from diarizen_tpu.infer.sliding import DeviceRows

        if isinstance(merged, DeviceRows):
            return [np.asarray(merged.buf)[: merged.n].astype(np.float64)]
        return [np.asarray(merged).astype(np.float64)]

    def _infer_batches(self, wave_device, starts, weights, hook):
        return self.collect(self.dispatch(wave_device, starts, weights, hook))


@dataclass
class DiarizationPipeline:
    """End-to-end diarization: __call__(waveform, sample_rate, uri) -> Annotation."""

    seg_inference: SlidingInference
    emb_inference: EmbeddingInference
    clustering: Callable  # AgglomerativeClustering | VBxClustering
    eend_cfg: EendConfig
    min_speakers: int = 1
    max_speakers: int = 8
    apply_median_filtering: bool = True
    embedding_exclude_overlap: bool = True
    segmentation_step: float = 0.1  # ratio of duration
    # Fused device stitching (infer/fused.py): median filter + speaker
    # count + embedding weights run ON DEVICE between the two model stages,
    # so a file's whole device chain dispatches with zero host syncs and
    # ONE merged fetch. Bit-identical to the host stages (tests/
    # test_fused_stitch.py); auto-disabled for meshes/multi-host where the
    # window-sharding path owns the data movement.
    fused_stitch: bool = True
    _fused: object = field(default=None, init=False, repr=False)
    # centroids of the most recent __call__, aligned to its labels() order
    # (consumed by return_embeddings; per-file in stream mode is racy — use
    # __call__ when centroids are needed)
    _last_centroids: object = field(default=None, init=False, repr=False)

    def __call__(
        self,
        waveform: np.ndarray,
        sample_rate: int = 16000,
        uri: Optional[str] = None,
        num_speakers: Optional[int] = None,
        hook: Optional[Callable] = None,
        return_embeddings: bool = False,
    ) -> Annotation:
        """`hook(step_name, artifact, total=, completed=)` is invoked after
        every stage (and per batch inside segmentation/embedding), matching
        the reference protocol (pipelines/utils/hook.py:36-224,
        speaker_diarization.py:427-636). See `hooks.ProgressHook` /
        `TimingHook` / `ArtifactHook`.

        `return_embeddings=True` additionally returns the representative
        speaker centroids, row i aligned with `annotation.labels()[i]` and
        zero-padded for speakers without a centroid (the reference apply()'s
        return_embeddings surface, speaker_diarization.py:433, 600-636)."""
        if waveform.ndim == 1:
            waveform = waveform[None]
        waveform = waveform[0:1]  # force SDM channel 0 (inference.py:127-128)

        # one waveform h2d for the whole pipeline (the transfer is ~2x the
        # segmentation compute on the axon tunnel; sharing it with the
        # embedding stage halves the pipeline's h2d bytes)
        prepared = self.seg_inference.prepare_wave(waveform)

        ann = None
        st = self._try_dispatch_fused(waveform, prepared, uri, hook)
        if st is not None:
            try:
                ann = self._finish_fused(st, num_speakers, hook)
            except Exception as e:  # noqa: BLE001 — OOM falls back to the
                # host path (which carries its own batch-halving retry)
                from diarizen_tpu.utils import is_oom_error

                if not is_oom_error(e):
                    raise

        if ann is None:
            segmentations = self.seg_inference(
                waveform, sample_rate, soft=False, hook=hook, prepared=prepared
            )
            ann = self._finish_from_segmentations(
                waveform, prepared, segmentations, uri, num_speakers, hook
            )
        if return_embeddings:
            return ann, self._last_centroids
        return ann

    def stream(
        self,
        waveforms,
        sample_rate: int = 16000,
        uris=None,
        num_speakers: Optional[int] = None,
        hook: Optional[Callable] = None,
        trim_every: int = 10,
    ):
        """Pipelined multi-file diarization: yields one Annotation per input
        waveform, in order, with outputs identical to per-file `__call__`.

        File i+1's segmentation batches are dispatched BEFORE file i's
        host-side stages run, so the chip's in-order queue always has work
        and host stitching/clustering + tunnel transfers hide behind device
        compute — the throughput mode for full-eval scoring (the BASELINE
        north-star is audio-s/s over a whole test set, not one file).

        `hook` is shared across in-flight files, so per-batch progress
        callbacks interleave; per-stage artifacts still arrive in file order.

        `trim_every`: every N files, run gc + glibc malloc_trim (no-op on
        other libcs; 0 disables). Long soaks on the axon runtime measured
        ~5 MB/file of host RSS growth; ~30% of it is glibc retention this
        releases. The rest is the runtime retaining every h2d transfer
        buffer for process lifetime (measured linear to >1 GB, unaffected
        by jax.clear_caches — PERF.md round 5); at serving scale recycle
        the worker process every few thousand files.
        """
        import gc
        from itertools import repeat

        def trim():
            gc.collect()
            try:
                import ctypes

                ctypes.CDLL("libc.so.6").malloc_trim(0)
            except Exception:  # noqa: BLE001 — musl/macOS: gc alone
                pass

        uri_iter = iter(uris) if uris is not None else repeat(None)
        prev = None
        done = 0
        for waveform in waveforms:
            if prev is not None and "fused_buf" not in prev:
                # collect file i's segmentation FIRST (its d2h is queued
                # directly behind its own execs, not behind file i+1's), THEN
                # enqueue file i+1's segmentation so the device stays busy
                # while the host runs file i's stitching/embedding/clustering
                prev["segmentations"] = self._collect_segmentations(prev, hook)
            cur = self._dispatch_file(waveform, sample_rate, next(uri_iter), hook)
            if prev is not None:
                yield self._finish_file(prev, num_speakers, hook)
                done += 1
                if trim_every and done % trim_every == 0:
                    trim()
            prev = cur
        if prev is not None:
            yield self._finish_file(prev, num_speakers, hook)

    def _dispatch_file(self, waveform, sample_rate, uri, hook):
        if waveform.ndim == 1:
            waveform = waveform[None]
        waveform = waveform[0:1]
        assert (sample_rate or self.seg_inference.sample_rate) == \
            self.seg_inference.sample_rate, "resample before inference"
        prepared = self.seg_inference.prepare_wave(waveform)
        st = self._try_dispatch_fused(waveform, prepared, uri, hook)
        if st is not None:
            return st
        seg_dev = self.seg_inference.dispatch(
            prepared[0], prepared[1], soft=False, hook=hook
        )
        return {
            "waveform": waveform, "uri": uri,
            "prepared": prepared, "seg_dev": seg_dev,
        }

    # ---- fused device-stitch path (infer/fused.py) --------------------

    def _use_fused(self) -> bool:
        if not self.fused_stitch:
            return False
        # duck-typed custom embedders (tests, alternative backends) may lack
        # the dispatch/mesh interface the fused chain needs
        for inf in (self.seg_inference, self.emb_inference):
            if not hasattr(inf, "dispatch"):
                return False
            if getattr(inf, "mesh", None) is not None:
                return False  # window-sharding path owns data movement
        import jax as _jax

        return _jax.process_count() == 1

    def _get_fused(self):
        if self._fused is None:
            from diarizen_tpu.infer.fused import make_fused_stitch

            self._fused = make_fused_stitch(
                self.eend_cfg,
                self.seg_inference.window_size,
                self.seg_inference.duration,
                self.seg_inference.step,
                self.emb_inference.num_speakers,
                self.emb_inference.min_num_samples,
                apply_median_filtering=self.apply_median_filtering,
                exclude_overlap=self.embedding_exclude_overlap,
            )
        return self._fused

    def _try_dispatch_fused(self, waveform, prepared, uri, hook):
        """Dispatch the file's WHOLE device chain (segmentation -> stitch ->
        embeddings -> merged transport buffer) with no host sync; returns
        the stream-state dict, or None when the fused path doesn't apply."""
        if not self._use_fused():
            return None
        wave_device, starts = prepared
        fs = self._get_fused()
        plan = fs.plan(len(starts))
        if plan is None:
            return None
        try:
            seg_dev = self.seg_inference.dispatch(
                wave_device, starts, soft=False, hook=hook
            )
            if seg_dev is None or seg_dev.dtype != jnp.uint8:
                return None  # empty file / soft scores -> host path
            packed, counts, weights = fs.stitch(seg_dev, plan)
            emb_dev = self.emb_inference.dispatch(
                wave_device, starts[: plan["n_true"]], weights, hook=hook
            )
            from diarizen_tpu.infer.sliding import DeviceRows

            if isinstance(emb_dev, DeviceRows):
                # ship the full bucket-shaped buffer: slicing to ceil8(n)
                # was tried and REVERTED — it keyed the merge programs on
                # ceil8(n_true), reintroducing per-length compiles (~0.5 s
                # each on the tunnel) to save ~2 ms of padding-row fetch.
                # split() slices back to n_true rows host-side.
                emb_dev = emb_dev.buf
            buf = fs.merge(packed, counts, emb_dev)
            # enqueue the d2h right behind this file's own execs — in stream
            # mode the blocking np.asarray() in _finish_fused otherwise
            # issues it only after the NEXT file's work is queued, and the
            # tunnel processes the in-order queue serially
            try:
                buf.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass
        except Exception as e:  # noqa: BLE001 — OOM -> host path w/ backoff
            from diarizen_tpu.utils import is_oom_error

            if not is_oom_error(e):
                raise
            return None
        return {
            "waveform": waveform, "uri": uri, "prepared": prepared,
            "fused_buf": buf, "fused_plan": plan,
            "emb_shape": tuple(emb_dev.shape),
        }

    def _finish_fused(self, st, num_speakers, hook) -> Annotation:
        fs = self._get_fused()
        plan = st["fused_plan"]
        buf = np.asarray(st["fused_buf"])  # THE one host sync per file
        binary, count_data, embeddings = fs.split(buf, plan, st["emb_shape"])

        chunks = SlidingWindow(
            start=0.0,
            duration=self.seg_inference.duration,
            step=self.seg_inference.step,
        )
        segmentations = SlidingWindowFeature(binary, chunks)
        if hook is not None:
            hook("segmentation", segmentations)
        count = SlidingWindowFeature(count_data, fs.out_frames)
        if hook is not None:
            hook("speaker_counting", count)

        ann = Annotation(uri=st["uri"])
        if count.data.size == 0 or np.nanmax(count.data) == 0:
            # reset, else return_embeddings would hand back the PREVIOUS
            # file's centroids; (0, dim) matches the reference's
            # np.zeros((0, dimension)) (speaker_diarization.py:503-509)
            self._last_centroids = np.zeros((0, self._embedding_dim()))
            return ann  # no speech (speaker_diarization.py:503-509)
        return self._cluster_and_reconstruct(
            segmentations, count, embeddings, st["uri"], num_speakers, hook
        )

    def _embedding_dim(self) -> int:
        """Embedding dimensionality of the configured embedder, for the
        reference-matching np.zeros((0, dimension)) no-speech centroid shape
        (speaker_diarization.py:506). Reads EmbeddingInference's own probe
        (_embed_dim) so the two stay consistent; duck-typed test embedders
        fall back to their cfg or 0 columns."""
        dim = getattr(self.emb_inference, "_embed_dim", None)
        if dim is not None:
            return int(dim)
        cfg = getattr(self.emb_inference, "cfg", None)
        for attr in ("embed_dim", "dimension"):
            d = getattr(cfg, attr, None)
            if d is not None:
                return int(d)
        return 0

    def _collect_segmentations(self, st, hook):
        try:
            outputs = self.seg_inference.collect(st["seg_dev"])
            return self.seg_inference.to_feature(outputs)
        except Exception as e:  # noqa: BLE001 — halve_batch re-raises non-OOM
            from diarizen_tpu.utils import halve_batch_or_raise

            self.seg_inference.batch_size = halve_batch_or_raise(
                e, self.seg_inference.batch_size, "segmentation inference"
            )
            return self.seg_inference(
                st["waveform"], soft=False, hook=hook, prepared=st["prepared"]
            )

    def _finish_file(self, st, num_speakers, hook):
        if "fused_buf" in st:
            try:
                return self._finish_fused(st, num_speakers, hook)
            except Exception as e:  # noqa: BLE001 — OOM -> host re-run
                from diarizen_tpu.utils import is_oom_error

                if not is_oom_error(e):
                    raise
                segmentations = self.seg_inference(
                    st["waveform"], soft=False, hook=hook,
                    prepared=st["prepared"],
                )
                return self._finish_from_segmentations(
                    st["waveform"], st["prepared"], segmentations,
                    st["uri"], num_speakers, hook,
                )
        segmentations = st.get("segmentations")
        if segmentations is None:
            segmentations = self._collect_segmentations(st, hook)
        return self._finish_from_segmentations(
            st["waveform"], st["prepared"], segmentations,
            st["uri"], num_speakers, hook,
        )

    def _finish_from_segmentations(
        self, waveform, prepared, segmentations, uri, num_speakers, hook
    ) -> Annotation:
        if self.apply_median_filtering:
            segmentations.data = median_filter(
                segmentations.data, size=(1, 11, 1), mode="reflect"
            )
        binarized = segmentations  # powerset output is already binary
        if hook is not None:
            hook("segmentation", binarized)

        frames = receptive_field_window(self.eend_cfg)
        count = speaker_count(binarized, frames, warm_up=(0.0, 0.0))
        if hook is not None:
            hook("speaker_counting", count)

        ann = Annotation(uri=uri)
        if count.data.size == 0 or np.nanmax(count.data) == 0:
            self._last_centroids = np.zeros((0, self._embedding_dim()))
            return ann  # no speech at all (speaker_diarization.py:503-509)

        embeddings = self.get_embeddings(
            waveform[0], binarized, hook=hook, prepared=prepared
        )
        return self._cluster_and_reconstruct(
            segmentations, count, embeddings, uri, num_speakers, hook
        )

    def _cluster_and_reconstruct(
        self, segmentations, count, embeddings, uri, num_speakers, hook
    ) -> Annotation:
        """Stages 6-7 (clustering -> reconstruct -> binarize -> Annotation),
        shared by the host and fused paths. `segmentations` is the
        median-filtered binarized (chunks, frames, S) feature."""
        binarized = segmentations
        if hook is not None:
            hook("embeddings", embeddings)

        min_clusters = num_speakers or self.min_speakers
        max_clusters = num_speakers or self.max_speakers
        hard_clusters, _, centroids = self.clustering(
            embeddings, binarized.data,
            min_clusters=min_clusters, max_clusters=max_clusters,
        )
        # multi-host: every process clustered the same gathered embeddings;
        # pin host 0's assignment so ties can never diverge across hosts
        # (no-op single-process; SURVEY section 2.5 scale-out flow)
        from diarizen_tpu.parallel.distributed import broadcast_from_host

        hard_clusters = broadcast_from_host(hard_clusters)
        if hook is not None:
            hook("clustering", hard_clusters)

        count.data = np.minimum(count.data, max_clusters).astype(np.int8)
        inactive = np.sum(binarized.data, axis=1) == 0
        hard_clusters[inactive] = -2

        discrete = reconstruct(segmentations, hard_clusters, count)
        if hook is not None:
            hook("discrete_diarization", discrete)
        to_annotation = Binarize(
            onset=0.5, offset=0.5, min_duration_on=0.0, min_duration_off=0.0
        )
        result = to_annotation(discrete)
        result.uri = uri
        labels = result.labels()  # sorted cluster ids
        result = result.rename_labels(
            {label: f"SPEAKER_{i:02d}" for i, label in enumerate(labels)}
        )
        # representative centroids aligned to the renamed labels() order,
        # zero-padded for speakers beyond the centroid count (reference
        # apply() return_embeddings semantics, speaker_diarization.py:600-636)
        dim = centroids.shape[1] if centroids is not None and centroids.ndim == 2 else 0
        aligned = np.zeros((len(labels), dim))
        for i, lab in enumerate(labels):
            if centroids is not None and 0 <= int(lab) < centroids.shape[0]:
                aligned[i] = centroids[int(lab)]
        self._last_centroids = aligned
        return result

    def get_embeddings(
        self, waveform: np.ndarray, binarized: SlidingWindowFeature,
        hook: Optional[Callable] = None,
        prepared=None,
    ) -> np.ndarray:
        """(num_chunks, S, D) embeddings with exclude-overlap mask fallback
        (speaker_diarization.py:228-360, vectorized per chunk)."""
        num_chunks, num_frames, num_speakers = binarized.data.shape
        window_size = self.seg_inference.window_size
        step_size = self.seg_inference.step_size

        masks = np.nan_to_num(binarized.data, nan=0.0).astype(np.float32)
        if self.embedding_exclude_overlap:
            min_num_samples = self.emb_inference.min_num_samples
            min_num_frames = math.ceil(num_frames * min_num_samples / window_size)
            clean = masks * (np.sum(masks, axis=2, keepdims=True) < 2)
            use_clean = np.sum(clean, axis=1) > min_num_frames  # (chunks, spks)
            weights = np.where(use_clean[:, None, :], clean, masks)
        else:
            weights = masks

        # one padded device copy of the waveform, windows gathered on device
        # (shared with the segmentation stage when `prepared` is passed)
        wave_device, starts = (
            prepared if prepared is not None
            else self.seg_inference.prepare_wave(waveform)
        )
        starts = starts[:num_chunks]

        weights = np.transpose(weights, (0, 2, 1))  # (chunks, S, frames)
        # masks from hard multilabel segmentation are binary -> ship uint8
        # (4x less tunnel traffic; stats_pool upcasts to f32 on device)
        if weights.size and np.isin(weights, (0.0, 1.0)).all():
            weights = weights.astype(np.uint8)

        # multi-host fan-out: each process embeds a strided shard of the
        # windows, then the shards are all-gathered back to every host for
        # global clustering (single-process: shard == everything, gather is
        # a copy). SURVEY section 2.5 north-star scale-out.
        from diarizen_tpu.parallel.distributed import (
            gather_window_shards,
            process_window_shard,
        )

        shard = process_window_shard(num_chunks)
        local = self.emb_inference(
            wave_device, starts[shard], weights[shard], hook=hook
        )
        return gather_window_shards(local, num_chunks)

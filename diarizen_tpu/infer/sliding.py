"""Sliding-window inference engine.

Capability parity with the reference engine (pyannote-audio/pyannote/audio/
core/inference.py:237-409 `slide`): unfold the waveform into
(num_chunks, C, window) chunks at `step` seconds, run the segmentation model
in fixed-size batches, convert powerset log-scores to (hard or soft)
multilabel, and return a (num_chunks, frames, K) SlidingWindowFeature with
the chunk SlidingWindow (skip_aggregation mode — stitching happens in
ops/aggregate.py).

TPU-first design:
  * fixed (batch, window) shapes — ONE compiled forward regardless of file
    length; the last partial batch is padded with zero chunks and sliced off,
    so no recompiles across files;
  * powerset -> multilabel conversion runs on device inside the same jit
    (an argmax + one-hot matmul fused into the forward);
  * windows are gathered on device from the full waveform (one host->device
    transfer per file, windows never materialized on host).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diarizen_tpu.core.segments import SlidingWindow, SlidingWindowFeature
from diarizen_tpu.models.eend import EendConfig
from diarizen_tpu.models.forward import segmentation_forward


@functools.partial(jax.jit, static_argnums=1)
def _pad_to(wave: jnp.ndarray, extra: int) -> jnp.ndarray:
    """Device-side zero-pad (prepare_wave length bucketing). The only
    remaining per-length program: its key (chunk-quantized wave length,
    bucket remainder) takes at most `bucket quantum` distinct values per
    bucket, each a trivial compile."""
    return jnp.pad(wave, (0, extra))


@functools.partial(jax.jit, static_argnums=(0, 1))
def _zero_rows(shape, dtype) -> jnp.ndarray:
    """Bucket-shaped accumulation buffer (keyed on the bucket, never the
    exact file length)."""
    return jnp.zeros(shape, dtype)


@functools.partial(jax.jit, static_argnums=(2,))
def _slice_rows(arr: jnp.ndarray, offset, length: int) -> jnp.ndarray:
    """length rows from a TRACED offset — keyed on (arr shape, length),
    both bucket-stable, unlike basic `arr[a:b]` slicing which keys on the
    exact bounds."""
    return jax.lax.dynamic_slice(
        arr, (offset,) + (0,) * (arr.ndim - 1), (length,) + arr.shape[1:]
    )


def batch_row_spans(total: int, batch_size: int, tail_size):
    """(offset, length, pad) spans covering [0, total) in `batch_size` rows:
    full batches, then a right-sized tail drawn from the LAST `tail_size`
    REAL rows (offset shifted back — re-running a few rows beats padding;
    the overwritten overlap rows get identical values). A file smaller than
    one tail quantum zero-pads instead (pad > 0, offset 0). Shared by the
    segmentation and embedding dispatch engines so the subtle tail logic
    has ONE implementation."""
    for b0 in range(0, total, batch_size):
        n_real = min(batch_size, total - b0)
        if n_real == batch_size:
            yield b0, batch_size, 0
        else:
            padded = tail_size(n_real)
            if padded <= total:
                yield total - padded, padded, 0
            else:
                yield 0, n_real, padded - n_real


class DeviceRows:
    """A bucket-shaped device buffer whose first `n` rows are real.

    The batched-dispatch engines accumulate per-batch outputs into one
    bucket-shaped buffer with `lax.dynamic_update_slice` at TRACED offsets,
    so every compiled program keys on the compile bucket — never on the
    exact chunk count. Rows >= n are zeros (or tail-overlap duplicates) and
    are sliced off host-side in collect()."""

    __slots__ = ("buf", "n")

    def __init__(self, buf, n: int):
        self.buf = buf
        self.n = n

    @property
    def dtype(self):
        return self.buf.dtype

    @property
    def shape(self):
        return (self.n,) + tuple(self.buf.shape[1:])


def chunk_length_bucket(n: int, base: int = 32) -> int:
    """Tiered compile buckets over chunk counts: multiples of `base` (32)
    up to 1024, multiples of 256 above. Shared by the wave-length padding
    below and FusedStitch so every per-length jit (segmentation forward,
    shared fbank, stitch) specializes once per BUCKET, not once per exact
    file length — each full-model compile costs 40-100 s through the
    remote-compile tunnel (PERF.md round 4)."""
    b = base if n <= 1024 else max(base, 256)
    return ((n + b - 1) // b) * b


class SlidingInference:
    """Callable: (waveform (C, num_samples), sample_rate) ->
    SlidingWindowFeature (num_chunks, num_frames, K)."""

    def __init__(
        self,
        params,
        state,
        cfg: EendConfig,
        duration: Optional[float] = None,
        step: Optional[float] = None,
        batch_size: int = 32,
        compute_dtype=jnp.bfloat16,
        mesh=None,
    ):
        """With `mesh` (a ('data', 'model') jax Mesh), each window batch is
        sharded over the 'data' axis — windows fan out across chips and
        posteriors gather back to the host (the inference scale-out the
        reference lacks, SURVEY.md section 2.5; batch_size must divide by the
        data-axis size)."""
        self.mesh = mesh
        self.cfg = cfg
        self.duration = duration if duration is not None else cfg.chunk_size
        self.step = step if step is not None else 0.1 * self.duration
        self.batch_size = batch_size
        self.powerset = cfg.powerset
        self.sample_rate = cfg.sample_rate
        self.window_size = round(self.duration * self.sample_rate)
        self.step_size = round(self.step * self.sample_rate)

        mapping = jnp.asarray(self.powerset.mapping)  # (P, K)

        # params/state live on device and are passed as jit ARGUMENTS —
        # closing over them would bake ~100 M weights into the HLO as
        # constants (breaks remote compilation and bloats the executable)
        self._params = jax.device_put(params)
        self._state = jax.device_put(state)
        model_fwd = segmentation_forward(cfg)

        def to_multilabel(scores, soft: bool):
            """(…, P) log-powerset scores -> multilabel: soft = exp @ mapping;
            hard = argmax one-hot @ mapping as uint8 (binary — 4x less tunnel
            traffic). Shared by the sliding and whole-file paths."""
            if soft:
                return jnp.exp(scores) @ mapping
            one_hot = jax.nn.one_hot(
                jnp.argmax(scores, axis=-1), self.powerset.num_powerset_classes,
                dtype=scores.dtype,
            )
            return (one_hot @ mapping).astype(jnp.uint8)

        def whole_fwd(params, state, wave, soft: bool):
            scores, _ = model_fwd(
                params, state, cfg, wave, train=False, compute_dtype=compute_dtype
            )
            return to_multilabel(scores, soft)

        self._whole_fwd = jax.jit(whole_fwd, static_argnames=("soft",))

        def fwd(params, state, wave_device, starts, soft: bool):
            # wave_device: (num_samples_padded,) on device; starts: (B,) int32.
            # vmapped dynamic_slice, NOT an advanced-index gather: a
            # (B, window)-index gather takes minutes to compile on TPU.
            chunks = jax.vmap(
                lambda s: jax.lax.dynamic_slice(wave_device, (s,), (self.window_size,))
            )(starts)  # (B, window)
            if chunks.dtype == jnp.int16:  # PCM shipped at half the bytes
                chunks = chunks.astype(jnp.float32) * (1.0 / 32768.0)
            scores, _ = model_fwd(
                params, state, cfg, chunks, train=False, compute_dtype=compute_dtype
            )  # (B, F, P) log-probs
            return to_multilabel(scores, soft)  # (B, F, K)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            batch_shard = NamedSharding(mesh, P("data"))
            assert batch_size % mesh.shape["data"] == 0, (
                f"batch_size {batch_size} must divide data axis {mesh.shape['data']}"
            )
            self._params = jax.device_put(params, repl)
            self._state = jax.device_put(state, repl)
            jitted = jax.jit(
                fwd,
                static_argnames=("soft",),
                in_shardings=(None, None, repl, batch_shard),
                out_shardings=batch_shard,
            )
        else:
            jitted = jax.jit(fwd, static_argnames=("soft",))
        self._fwd = lambda wave, starts, soft: jitted(
            self._params, self._state, wave, starts, soft
        )

        def fwd_acc(params, state, buf, wave_device, starts, offset, soft):
            # batch forward accumulated into the bucket-shaped buffer at a
            # TRACED offset: the program keys on (bucket rows, batch size),
            # never on the exact chunk count — the round-4 residual ~6 s of
            # per-exact-length pad/slice/concat compiles (PERF.md) was this
            out = fwd(params, state, wave_device, starts, soft)
            return jax.lax.dynamic_update_slice(
                buf, out.astype(buf.dtype), (offset, 0, 0)
            )

        jitted_acc = jax.jit(
            fwd_acc, static_argnames=("soft",), donate_argnums=(2,)
        )
        self._fwd_acc = lambda buf, wave, starts, offset, soft: jitted_acc(
            self._params, self._state, buf, wave, starts, offset, soft
        )
        self._frames_per_chunk = cfg.num_frames(self.window_size)
        self._num_labels = int(mapping.shape[1])

    def _tail_size(self, n_real: int) -> int:
        """Smallest multiple of max(8, data-axis) >= n_real, capped at
        batch_size — the compiled shape for a partial last batch."""
        q = 8
        if self.mesh is not None:
            data = self.mesh.shape["data"]
            q = q * data // math.gcd(q, data)
        return min(self.batch_size, ((n_real + q - 1) // q) * q)

    def dispatch(self, wave_device, starts, soft: bool, hook=None):
        """Enqueue all batches (async dispatch — returns ONE device-side
        result, no host sync). Collect later with `collect`; splitting the
        two lets a caller overlap this file's device compute with another
        file's host-side stages (DiarizationPipeline.stream).

        Single-device path: batches accumulate into a bucket-shaped buffer
        (DeviceRows) via dynamic_update_slice at traced offsets — every
        compiled program keys on the compile bucket, so a NEW exact file
        length in an already-visited bucket triggers zero compiles (the tail
        batch re-runs the last `tail` REAL chunks instead of padding:
        overlap rows are overwritten with identical values). Mesh path keeps
        the per-batch concat (collectives own the data movement there)."""
        total = len(starts)
        if total == 0:
            return None
        if self.mesh is not None:
            pending = []
            for b0 in range(0, total, self.batch_size):
                batch_starts = starts[b0 : b0 + self.batch_size]
                n_real = len(batch_starts)
                if n_real < self.batch_size:
                    padded = self._tail_size(n_real)
                    batch_starts = np.pad(batch_starts, (0, padded - n_real))
                out = self._fwd(
                    wave_device, jnp.asarray(batch_starts, jnp.int32), soft
                )
                pending.append((out, n_real))
                if hook is not None:
                    hook("segmentation", None, total=total, completed=b0 + n_real)
            return (
                pending[0][0][: pending[0][1]]
                if len(pending) == 1
                else jnp.concatenate([out[:n] for out, n in pending])
            )

        n_rows = chunk_length_bucket(total)
        dtype = jnp.float32 if soft else jnp.uint8
        buf = _zero_rows((n_rows, self._frames_per_chunk, self._num_labels), dtype)
        for off, blen, pad in batch_row_spans(total, self.batch_size, self._tail_size):
            sb = np.pad(starts[off : off + blen], (0, pad))
            buf = self._fwd_acc(
                buf, wave_device, jnp.asarray(sb, jnp.int32), np.int32(off), soft
            )
            if hook is not None:
                hook("segmentation", None, total=total,
                     completed=min(off + blen + pad, total))
        return DeviceRows(buf, total)

    @staticmethod
    def collect(merged):
        """One d2h transfer of the dispatched result (per-batch np.asarray
        pays a ~30 ms tunnel round-trip each, which dominated the stage at
        5+ batches per file)."""
        if merged is None:
            return []
        if isinstance(merged, DeviceRows):
            return [np.asarray(merged.buf)[: merged.n].astype(np.float32)]
        return [np.asarray(merged).astype(np.float32)]

    def _infer_batches(self, wave_device, starts, soft: bool, hook):
        return self.collect(self.dispatch(wave_device, starts, soft, hook))

    def num_chunks(self, num_samples: int) -> Tuple[int, bool]:
        if num_samples >= self.window_size:
            n_complete = 1 + (num_samples - self.window_size) // self.step_size
        else:
            n_complete = 0
        has_last = (num_samples < self.window_size) or (
            (num_samples - self.window_size) % self.step_size > 0
        )
        return n_complete, has_last

    def prepare_wave(self, waveform: np.ndarray):
        """Pad + ship the waveform to device ONCE; returns
        (wave_device, starts). The device copy is shared with the embedding
        stage — windows overlap 90%, so gathering on device instead of
        shipping per-chunk crops cuts host->device traffic ~10x.

        PCM-sourced audio (float exactly representable as int16, the common
        WAV case) ships as int16 — half the tunnel bytes, bit-exact f32
        reconstruction on device (x/2^15 is a power-of-two scale)."""
        if waveform.ndim == 2:
            waveform = waveform[0]
        num_samples = waveform.shape[0]
        n_complete, has_last = self.num_chunks(num_samples)
        total = n_complete + has_last
        starts = np.arange(total, dtype=np.int64) * self.step_size
        # pad so every window gather (incl. the orphan last chunk and the
        # batch padding) stays in bounds — to the BUCKETED chunk count, so
        # the device wave shape (and with it every downstream jit: the
        # segmentation forward, the shared full-file fbank) specializes once
        # per length bucket instead of once per exact file length. The
        # bucket padding happens ON DEVICE (a tiny per-length pad program):
        # the host->device transfer still ships only the real samples
        # (+ sub-window rounding), so tunnel bytes are unchanged.
        pad_to = starts[-1] + self.window_size if total else self.window_size
        pad_to = max(pad_to, self.window_size)
        n_bucket = chunk_length_bucket(max(total, 1))
        pad_to_bucket = max(
            pad_to, (n_bucket - 1) * self.step_size + self.window_size
        )

        scaled = waveform.astype(np.float32) * 32768.0
        if (
            np.all(np.abs(scaled) <= 32767.0)
            and np.array_equal(scaled, np.rint(scaled))
        ):
            wave = np.zeros(pad_to, dtype=np.int16)
            wave[:num_samples] = scaled.astype(np.int16)
        else:
            wave = np.zeros(pad_to, dtype=np.float32)
            wave[:num_samples] = waveform
        wave_device = jax.device_put(wave)
        if pad_to_bucket > pad_to:
            wave_device = _pad_to(wave_device, int(pad_to_bucket - pad_to))
        return wave_device, starts

    def __call__(
        self,
        waveform: np.ndarray,
        sample_rate: Optional[int] = None,
        soft: bool = False,
        hook: Optional[Callable] = None,
        prepared=None,
    ) -> SlidingWindowFeature:
        """`hook(step_name, artifact, total=, completed=)` is invoked per batch
        (the reference engine's progress protocol, core/inference.py:85-90 +
        pipelines/utils/hook.py). `prepared` is an optional
        `prepare_wave(waveform)` result — lets the caller ship the waveform to
        device once and share the copy across pipeline stages."""
        sample_rate = sample_rate or self.sample_rate
        assert sample_rate == self.sample_rate, "resample before inference"
        wave_device, starts = prepared if prepared is not None else self.prepare_wave(waveform)

        # device OOM -> halve the batch and re-run (jit re-specializes on the
        # new batch shape); reference equivalent: core/inference.py:216-223
        from diarizen_tpu.utils import halve_batch_or_raise

        while True:
            try:
                outputs = self._infer_batches(wave_device, starts, soft, hook)
                break
            except Exception as e:  # noqa: BLE001 — filtered by the helper
                self.batch_size = halve_batch_or_raise(
                    e, self.batch_size, "segmentation inference"
                )
                if self.mesh is not None:
                    assert self.batch_size % self.mesh.shape["data"] == 0, (
                        "OOM backoff broke data-axis divisibility; shrink the "
                        "mesh or start from a smaller batch_size"
                    )

        return self.to_feature(outputs)

    def to_feature(self, outputs) -> SlidingWindowFeature:
        """Collected batch outputs -> SlidingWindowFeature with the chunk
        window (empty-file case included)."""
        if outputs:
            data = np.vstack(outputs)
        else:
            nf = self.cfg.num_frames(self.window_size)
            data = np.zeros((0, nf, self.powerset.num_classes), dtype=np.float32)

        chunks = SlidingWindow(start=0.0, duration=self.duration, step=self.step)
        return SlidingWindowFeature(data, chunks)

    def whole(
        self,
        waveform: np.ndarray,
        sample_rate: Optional[int] = None,
        soft: bool = False,
    ) -> np.ndarray:
        """Whole-file (non-sliding) inference: ONE forward over the full
        waveform -> (num_frames, K) multilabel scores — the reference
        engine's `window="whole"` mode (core/inference.py:237-260, 411-442;
        recommended there only for short files: memory grows with length and
        WavLM's rel-pos buckets saturate at 800 frames). Each distinct input
        length compiles its own kernel, same as the reference re-running
        cudnn autotuning per shape."""
        sample_rate = sample_rate or self.sample_rate
        assert sample_rate == self.sample_rate, "resample before inference"
        if waveform.ndim == 2:
            waveform = waveform[self.cfg.selected_channel]
        out = self._whole_fwd(
            self._params, self._state,
            jnp.asarray(waveform, jnp.float32)[None], soft
        )
        return np.asarray(out[0])

    def aggregated(
        self,
        waveform: np.ndarray,
        sample_rate: Optional[int] = None,
        soft: bool = True,
        warm_up: Tuple[float, float] = (0.0, 0.0),
    ) -> SlidingWindowFeature:
        """Full-aggregation mode: hamming overlap-add of per-chunk scores to a
        single global frame sequence (the reference engine's default
        skip_aggregation=False path, core/inference.py:543-666) — for
        VAD/OSD-style frame-level consumption."""
        from diarizen_tpu.ops.aggregate import aggregate

        scores = self(waveform, sample_rate, soft=soft)
        if waveform.ndim == 2:
            waveform = waveform[0]
        agg = aggregate(
            scores,
            receptive_field_window(self.cfg),
            warm_up=warm_up,
            hamming=True,
            missing=0.0,
        )
        # trim the padding added to the orphan last chunk
        num_frames_valid = (
            receptive_field_window(self.cfg).closest_frame(
                waveform.shape[0] / self.sample_rate
            )
        )
        agg.data = agg.data[:num_frames_valid]
        return agg


def receptive_field_window(cfg) -> SlidingWindow:
    """Model output frame resolution as a SlidingWindow (the reference's
    `model._receptive_field`, core/model.py:180-195) — any segmentation
    family (conv-stack center for WavLM/SincNet, centered STFT for fbank)."""
    step, duration = cfg.rf_info()
    from diarizen_tpu.ops.receptive_field import multi_conv_receptive_field_center

    if hasattr(cfg, "wavlm"):
        kernels = [k for _, k, _ in cfg.wavlm.conv_layers]
        strides = [s for _, _, s in cfg.wavlm.conv_layers]
        center0 = multi_conv_receptive_field_center(0, kernels, strides)
    else:
        from diarizen_tpu.models.sincnet_eend import (
            SINCNET_KERNELS,
            SINCNET_STRIDES,
            SincNetEendConfig,
        )

        if isinstance(cfg, SincNetEendConfig):
            center0 = multi_conv_receptive_field_center(
                0, SINCNET_KERNELS, SINCNET_STRIDES
            )
        else:  # fbank: frame 0 is centered at t=0 (center=True framing)
            center0 = 0
    # start = (center - (size-1)/2) / sr, NOT center/sr - duration/2: the
    # reference offsets by half of (size-1) samples (core/model.py:188-190);
    # the half-sample difference shifts closest_frame rounding at boundaries
    # (caught by tests/test_full_pipeline_oracle.py)
    size = duration * cfg.sample_rate
    start = (center0 - (size - 1) / 2) / cfg.sample_rate
    return SlidingWindow(start=start, duration=duration, step=step)

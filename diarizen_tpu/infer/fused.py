"""Device-side stage fusion for the diarization pipeline.

In hard-segmentation mode (the pipeline default, soft=False), every host
stage between segmentation and embedding inference is exact integer/binary
math, so it can run on device and the whole per-file chain

    seg forward -> median filter -> speaker count -> embedding weights ->
    embedding forward

dispatches with ZERO host round-trips; the host fetches ONE merged byte
buffer (bit-packed binarized segmentation + frame counts + embedding bytes)
per file. On the TPU tunnel this removes two blocking transfers and one
host stage from the critical path (~60 ms/file, PERF.md); on locally
attached TPUs it removes a device->host->device sync entirely.

Exactness (the DER gate depends on these semantics, so each has a
bit-equality test vs the host implementation in tests/test_fused_stitch.py):

  * median_filter(size=(1,11,1), mode='reflect') on binary data == "at
    least 6 of 11 ones" with half-sample symmetric padding
    (jnp.pad mode='symmetric' == scipy 'reflect');
  * speaker_count (infer/pipeline.py:47, ops/aggregate.py) with
    warm_up=(0,0), hamming=False on binary input is an unweighted
    overlap-add of integer speaker sums, normalized by integer coverage,
    then rint — f32 is exact for the sums, and the single f32 division +
    rint round identically on host and device (IEEE);
  * the overlap-add is evaluated as K= ceil(F/hop) shifted block adds
    (chunk frame starts are affine in the chunk index — verified on host
    per file; non-affine layouts fall back to the host path);
  * embedding weights: the exclude-overlap fallback of
    DiarizationPipeline.get_embeddings (speaker_diarization.py:228-360)
    on binary masks.

Reference: the stages this fuses are pyannote's host-side
`median_filter` + `speaker_count` (pipelines/utils/diarization.py:121-157)
+ mask building (speaker_diarization.py:295-324); the reference runs them
on CPU between two GPU stages.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diarizen_tpu.core.segments import SlidingWindow

_BIT_WEIGHTS = np.array([128, 64, 32, 16, 8, 4, 2, 1], dtype=np.int32)


def _median11_binary(x: jnp.ndarray) -> jnp.ndarray:
    """scipy.ndimage.median_filter(x, size=(1, 11, 1), mode='reflect') for
    binary x (N, F, S): median of 11 zeros/ones == [sum >= 6]."""
    xp = jnp.pad(x.astype(jnp.int32), ((0, 0), (5, 5), (0, 0)), mode="symmetric")
    f = x.shape[1]
    acc = xp[:, 0:f]
    for k in range(1, 11):
        acc = acc + xp[:, k : k + f]
    return (acc >= 6).astype(jnp.uint8)


class FusedStitch:
    """Builds + runs the jitted stitch program for one pipeline config.

    Compiled once per (padded chunk count) bucket; chunk counts are padded
    to multiples of `chunk_bucket`, so an eval set compiles a handful of
    tiny programs (the stitch is elementwise + K block adds).
    """

    def __init__(
        self,
        frames: SlidingWindow,
        chunk_window: SlidingWindow,
        frames_per_chunk: int,
        num_speakers: int,
        *,
        apply_median_filtering: bool = True,
        exclude_overlap: bool = True,
        min_num_frames: int = 0,
        chunk_bucket: int = 32,
    ):
        self.frames = frames
        self.chunks = chunk_window
        self.f = frames_per_chunk
        self.s = num_speakers
        self.median = apply_median_filtering
        self.exclude_overlap = exclude_overlap
        self.min_num_frames = min_num_frames
        self.bucket = chunk_bucket
        # aggregate() output frame grid: starts at the chunk grid origin
        # (ops/aggregate.py:36-38)
        self.out_frames = SlidingWindow(
            start=chunk_window.start, duration=frames.duration, step=frames.step
        )
        self._jit_cache: Dict[int, callable] = {}

    # ---- host-side planning -------------------------------------------

    def _frame_starts(self, n: int) -> np.ndarray:
        """Per-chunk destination frame start, ops/aggregate.py:70-76."""
        c = np.arange(n, dtype=np.float64)
        t = (
            self.chunks.start
            + c * self.chunks.step
            + 0.5 * self.frames.duration
        )
        return np.rint(
            (t - self.out_frames.start - 0.5 * self.out_frames.duration)
            / self.out_frames.step
        ).astype(np.int64)

    def num_frames(self, n: int) -> int:
        """aggregate()'s output length for n chunks (ops/aggregate.py:55-63)."""
        return (
            self.out_frames.closest_frame(
                self.chunks.start
                + self.chunks.duration
                + (n - 1) * self.chunks.step
                + 0.5 * self.frames.duration
            )
            + 1
        )

    def _bucket_pad(self, n: int) -> int:
        """Tiered compile buckets shared with the wave-length padding
        (sliding.chunk_length_bucket): padded chunks only flow through the
        elementwise stitch (segmentation/embedding always run on the REAL
        chunks), so coarse long-file buckets cost ~nothing while cutting
        per-length compiles 8x."""
        from diarizen_tpu.infer.sliding import chunk_length_bucket

        return chunk_length_bucket(n, base=self.bucket)

    def plan(self, num_chunks: int) -> Optional[dict]:
        """Static layout for a file with `num_chunks` chunks, or None when
        the chunk->frame mapping is not affine (host path handles it)."""
        if num_chunks < 1:
            return None
        n_pad = self._bucket_pad(num_chunks)
        starts = self._frame_starts(n_pad)
        base, hop = int(starts[0]), int(starts[1] - starts[0]) if n_pad > 1 else 0
        if n_pad > 1 and (
            hop <= 0
            or not np.array_equal(starts, base + hop * np.arange(n_pad))
        ):
            return None
        return {
            "n_true": num_chunks,
            "n_pad": n_pad,
            "base": base,
            "hop": max(hop, 1),
            "num_frames_pad": self.num_frames(n_pad),
            "num_frames_true": self.num_frames(num_chunks),
        }

    # ---- device program ------------------------------------------------

    def _build(self, n_pad: int, base: int, hop: int, num_frames_pad: int):
        f, s = self.f, self.s
        k_blocks = (f + hop - 1) // hop
        flat_bits = n_pad * f * s
        pad_bits = (-flat_bits) % 8

        def stitch(seg: jnp.ndarray, n_true: jnp.ndarray):
            # seg: (n_pad, f, s) uint8; rows >= n_true are padding
            x = _median11_binary(seg) if self.median else seg.astype(jnp.uint8)
            valid = (jnp.arange(n_pad) < n_true).astype(jnp.float32)

            # --- speaker count: unweighted overlap-add + rint ----------
            spk = jnp.sum(x, axis=-1).astype(jnp.float32) * valid[:, None]
            cov = jnp.broadcast_to(valid[:, None], (n_pad, f))
            fpad = k_blocks * hop - f
            spk = jnp.pad(spk, ((0, 0), (0, fpad)))
            cov = jnp.pad(cov, ((0, 0), (0, fpad)))
            spk = spk.reshape(n_pad, k_blocks, hop)
            cov = cov.reshape(n_pad, k_blocks, hop)
            total = jnp.zeros((n_pad + k_blocks, hop), jnp.float32)
            count = jnp.zeros((n_pad + k_blocks, hop), jnp.float32)
            for k in range(k_blocks):
                # frame = base + (c + k) * hop + r  ->  diagonal block add
                total = jax.lax.dynamic_update_slice(
                    total,
                    jax.lax.dynamic_slice(total, (k, 0), (n_pad, hop))
                    + spk[:, k, :],
                    (k, 0),
                )
                count = jax.lax.dynamic_update_slice(
                    count,
                    jax.lax.dynamic_slice(count, (k, 0), (n_pad, hop))
                    + cov[:, k, :],
                    (k, 0),
                )
            total = total.reshape(-1)
            count = count.reshape(-1)
            avg = total / jnp.maximum(count, 1e-12)  # aggregate() epsilon
            avg = jnp.rint(avg).astype(jnp.uint8)
            counts = jnp.zeros((num_frames_pad,), jnp.uint8)
            take = min(total.shape[0], num_frames_pad - base)
            counts = jax.lax.dynamic_update_slice(counts, avg[:take], (base,))

            # --- embedding weights (exclude-overlap fallback) ----------
            if self.exclude_overlap:
                xi = x.astype(jnp.int32)
                clean = xi * (jnp.sum(xi, axis=2, keepdims=True) < 2)
                use_clean = jnp.sum(clean, axis=1) > self.min_num_frames
                w = jnp.where(use_clean[:, None, :], clean, xi)
            else:
                w = x.astype(jnp.int32)
            weights = jnp.transpose(w, (0, 2, 1)).astype(jnp.uint8)

            # --- bit-pack the filtered binarized segmentation ----------
            bits = x.reshape(-1)
            if pad_bits:
                bits = jnp.pad(bits, (0, pad_bits))
            packed = (
                bits.reshape(-1, 8).astype(jnp.int32)
                @ jnp.asarray(_BIT_WEIGHTS)
            ).astype(jnp.uint8)
            return packed, counts, weights

        return jax.jit(stitch)

    def stitch(self, seg_dev, plan: dict):
        """Device segmentation (DeviceRows bucket buffer from
        SlidingInference.dispatch, or a plain (n_true, F, S) uint8 array) ->
        (packed, counts, weights) device arrays; `weights` keeps all n_pad
        rows (bucket-shaped — the embedding dispatch slices real batches
        with traced offsets so nothing compiles per exact length). No host
        sync."""
        from diarizen_tpu.infer.sliding import DeviceRows

        n_pad = plan["n_pad"]
        key = n_pad
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build(
                n_pad, plan["base"], plan["hop"], plan["num_frames_pad"]
            )
        n_true = plan["n_true"]
        if isinstance(seg_dev, DeviceRows):
            # bucket-shaped already. Rows >= n_true are zeros, EXCEPT for a
            # file smaller than one tail quantum, where the zero-pad-starts
            # batch writes chunk-0 duplicates there — the stitch's `valid`
            # mask and every downstream [:n_true] slice ignore those rows,
            # but do not rely on them being zero
            seg_dev = seg_dev.buf
        if seg_dev.shape[0] < n_pad:
            seg_dev = jnp.pad(
                seg_dev, ((0, n_pad - seg_dev.shape[0]), (0, 0), (0, 0))
            )
        elif seg_dev.shape[0] > n_pad:
            seg_dev = seg_dev[:n_pad]
        packed, counts, weights = self._jit_cache[key](
            seg_dev, jnp.asarray(n_true, jnp.int32)
        )
        return packed, counts, weights

    # ---- merged single-fetch transport ---------------------------------

    @staticmethod
    def merge(packed: jnp.ndarray, counts: jnp.ndarray, emb: jnp.ndarray):
        """One flat uint8 buffer [packed | counts | emb bytes] — a single
        d2h transfer replaces three (~27 ms fixed cost each on the tunnel)."""
        emb_bytes = jax.lax.bitcast_convert_type(
            emb.astype(jnp.float32), jnp.uint8
        ).reshape(-1)
        return jnp.concatenate([packed, counts, emb_bytes])

    def split(
        self, buf: np.ndarray, plan: dict, emb_shape: Tuple[int, ...]
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Host-side inverse of merge(): (binarized (n,F,S) f32,
        counts (num_frames_true, 1) uint8, embeddings f64)."""
        n_pad, n = plan["n_pad"], plan["n_true"]
        n_packed = (n_pad * self.f * self.s + 7) // 8
        packed = buf[:n_packed]
        counts = buf[n_packed : n_packed + plan["num_frames_pad"]]
        emb = np.frombuffer(
            buf[n_packed + plan["num_frames_pad"] :].tobytes(), dtype="<f4"
        ).reshape(emb_shape)
        bits = np.unpackbits(packed)[: n_pad * self.f * self.s]
        binarized = (
            bits.reshape(n_pad, self.f, self.s)[:n].astype(np.float32)
        )
        return (
            binarized,
            counts[: plan["num_frames_true"]].reshape(-1, 1).copy(),
            # embeddings may ride in a bucket-shaped buffer (rows >= n_true
            # are zeros/overlap duplicates) — keep only the real chunks
            emb[:n].astype(np.float64),
        )


def make_fused_stitch(
    eend_cfg,
    window_size: int,
    duration: float,
    step: float,
    num_speakers: int,
    min_num_samples: int,
    *,
    apply_median_filtering: bool = True,
    exclude_overlap: bool = True,
) -> FusedStitch:
    """FusedStitch wired from pipeline-level objects (mirrors the host-side
    constants of DiarizationPipeline.get_embeddings / speaker_count)."""
    from diarizen_tpu.infer.sliding import receptive_field_window

    frames = receptive_field_window(eend_cfg)
    f = eend_cfg.num_frames(window_size)
    min_num_frames = math.ceil(f * min_num_samples / window_size)
    return FusedStitch(
        frames,
        SlidingWindow(start=0.0, duration=duration, step=step),
        f,
        num_speakers,
        apply_median_filtering=apply_median_filtering,
        exclude_overlap=exclude_overlap,
        min_num_frames=min_num_frames,
    )

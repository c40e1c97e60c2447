"""Oracle clustering: map local speakers to reference speakers.

Reference parity: pyannote OracleClustering (clustering.py:516-598) — for
each chunk, PIT-align the binarized local segmentation against the reference
annotation rasterized on the same chunk grid; the permutation IS the cluster
assignment. Used for ceiling analyses of the clustering stage.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from diarizen_tpu.core.segments import Annotation, SlidingWindow, SlidingWindowFeature
from diarizen_tpu.cluster.base import filter_embeddings
from diarizen_tpu.ops.permutation import permutate_hungarian


def oracle_segmentation(
    reference: Annotation,
    window: SlidingWindow,
    num_chunks: int,
    frames: SlidingWindow,
    num_frames: int,
) -> np.ndarray:
    """Rasterize the reference annotation per chunk: (chunks, frames, spk)."""
    labels = reference.labels()
    out = np.zeros((num_chunks, num_frames, max(len(labels), 1)), dtype=np.float32)
    for c in range(num_chunks):
        chunk = window[c]
        for seg, _, label in reference.itertracks():
            if seg.end <= chunk.start or seg.start >= chunk.start + window.duration:
                continue
            k = labels.index(label)
            f0 = max(0, round((seg.start - chunk.start - 0.5 * frames.duration) / frames.step))
            f1 = round((seg.end - chunk.start - 0.5 * frames.duration) / frames.step)
            out[c, f0 : min(f1 + 1, num_frames), k] = 1.0
    return out


class OracleClustering:
    def __init__(self, reference: Annotation, frames: SlidingWindow):
        self.reference = reference
        self.frames = frames

    def __call__(
        self,
        embeddings: Optional[np.ndarray],
        binary_segmentations: np.ndarray,
        window: Optional[SlidingWindow] = None,
        min_clusters=None,
        max_clusters=None,
    ) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
        num_chunks, num_frames, num_speakers = binary_segmentations.shape
        assert window is not None, "OracleClustering needs the chunk window"
        oracle = oracle_segmentation(
            self.reference, window, num_chunks, self.frames, num_frames
        )
        num_clusters = oracle.shape[2]

        hard = -2 * np.ones((num_chunks, num_speakers), dtype=np.int8)
        soft = np.zeros((num_chunks, num_speakers, num_clusters))
        for c in range(num_chunks):
            # align ORACLE columns onto the local segmentation
            _, perm = permutate_hungarian(
                oracle[c][None], binary_segmentations[c][None].astype(np.float64)
            )
            for j, i in enumerate(perm[0]):
                if i < 0 or i >= num_speakers:
                    continue
                hard[c, i] = j
                soft[c, i, j] = 1.0

        if embeddings is None:
            return hard, soft, None
        train_embeddings, chunk_idx, speaker_idx = filter_embeddings(
            embeddings, binary_segmentations
        )
        train_clusters = hard[chunk_idx, speaker_idx]
        centroids = np.vstack([
            np.mean(train_embeddings[train_clusters == k], axis=0)
            if np.any(train_clusters == k)
            else np.zeros(embeddings.shape[-1])
            for k in range(num_clusters)
        ])
        return hard, soft, centroids

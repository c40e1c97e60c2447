"""Kaldi-style metadata io: RTTM, UEM, wav.scp.

Reference behavior: recipes/diar_ssl/dataset.py:150-194 (RTTM parsing into
structured arrays), diarizen/pipelines/utils.py (scp2path), dscore scoring
inputs (RTTM/UEM).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

from diarizen_tpu.core.segments import Annotation, Segment, Timeline


def load_rttm(path: str | Path) -> Dict[str, Annotation]:
    """Parse an RTTM file into per-recording Annotations."""
    annotations: Dict[str, Annotation] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(";"):
                continue
            fields = line.split()
            if fields[0] != "SPEAKER":
                continue
            uri = fields[1]
            start = float(fields[3])
            duration = float(fields[4])
            speaker = fields[7]
            ann = annotations.setdefault(uri, Annotation(uri=uri))
            track = len(ann)
            ann[Segment(start, start + duration), track] = speaker
    return annotations


def write_rttm(path: str | Path, annotations: List[Annotation]) -> None:
    with open(path, "w") as f:
        for ann in annotations:
            f.write(ann.to_rttm())


def load_uem(path: str | Path) -> Dict[str, Timeline]:
    """Parse a UEM file: `<uri> <channel> <start> <end>` per line."""
    uems: Dict[str, Timeline] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(";"):
                continue
            uri, _channel, start, end = line.split()[:4]
            uems.setdefault(uri, Timeline()).add(Segment(float(start), float(end)))
    return uems


def load_scp(path: str | Path) -> Dict[str, str]:
    """Parse wav.scp: `<uri> <path>` per line."""
    out: Dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            uri, wav_path = line.split(maxsplit=1)
            out[uri] = wav_path
    return out


def rttm_to_arrays(
    annotations: Dict[str, Annotation]
) -> Tuple[np.ndarray, List[str], Dict[str, List[str]]]:
    """Flatten RTTM annotations into a structured numpy array for fast chunk
    cropping during training (reference: recipes/diar_ssl/dataset.py:150-194).

    Returns
    -------
    data : structured array with fields
        (session_idx:int32, start:float64, end:float64, speaker_idx:int32)
    sessions : list of session uris (index = session_idx)
    speakers : per-session ordered speaker lists (index = speaker_idx)
    """
    sessions = sorted(annotations.keys())
    speakers: Dict[str, List[str]] = {}
    rows = []
    for si, uri in enumerate(sessions):
        ann = annotations[uri]
        spk_list = ann.labels()
        speakers[uri] = spk_list
        spk_index = {s: i for i, s in enumerate(spk_list)}
        for seg, _, label in ann.itertracks():
            rows.append((si, seg.start, seg.end, spk_index[label]))
    dtype = np.dtype(
        [
            ("session_idx", np.int32),
            ("start", np.float64),
            ("end", np.float64),
            ("speaker_idx", np.int32),
        ]
    )
    data = np.array(rows, dtype=dtype)
    return data, sessions, speakers

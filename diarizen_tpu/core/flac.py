"""Native FLAC decoding via a small C++ library (ctypes).

The reference stack decodes FLAC through torchaudio/libsndfile
(pyannote-audio core/io.py:436). This module loads
``core/_flac/flacdec.cpp`` — a self-contained FLAC bitstream decoder —
compiling it on first use with g++ into a content-hashed shared object next
to the source, so rebuilds happen exactly when the source changes.

Public API mirrors :mod:`diarizen_tpu.core.audio`'s WAV functions:

- :func:`read_flac` -> (float32 [channels, samples], sample_rate)
- :func:`get_flac_info` -> (num_samples, sample_rate, num_channels)

FLAC frames are not random-access without decoding (no sample index), so
cropped reads decode the whole file once and keep a tiny LRU of decoded
waveforms — the training dataset's per-chunk ``crop`` calls then cost one
decode per file, not per chunk.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from collections import OrderedDict
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_SRC = Path(__file__).parent / "_flac" / "flacdec.cpp"
_LOCK = threading.Lock()
_LIB = None

_ERRORS = {
    -1: "bad magic / truncated metadata",
    -2: "missing STREAMINFO",
    -3: "bad frame header / lost sync",
    -4: "bad subframe or residual",
    -5: "frame header CRC-8 mismatch",
    -6: "frame CRC-16 mismatch",
    -7: "allocation failure",
}


def _build_library() -> Path:
    src = _SRC.read_bytes()
    tag = hashlib.sha1(src).hexdigest()[:12]
    lib_path = _SRC.parent / f"libflacdec_{tag}.so"
    if lib_path.exists():
        return lib_path
    with tempfile.NamedTemporaryFile(
        suffix=".so", dir=_SRC.parent, delete=False
    ) as tmp:
        tmp_path = tmp.name
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", tmp_path, str(_SRC)],
            check=True,
            capture_output=True,
            text=True,
        )
        os.replace(tmp_path, lib_path)  # atomic: concurrent builds both win
    except FileNotFoundError:
        os.unlink(tmp_path)
        raise RuntimeError(
            "FLAC decoding needs g++ to build the native decoder "
            f"({_SRC}); install g++ or convert the file to WAV"
        ) from None
    except subprocess.CalledProcessError as e:
        os.unlink(tmp_path)
        raise RuntimeError(f"FLAC decoder build failed:\n{e.stderr}") from None
    return lib_path


def _lib():
    global _LIB
    if _LIB is None:
        with _LOCK:
            if _LIB is None:
                lib = ctypes.CDLL(str(_build_library()))
                lib.flac_decode.restype = ctypes.c_int
                lib.flac_decode.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                ]
                lib.flac_free.restype = None
                lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
                _LIB = lib
    return _LIB


def decode_flac_bytes(data: bytes) -> Tuple[np.ndarray, int, int]:
    """Decode a FLAC byte string -> (int32 [channels, samples], rate, bits)."""
    lib = _lib()
    out = ctypes.POINTER(ctypes.c_int32)()
    frames = ctypes.c_int64()
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    bits = ctypes.c_int32()
    rc = lib.flac_decode(
        data,
        len(data),
        ctypes.byref(out),
        ctypes.byref(frames),
        ctypes.byref(channels),
        ctypes.byref(rate),
        ctypes.byref(bits),
    )
    if rc != 0:
        raise ValueError(f"FLAC decode failed: {_ERRORS.get(rc, rc)}")
    try:
        n = frames.value * channels.value
        interleaved = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.flac_free(out)
    x = interleaved.reshape(frames.value, channels.value).T
    return np.ascontiguousarray(x), rate.value, bits.value


def _read_all_bytes(path) -> bytes:
    if hasattr(path, "read"):
        path.seek(0)
        return path.read()
    return Path(path).read_bytes()


# Decoded-waveform LRU: FLAC has no per-sample random access, so cropped reads
# decode once per file. Keyed by (path, mtime, size); file-like objects bypass.
# Byte-budgeted (an hour of 16 kHz mono f32 is ~230 MB — per-file LRU counts
# would silently pin gigabytes across data-loader workers). Override with
# DIARIZEN_FLAC_CACHE_MB=0 to disable caching entirely.
_CACHE: "OrderedDict[tuple, Tuple[np.ndarray, int]]" = OrderedDict()
_CACHE_MAX_BYTES = int(os.environ.get("DIARIZEN_FLAC_CACHE_MB", "512")) * (1 << 20)
_CACHE_BYTES = 0


def _decode_cached(path) -> Tuple[np.ndarray, int]:
    global _CACHE_BYTES
    key = None
    if not hasattr(path, "read"):
        st = os.stat(path)
        key = (str(path), st.st_mtime_ns, st.st_size)
        with _LOCK:
            if key in _CACHE:
                _CACHE.move_to_end(key)
                return _CACHE[key]
    x, rate, bits = decode_flac_bytes(_read_all_bytes(path))
    wave = (x.astype(np.float32) / float(1 << (bits - 1))).astype(np.float32)
    wave.flags.writeable = False  # callers get copies; the cache stays pristine
    if key is not None and wave.nbytes <= _CACHE_MAX_BYTES:
        with _LOCK:
            _CACHE[key] = (wave, rate)
            _CACHE_BYTES += wave.nbytes
            while _CACHE_BYTES > _CACHE_MAX_BYTES and _CACHE:
                _, (old, _r) = _CACHE.popitem(last=False)
                _CACHE_BYTES -= old.nbytes
    return wave, rate


def read_flac(
    path,
    start_frame: int = 0,
    num_frames: Optional[int] = None,
) -> Tuple[np.ndarray, int]:
    """Read a FLAC file into float32 in [-1, 1] — (channels, samples), rate."""
    wave, rate = _decode_cached(path)
    total = wave.shape[-1]
    if num_frames is None:
        num_frames = total - start_frame
    start = max(0, min(start_frame, total))
    stop = max(start, min(start_frame + num_frames, total))
    # Always copy: a full-range slice would alias the (read-only) cached array.
    return wave[:, start:stop].copy(), rate


def get_flac_info(path) -> Tuple[int, int, int]:
    """(num_samples, sample_rate, num_channels) from STREAMINFO only."""
    if hasattr(path, "read"):
        path.seek(0)
        head = path.read(256)
    else:
        with open(path, "rb") as fh:
            head = fh.read(256)
    if head[:4] != b"fLaC":
        raise ValueError(f"{path}: not a FLAC file")
    pos = 4
    while pos + 4 <= len(head):
        hdr = head[pos]
        length = int.from_bytes(head[pos + 1 : pos + 4], "big")
        pos += 4
        if hdr & 0x7F == 0:  # STREAMINFO
            s = head[pos : pos + 34]
            rate = (s[10] << 12) | (s[11] << 4) | (s[12] >> 4)
            channels = ((s[12] >> 1) & 0x7) + 1
            total = ((s[13] & 0x0F) << 32) | int.from_bytes(s[14:18], "big")
            return total, rate, channels
        pos += length
        if hdr & 0x80:
            break
    raise ValueError(f"{path}: missing STREAMINFO")

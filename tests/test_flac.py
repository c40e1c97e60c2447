"""Round-trip tests for the native FLAC decoder (core/_flac/flacdec.cpp).

The reference decodes FLAC through torchaudio/libsndfile
(pyannote-audio core/io.py:436); this repo ships its own bitstream decoder.
No FLAC tooling exists in the image, so tests/flac_ref_encoder.py encodes
known samples per the public spec and every test asserts bit-exact recovery.
"""

import io

import numpy as np
import pytest

from diarizen_tpu.core import flac as flac_mod
from diarizen_tpu.core.audio import Audio, get_audio_info, read_audio, write_wav
from diarizen_tpu.core.flac import decode_flac_bytes, get_flac_info, read_flac
from diarizen_tpu.core.segments import Segment

from flac_ref_encoder import encode_flac


def _rand(rng, shape, bps, scale=1.0):
    lim = int((1 << (bps - 1)) * scale) - 1
    return rng.integers(-lim, lim + 1, size=shape, dtype=np.int64)


def _roundtrip(x, bps=16, rate=16000, **kw):
    data = encode_flac(x, rate, bps=bps, **kw)
    got, got_rate, got_bits = decode_flac_bytes(data)
    assert got_rate == rate and got_bits == bps
    np.testing.assert_array_equal(got, np.atleast_2d(np.asarray(x, np.int64)))
    return data


def test_verbatim_mono():
    rng = np.random.default_rng(0)
    _roundtrip(_rand(rng, 1000, 16), blocksize=256)


def test_constant_subframe():
    x = np.full((1, 777), -12345, dtype=np.int64)
    _roundtrip(x, blocksize=777, specs=[{"kind": "constant"}])


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders_with_partitions(order):
    rng = np.random.default_rng(order)
    x = np.cumsum(_rand(rng, 512, 8), dtype=np.int64)[None]  # smooth-ish
    _roundtrip(
        x, bps=16, blocksize=512,
        specs=[{"kind": "fixed", "order": order, "porder": 2}],
    )


@pytest.mark.parametrize("order,shift,method", [(1, 3, 0), (8, 5, 0), (32, 9, 1)])
def test_lpc_orders(order, shift, method):
    rng = np.random.default_rng(order)
    x = _rand(rng, 400, 12)[None]  # small amplitude keeps rice quotients sane
    _roundtrip(
        x, bps=16, blocksize=400,
        specs=[{"kind": "lpc", "order": order, "shift": shift,
                "method": method, "porder": 1 if order <= 8 else 0}],
    )


def test_rice2_and_escape_partitions():
    rng = np.random.default_rng(7)
    x = _rand(rng, 1024, 16)[None]
    _roundtrip(x, blocksize=1024,
               specs=[{"kind": "fixed", "order": 1, "method": 1, "porder": 3}])
    _roundtrip(x, blocksize=1024,
               specs=[{"kind": "fixed", "order": 2, "porder": 2, "escape": True}])


def test_escape_partition_raw_zero():
    x = np.zeros((1, 256), dtype=np.int64)
    _roundtrip(x, blocksize=256,
               specs=[{"kind": "fixed", "order": 0, "escape": True}])


def test_wasted_bits():
    rng = np.random.default_rng(3)
    x = (_rand(rng, 300, 12) << 3)[None]  # 3 guaranteed-zero LSBs
    _roundtrip(x, bps=16, blocksize=300,
               specs=[{"kind": "verbatim", "wasted": 3}])
    _roundtrip(x, bps=16, blocksize=300,
               specs=[{"kind": "lpc", "order": 2, "wasted": 3, "method": 1}])


@pytest.mark.parametrize("stereo", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_assignments(stereo):
    rng = np.random.default_rng(hash(stereo) % 2**31)
    x = _rand(rng, (2, 600), 16)
    _roundtrip(x, blocksize=200, stereo=stereo,
               specs=[{"kind": "fixed", "order": 2, "porder": 1},
                      {"kind": "verbatim"}])


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_bit_depths(bps):
    rng = np.random.default_rng(bps)
    _roundtrip(_rand(rng, (2, 333), bps), bps=bps, blocksize=128, stereo="mid_side")


def test_multi_frame_and_block_size_codes():
    rng = np.random.default_rng(11)
    # 200 frames of 192 (fixed code 1) exercises multi-byte UTF-8 frame numbers.
    x = _rand(rng, 192 * 200 + 57, 16)
    data = _roundtrip(x, blocksize=192)
    assert len(data) > 192 * 200 * 2 // 8
    # 8-bit (code 6) and 16-bit (code 7) explicit block sizes.
    _roundtrip(_rand(rng, 500, 16), blocksize=250, bs_mode="explicit")
    _roundtrip(_rand(rng, 700, 16), blocksize=300, bs_mode="explicit")


def test_extra_metadata_block_skipped():
    rng = np.random.default_rng(5)
    _roundtrip(_rand(rng, 256, 16), blocksize=256, extra_metadata=True)


def test_trailing_garbage_tolerated():
    rng = np.random.default_rng(9)
    x = _rand(rng, 1024, 16)
    id3v1 = b"TAG" + bytes(125)
    data = encode_flac(x, 16000, trailing=id3v1)
    got, rate, bits = decode_flac_bytes(data)
    np.testing.assert_array_equal(got[0], x)
    # Garbage-only payload (no frames) still errors.
    head = data[: data.index(b"\xff\xf8")]
    with pytest.raises(ValueError, match="lost sync"):
        decode_flac_bytes(head + bytes(64))


def test_corrupt_crc_detected():
    rng = np.random.default_rng(13)
    data = bytearray(encode_flac(_rand(rng, 256, 16), 16000, blocksize=256))
    data[-40] ^= 0x40  # flip a payload bit inside the only frame
    with pytest.raises(ValueError):
        decode_flac_bytes(bytes(data))


def test_get_flac_info_and_read(tmp_path):
    rng = np.random.default_rng(21)
    x = _rand(rng, (2, 5000), 16)
    path = tmp_path / "a.flac"
    path.write_bytes(encode_flac(x, 22050, blocksize=1000))
    assert get_flac_info(path) == (5000, 22050, 2)
    wave, rate = read_flac(path)
    assert rate == 22050 and wave.shape == (2, 5000)
    np.testing.assert_array_equal((wave * 32768.0).astype(np.int64), x)
    crop, _ = read_flac(path, 1234, 100)
    np.testing.assert_array_equal(crop, wave[:, 1234:1334])
    tail, _ = read_flac(path, 4990, 100)  # clamped at EOF
    assert tail.shape == (2, 10)


def test_cache_isolation_and_budget(tmp_path, monkeypatch):
    rng = np.random.default_rng(31)
    x = _rand(rng, 2048, 16)
    path = tmp_path / "c.flac"
    path.write_bytes(encode_flac(x, 16000))
    first, _ = read_flac(path)
    first[:] = 0.0  # mutating a result must not corrupt the cache
    again, _ = read_flac(path)
    np.testing.assert_array_equal((again[0] * 32768.0).astype(np.int64), x)

    monkeypatch.setattr(flac_mod, "_CACHE_MAX_BYTES", 0)
    monkeypatch.setattr(flac_mod, "_CACHE_BYTES", 0)
    monkeypatch.setattr(flac_mod, "_CACHE", type(flac_mod._CACHE)())
    w, _ = read_flac(path)  # budget 0: decode works, nothing cached
    assert len(flac_mod._CACHE) == 0
    np.testing.assert_array_equal((w[0] * 32768.0).astype(np.int64), x)


def test_read_audio_and_info_dispatch(tmp_path):
    rng = np.random.default_rng(41)
    x = _rand(rng, (1, 16000), 16)
    fpath = tmp_path / "d.flac"
    fpath.write_bytes(encode_flac(x, 16000))
    wave, rate = read_audio(fpath)
    assert rate == 16000 and wave.shape == (1, 16000)
    assert get_audio_info(fpath) == (16000, 16000, 1)
    # file-like dispatch sniffs the fLaC magic
    buf = io.BytesIO(fpath.read_bytes())
    wave2, _ = read_audio(buf)
    np.testing.assert_array_equal(wave, wave2)
    assert get_audio_info(io.BytesIO(fpath.read_bytes())) == (16000, 16000, 1)


def test_audio_crop_flac_matches_wav(tmp_path):
    rng = np.random.default_rng(51)
    x = _rand(rng, (1, 32000), 16)
    fpath = tmp_path / "e.flac"
    wpath = tmp_path / "e.wav"
    fpath.write_bytes(encode_flac(x, 16000))
    write_wav(wpath, x.astype(np.float32) / 32768.0, 16000)
    audio = Audio(sample_rate=16000, mono="downmix")
    assert audio.get_duration(fpath) == audio.get_duration(wpath) == 2.0
    seg = Segment(0.25, 1.75)
    from_flac, _ = audio.crop(fpath, seg)
    from_wav, _ = audio.crop(wpath, seg)
    np.testing.assert_allclose(from_flac, from_wav, atol=1.0 / 32768.0)
    # padded out-of-bounds crop
    padded, _ = audio.crop(fpath, Segment(1.5, 2.5), mode="pad")
    assert padded.shape == (1, 16000)
    np.testing.assert_array_equal(padded[:, 8000:], 0.0)

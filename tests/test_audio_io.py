import numpy as np
import pytest

from diarizen_tpu.core.audio import (
    Audio,
    get_wav_info,
    read_audio,
    read_wav,
    write_wav,
)
from diarizen_tpu.core.io_rttm import load_rttm, load_scp, load_uem, rttm_to_arrays
from diarizen_tpu.core.segments import Segment


@pytest.fixture
def wav_file(tmp_path, rng):
    sr = 16000
    wave = rng.standard_normal((2, sr * 2)).astype(np.float32) * 0.1
    path = tmp_path / "test.wav"
    write_wav(path, wave, sr)
    return path, wave, sr


def test_read_roundtrip(wav_file):
    path, wave, sr = wav_file
    out, out_sr = read_wav(path)
    assert out_sr == sr
    assert out.shape == wave.shape
    np.testing.assert_allclose(out, wave, atol=1e-4)  # PCM16 quantization


def test_reference_example_wav_loads():
    out, sr = read_wav("/root/reference/example/EN2002a_30s.wav")
    assert sr == 16000
    assert out.shape[0] >= 1
    assert abs(out.shape[1] / sr - 30.0) < 0.5


def test_read_audio_dispatch(wav_file, tmp_path):
    """read_audio: WAV and FLAC decode natively (FLAC via core/flac.py's C++
    decoder — round-trip coverage in test_flac.py); other formats without
    soundfile raise an actionable error naming the missing decoder (reference
    loads anything torchaudio does, core/io.py:436)."""
    path, wave, sr = wav_file
    out, out_sr = read_audio(path)
    assert out_sr == sr and out.shape == wave.shape

    flac = tmp_path / "x.flac"
    flac.write_bytes(b"fLaC\x00\x00\x00\x22")  # truncated: dispatched natively
    with pytest.raises(ValueError, match="FLAC decode failed"):
        read_audio(flac)

    ogg = tmp_path / "x.ogg"
    ogg.write_bytes(b"OggS")
    try:
        import soundfile  # noqa: F401
    except ImportError:
        with pytest.raises(ValueError, match="soundfile"):
            read_audio(ogg)


def test_get_wav_info(wav_file):
    path, wave, sr = wav_file
    n, rate, ch = get_wav_info(path)
    assert (n, rate, ch) == (wave.shape[1], sr, 2)


def test_audio_downmix_and_crop(wav_file):
    path, wave, sr = wav_file
    audio = Audio(sample_rate=sr, mono="downmix")
    full, _ = audio(path)
    assert full.shape == (1, wave.shape[1])
    np.testing.assert_allclose(full[0], wave.mean(0), atol=1e-4)

    crop, _ = audio.crop(path, Segment(0.5, 1.0))
    assert crop.shape == (1, sr // 2)
    np.testing.assert_allclose(crop[0], wave.mean(0)[sr // 2 : sr], atol=1e-4)


def test_audio_crop_pads_out_of_bounds(wav_file):
    path, wave, sr = wav_file
    audio = Audio(sample_rate=sr, mono="downmix")
    crop, _ = audio.crop(path, Segment(1.5, 3.0))  # file is 2 s long
    assert crop.shape == (1, int(1.5 * sr))
    assert np.all(crop[0, sr // 2 :] == 0)


def test_rttm_uem_scp_io(tmp_path):
    rttm = tmp_path / "ref.rttm"
    rttm.write_text(
        "SPEAKER rec1 1 0.5 2.0 <NA> <NA> alice <NA> <NA>\n"
        "SPEAKER rec1 1 3.0 1.0 <NA> <NA> bob <NA> <NA>\n"
        "SPEAKER rec2 1 0.0 5.0 <NA> <NA> carol <NA> <NA>\n"
    )
    anns = load_rttm(rttm)
    assert set(anns) == {"rec1", "rec2"}
    assert anns["rec1"].labels() == ["alice", "bob"]

    data, sessions, speakers = rttm_to_arrays(anns)
    assert sessions == ["rec1", "rec2"]
    assert len(data) == 3
    assert speakers["rec1"] == ["alice", "bob"]

    uem = tmp_path / "all.uem"
    uem.write_text("rec1 1 0.0 10.0\nrec1 1 20.0 30.0\n")
    uems = load_uem(uem)
    assert len(uems["rec1"]) == 2

    scp = tmp_path / "wav.scp"
    scp.write_text("rec1 /path/to/rec1.wav\n")
    assert load_scp(scp) == {"rec1": "/path/to/rec1.wav"}


def test_file_like_and_random_channel(tmp_path):
    """read_wav/read_audio accept seekable binary file-like objects and
    Audio(mono='random') picks one channel deterministically under rng
    (reference core/io.py:213-286)."""
    import io

    sr = 8000
    t = np.arange(sr) / sr
    stereo = np.stack(
        [np.sin(2 * np.pi * 220 * t), np.sin(2 * np.pi * 440 * t)]
    ).astype(np.float32)
    path = tmp_path / "st.wav"
    write_wav(path, stereo, sr)

    buf = io.BytesIO(path.read_bytes())
    w1, sr1 = read_wav(buf)
    w2, sr2 = read_wav(path)
    assert sr1 == sr2 == sr
    np.testing.assert_array_equal(w1, w2)

    buf.seek(0)
    w3, _ = read_audio(buf)
    np.testing.assert_array_equal(w3, w2)

    # segment reads work on file-likes too
    w4, _ = read_wav(io.BytesIO(path.read_bytes()), start_frame=100, num_frames=50)
    np.testing.assert_array_equal(w4, w2[:, 100:150])

    audio = Audio(sample_rate=sr, mono="random", rng=np.random.default_rng(0))
    picked, _ = audio(path)
    assert picked.shape == (1, sr)
    assert any(
        np.allclose(picked[0], w2[c], atol=2e-4) for c in range(2)
    )

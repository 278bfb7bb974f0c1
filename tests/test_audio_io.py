import io
import wave

import numpy as np
import pytest

from whisperseg_tpu.audio import (
    get_audio_duration,
    get_sampling_rate,
    load_audio,
    read_wav,
    resample,
)


def _write_wav(path, data_int16, sr, channels=1):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data_int16.astype("<i2").tobytes())


def test_read_pcm16(tmp_path):
    sr = 16000
    x = (np.sin(2 * np.pi * 440 * np.arange(sr) / sr) * 20000).astype(np.int16)
    p = tmp_path / "a.wav"
    _write_wav(p, x, sr)
    y, got_sr = read_wav(str(p))
    assert got_sr == sr
    assert y.shape == (sr, 1)
    np.testing.assert_allclose(y[:, 0], x / 32768.0, atol=1e-6)


def test_read_example_subset_wav():
    y, sr = load_audio(
        "/root/reference/data/example_subset/Zebra_finch/test_adults/"
        "zebra_finch_g17y2U-f00007.wav"
    )
    assert sr == 32000
    assert y.ndim == 1 and len(y) == 231424
    assert np.abs(y).max() <= 1.0


def test_stereo_mono_and_channel_select(tmp_path):
    sr = 8000
    left = (np.ones(100) * 10000).astype(np.int16)
    right = (np.ones(100) * -10000).astype(np.int16)
    inter = np.empty(200, dtype=np.int16)
    inter[0::2] = left
    inter[1::2] = right
    p = tmp_path / "st.wav"
    _write_wav(p, inter, sr, channels=2)

    y_mono, _ = load_audio(str(p), mono=True)
    np.testing.assert_allclose(y_mono, 0.0, atol=1e-6)

    y_l, _ = load_audio(str(p), channel_id=0)
    np.testing.assert_allclose(y_l, 10000 / 32768.0, atol=1e-6)


def test_resample_preserves_tone():
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert len(y) == sr_out
    # Dominant frequency preserved
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    assert abs(np.argmax(spec) - 440) <= 2


def test_load_audio_resamples(tmp_path):
    sr = 32000
    x = (np.random.RandomState(0).randn(sr) * 1000).astype(np.int16)
    p = tmp_path / "r.wav"
    _write_wav(p, x, sr)
    y, got = load_audio(str(p), sr=16000)
    assert got == 16000
    assert len(y) == 16000


def test_header_probes(tmp_path):
    sr = 24000
    x = np.zeros(sr * 2, dtype=np.int16)
    p = tmp_path / "h.wav"
    _write_wav(p, x, sr)
    assert get_sampling_rate(str(p)) == sr
    assert get_audio_duration(str(p)) == pytest.approx(2.0)


def test_read_from_bytes():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((np.arange(100) * 100).astype("<i2").tobytes())
    y, sr = read_wav(buf.getvalue())
    assert sr == 16000 and y.shape == (100, 1)


def test_ieee_float_wav(tmp_path):
    # Hand-build a float32 WAV (stdlib wave cannot write these).
    sr = 16000
    x = np.linspace(-0.5, 0.5, 64).astype("<f4")
    data = x.tobytes()
    fmt = (
        (3).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + sr.to_bytes(4, "little")
        + (sr * 4).to_bytes(4, "little")
        + (4).to_bytes(2, "little")
        + (32).to_bytes(2, "little")
    )
    riff = (
        b"RIFF"
        + (4 + 8 + len(fmt) + 8 + len(data)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + len(fmt).to_bytes(4, "little")
        + fmt
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )
    p = tmp_path / "f32.wav"
    p.write_bytes(riff)
    y, got = read_wav(str(p))
    assert got == sr
    np.testing.assert_allclose(y[:, 0], x, atol=1e-7)


def test_save_wav_roundtrip(tmp_path):
    from whisperseg_tpu.audio.io import save_wav

    sr = 22050
    rng = np.random.RandomState(0)
    y = np.clip(rng.randn(4000) * 0.2, -1, 1).astype(np.float32)
    p = tmp_path / "out.wav"
    save_wav(str(p), y, sr)
    got, got_sr = read_wav(str(p))
    assert got_sr == sr
    assert got.shape == (4000, 1)
    np.testing.assert_allclose(got[:, 0], y, atol=2.0 / 32767)

    # stereo
    y2 = np.stack([y, -y], axis=1)
    save_wav(str(p), y2, sr)
    got2, _ = read_wav(str(p))
    assert got2.shape == (4000, 2)
    np.testing.assert_allclose(got2, y2, atol=2.0 / 32767)

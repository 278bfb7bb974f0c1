"""Native C++ audio-ingest library: parity against the numpy/scipy reference
implementations in audio/io.py."""

import io
import wave

import numpy as np
import pytest

from whisperseg_tpu.audio import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built / no g++")


def wav_bytes(samples, sr, channels=1, sampwidth=2):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sr)
        if sampwidth == 2:
            w.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())
        elif sampwidth == 4:
            w.writeframes(
                (np.clip(samples, -1, 1) * 2147483647).astype("<i4").tobytes())
        elif sampwidth == 1:
            w.writeframes(
                ((np.clip(samples, -1, 1) * 127) + 128).astype(np.uint8).tobytes())
    return buf.getvalue()


def test_decode_pcm16_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.uniform(-0.9, 0.9, 4000).astype(np.float32)
    data = wav_bytes(x, 16000)
    got, sr = native.decode_wav(data)
    assert sr == 16000
    assert got.shape == (4000, 1)
    np.testing.assert_allclose(got[:, 0], np.round(x * 32767) / 32768.0 * (32768/32767) *
                               (32767/32768), atol=1e-4)


def test_decode_stereo():
    x = np.zeros(200, np.float32)
    x[0::2] = 0.5
    x[1::2] = -0.5
    data = wav_bytes(x, 8000, channels=2)
    got, sr = native.decode_wav(data)
    assert got.shape == (100, 2)
    np.testing.assert_allclose(got[:, 0], 0.5, atol=1e-3)
    np.testing.assert_allclose(got[:, 1], -0.5, atol=1e-3)


def test_decode_vs_python_reader(tmp_path):
    from whisperseg_tpu.audio.io import _pcm_to_float

    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, 1000).astype(np.float32)
    for width in (1, 2, 4):
        data = wav_bytes(x, 22050, sampwidth=width)
        got, sr = native.decode_wav(data)
        with wave.open(io.BytesIO(data)) as w:
            ref = _pcm_to_float(w.readframes(w.getnframes()), width, 1)
        np.testing.assert_allclose(got, ref, atol=1e-7)


def test_decode_example_wav_matches_python():
    path = ("/root/reference/data/example_subset/Zebra_finch/test_adults/"
            "zebra_finch_g17y2U-f00007.wav")
    data = open(path, "rb").read()
    got, sr = native.decode_wav(data)
    assert sr == 32000 and got.shape[0] == 231424

    import whisperseg_tpu.audio.io as aio

    # compare against the pure-python path by disabling native momentarily
    old = native._lib
    try:
        native._lib = None
        native._lib_failed = True
        ref, ref_sr = aio.read_wav(path)
    finally:
        native._lib = old
        native._lib_failed = False
    np.testing.assert_allclose(got, ref, atol=1e-7)


def test_resample_matches_scipy():
    from scipy.signal import resample_poly

    rng = np.random.RandomState(2)
    for sr_in, sr_out in [(48000, 16000), (16000, 32000), (44100, 32000),
                          (32000, 300000)]:
        x = rng.randn(sr_in // 5).astype(np.float32) * 0.3
        got = native.resample(x, sr_in, sr_out)
        from math import gcd

        g = gcd(sr_in, sr_out)
        ref = resample_poly(x, sr_out // g, sr_in // g).astype(np.float32)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-5)


def test_resample_identity():
    x = np.random.RandomState(3).randn(100).astype(np.float32)
    got = native.resample(x, 16000, 16000)
    np.testing.assert_array_equal(got, x)


def test_resample_tone_frequency_preserved():
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = native.resample(x, sr_in, sr_out)
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    assert abs(np.argmax(spec) - 440) <= 2

"""MP3 ingest through the ctypes libmpg123 backend.

Test vectors are produced with libmp3lame via ctypes (test-only; ships with
the image's SDL2_mixer). Tests skip cleanly when the system libraries are
absent.
"""

import ctypes as C

import numpy as np
import pytest

from whisperseg_tpu.audio import mpg123


def encode_mp3(pcm: np.ndarray, sr: int, kbps: int = 128) -> bytes:
    """pcm [frames, ch] float32 in [-1, 1] -> MP3 bytes via libmp3lame."""
    try:
        lame = C.CDLL("libmp3lame.so.0")
    except OSError:
        pytest.skip("libmp3lame not available")
    lame.lame_init.restype = C.c_void_p
    gfp = lame.lame_init()
    ch = pcm.shape[1]
    lame.lame_set_in_samplerate(C.c_void_p(gfp), C.c_int(sr))
    lame.lame_set_out_samplerate(C.c_void_p(gfp), C.c_int(sr))
    lame.lame_set_num_channels(C.c_void_p(gfp), C.c_int(ch))
    lame.lame_set_mode(C.c_void_p(gfp), C.c_int(3 if ch == 1 else 1))
    lame.lame_set_brate(C.c_void_p(gfp), C.c_int(kbps))
    if lame.lame_init_params(C.c_void_p(gfp)) < 0:
        pytest.skip("lame_init_params failed")
    n = pcm.shape[0]
    out = (C.c_ubyte * (int(1.25 * n) + 7200 + 4096))()
    left = np.ascontiguousarray(pcm[:, 0], np.float32)
    right = np.ascontiguousarray(pcm[:, ch - 1], np.float32)
    written = lame.lame_encode_buffer_ieee_float(
        C.c_void_p(gfp), C.c_void_p(left.ctypes.data),
        C.c_void_p(right.ctypes.data), C.c_int(n), out, C.c_int(len(out)))
    assert written >= 0
    data = bytes(out[:written])
    tail = lame.lame_encode_flush(C.c_void_p(gfp), out, C.c_int(len(out)))
    data += bytes(out[:max(tail, 0)])
    lame.lame_close(C.c_void_p(gfp))
    return data


def _tone(seconds, sr, ch, f0=440.0):
    t = np.arange(int(seconds * sr)) / sr
    out = [0.5 * np.sin(2 * np.pi * (f0 + 100 * c) * t) for c in range(ch)]
    return np.stack(out, axis=1).astype(np.float32)


@pytest.mark.skipif(not mpg123.available(), reason="libmpg123 not available")
@pytest.mark.parametrize("sr,ch", [(44100, 1), (32000, 2), (16000, 1)])
def test_mpg123_roundtrip(sr, ch):
    pcm = _tone(1.0, sr, ch)
    data = encode_mp3(pcm, sr)
    got, got_sr = mpg123.decode_mp3(data)
    assert got_sr == sr
    assert got.shape[1] == ch
    # lossy codec with encoder+decoder delay: compare via cross-correlation
    # of the dominant tone region
    a = got[:, 0]
    b = pcm[:, 0]
    n = min(len(a), len(b))
    assert n > 0.9 * len(b)
    # find alignment within the codec delay (< 2500 samples), then correlate
    best = -1.0
    for lag in range(0, 2501, 10):
        if lag + n // 2 > len(a):
            break
        aa = a[lag:lag + n // 2] - a[lag:lag + n // 2].mean()
        bb = b[:n // 2] - b[:n // 2].mean()
        c = float((aa * bb).sum()
                  / (np.sqrt((aa * aa).sum() * (bb * bb).sum()) + 1e-12))
        best = max(best, c)
    assert best > 0.97, best


@pytest.mark.skipif(not mpg123.available(), reason="libmpg123 not available")
def test_formats_route_prefers_mpg123(monkeypatch):
    from whisperseg_tpu.audio import formats

    sr = 32000
    pcm = _tone(0.5, sr, 1)
    data = encode_mp3(pcm, sr)
    assert formats.sniff_format(data) == "mp3"
    assert formats.probe_sampling_rate(data) == sr
    # the SDL path must NOT be touched when libmpg123 handles the file
    monkeypatch.setattr(formats, "decode_with_sdl",
                        lambda *a, **k: pytest.fail("SDL used despite "
                                                    "libmpg123"))
    out, out_sr = formats.decode_compressed(data, "mp3")
    assert out_sr == sr and out.shape[1] == 1 and np.abs(out).max() <= 1.0

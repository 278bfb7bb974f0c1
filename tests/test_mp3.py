"""From-scratch MPEG Layer III decoder (whisperseg_tpu/audio/mp3.py).

Validation strategy: libmpg123 is the authoritative oracle (the same library
the constant tables were recovered from — scripts/mp3_oracle_extract.py);
libmp3lame (ctypes, tests/lame_encode.py) generates real encoder fixtures
covering long/short/start/stop blocks, MS joint stereo, the bit reservoir
(VBR), and all nine MPEG-1/2/2.5 sample rates. Reference parity context:
the reference delegates mp3 to librosa (reference datautils.py:116,
demo.py:78); here the format decodes fully in-repo.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from whisperseg_tpu.audio import mp3, mp3_tables, mpg123  # noqa: E402
from whisperseg_tpu.audio.formats import decode_compressed  # noqa: E402

import lame_encode  # noqa: E402

_needs_oracle = pytest.mark.skipif(not mpg123.available(),
                                   reason="libmpg123 not available")
_needs_lame = pytest.mark.skipif(not lame_encode.available(),
                                 reason="libmp3lame not available")

PYGAME_MP3 = ("/opt/venv/lib/python3.12/site-packages/pygame/examples/data/"
              "house_lo.mp3")


def _signal(sr, dur=1.2, ch=1, seed=5):
    rng = np.random.RandomState(seed)
    n = int(sr * dur)
    t = np.arange(n) / sr
    y = np.zeros((n, ch))
    for c in range(ch):
        y[:, c] = (0.3 * np.sin(2 * np.pi * (220 + 80 * c) * t)
                   + 0.2 * np.sin(2 * np.pi * 1730 * t + c))
        for k in range(6):  # transients force short-block switching
            p = int((0.1 + 0.22 * k) * n)
            w = max(0, min(sr // 200, n - p))
            y[p:p + w, c] += rng.randn(w) * 0.5
    return np.clip(y, -1, 1)


def _compare(data, tol=1e-4):
    ref, sr1 = mpg123.decode_mp3(data)
    mine, sr2 = mp3.decode_mp3(data)
    assert sr1 == sr2
    n = min(len(ref), len(mine))
    assert n > 0 and abs(len(ref) - len(mine)) <= 1152
    err = float(np.abs(ref[:n] - mine[:n]).max())
    rms = float(np.sqrt(np.mean(ref[:n] ** 2)))
    assert err <= tol * max(rms, 1e-3), (err, rms)


# ------------------------------------------------------------- tables


def test_tables_structurally_valid():
    """Prefix-free, Kraft-complete codebooks with full value grids."""
    for t, (linbits, codes) in mp3_tables.HUFF_PAIR_TABLES.items():
        kraft = sum(2.0 ** -len(c) for c in codes)
        assert kraft == 1.0, (t, kraft)
        vals = list(codes.values())
        assert len(set(vals)) == len(vals), t
        side = int(np.sqrt(len(vals)))
        assert set(vals) == {(x, y) for x in range(side)
                             for y in range(side)}, t
        codes_sorted = sorted(codes)
        for a, b in zip(codes_sorted, codes_sorted[1:]):
            assert not b.startswith(a), (t, a, b)
    for s, codes in mp3_tables.HUFF_COUNT1.items():
        assert sum(2.0 ** -len(c) for c in codes) == 1.0
        assert set(codes.values()) == {
            (v, w, x, y) for v in (0, 1) for w in (0, 1)
            for x in (0, 1) for y in (0, 1)}
    assert len(mp3_tables.SYNTH_WINDOW_INT65536) == 512
    for sr, edges in mp3_tables.SFB_LONG.items():
        assert edges[0] == 0 and edges[-1] == 576
        assert all(a < b for a, b in zip(edges, edges[1:])), sr
    for sr, edges in mp3_tables.SFB_SHORT.items():
        assert edges[0] == 0 and edges[-1] == 192
        assert all(a < b for a, b in zip(edges, edges[1:])), sr


# -------------------------------------------------------- real fixtures


@_needs_oracle
def test_pygame_fixture_matches_mpg123():
    if not os.path.exists(PYGAME_MP3):
        pytest.skip("pygame example mp3 not present")
    _compare(open(PYGAME_MP3, "rb").read())


@_needs_oracle
@_needs_lame
@pytest.mark.parametrize("sr", [44100, 48000, 32000, 24000, 22050, 16000,
                                12000, 11025, 8000])
def test_lame_mono_all_rates(sr):
    data = lame_encode.encode(_signal(sr), sr, 64, mode=3)
    _compare(data)


@_needs_oracle
@_needs_lame
@pytest.mark.parametrize("sr", [44100, 16000, 8000])
def test_lame_joint_stereo(sr):
    data = lame_encode.encode(_signal(sr, ch=2), sr, 128, mode=1)
    _compare(data)


@_needs_oracle
@_needs_lame
def test_lame_vbr_reservoir():
    data = lame_encode.encode(_signal(32000, dur=2.0), 32000, 128,
                              mode=3, vbr=4)
    _compare(data)


@_needs_lame
def test_formats_dispatch_uses_native_decoder(monkeypatch):
    """decode_compressed must reach the in-repo decoder, not the fallbacks."""
    data = lame_encode.encode(_signal(16000), 16000, 64, mode=3)
    calls = {}
    real = mp3.decode_mp3

    def spy(d):
        calls["native"] = True
        return real(d)

    monkeypatch.setattr(mp3, "decode_mp3", spy)
    pcm, sr = decode_compressed(data)
    assert calls.get("native") and sr == 16000 and len(pcm) > 0


def test_id3_tag_skipped():
    if not lame_encode.available():
        pytest.skip("libmp3lame not available")
    data = lame_encode.encode(_signal(16000), 16000, 64, mode=3)
    tag = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"x" * 10
    pcm1, sr1 = mp3.decode_mp3(data)
    pcm2, sr2 = mp3.decode_mp3(tag + data)
    assert sr1 == sr2 and np.array_equal(pcm1, pcm2)


def test_garbage_raises():
    with pytest.raises(Exception):
        mp3.decode_mp3(b"\x00" * 4096)

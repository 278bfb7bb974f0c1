"""Compressed-audio ingest tests: from-scratch FLAC codec, mp3/ogg via the
SDL backend, magic-byte dispatch in load_audio, header probes, service and
data-layer integration (VERDICT.md item 3 — the reference accepts mp3 in the
GUI and anything librosa reads in the service, demo.py:78,
segment_service.py:76-80)."""

import base64
import io
import json
import os
import wave

import numpy as np
import pytest

from whisperseg_tpu.audio.flac import (
    BitReader,
    BitWriter,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    flac_stream_info,
)
from whisperseg_tpu.audio.formats import (
    mp3_stream_info,
    ogg_stream_info,
    probe_duration,
    probe_sampling_rate,
    sniff_format,
)
from whisperseg_tpu.audio.io import get_audio_duration, get_sampling_rate, load_audio

MP3_FIXTURES = [
    "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3",
]
OGG_FIXTURES = [
    "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.ogg",
]
ZF_WAV = ("/root/reference/data/example_subset/Zebra_finch/test_adults/"
          "zebra_finch_g17y2U-f00007.wav")


def _have_sdl():
    try:
        import pygame  # noqa: F401

        return True
    except Exception:
        return False


def _tone(sr=32000, seconds=1.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.01 * rng.standard_normal(len(t))
    return np.clip(np.round(x * 32768), -32768, 32767).astype(np.int16)


# ------------------------------------------------------------------ FLAC codec


@pytest.mark.parametrize("channels,n,sr", [
    (1, 32000, 32000), (2, 20000, 48000), (1, 5000, 16000), (1, 4096, 8000),
    (1, 1, 44100),
])
def test_flac_roundtrip_bit_exact(channels, n, sr):
    x = _tone(seconds=1.0)[:n]
    pcm = np.stack([x, np.roll(x, 7)], axis=1)[:, :channels]
    enc = encode_flac(pcm, sr)
    dec, dec_sr = decode_flac(enc)
    assert dec_sr == sr
    got = np.round(dec * 32768).astype(np.int64)
    np.testing.assert_array_equal(got, pcm.astype(np.int64))


def test_flac_constant_and_silence_blocks():
    pcm = np.concatenate([np.zeros(4096, np.int16),
                          np.full(4096, 123, np.int16),
                          _tone()[:1000]])
    enc = encode_flac(pcm, 22050)
    dec, sr = decode_flac(enc)
    np.testing.assert_array_equal(np.round(dec[:, 0] * 32768).astype(np.int64),
                                  pcm.astype(np.int64))


def test_flac_stream_info_fields():
    enc = encode_flac(_tone()[:12345], 32000)
    info = flac_stream_info(enc)
    assert info["sr"] == 32000
    assert info["channels"] == 1
    assert info["bps"] == 16
    assert info["total_samples"] == 12345


@pytest.mark.skipif(not _have_sdl(), reason="pygame/SDL backend unavailable")
def test_flac_encoder_accepted_by_independent_decoder(tmp_path):
    """Our encoder's output must be readable by SDL_mixer's dr_flac — an
    independent implementation — bit-exactly."""
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    import pygame
    import pygame.sndarray

    x = _tone(sr=32000)
    p = tmp_path / "t.flac"
    p.write_bytes(encode_flac(x, 32000))
    pygame.mixer.quit()
    pygame.mixer.init(frequency=32000, size=-16, channels=1)
    arr = pygame.sndarray.array(pygame.mixer.Sound(str(p)))
    arr = arr.reshape(-1) if arr.ndim == 1 else arr[:, 0]
    np.testing.assert_array_equal(arr.astype(np.int64), x.astype(np.int64))


# ------------------- adversarial streams: decoder paths our encoder never emits


def _frame_header(bw, blocksize, nch_code, fi=0):
    bw.write_uint(0x3FFE, 14)
    bw.write_uint(0, 2)
    bw.write_uint(7, 4)          # 16-bit blocksize-1 follows
    bw.write_uint(0, 4)          # sr from streaminfo
    bw.write_uint(nch_code, 4)
    bw.write_uint(4, 3)          # 16 bps
    bw.write_uint(0, 1)
    bw.write_uint(fi, 8)         # utf8 number < 0x80
    bw.write_uint(blocksize - 1, 16)


def _handmade_flac(subframes_writer, blocksize, nch_code, n_channels, sr=8000):
    """Build a one-frame FLAC stream with arbitrary subframe content."""
    head = BitWriter()
    head.write_uint(int.from_bytes(b"fLaC", "big"), 32)
    head.write_uint(0x80, 8)
    head.write_uint(34, 24)
    si = BitWriter()
    si.write_uint(blocksize, 16)
    si.write_uint(blocksize, 16)
    si.write_uint(0, 24)
    si.write_uint(0, 24)
    si.write_uint(sr, 20)
    si.write_uint(n_channels - 1, 3)
    si.write_uint(15, 5)  # bps 16
    si.write_uint(blocksize, 36)
    for _ in range(16):
        si.write_uint(0, 8)
    fw = BitWriter()
    _frame_header(fw, blocksize, nch_code)
    assert fw.nacc == 0
    hb = fw.getvalue()
    frame = bytearray(hb)
    frame.append(crc8(hb))
    body = BitWriter()
    subframes_writer(body)
    body.align_to_byte()
    frame.extend(body.getvalue())
    frame.extend(crc16(bytes(frame)).to_bytes(2, "big"))
    return head.getvalue() + si.getvalue() + bytes(frame)


def _write_verbatim(bw, samples, bps=16):
    bw.write_uint(0, 1)
    bw.write_uint(1, 6)
    bw.write_uint(0, 1)
    for s in samples:
        bw.write_uint(int(s), bps)


def test_flac_decoder_lpc_subframe():
    """Hand-built LPC subframe: residual computed by running the integer
    predictor forward, decoder must invert it exactly."""
    rng = np.random.default_rng(3)
    n = 256
    x = np.cumsum(rng.integers(-50, 50, n)).astype(np.int64)
    order, shift = 3, 5
    coefs = [29, -18, 7]  # arbitrary valid 6-bit precision coefficients

    def residual(i):
        acc = sum(coefs[j] * int(x[i - 1 - j]) for j in range(order))
        return int(x[i]) - (acc >> shift)

    def write(bw):
        bw.write_uint(0, 1)
        bw.write_uint(32 + order - 1, 6)  # LPC subframe, order 3
        bw.write_uint(0, 1)               # no wasted bits
        for w in x[:order]:
            bw.write_uint(int(w), 16)
        bw.write_uint(6 - 1, 4)           # precision 6
        bw.write_uint(shift, 5)
        for c in coefs:
            bw.write_uint(c, 6)
        bw.write_uint(0, 2)               # rice method 0
        bw.write_uint(0, 4)               # partition order 0
        bw.write_uint(6, 4)               # rice k
        for i in range(order, n):
            bw.write_rice(residual(i), 6)

    data = _handmade_flac(write, n, nch_code=0, n_channels=1)
    dec, sr = decode_flac(data)
    np.testing.assert_array_equal(np.round(dec[:, 0] * 32768).astype(np.int64), x)


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_flac_decoder_stereo_decorrelation(mode):
    rng = np.random.default_rng(4)
    n = 192
    left = rng.integers(-3000, 3000, n).astype(np.int64)
    right = rng.integers(-3000, 3000, n).astype(np.int64)
    side = left - right
    nch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[mode]

    def write(bw):
        if mode == "left_side":
            _write_verbatim(bw, left, 16)
            _write_verbatim(bw, side, 17)
        elif mode == "right_side":
            _write_verbatim(bw, side, 17)
            _write_verbatim(bw, right, 16)
        else:
            mid = (left + right) >> 1
            _write_verbatim(bw, mid, 16)
            _write_verbatim(bw, side, 17)

    data = _handmade_flac(write, n, nch_code=nch_code, n_channels=2)
    dec, _ = decode_flac(data)
    got = np.round(dec * 32768).astype(np.int64)
    np.testing.assert_array_equal(got[:, 0], left)
    np.testing.assert_array_equal(got[:, 1], right)


def test_flac_decoder_rice2_partitions_escape_and_wasted_bits():
    n = 256
    x = (np.arange(n, dtype=np.int64) % 37 - 18) * 4  # 2 wasted bits

    def write(bw):
        bw.write_uint(0, 1)
        bw.write_uint(1, 6)   # verbatim
        bw.write_uint(1, 1)   # wasted bits flag
        bw.write_unary(1)     # wasted = 2
        for s in x // 4:
            bw.write_uint(int(s), 14)

    data = _handmade_flac(write, n, nch_code=0, n_channels=1)
    dec, _ = decode_flac(data)
    np.testing.assert_array_equal(np.round(dec[:, 0] * 32768).astype(np.int64), x)

    # fixed-order-1 subframe with rice2 coding and 4 partitions, one escaped
    def write2(bw):
        bw.write_uint(0, 1)
        bw.write_uint(8 + 1, 6)  # fixed order 1
        bw.write_uint(0, 1)
        bw.write_uint(int(x[0]), 16)
        res = np.diff(x)
        bw.write_uint(1, 2)      # rice2 (5-bit params)
        bw.write_uint(2, 4)      # partition order 2 -> 4 partitions
        per = n >> 2
        idx = 0
        for p in range(4):
            cnt = per - (1 if p == 0 else 0)
            chunk = res[idx:idx + cnt]
            idx += cnt
            if p == 2:           # escape partition: raw 12-bit samples
                bw.write_uint(31, 5)
                bw.write_uint(12, 5)
                for r in chunk:
                    bw.write_uint(int(r), 12)
            else:
                bw.write_uint(5, 5)
                for r in chunk:
                    bw.write_rice(int(r), 5)

    data2 = _handmade_flac(write2, n, nch_code=0, n_channels=1)
    dec2, _ = decode_flac(data2)
    np.testing.assert_array_equal(np.round(dec2[:, 0] * 32768).astype(np.int64), x)


def test_bitreader_bitwriter_roundtrip():
    bw = BitWriter()
    values = [(5, 3), (0, 1), (1023, 10), (0x3FFE, 14), (123456789, 36)]
    for v, n in values:
        bw.write_uint(v, n)
    bw.align_to_byte()
    br = BitReader(bw.getvalue())
    for v, n in values:
        assert br.read_uint(n) == v
    bw2 = BitWriter()
    for v in [0, -1, 1, -300, 300, 7777, -7777]:
        bw2.write_rice(v, 4)
    bw2.align_to_byte()
    br2 = BitReader(bw2.getvalue())
    for v in [0, -1, 1, -300, 300, 7777, -7777]:
        assert br2.read_rice(4) == v


# ----------------------------------------------------------- mp3 / ogg headers


@pytest.mark.parametrize("path", MP3_FIXTURES)
def test_mp3_stream_info(path):
    if not os.path.exists(path):
        pytest.skip("fixture not present")
    info = mp3_stream_info(open(path, "rb").read())
    assert info["sr"] in (8000, 11025, 12000, 16000, 22050, 24000, 32000,
                          44100, 48000)
    assert info["channels"] in (1, 2)
    assert info["duration"] > 0.5


@pytest.mark.parametrize("path", OGG_FIXTURES)
def test_ogg_stream_info(path):
    if not os.path.exists(path):
        pytest.skip("fixture not present")
    info = ogg_stream_info(open(path, "rb").read())
    assert info["sr"] > 0 and info["channels"] in (1, 2)


@pytest.mark.skipif(not _have_sdl(), reason="pygame/SDL backend unavailable")
@pytest.mark.parametrize("path", MP3_FIXTURES + OGG_FIXTURES)
def test_load_audio_decodes_mp3_and_ogg(path):
    if not os.path.exists(path):
        pytest.skip("fixture not present")
    y, sr = load_audio(path)
    assert y.ndim == 1 and len(y) > sr  # > 1 second of audio
    assert 0.01 < np.abs(y).max() <= 1.0
    # resampling path: request half the native rate
    y2, sr2 = load_audio(path, sr=sr // 2)
    assert sr2 == sr // 2
    assert abs(len(y2) - len(y) // 2) <= 16  # resampler edge handling


def test_sniff_format():
    assert sniff_format(b"RIFF1234WAVEfmt ") == "wav"
    assert sniff_format(b"fLaC" + b"\0" * 10) == "flac"
    assert sniff_format(b"OggS" + b"\0" * 10) == "ogg"
    assert sniff_format(b"ID3\x04" + b"\0" * 10) == "mp3"
    assert sniff_format(b"\xff\xfb\x90\x00" + b"\0" * 10) == "mp3"
    assert sniff_format(b"\x00\x01\x02\x03") == "unknown"


# ------------------------------------------------- real-data round trip + API


@pytest.mark.skipif(not os.path.exists(ZF_WAV), reason="reference data absent")
def test_zebra_finch_wav_to_flac_roundtrip(tmp_path):
    """The VERDICT.md acceptance shape: a compressed copy of the zebra-finch
    wav round-trips through load_audio identically to the wav original
    (FLAC is lossless, so the tolerance is zero)."""
    y_wav, sr = load_audio(ZF_WAV)
    pcm = np.clip(np.round(y_wav * 32768), -32768, 32767).astype(np.int16)
    p = tmp_path / "zf.flac"
    p.write_bytes(encode_flac(pcm, sr))
    y_flac, sr2 = load_audio(str(p))
    assert sr2 == sr
    np.testing.assert_allclose(y_flac, pcm.astype(np.float32) / 32768.0,
                               atol=0)
    # header probes agree with the wav's
    assert get_sampling_rate(str(p)) == sr
    assert abs(get_audio_duration(str(p)) - len(y_wav) / sr) < 1e-6


@pytest.mark.skipif(not os.path.exists(ZF_WAV), reason="reference data absent")
def test_data_layer_pairs_flac(tmp_path):
    from whisperseg_tpu.data import get_audio_and_label_paths, load_data

    y, sr = load_audio(ZF_WAV)
    pcm = np.clip(np.round(y * 32768), -32768, 32767).astype(np.int16)
    (tmp_path / "a.flac").write_bytes(encode_flac(pcm, sr))
    json.dump({"onset": [0.1], "offset": [0.3], "cluster": ["c"], "sr": sr,
               "spec_time_step": 0.0025, "min_frequency": 0},
              open(tmp_path / "a.json", "w"))
    audio_paths, label_paths = get_audio_and_label_paths(str(tmp_path))
    assert len(audio_paths) == 1 and audio_paths[0].endswith(".flac")
    audio_list, label_list = load_data(audio_paths, label_paths,
                                       cluster_codebook={"c": 0}, n_threads=1)
    assert len(audio_list) == 1 and len(audio_list[0]) == len(y)


def test_service_accepts_flac_base64():
    """POST /segment with a base64 FLAC body -> 201 with a prediction
    (reference segment_service.py:76-80 decodes arbitrary formats)."""
    import socket
    import threading

    import requests

    from whisperseg_tpu.services.segment_service import build_app

    class Stub:
        def __init__(self):
            self.calls = []

        def segment(self, audio, sr, **kw):
            self.calls.append((len(audio), sr))
            return {"onset": [0.0], "offset": [0.1], "cluster": ["x"]}

    stub = Stub()
    app = build_app(stub, batch_size=4)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    app.serve("127.0.0.1", port, background=True)
    import time

    for _ in range(50):
        try:
            requests.get(f"http://127.0.0.1:{port}/status", timeout=0.2)
            break
        except Exception:
            time.sleep(0.1)
    flac = encode_flac(_tone(sr=16000, seconds=0.5), 16000)
    r = requests.post(
        f"http://127.0.0.1:{port}/segment",
        json={"audio_file_base64_string": base64.b64encode(flac).decode(),
              "sr": 16000, "num_trials": 1},
        timeout=10,
    )
    assert r.status_code == 201
    assert r.json()["onset"] == [0.0]
    assert stub.calls and stub.calls[0][1] == 16000


# ------------------------------------------------- native C++ decoder parity


def _native_or_skip():
    from whisperseg_tpu.audio import native

    if not native.available() or not hasattr(native.get_lib(),
                                             "ws_decode_flac"):
        pytest.skip("native library unavailable")
    return native


def test_native_flac_matches_python_on_encoder_output():
    native = _native_or_skip()
    from whisperseg_tpu.audio.flac import decode_flac_py

    x = _tone(sr=32000)
    st = np.stack([x, np.roll(x, 3)], axis=1)
    for pcm, sr in [(x, 32000), (st, 48000), (x[:5000], 16000)]:
        enc = encode_flac(pcm, sr)
        py, sr_py = decode_flac_py(enc)
        nat = native.decode_flac(enc)
        assert nat is not None
        arr, sr_nat = nat
        assert sr_nat == sr_py == sr
        np.testing.assert_array_equal(arr, py)


def test_native_flac_matches_python_on_adversarial_streams():
    """LPC, stereo decorrelation, rice2/escape/wasted-bits paths: the C++
    decoder must agree bit-exactly with the pure-Python reference."""
    native = _native_or_skip()
    from whisperseg_tpu.audio.flac import decode_flac_py

    rng = np.random.default_rng(7)
    n = 256
    x = np.cumsum(rng.integers(-50, 50, n)).astype(np.int64)
    order, shift, coefs = 3, 5, [29, -18, 7]

    def residual(i):
        acc = sum(coefs[j] * int(x[i - 1 - j]) for j in range(order))
        return int(x[i]) - (acc >> shift)

    def write_lpc(bw):
        bw.write_uint(0, 1)
        bw.write_uint(32 + order - 1, 6)
        bw.write_uint(0, 1)
        for w in x[:order]:
            bw.write_uint(int(w), 16)
        bw.write_uint(6 - 1, 4)
        bw.write_uint(shift, 5)
        for c in coefs:
            bw.write_uint(c, 6)
        bw.write_uint(0, 2)
        bw.write_uint(0, 4)
        bw.write_uint(6, 4)
        for i in range(order, n):
            bw.write_rice(residual(i), 6)

    streams = [_handmade_flac(write_lpc, n, nch_code=0, n_channels=1)]

    left = rng.integers(-3000, 3000, 192).astype(np.int64)
    right = rng.integers(-3000, 3000, 192).astype(np.int64)
    side = left - right
    for mode, nch_code in [("left_side", 8), ("right_side", 9),
                           ("mid_side", 10)]:
        def write_st(bw, mode=mode):
            if mode == "left_side":
                _write_verbatim(bw, left, 16)
                _write_verbatim(bw, side, 17)
            elif mode == "right_side":
                _write_verbatim(bw, side, 17)
                _write_verbatim(bw, right, 16)
            else:
                _write_verbatim(bw, (left + right) >> 1, 16)
                _write_verbatim(bw, side, 17)
        streams.append(_handmade_flac(write_st, 192, nch_code=nch_code,
                                      n_channels=2))

    for data in streams:
        py, sr_py = decode_flac_py(data)
        nat = native.decode_flac(data)
        assert nat is not None
        arr, sr_nat = nat
        assert sr_nat == sr_py
        np.testing.assert_array_equal(arr, py)


def test_encode_flac_empty_stream_roundtrips():
    """Zero-length PCM encodes as a header-only stream (no bogus empty frame)
    and decodes back to zero samples."""
    data = encode_flac(np.zeros((0, 1), np.int16), 16000)
    info = flac_stream_info(data)
    assert info["total_samples"] == 0
    pcm, sr = decode_flac(data)
    assert sr == 16000
    assert pcm.shape[0] == 0


def test_ogg_stream_info_granule_ignores_payload_oggs():
    """'OggS' inside a packet payload must not be mistaken for the last page
    header when deriving the duration."""
    sr = 8000

    def page(granule, payload, header_type=0):
        seg = bytes([len(payload)])
        h = (b"OggS" + bytes([0, header_type])
             + granule.to_bytes(8, "little", signed=True)
             + b"\x00" * 12  # serial, seqno, crc
             + bytes([1]) + seg)
        return h + payload

    ident = b"\x01vorbis" + bytes(4) + bytes([1]) + sr.to_bytes(4, "little") \
        + bytes(16)
    # last REAL page: granule 16000 (2 s) — followed by a payload page whose
    # body contains a fake 'OggS' with garbage granule bytes
    fake_payload = b"OggS" + bytes([9, 99]) + (10 ** 15).to_bytes(8, "little") \
        + b"\xff" * 30
    data = page(0, ident) + page(16000, fake_payload, header_type=4)
    info = ogg_stream_info(data)
    assert info["sr"] == sr
    assert info["duration"] == pytest.approx(2.0)


def test_fit_postprocess_grid_without_zero_point():
    """User grids that omit 0 still produce the no-op combo (raw baseline)."""
    from whisperseg_tpu.refine import fit_postprocess

    sr = 16000
    audio = np.zeros(sr, np.float32)
    label = {"onset": [0.2], "offset": [0.4], "cluster": ["Vocal"],
             "sr": sr, "spec_time_step": 0.005}
    pred = {"onset": [0.2], "offset": [0.4], "cluster": ["Vocal"]}
    params, table = fit_postprocess(
        [pred], [label], [audio], [sr], merge_gap_ms=(5.0,),
        split_db=(10.0,), widths_ms=(20.0,))
    assert "merge_0+split_0+refine_0" in table

"""From-scratch Ogg Vorbis decoder vs the reference Xiph implementation.

Test vectors are produced with libvorbisenc and the oracle output with
libvorbisfile, both driven through ctypes (these system libraries ship with
the image's SDL2_mixer but are NOT runtime dependencies of the decoder —
tests skip cleanly when they're absent).
"""

import ctypes as C
import os

import numpy as np
import pytest

from whisperseg_tpu.audio.vorbis import (_IMDCT, VorbisError,
                                         decode_ogg_vorbis)


def _load(name):
    try:
        return C.CDLL(name)
    except OSError:
        pytest.skip(f"{name} not available")


# ------------------------------------------------------------ ctypes encode


class _OggPacket(C.Structure):
    _fields_ = [("packet", C.POINTER(C.c_ubyte)), ("bytes", C.c_long),
                ("b_o_s", C.c_long), ("e_o_s", C.c_long),
                ("granulepos", C.c_int64), ("packetno", C.c_int64)]


class _OggPage(C.Structure):
    _fields_ = [("header", C.POINTER(C.c_ubyte)), ("header_len", C.c_long),
                ("body", C.POINTER(C.c_ubyte)), ("body_len", C.c_long)]


def _opaque():
    # generous over-allocation for libogg/libvorbis state structs
    return C.create_string_buffer(1 << 15)


def encode_ogg(pcm: np.ndarray, sr: int, quality: float = 0.4) -> bytes:
    """pcm [frames, ch] float32 in [-1, 1] -> Ogg Vorbis bytes."""
    vorbis = _load("libvorbis.so.0")
    venc = _load("libvorbisenc.so.2")
    ogg = _load("libogg.so.0")
    ch = pcm.shape[1]
    vi, vc, vd, vb, osr = (_opaque() for _ in range(5))
    vorbis.vorbis_info_init(vi)
    if venc.vorbis_encode_init_vbr(vi, C.c_long(ch), C.c_long(sr),
                                   C.c_float(quality)) != 0:
        pytest.skip("vorbis_encode_init_vbr failed")
    vorbis.vorbis_comment_init(vc)
    assert vorbis.vorbis_analysis_init(vd, vi) == 0
    assert vorbis.vorbis_block_init(vd, vb) == 0
    assert ogg.ogg_stream_init(osr, C.c_int(12345)) == 0

    out = bytearray()
    page = _OggPage()

    def drain(flush):
        fn = ogg.ogg_stream_flush if flush else ogg.ogg_stream_pageout
        while fn(osr, C.byref(page)) != 0:
            out.extend(C.string_at(page.header, page.header_len))
            out.extend(C.string_at(page.body, page.body_len))

    hmain, hcomm, hcode = _OggPacket(), _OggPacket(), _OggPacket()
    assert vorbis.vorbis_analysis_headerout(
        vd, vc, C.byref(hmain), C.byref(hcomm), C.byref(hcode)) == 0
    for h in (hmain, hcomm, hcode):
        ogg.ogg_stream_packetin(osr, C.byref(h))
    drain(flush=True)

    vorbis.vorbis_analysis_buffer.restype = \
        C.POINTER(C.POINTER(C.c_float))
    pkt = _OggPacket()
    pos = 0
    n_total = pcm.shape[0]
    while True:
        chunk = min(1024, n_total - pos)
        if chunk > 0:
            buf = vorbis.vorbis_analysis_buffer(vd, C.c_int(chunk))
            for c in range(ch):
                # keep the contiguous copy alive through the memmove — an
                # inline temporary's .ctypes.data can dangle (observed as
                # intermittent garbage input)
                col = np.ascontiguousarray(pcm[pos:pos + chunk, c],
                                           np.float32)
                C.memmove(buf[c], col.ctypes.data, chunk * 4)
                del col
        vorbis.vorbis_analysis_wrote(vd, C.c_int(max(chunk, 0)))
        pos += chunk
        while vorbis.vorbis_analysis_blockout(vd, vb) == 1:
            vorbis.vorbis_analysis(vb, None)
            vorbis.vorbis_bitrate_addblock(vb)
            while vorbis.vorbis_bitrate_flushpacket(vd, C.byref(pkt)) == 1:
                ogg.ogg_stream_packetin(osr, C.byref(pkt))
                drain(flush=False)
        if chunk <= 0:
            break
    drain(flush=True)
    ogg.ogg_stream_clear(osr)
    vorbis.vorbis_block_clear(vb)
    vorbis.vorbis_dsp_clear(vd)
    vorbis.vorbis_comment_clear(vc)
    vorbis.vorbis_info_clear(vi)
    return bytes(out)


# ------------------------------------------------------------ ctypes oracle


class _VorbisInfoHead(C.Structure):
    _fields_ = [("version", C.c_int), ("channels", C.c_int),
                ("rate", C.c_long)]


def oracle_decode(ogg_bytes: bytes, tmp_path) -> tuple:
    """libvorbisfile float decode -> (pcm [frames, ch] float32, sr)."""
    vfl = _load("libvorbisfile.so.3")
    path = os.path.join(str(tmp_path), "oracle.ogg")
    with open(path, "wb") as f:
        f.write(ogg_bytes)
    vf = _opaque()
    assert vfl.ov_fopen(path.encode(), vf) == 0
    vfl.ov_info.restype = C.POINTER(_VorbisInfoHead)
    info = vfl.ov_info(vf, -1).contents
    ch, sr = info.channels, info.rate
    vfl.ov_read_float.restype = C.c_long
    pcmp = C.POINTER(C.POINTER(C.c_float))()
    bitstream = C.c_int(0)
    chunks = []
    while True:
        got = vfl.ov_read_float(vf, C.byref(pcmp), C.c_int(4096),
                                C.byref(bitstream))
        if got <= 0:
            break
        frame = np.stack(
            [np.ctypeslib.as_array(pcmp[c], shape=(got,)).copy()
             for c in range(ch)], axis=1)
        chunks.append(frame)
    vfl.ov_clear(vf)
    pcm = (np.concatenate(chunks, axis=0) if chunks
           else np.zeros((0, ch), np.float32))
    return pcm, sr


# ------------------------------------------------------------------- tests


def test_imdct_matches_direct_transform():
    rng = np.random.default_rng(0)
    for n in (64, 256, 2048):
        X = rng.standard_normal(n // 2).astype(np.float32)
        fast = _IMDCT(n)(X)
        j = np.arange(n)[:, None]
        k = np.arange(n // 2)[None, :]
        direct = (X[None, :] * np.cos(
            np.pi / (2 * n) * (2 * j + 1 + n // 2) * (2 * k + 1))).sum(1)
        np.testing.assert_allclose(fast, direct, atol=1e-4 * np.abs(
            direct).max())


def _make_signal(seconds, sr, ch, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    out = []
    for c in range(ch):
        y = (0.45 * np.sin(2 * np.pi * (440 + 180 * c) * t)
             + 0.2 * np.sin(2 * np.pi * 37 * t)  # slow AM-ish component
             * np.sin(2 * np.pi * (1200 + 80 * c) * t)
             + 0.02 * rng.standard_normal(len(t)))
        out.append(y)
    return np.clip(np.stack(out, axis=1), -0.98, 0.98).astype(np.float32)


@pytest.mark.parametrize("sr,ch,quality", [
    (16000, 1, 0.4),
    (44100, 2, 0.2),   # coupled stereo exercises square-polar + residue 2
    (32000, 1, 0.8),   # high quality -> different codebook/floor setup
])
def test_decode_matches_libvorbisfile(tmp_path, sr, ch, quality):
    pcm = _make_signal(1.2, sr, ch)
    data = encode_ogg(pcm, sr, quality)
    ref, ref_sr = oracle_decode(data, tmp_path)
    got, got_sr = decode_ogg_vorbis(data)
    assert got_sr == ref_sr == sr
    assert got.shape == ref.shape, (got.shape, ref.shape)
    # both are float32 conformant decoders; differences are rounding-level
    err = np.abs(got - ref).max()
    assert err < 2e-4, f"max abs deviation vs libvorbisfile: {err}"


def test_decoded_length_matches_input(tmp_path):
    sr = 22050
    pcm = _make_signal(0.737, sr, 1)  # non-round length exercises the trim
    data = encode_ogg(pcm, sr)
    got, _ = decode_ogg_vorbis(data)
    ref, _ = oracle_decode(data, tmp_path)
    assert len(got) == len(ref) == len(pcm)


def test_formats_route_uses_in_repo_decoder(tmp_path):
    from whisperseg_tpu.audio.formats import (decode_compressed,
                                              probe_duration,
                                              probe_sampling_rate,
                                              sniff_format)

    sr = 16000
    pcm = _make_signal(0.5, sr, 1)
    data = encode_ogg(pcm, sr)
    assert sniff_format(data) == "ogg"
    assert probe_sampling_rate(data) == sr
    assert abs(probe_duration(data) - 0.5) < 0.05
    out, out_sr = decode_compressed(data, "ogg")
    assert out_sr == sr
    assert out.shape == (len(pcm), 1)
    # correlation with the source signal (lossy codec, not exactness)
    a = out[:, 0] - out[:, 0].mean()
    b = pcm[:, 0] - pcm[:, 0].mean()
    corr = float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))
    assert corr > 0.98, corr


def test_rejects_non_vorbis():
    with pytest.raises((VorbisError, ValueError)):
        decode_ogg_vorbis(b"OggS" + b"\x00" * 60)

"""Encode PCM to mp3 through the system libmp3lame via ctypes — test-fixture
generator for the from-scratch Layer III decoder (tests/test_mp3.py).

Not a product feature: the framework never encodes mp3; this exists so the
decoder can be validated against real encoder output (long/short blocks,
MS joint stereo, bit reservoir, all MPEG-1/2 rates) without network access.
"""

from __future__ import annotations

import ctypes as C
from typing import Optional

import numpy as np

_lib: Optional[C.CDLL] = None
_tried = False


def _load() -> Optional[C.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    for name in ("libmp3lame.so.0", "libmp3lame.so", "libmp3lame.dylib"):
        try:
            lib = C.CDLL(name)
        except OSError:
            continue
        lib.lame_init.restype = C.c_void_p
        for fn in ("lame_set_in_samplerate", "lame_set_out_samplerate",
                   "lame_set_num_channels", "lame_set_brate",
                   "lame_set_mode", "lame_set_quality",
                   "lame_set_bWriteVbrTag", "lame_set_VBR"):
            getattr(lib, fn).argtypes = [C.c_void_p, C.c_int]
        lib.lame_init_params.argtypes = [C.c_void_p]
        lib.lame_encode_buffer.argtypes = [
            C.c_void_p, C.POINTER(C.c_short), C.POINTER(C.c_short),
            C.c_int, C.c_char_p, C.c_int]
        lib.lame_encode_flush.argtypes = [C.c_void_p, C.c_char_p, C.c_int]
        lib.lame_close.argtypes = [C.c_void_p]
        _lib = lib
        break
    return _lib


def available() -> bool:
    return _load() is not None


def encode(pcm: np.ndarray, sr: int, bitrate_kbps: int = 128,
           mode: Optional[int] = None, vbr: int = 0) -> bytes:
    """float PCM [n] or [n, ch] -> mp3 bytes.

    mode: 0 stereo, 1 joint stereo, 3 mono (default: by channel count).
    vbr: 0 = CBR, 4 = default VBR."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libmp3lame not available")
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    assert ch in (1, 2)
    gfp = lib.lame_init()
    lib.lame_set_in_samplerate(gfp, sr)
    lib.lame_set_out_samplerate(gfp, sr)
    lib.lame_set_num_channels(gfp, ch)
    lib.lame_set_brate(gfp, bitrate_kbps)
    lib.lame_set_mode(gfp, mode if mode is not None else (3 if ch == 1
                                                         else 1))
    lib.lame_set_quality(gfp, 2)
    lib.lame_set_bWriteVbrTag(gfp, 0)
    if vbr:
        lib.lame_set_VBR(gfp, vbr)
    if lib.lame_init_params(gfp) < 0:
        lib.lame_close(gfp)
        raise RuntimeError("lame_init_params failed")
    s16 = np.clip(pcm * 32767.0, -32768, 32767).astype(np.int16)
    left = np.ascontiguousarray(s16[:, 0])
    right = np.ascontiguousarray(s16[:, 1] if ch == 2 else s16[:, 0])
    buf = C.create_string_buffer(int(1.25 * n + 7200))
    m = lib.lame_encode_buffer(
        gfp, left.ctypes.data_as(C.POINTER(C.c_short)),
        right.ctypes.data_as(C.POINTER(C.c_short)), n, buf, len(buf))
    if m < 0:
        lib.lame_close(gfp)
        raise RuntimeError(f"lame_encode_buffer failed ({m})")
    out = buf.raw[:m]
    m = lib.lame_encode_flush(gfp, buf, len(buf))
    out += buf.raw[:max(m, 0)]
    lib.lame_close(gfp)
    return out

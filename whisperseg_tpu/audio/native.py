"""ctypes bindings for the native audio-ingest library (native/src/ws_audio.cpp).

The library is built lazily with ``make`` (g++) on first use and cached; if the
toolchain or build is unavailable everything transparently falls back to the
numpy implementations in audio/io.py. Disable with ``WS_NATIVE=0``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libws_audio.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build(force: bool = False) -> bool:
    try:
        cmd = ["make", "-B", "-C", _NATIVE_DIR] if force else \
            ["make", "-C", _NATIVE_DIR]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it on first call; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if os.environ.get("WS_NATIVE", "1") == "0":
            _lib_failed = True
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            if not hasattr(lib, "ws_decode_flac") and _build(force=True):
                # Stale pre-FLAC build: dlopen caches by path and ctypes never
                # dlcloses, so re-CDLL'ing _LIB_PATH would hand back the OLD
                # image — load the rebuilt library under a fresh path instead
                # (unlinked immediately; the mapping stays valid on Linux).
                import shutil
                import tempfile

                try:
                    fd, tmp = tempfile.mkstemp(suffix=".so",
                                               prefix="ws_audio_")
                    os.close(fd)
                    shutil.copy2(_LIB_PATH, tmp)
                    fresh = ctypes.CDLL(tmp)
                    os.unlink(tmp)
                    if hasattr(fresh, "ws_decode_flac"):
                        lib = fresh
                    # else: keep the old image's WAV/resample paths
                except OSError:
                    pass  # keep the old image's WAV/resample paths
        except OSError:
            _lib_failed = True
            return None
        lib.ws_decode_wav.restype = ctypes.c_int
        lib.ws_decode_wav.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ws_read_wav.restype = ctypes.c_int
        lib.ws_read_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        try:
            lib.ws_decode_flac.restype = ctypes.c_int
            lib.ws_decode_flac.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
        except AttributeError:
            # stale build without the FLAC object; rebuild lazily next session
            pass
        lib.ws_resample.restype = ctypes.c_int64
        lib.ws_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ]
        lib.ws_free.restype = None
        lib.ws_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _take_array(lib, ptr, n) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.ws_free(ptr)
    return arr


def decode_wav(data: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """WAV bytes -> (float32 (frames, channels), sr), or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    n_frames = ctypes.c_int32()
    n_channels = ctypes.c_int32()
    sr = ctypes.c_int32()
    rc = lib.ws_decode_wav(data, len(data), ctypes.byref(out),
                           ctypes.byref(n_frames), ctypes.byref(n_channels),
                           ctypes.byref(sr))
    if rc != 0:
        return None
    n = n_frames.value * n_channels.value
    arr = _take_array(lib, out, n).reshape(n_frames.value, n_channels.value)
    return arr, sr.value


def decode_flac(data: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """FLAC bytes -> (float32 (frames, channels), sr), or None if unavailable
    (missing toolchain/stale build) — the caller falls back to the pure-Python
    reference decoder in audio/flac.py."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ws_decode_flac"):
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    n_frames = ctypes.c_int32()
    n_channels = ctypes.c_int32()
    sr = ctypes.c_int32()
    rc = lib.ws_decode_flac(data, len(data), ctypes.byref(out),
                            ctypes.byref(n_frames), ctypes.byref(n_channels),
                            ctypes.byref(sr))
    if rc != 0:
        return None
    n = n_frames.value * n_channels.value
    arr = _take_array(lib, out, n).reshape(n_frames.value, n_channels.value)
    return arr, sr.value


def resample(y: np.ndarray, sr_in: int, sr_out: int) -> Optional[np.ndarray]:
    """Mono float32 polyphase resample, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    y = np.ascontiguousarray(y, dtype=np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.ws_resample(y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        len(y), sr_in, sr_out, ctypes.byref(out))
    if n < 0:
        return None
    return _take_array(lib, out, n)

"""ctypes bindings for the native audio decoder (audio.cpp).

Compiles libskaudio.so on first use (g++ + system libav dev libs) and caches
it next to the source. Falls back gracefully: callers should catch
NativeUnavailable and use the pure-Python wav reader (utils/audio.py)."""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "audio.cpp")
_LIB = os.path.join(_HERE, "libskaudio.so")
_LOCK = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    cmd = ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _LIB,
           "-lavformat", "-lavcodec", "-lavutil", "-lswresample"]
    logger.info("Building native audio decoder: %s", " ".join(cmd))
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise NativeUnavailable(f"native build failed:\n{proc.stderr}")


def _load() -> ctypes.CDLL:
    global _lib, _failed
    with _LOCK:
        if _lib is not None:
            return _lib
        if _failed:  # cache build failures: corpus loops must not re-run g++
            raise NativeUnavailable("native audio build previously failed")
        try:
            if not os.path.exists(_LIB) or \
                    os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build()
        except Exception:
            _failed = True
            raise
        lib = ctypes.CDLL(_LIB)
        lib.sk_decode_audio.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64)]
        lib.sk_decode_audio.restype = ctypes.c_int
        lib.sk_audio_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int)]
        lib.sk_audio_info.restype = ctypes.c_int
        lib.sk_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.sk_free.restype = None
        _lib = lib
        return lib


def decode_audio(path: str, target_sr: int = 16000) -> np.ndarray:
    """Decode any libav-supported audio file -> mono float32 at target_sr."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.sk_decode_audio(path.encode(), target_sr,
                             ctypes.byref(out), ctypes.byref(n))
    if rc != 0:
        raise IOError(f"native decode failed ({rc}) for {path}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.sk_free(out)
    return arr


def audio_info(path: str) -> Tuple[int, int]:
    """(num_frames_at_native_rate, sample_rate) without decoding."""
    lib = _load()
    frames = ctypes.c_int64()
    sr = ctypes.c_int()
    rc = lib.sk_audio_info(path.encode(), ctypes.byref(frames), ctypes.byref(sr))
    if rc != 0:
        raise IOError(f"native info failed ({rc}) for {path}")
    return frames.value, sr.value


def available() -> bool:
    try:
        _load()
        return True
    except Exception as e:
        logger.warning("native audio decoder unavailable: %s", e)
        return False

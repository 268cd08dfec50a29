"""ctypes binding for the C++ unit-string codec (codec.cpp)."""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Iterable, Optional

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "codec.cpp")
_LIB = os.path.join(_HERE, "libskcodec.so")
_LOCK = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _LOCK:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or \
                    os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                proc = subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _LIB],
                    capture_output=True, text=True)
                if proc.returncode != 0:
                    raise RuntimeError(proc.stderr)
            lib = ctypes.CDLL(_LIB)
            lib.sk_units_to_string.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
            lib.sk_units_to_string.restype = ctypes.c_void_p
            lib.sk_string_to_units.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
            lib.sk_string_to_units.restype = ctypes.c_void_p
            lib.sk_codec_free.argtypes = [ctypes.c_void_p]
            lib.sk_codec_free.restype = None
            _lib = lib
        except Exception as e:
            logger.info("native codec unavailable, using Python path: %s", e)
            _failed = True
    return _lib


def available() -> bool:
    return _load() is not None


class NativeUnavailable(RuntimeError):
    pass


def units_to_string(units: Iterable[int]) -> str:
    lib = _load()
    if lib is None:
        raise NativeUnavailable("native codec build failed; use unit_codec's "
                                "Python path (it checks available() first)")
    arr = np.ascontiguousarray(np.asarray(list(units) if not isinstance(units, np.ndarray) else units, dtype=np.int32))
    ptr = lib.sk_units_to_string(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), arr.size)
    try:
        return ctypes.string_at(ptr).decode()
    finally:
        lib.sk_codec_free(ptr)


def string_to_units(text: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise NativeUnavailable("native codec build failed; use unit_codec's "
                                "Python path (it checks available() first)")
    n = ctypes.c_int64()
    ptr = lib.sk_string_to_units(text.encode(), ctypes.byref(n))
    try:
        buf = ctypes.cast(ptr, ctypes.POINTER(ctypes.c_int32))
        return np.ctypeslib.as_array(buf, shape=(n.value,)).copy() if n.value \
            else np.empty(0, np.int32)
    finally:
        lib.sk_codec_free(ptr)

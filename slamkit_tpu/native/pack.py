"""ctypes binding for the greedy packing recurrence (pack.cpp).

Falls back to a pure-Python loop when g++ is unavailable — same results,
just slower on multi-million-sequence corpora."""
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
_SRC = os.path.join(_HERE, "pack.cpp")
_LIB = os.path.join(_HERE, "libskpack.so")
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
            i64p = ctypes.POINTER(ctypes.c_int64)
            lib.sk_greedy_pack.argtypes = [
                i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, i64p, i64p, i64p]
            lib.sk_greedy_pack.restype = None
            lib.sk_greedy_pack_count.argtypes = [i64p, ctypes.c_int64,
                                                 ctypes.c_int64]
            lib.sk_greedy_pack_count.restype = ctypes.c_int64
            lib.sk_bestfit_pack.argtypes = [i64p, ctypes.c_int64,
                                            ctypes.c_int64, i64p, i64p]
            lib.sk_bestfit_pack.restype = ctypes.c_int64
            _lib = lib
        except Exception as e:
            logger.info("native packer unavailable, using Python path: %s", e)
            _failed = True
    return _lib


def greedy_pack(lens: np.ndarray, context_len: int, row0: int = 0,
                col0: int = 0) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Per-sequence (row, col) assignment; returns (rows, cols, row, col)
    where (row, col) is the carry state for the next slab."""
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    n = lens.size
    rows = np.empty(n, dtype=np.int64)
    cols = np.empty(n, dtype=np.int64)
    lib = _load()
    if lib is not None:
        state = np.empty(2, dtype=np.int64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.sk_greedy_pack(
            lens.ctypes.data_as(i64p), n, context_len, row0, col0,
            rows.ctypes.data_as(i64p), cols.ctypes.data_as(i64p),
            state.ctypes.data_as(i64p))
        return rows, cols, int(state[0]), int(state[1])
    row, col = row0, col0
    for i in range(n):
        ln = int(lens[i])
        if col + ln > context_len:
            row += 1
            col = 0
        rows[i] = row
        cols[i] = col
        col += ln
    return rows, cols, row, col


def bestfit_pack(lens: np.ndarray, context_len: int
                 ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Best-fit-decreasing row assignment: (rows, cols, n_rows) per ORIGINAL
    sequence index. ~97.5% row occupancy vs greedy's ~73% on ~500-token
    utterances at T=1024 (1.33x real-token throughput). Deterministic
    (stable sort, ties by index)."""
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    n = lens.size
    rows = np.empty(n, dtype=np.int64)
    cols = np.empty(n, dtype=np.int64)
    lib = _load()
    if lib is not None:
        i64p = ctypes.POINTER(ctypes.c_int64)
        n_rows = int(lib.sk_bestfit_pack(
            lens.ctypes.data_as(i64p), n, context_len,
            rows.ctypes.data_as(i64p), cols.ctypes.data_as(i64p)))
        return rows, cols, n_rows
    import bisect

    # tie-break parity with the C++ multimap: among equal capacities the
    # EARLIEST-inserted row wins (emplace appends to the equal range,
    # lower_bound picks its front), so key entries by (capacity, insertion
    # sequence number) — bit-identical assignments either path
    order = np.argsort(-lens, kind="stable")
    caps: list = []      # sorted (remaining capacity, insert_seq)
    cap_row: list = []   # row id aligned with caps
    n_rows = 0
    seq = 0
    for i in order:
        ln = int(lens[i])
        j = bisect.bisect_left(caps, (ln, -1))
        if j < len(caps):
            (rem, _), row = caps.pop(j), cap_row.pop(j)
            rows[i] = row
            cols[i] = context_len - rem
            entry = (rem - ln, seq)
        else:
            row = n_rows
            rows[i] = row
            cols[i] = 0
            entry = (context_len - ln, seq)
            n_rows += 1
        seq += 1
        k = bisect.bisect_left(caps, entry)
        caps.insert(k, entry)
        cap_row.insert(k, row)
    return rows, cols, n_rows


def greedy_pack_count(lens: np.ndarray, context_len: int) -> int:
    """Number of packed rows the greedy rule produces (no assembly)."""
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    lib = _load()
    if lib is not None:
        i64p = ctypes.POINTER(ctypes.c_int64)
        return int(lib.sk_greedy_pack_count(
            lens.ctypes.data_as(i64p), lens.size, context_len))
    lens = lens[lens > 0]
    if lens.size == 0:
        return 0
    _, _, row, _ = greedy_pack(lens, context_len)
    return row + 1

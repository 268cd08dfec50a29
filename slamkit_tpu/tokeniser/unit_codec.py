"""Unit-string codec: the `<UnN>` pseudo-word representation.

The reference renders discrete speech units as concatenated `<UnN>` tokens and
round-trips them through a WordLevel HF tokenizer (reference
slamkit/tokeniser/unit_tokeniser.py:33-47,62,85-89). Here the codec is direct
integer arithmetic — ids ARE unit indices plus an offset — so the hot path never
touches strings; regex only appears at the jsonl boundary. A C++ fast path
(slamkit_tpu/native) accelerates bulk encode/decode when built.
"""
from __future__ import annotations

import re
from typing import Iterable, List, Sequence

import numpy as np

_UNIT_RE = re.compile(r"<Un(\d+)>")

_native = None


def _get_native():
    global _native
    if _native is None:
        try:
            from ..native import codec as _codec  # noqa: PLC0415

            _native = _codec if _codec.available() else False
        except Exception:
            _native = False
    return _native


def units_to_string(units: Iterable[int]) -> str:
    """[3, 49, 7] -> '<Un3><Un49><Un7>' (reference unit_tokeniser.py:62)."""
    native = _get_native()
    if native:
        return native.units_to_string(units)
    return "".join(f"<Un{int(u)}>" for u in units)


def string_to_units(text: str) -> np.ndarray:
    """'<Un3><Un49>' -> array([3, 49]); ignores any non-unit characters
    (reference unit_tokeniser.py:85-89 regex parse)."""
    native = _get_native()
    if native:
        return native.string_to_units(text)
    return np.asarray([int(m) for m in _UNIT_RE.findall(text)], dtype=np.int32)


def run_length_encode(tokens: np.ndarray) -> tuple[List[int], List[int]]:
    """Deduplicate consecutive repeats -> (units, durations).

    Matches itertools.groupby semantics in the reference
    (unit_tokeniser.py:54-57): [7,7,3,3,3,9] -> ([7,3,9], [2,3,1]).
    Vectorised: one pass of np.diff instead of a Python loop.
    """
    t = np.asarray(tokens).ravel()
    if t.size == 0:
        return [], []
    boundaries = np.flatnonzero(np.diff(t) != 0) + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [t.size]))
    return t[starts].astype(int).tolist(), (ends - starts).astype(int).tolist()


def run_length_decode(units: Sequence[int], durations: Sequence[int]) -> np.ndarray:
    return np.repeat(np.asarray(units, dtype=np.int32), np.asarray(durations))


def encode_units_to_ids(units: Sequence[int], offset: int) -> List[int]:
    """Unit indices -> token ids (unit N maps to id N + offset)."""
    return [int(u) + offset for u in units]


def decode_ids_to_units(ids: Sequence[int], offset: int, num_units: int) -> np.ndarray:
    """Token ids -> unit indices, dropping out-of-range (special) ids."""
    a = np.asarray(ids, dtype=np.int64) - offset
    return a[(a >= 0) & (a < num_units)].astype(np.int32)


def tokenise_unit_string(text: str, offset: int) -> List[int]:
    """'<Un3><Un49>' -> [3+offset, 49+offset] without building a vocab table."""
    return [int(m) + offset for m in _UNIT_RE.findall(text)]

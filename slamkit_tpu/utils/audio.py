"""Host-side audio I/O: native libav decoder with a pure-Python WAV fallback.

Replaces the reference's torchaudio load/info/resample
(reference cli/extract_features.py:43-54, SURVEY.md §2.9)."""
from __future__ import annotations

import logging
import wave
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _wav_info(path: str) -> Tuple[int, int]:
    with wave.open(path, "rb") as w:
        return w.getnframes(), w.getframerate()


def _wav_load(path: str) -> Tuple[np.ndarray, int]:
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n)
        if width == 2:
            data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif width == 4:
            data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        elif width == 1:
            data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128) / 128.0
        else:
            raise ValueError(f"Unsupported wav sample width {width}")
        ch = w.getnchannels()
        if ch > 1:
            data = data.reshape(-1, ch).mean(axis=1)
        return data, sr


def _resample_poly(wav: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(sr, target_sr)
    return resample_poly(wav, target_sr // g, sr // g).astype(np.float32)


def audio_info(path: str) -> Tuple[int, int]:
    """(num_frames at native rate, sample_rate) — reference torchaudio.info."""
    try:
        from ..native.bindings import audio_info as native_info

        return native_info(path)
    except Exception:
        if path.lower().endswith(".wav"):
            return _wav_info(path)
        raise


def save_wav(path: str, wav: np.ndarray, sample_rate: int = 16000):
    """Write mono float32 [-1, 1] as 16-bit PCM WAV (the reference saves
    generated audio via torchaudio.save, cli/eval.py:87-102)."""
    wav = np.clip(np.asarray(wav, dtype=np.float32), -1.0, 1.0)
    pcm = (wav * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def load_audio(path: str, target_sr: int = 16000) -> np.ndarray:
    """Mono float32 at target_sr (decode + downmix + resample)."""
    try:
        from ..native.bindings import decode_audio

        return decode_audio(path, target_sr)
    except Exception as e:
        if path.lower().endswith(".wav"):
            wav, sr = _wav_load(path)
            if sr != target_sr:
                wav = _resample_poly(wav, sr, target_sr)
            return wav
        raise IOError(f"Cannot decode {path}: native decoder failed ({e}) "
                      f"and no fallback for this format") from e

"""AudioVocoder ABC + factory (reference slamkit/vocoder/audio_vocoder.py:6-25)."""
from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np


class AudioVocoder(ABC):
    @abstractmethod
    def vocode(self, tokens, **kwargs) -> np.ndarray:
        """Unit-id sequence -> waveform."""

    def vocode_batch(self, token_lists, **kwargs) -> list:
        """Many unit-id sequences -> waveforms. Default: per-sample loop;
        implementations override to batch fixed-shape device work."""
        return [self.vocode(t, **kwargs) for t in token_lists]

    def to(self, device):
        return self


_OPTIONAL_KEYS = ("vocoder_suffix", "speaker_meta", "style_meta", "bucket_frames")


def vocoder_factory(cfg):
    kind = cfg.vocoder_type
    if kind is None:
        return None
    if kind != "hifigan":
        raise ValueError(f"Unknown vocoder type: {kind}")
    from .hifi_gan_vocoder import HiFiGANVocoder

    opts = {k: cfg.get(k, None) for k in _OPTIONAL_KEYS}
    return HiFiGANVocoder(
        dense_model_name=cfg.dense_model_name,
        quantizer_model_name=cfg.quantizer_model_name,
        vocab_size=cfg.vocab_size,
        **opts,
    )

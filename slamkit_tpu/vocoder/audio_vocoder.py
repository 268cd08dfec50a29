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


def vocoder_factory(cfg):
    if cfg.vocoder_type == "hifigan":
        from .hifi_gan_vocoder import HiFiGANVocoder

        return HiFiGANVocoder(cfg.dense_model_name,
                              cfg.quantizer_model_name,
                              cfg.vocab_size,
                              cfg.get("vocoder_suffix", None),
                              cfg.get("speaker_meta", None),
                              cfg.get("style_meta", None),
                              bucket_frames=cfg.get("bucket_frames", None))
    if cfg.vocoder_type is None:
        return None
    raise ValueError(f"Unknown vocoder type: {cfg.vocoder_type}")

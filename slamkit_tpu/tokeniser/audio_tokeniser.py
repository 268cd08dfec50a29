"""AudioTokeniser interface + factory.

Mirrors the 8-method contract of the reference ABC
(reference slamkit/tokeniser/audio_tokeniser.py:9-95) with numpy/JAX types:
batches are numpy arrays host-side; the feature extractor runs on-device and
returns host arrays. `tokeniser_factory` dispatches on `tokeniser_type`
∈ {unit, interleave} and copies `feature_extractor.num_units` into params
(reference audio_tokeniser.py:107-121).
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, List, Optional, Union

import numpy as np


class AudioTokeniser(ABC):
    text_tokeniser = None

    @abstractmethod
    def audio_represent(self, wav: np.ndarray, lens: Optional[np.ndarray] = None) -> List[Dict]:
        """Batch of audio -> list of {'units': [...], 'duration': [...]} dicts."""

    @abstractmethod
    def stringify_representation(self, reps: List[Dict], mode: str = "test") -> List[str]:
        """Representation dicts -> '<Un17>...' strings (train mode may interleave text)."""

    @abstractmethod
    def string_tokenise(self, audio_repr: List[str], **kwargs) -> dict:
        """Strings -> {'input_ids': ..., 'attention_mask': ...}."""

    @abstractmethod
    def tokenise(self, wav: np.ndarray, lens: Optional[np.ndarray] = None) -> dict:
        """Audio batch -> padded token batch."""

    @abstractmethod
    def build_prompt(self, wav: np.ndarray, lens: Optional[np.ndarray] = None,
                     output_modality: Optional[str] = None) -> dict:
        """Audio batch -> generation prompt (no trailing eos, left padding)."""

    @abstractmethod
    def prepare_sample(self, sample: dict, **kwargs) -> dict:
        """Dataset row with 'audio_repr' -> token ids."""

    def prepare_batch(self, samples: list) -> list:
        """Rows -> list of token-id sequences. Subclasses override with a
        truly batched encode (the HF fast tokenizer releases the GIL and
        runs Rust-parallel over a list); the default loops prepare_sample."""
        out = []
        for s in samples:
            ids = self.prepare_sample(s)["input_ids"]
            out.append(ids[0] if len(ids)
                       and isinstance(ids[0], (list, np.ndarray)) else ids)
        return out

    @abstractmethod
    def decode_sample(self, tokens, output_modality: str = "SPEECH") -> Union[np.ndarray, str]:
        """Token ids -> unit array (SPEECH) or text (TEXT), dropping specials."""

    @abstractmethod
    def get_ignore_tokens(self, used_token_modality: Optional[str]) -> Optional[List[int]]:
        """Token ids excluded from likelihood scoring/generation for a modality."""

    def audio_stringify(self, wav, lens=None) -> List[str]:
        return self.stringify_representation(self.audio_represent(wav, lens))

    @staticmethod
    def _represent(feature_extractor, wav, lens, dedup: bool) -> List[Dict]:
        """Shared FE -> {'units','duration'} transform (run-length dedup per
        reference unit_tokeniser.py:54-60 / interleaving_tokeniser.py:131-139)."""
        from . import unit_codec

        out = []
        for t in feature_extractor.extract(wav, lens):
            if dedup:
                units, duration = unit_codec.run_length_encode(t)
            else:
                units = np.asarray(t).astype(int).tolist()
                duration = [1] * len(units)
            out.append({"units": units, "duration": duration})
        return out


def _init_feature_extractor(fe_type: str, cfg):
    if fe_type == "hubert":
        from ..feature_extractor.hubert_feature_extractor import HubertFeatureExtractor
        from ..config import to_container

        return HubertFeatureExtractor(**to_container(cfg))
    raise ValueError(f"Unknown speech tokeniser type: {fe_type}")


def tokeniser_factory(cfg) -> AudioTokeniser:
    # vocabulary size always follows the feature extractor's unit count
    cfg.params.num_units = cfg.feature_extractor.num_units
    feature_extractor = None
    if cfg.params.load_fe:
        feature_extractor = _init_feature_extractor(cfg.feature_extractor_type, cfg.feature_extractor)

    from ..config import to_container

    params = to_container(cfg.params)
    if cfg.tokeniser_type == "unit":
        from .unit_tokeniser import UnitTokeniser

        return UnitTokeniser(feature_extractor, **params)
    if cfg.tokeniser_type == "interleave":
        from .interleaving_tokeniser import InterleavingTokeniser

        return InterleavingTokeniser(feature_extractor, **params)
    raise ValueError(f"Unknown tokeniser type: {cfg.tokeniser_type}")

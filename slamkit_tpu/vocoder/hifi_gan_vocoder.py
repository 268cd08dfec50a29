"""HiFiGANVocoder: named-checkpoint wrapper over the JAX CodeHiFiGAN
(reference slamkit/vocoder/hifi_gan_vocoder.py:5-22 + hifigan/vocoder.py:22-140).
Duration prediction is enabled automatically when the checkpoint carries a
VariancePredictor; negative codes are dropped before synthesis. Named
speaker/style metadata (Expresso checkpoints) resolves through the registry
so `vocode(speaker_id='ex04')` works like the reference's speakers.txt path
(reference hifigan/vocoder.py:140+ load_vocoder_meta)."""
from __future__ import annotations

import logging
from typing import List, Optional, Union

import numpy as np

from .audio_vocoder import AudioVocoder
from .checkpoint_manager import CHECKPOINT_MANAGER
from .hifigan_jax import (code_generator_forward, load_checkpoint,
                          synthesize_batch)

logger = logging.getLogger(__name__)


def _load_meta(path) -> Optional[List[str]]:
    if path is None:
        return None
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


class HiFiGANVocoder(AudioVocoder):
    def __init__(self, dense_model_name: str, quantizer_model_name: str,
                 vocab_size: int, vocoder_suffix: str = None,
                 speaker_meta=None, style_meta=None,
                 bucket_frames: Optional[int] = None):
        name = f"{dense_model_name}-{quantizer_model_name}-{vocab_size}-hifigan"
        if vocoder_suffix is not None:
            name += "-" + vocoder_suffix
        model_path = CHECKPOINT_MANAGER.get_by_name(name)
        config_path = CHECKPOINT_MANAGER.get_by_name(f"{name}-config")
        speaker_path = (CHECKPOINT_MANAGER.get_by_name(f"{name}-speakers")
                        if speaker_meta else None)
        style_path = (CHECKPOINT_MANAGER.get_by_name(f"{name}-styles")
                      if style_meta else None)
        self.params, self.cfg = load_checkpoint(str(model_path), str(config_path))
        self.speakers = _load_meta(speaker_path)
        self.styles = _load_meta(style_path)
        self.has_dur_predictor = "dur_predictor" in self.params
        # None (default) = reference-exact: batch same-length samples, one
        # compile per distinct length. Set vocoder.bucket_frames=N to pad
        # lengths to N-multiples for bounded compiles (perturbs each
        # waveform's receptive-field tail) — exactness-first like the
        # feature extractor's opt-in bucket_samples
        self.bucket_frames = bucket_frames
        logger.info("CodeHiFiGAN model loaded (%s)", name)

    @property
    def output_sample_rate(self) -> int:
        return self.cfg.get("sampling_rate", 16_000)

    def _resolve(self, value: Union[int, str], names: Optional[List[str]],
                 kind: str) -> int:
        if isinstance(value, str):
            if not names:
                raise ValueError(f"named {kind} requested but this vocoder has "
                                 f"no {kind} metadata")
            return names.index(value)
        return int(value)

    def vocode(self, tokens, speaker_id: Union[int, str] = 0,
               style_id: Union[int, str] = 0, f0=None, **kwargs) -> np.ndarray:
        code = np.asarray(tokens).ravel()
        code = code[code >= 0]  # drop invalid codes (reference vocoder.py:79-81)
        if code.size == 0:
            return np.asarray([], dtype=np.float32)
        return code_generator_forward(
            self.params, self.cfg, code[None],
            dur_prediction=self.has_dur_predictor,
            speaker_id=self._resolve(speaker_id, self.speakers, "speaker"),
            style_id=self._resolve(style_id, self.styles, "style"),
            f0=f0)

    def vocode_batch(self, token_lists, speaker_id: Union[int, str] = 0,
                     style_id: Union[int, str] = 0, f0=None,
                     **kwargs) -> list:
        """Batched synthesis for many continuations. speaker/style may be
        scalars (broadcast) or per-sample lists; f0 must be a per-sample
        list of contours (or None).

        With bucket_frames set, lengths pad to bucket multiples and share a
        handful of compiled generator shapes — slightly perturbing each
        waveform's receptive-field tail (hifigan_jax.synthesize_batch). The
        default (None) keeps reference-exact outputs: same-length samples
        still batch together, distinct lengths compile per length."""
        n = len(token_lists)
        if kwargs:
            raise TypeError(f"vocode_batch got unexpected kwargs: {sorted(kwargs)}")
        if f0 is not None:
            # any per-sample sequence works: a list/tuple of contours OR of
            # per-sample scalar pitches (broadcast to constant contours,
            # same as vocode()), or a 2-D ndarray of contours. A bare 1-D
            # ndarray is rejected even when its length matches the batch —
            # that is ONE contour, and splitting it into per-sample scalars
            # would silently produce wrong audio.
            if np.isscalar(f0) or not hasattr(f0, "__len__") or len(f0) != n:
                raise ValueError(
                    "vocode_batch f0 must be a per-sample sequence (len "
                    f"{n}); pass voc.vocode(tokens, f0=contour) for one "
                    "sample")
            if isinstance(f0, np.ndarray) and f0.ndim == 1:
                raise ValueError(
                    "vocode_batch f0 got a single 1-D contour; pass a list "
                    f"of {n} per-sample contours (or scalar pitches)")
        codes, keep = [], []
        for i, t in enumerate(token_lists):
            code = np.asarray(t).ravel()
            code = code[code >= 0]
            if code.size:
                codes.append(code[None])
                keep.append(i)

        def per_sample(v, kind):
            vals = list(v) if isinstance(v, (list, tuple)) else [v] * n
            if len(vals) != n:
                raise ValueError(f"{kind}_id list has {len(vals)} entries "
                                 f"for {n} samples")
            names = self.speakers if kind == "speaker" else self.styles
            return [self._resolve(x, names, kind) for x in (vals[i] for i in keep)]

        wavs = synthesize_batch(
            self.params, self.cfg, codes,
            dur_prediction=self.has_dur_predictor,
            speaker_ids=per_sample(speaker_id, "speaker"),
            style_ids=per_sample(style_id, "style"),
            f0s=[f0[i] for i in keep] if f0 is not None else None,
            bucket_frames=self.bucket_frames)
        out = [np.asarray([], dtype=np.float32)] * n
        for w, i in zip(wavs, keep):
            out[i] = w
        return out

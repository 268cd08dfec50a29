"""SpeechLM — inference-time composition {TokenLM + AudioTokeniser + Vocoder}.

Counterpart of reference slamkit/model/speech_lm.py:8-63 with numpy batches:
log_likelihood pads right, generate builds left-padded prompts and converts
ignore tokens to unigram bad-words; SPEECH outputs are vocoded when a vocoder
is attached. Device movement is a no-op (JAX arrays follow the computation).
"""
from __future__ import annotations

import logging
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)


class SpeechLM:
    def __init__(self, model, tokeniser, vocoder=None, device=None):
        self.model = model
        self.tokeniser = tokeniser
        self.vocoder = vocoder
        self.device = device

    def log_likelihood(self, wavs, lens=None, mean_nll: bool = True,
                       used_token_modality: Optional[str] = None):
        """wavs [B, L] zero-padded + lens -> per-sample log likelihood
        (reference speech_lm.py:22-36)."""
        self.tokeniser.text_tokeniser.padding_side = "right"
        tokens = self.tokeniser.tokenise(wavs, lens)["input_ids"]
        ignore_tokens = self.tokeniser.get_ignore_tokens(used_token_modality)
        return self.model.log_likelihood(tokens, mean_nll, ignore_tokens)

    def generate(self, wavs, lens=None, output_modality: str = "SPEECH",
                 remove_prompt: bool = False, **kwargs) -> List:
        """Batch continuation: unit arrays / text, or waveforms when a vocoder
        is attached (reference speech_lm.py:38-55).

        The eval CLIs pass metric.used_token_modality positionally here
        (reference generative_metric.py:104), whose config default is null —
        treat None as the declared SPEECH default instead of crashing."""
        output_modality = output_modality or "SPEECH"
        self.tokeniser.text_tokeniser.padding_side = "left"
        tokens = self.tokeniser.build_prompt(wavs, lens,
                                             output_modality=output_modality)
        ignore_tokens = self.tokeniser.get_ignore_tokens(output_modality)
        bad_words_ids = None
        if ignore_tokens is not None:
            bad_words_ids = [[int(t)] for t in ignore_tokens]
        conts = self.model.generate(**tokens, bad_words_ids=bad_words_ids, **kwargs)
        conts = np.asarray(conts)
        if remove_prompt:
            conts = conts[..., np.asarray(tokens["input_ids"]).shape[1]:]
        decoded = [self.tokeniser.decode_sample(c, output_modality=output_modality)
                   for c in conts]
        if self.vocoder is not None and output_modality.upper() == "SPEECH":
            # one bucketed batch call: fixed-shape synthesis groups the
            # variable-length continuations instead of tracing per sample
            keep = [i for i, c in enumerate(decoded) if np.size(c) > 0]
            # duck-typed (non-AudioVocoder) vocoders may lack vocode_batch
            batch_fn = getattr(self.vocoder, "vocode_batch", None)
            if batch_fn is None:
                batch_fn = lambda cs: [self.vocoder.vocode(c) for c in cs]
            wavs = batch_fn([decoded[i] for i in keep])
            out = [np.asarray([], dtype=np.float32)] * len(decoded)
            for i, w in zip(keep, wavs):
                out[i] = w
            return out
        return decoded

    def to(self, device):
        self.device = device
        return self

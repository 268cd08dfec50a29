"""TokenLM interface + factory (reference slamkit/model/token_lm.py:7-43).

The ABC documents the contract every token LM satisfies; UnitLM is the one
concrete implementation (as in the reference, where both `twist` and `gslm`
dispatch to UnitLM with different init)."""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import List, Optional


class TokenLM(ABC):
    @abstractmethod
    def log_likelihood(self, tokens, mean_nll: bool = True,
                       ignore_tokens: Optional[List[int]] = None):
        """Per-sequence log likelihood of a padded token batch."""

    @abstractmethod
    def generate(self, input_ids, attention_mask=None, **kwargs):
        """Sampling continuation of left-padded prompts."""


from .unit_lm import tlm_factory  # noqa: E402  (re-export for import parity)

__all__ = ["TokenLM", "tlm_factory"]

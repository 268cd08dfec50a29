from .audio_tokeniser import AudioTokeniser, tokeniser_factory
from .unit_tokeniser import UnitTokeniser, pad_token_batch
from . import unit_codec

__all__ = ["AudioTokeniser", "tokeniser_factory", "UnitTokeniser",
           "pad_token_batch", "unit_codec"]

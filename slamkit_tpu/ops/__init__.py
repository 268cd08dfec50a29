from .attention_ref import mha_reference, attention_mask
from .flash_attention import flash_attention

__all__ = ["mha_reference", "attention_mask", "flash_attention"]

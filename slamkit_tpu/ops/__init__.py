from .attention_ref import mha_reference, attention_mask
from .flash_attention import flash_attention
from .quant import quantize_weight, dequantize_weight, dq_matmul

__all__ = ["mha_reference", "attention_mask", "flash_attention",
           "quantize_weight", "dequantize_weight", "dq_matmul"]

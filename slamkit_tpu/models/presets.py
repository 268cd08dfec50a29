"""Model-family presets: HF model name -> DecoderConfig.

The reference instantiates arbitrary HF causal LMs by name
(reference slamkit/model/unit_lm.py:94-102, config/model/*.yaml). Offline-first
here: known names resolve from this table; a local HF checkpoint directory (or
a cached hub config, when available) resolves through `config_from_hf_dict`,
which understands the decoder families the reference's recipes use:
opt, qwen2, llama, gpt_neox.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Optional

from .transformer import DecoderConfig

logger = logging.getLogger(__name__)

# Architecture facts for the models named in the reference's configs/docs.
PRESETS: dict[str, dict] = {
    "facebook/opt-125m": dict(
        hidden_size=768, num_layers=12, num_heads=12, num_kv_heads=12,
        head_dim=64, intermediate_size=3072, vocab_size=50272,
        max_position_embeddings=2048, norm="layernorm", norm_bias=True,
        act="relu", pos="learned", learned_pos_offset=2,
        qkv_bias=True, attn_out_bias=True, mlp_bias=True,
        tie_word_embeddings=True, norm_eps=1e-5,
    ),
    "Qwen/Qwen2.5-0.5B": dict(
        hidden_size=896, num_layers=24, num_heads=14, num_kv_heads=2,
        head_dim=64, intermediate_size=4864, vocab_size=151936,
        max_position_embeddings=32768, norm="rmsnorm", act="silu_glu",
        pos="rope", rope_theta=1000000.0, qkv_bias=True,
        tie_word_embeddings=True, norm_eps=1e-6,
    ),
    "Qwen/Qwen2.5-1.5B": dict(
        hidden_size=1536, num_layers=28, num_heads=12, num_kv_heads=2,
        head_dim=128, intermediate_size=8960, vocab_size=151936,
        max_position_embeddings=32768, norm="rmsnorm", act="silu_glu",
        pos="rope", rope_theta=1000000.0, qkv_bias=True,
        tie_word_embeddings=True, norm_eps=1e-6,
    ),
    "Qwen/Qwen2.5-3B": dict(
        hidden_size=2048, num_layers=36, num_heads=16, num_kv_heads=2,
        head_dim=128, intermediate_size=11008, vocab_size=151936,
        max_position_embeddings=32768, norm="rmsnorm", act="silu_glu",
        pos="rope", rope_theta=1000000.0, qkv_bias=True,
        tie_word_embeddings=True, norm_eps=1e-6,
    ),
    "Qwen/Qwen2.5-7B": dict(
        hidden_size=3584, num_layers=28, num_heads=28, num_kv_heads=4,
        head_dim=128, intermediate_size=18944, vocab_size=152064,
        max_position_embeddings=131072, norm="rmsnorm", act="silu_glu",
        pos="rope", rope_theta=1000000.0, qkv_bias=True,
        tie_word_embeddings=False, norm_eps=1e-6,
    ),
    "meta-llama/Llama-3.2-3B": dict(
        hidden_size=3072, num_layers=28, num_heads=24, num_kv_heads=8,
        head_dim=128, intermediate_size=8192, vocab_size=128256,
        max_position_embeddings=131072, norm="rmsnorm", act="silu_glu",
        pos="rope", rope_theta=500000.0,
        tie_word_embeddings=True, norm_eps=1e-5,
    ),
    "meta-llama/Llama-3.2-1B": dict(
        hidden_size=2048, num_layers=16, num_heads=32, num_kv_heads=8,
        head_dim=64, intermediate_size=8192, vocab_size=128256,
        max_position_embeddings=131072, norm="rmsnorm", act="silu_glu",
        pos="rope", rope_theta=500000.0,
        tie_word_embeddings=True, norm_eps=1e-5,
    ),
    "EleutherAI/pythia-14m": dict(
        hidden_size=128, num_layers=6, num_heads=4, num_kv_heads=4,
        head_dim=32, intermediate_size=512, vocab_size=50304,
        max_position_embeddings=2048, norm="layernorm", norm_bias=True,
        act="gelu", pos="rope", rotary_pct=0.25, parallel_residual=True,
        qkv_bias=True, attn_out_bias=True, mlp_bias=True,
        tie_word_embeddings=False, norm_eps=1e-5,
    ),
    "EleutherAI/pythia-160m": dict(
        hidden_size=768, num_layers=12, num_heads=12, num_kv_heads=12,
        head_dim=64, intermediate_size=3072, vocab_size=50304,
        max_position_embeddings=2048, norm="layernorm", norm_bias=True,
        act="gelu", pos="rope", rotary_pct=0.25, parallel_residual=True,
        qkv_bias=True, attn_out_bias=True, mlp_bias=True,
        tie_word_embeddings=False, norm_eps=1e-5,
    ),
}


# HF config.json attribute names -> DecoderConfig field names, for
# reference-parity `model.config_args` overrides (the reference forwards
# extra config_args straight into AutoConfig.from_pretrained —
# slamkit/model/unit_lm.py:62-68 — so users override depth/width/heads
# with HF names)
_HF_CONFIG_ALIASES = {
    "num_hidden_layers": "num_layers",
    "num_attention_heads": "num_heads",
    "num_key_value_heads": "num_kv_heads",
    "ffn_dim": "intermediate_size",
    "rms_norm_eps": "norm_eps",
    "layer_norm_eps": "norm_eps",
    "use_parallel_residual": "parallel_residual",
}


def translate_decoder_overrides(d: dict) -> dict:
    """Map user config overrides (HF attribute names or DecoderConfig field
    names) onto DecoderConfig kwargs; unknown keys warn and drop — the
    reference's AutoConfig also accepts-and-ignores attributes a family
    doesn't define."""
    import dataclasses

    fields = {f.name for f in dataclasses.fields(DecoderConfig)}
    out = {}
    for k, v in (d or {}).items():
        k2 = _HF_CONFIG_ALIASES.get(k, k)
        if k2 in fields:
            out[k2] = v
        else:
            logger.warning("Ignoring unknown decoder config override %r", k)
    return out


def config_from_hf_dict(hf: dict) -> dict:
    """Translate an HF config.json dict to DecoderConfig kwargs."""
    mt = hf.get("model_type")
    if mt == "opt":
        proj = hf.get("word_embed_proj_dim", hf["hidden_size"])
        return dict(
            embed_proj_dim=0 if proj == hf["hidden_size"] else proj,
            # opt-350m: do_layer_norm_before=False -> post-LN blocks, no
            # top-level final norm (HF OPTDecoder)
            pre_norm=hf.get("do_layer_norm_before", True),
            hidden_size=hf["hidden_size"], num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"], num_kv_heads=hf["num_attention_heads"],
            head_dim=hf["hidden_size"] // hf["num_attention_heads"],
            intermediate_size=hf["ffn_dim"], vocab_size=hf["vocab_size"],
            max_position_embeddings=hf["max_position_embeddings"],
            norm="layernorm", norm_bias=True, act="relu", pos="learned",
            learned_pos_offset=2, qkv_bias=True, attn_out_bias=True, mlp_bias=True,
            tie_word_embeddings=hf.get("tie_word_embeddings", True), norm_eps=1e-5,
        )
    if mt in ("qwen2", "qwen2_5"):
        heads = hf["num_attention_heads"]
        return dict(
            hidden_size=hf["hidden_size"], num_layers=hf["num_hidden_layers"],
            num_heads=heads, num_kv_heads=hf.get("num_key_value_heads", heads),
            head_dim=hf.get("head_dim") or hf["hidden_size"] // heads,
            intermediate_size=hf["intermediate_size"], vocab_size=hf["vocab_size"],
            max_position_embeddings=hf["max_position_embeddings"],
            norm="rmsnorm", act="silu_glu", pos="rope",
            rope_theta=hf.get("rope_theta", 1e6), qkv_bias=True,
            tie_word_embeddings=hf.get("tie_word_embeddings", True),
            norm_eps=hf.get("rms_norm_eps", 1e-6),
        )
    if mt == "llama":
        heads = hf["num_attention_heads"]
        return dict(
            hidden_size=hf["hidden_size"], num_layers=hf["num_hidden_layers"],
            num_heads=heads, num_kv_heads=hf.get("num_key_value_heads", heads),
            head_dim=hf.get("head_dim") or hf["hidden_size"] // heads,
            intermediate_size=hf["intermediate_size"], vocab_size=hf["vocab_size"],
            max_position_embeddings=hf["max_position_embeddings"],
            norm="rmsnorm", act="silu_glu", pos="rope",
            rope_theta=hf.get("rope_theta", 10000.0),
            qkv_bias=hf.get("attention_bias", False),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
            norm_eps=hf.get("rms_norm_eps", 1e-5),
        )
    if mt == "gpt_neox":
        heads = hf["num_attention_heads"]
        return dict(
            hidden_size=hf["hidden_size"], num_layers=hf["num_hidden_layers"],
            num_heads=heads, num_kv_heads=heads,
            head_dim=hf["hidden_size"] // heads,
            intermediate_size=hf["intermediate_size"], vocab_size=hf["vocab_size"],
            max_position_embeddings=hf["max_position_embeddings"],
            norm="layernorm", norm_bias=True, act="gelu", pos="rope",
            rotary_pct=hf.get("rotary_pct", 0.25),
            parallel_residual=hf.get("use_parallel_residual", True),
            qkv_bias=True, attn_out_bias=True, mlp_bias=True,
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
            norm_eps=hf.get("layer_norm_eps", 1e-5),
        )
    raise ValueError(f"Unsupported HF model_type for TPU decoder: {mt!r}")


def resolve_base_config(base_model_name: str, **overrides) -> DecoderConfig:
    """base_model_name (HF hub id, preset key, or local dir with config.json)
    -> DecoderConfig, with explicit overrides (vocab_size, rope_theta, ...)."""
    kwargs: Optional[dict] = None
    local_cfg = os.path.join(base_model_name, "config.json")
    if os.path.isfile(local_cfg):
        with open(local_cfg) as f:
            kwargs = config_from_hf_dict(json.load(f))
    elif base_model_name in PRESETS:
        kwargs = dict(PRESETS[base_model_name])
    else:
        try:  # cached/available HF hub config
            from transformers import AutoConfig

            hf = AutoConfig.from_pretrained(base_model_name)
            kwargs = config_from_hf_dict(hf.to_dict())
        except Exception as e:
            raise ValueError(
                f"Unknown base model '{base_model_name}': not a preset, not a local "
                f"checkpoint dir, and the HF config could not be loaded ({e})"
            ) from e
    kwargs.update({k: v for k, v in overrides.items() if v is not None})
    return DecoderConfig(**kwargs)

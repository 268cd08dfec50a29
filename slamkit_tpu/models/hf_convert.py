"""HF checkpoint -> JAX param-tree conversion (TWIST initialization).

The reference's TWIST init loads a pretrained text LM and resizes its token
embeddings to the unit vocab (reference slamkit/model/unit_lm.py:94-111).
Here the torch weights (local dir or HF cache) are mapped into the stacked
layer layout of slamkit_tpu.models.transformer. Supported families match
presets.py: qwen2, llama, opt, gpt_neox.

All four families use the same rotate-half RoPE convention as our `_rope`, so
no weight permutation is required for rotary layers; GPT-NeoX's fused
query_key_value is de-interleaved per head.
"""
from __future__ import annotations

import glob
import logging
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .transformer import DecoderConfig, init_params

logger = logging.getLogger(__name__)


def load_hf_state_dict(name_or_path: str) -> Dict[str, np.ndarray]:
    """Load an HF checkpoint's tensors as numpy, preferring direct safetensors
    reads over instantiating a torch model."""
    if os.path.isdir(name_or_path):
        st_files = sorted(glob.glob(os.path.join(name_or_path, "*.safetensors")))
        if st_files:
            from safetensors.numpy import load_file

            out = {}
            for f in st_files:
                out.update(load_file(f))
            return out
        bin_files = sorted(glob.glob(os.path.join(name_or_path, "pytorch_model*.bin")))
        if bin_files:
            import torch

            out = {}
            for f in bin_files:
                sd = torch.load(f, map_location="cpu", weights_only=True)
                out.update({k: v.float().numpy() for k, v in sd.items()})
            return out
        raise FileNotFoundError(f"No safetensors/bin weights under {name_or_path}")
    # hub name: go through transformers (works offline when cached)
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(name_or_path, torch_dtype=torch.float32)
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _stack(sd, template: str, n_layers: int, transpose=False):
    mats = []
    for i in range(n_layers):
        w = np.asarray(sd[template.format(i)], dtype=np.float32)
        mats.append(w.T if transpose else w)
    return jnp.asarray(np.stack(mats))


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: DecoderConfig) -> dict:
    """Map an HF state dict to the stacked-layer params pytree."""
    L = cfg.num_layers
    keys = set(sd.keys())

    def has(k):
        return k in keys

    if has("model.embed_tokens.weight"):          # qwen2 / llama
        pre = "model.layers.{}."
        layers = {
            "attn_norm_scale": _stack(sd, pre + "input_layernorm.weight", L),
            "q_w": _stack(sd, pre + "self_attn.q_proj.weight", L, transpose=True),
            "k_w": _stack(sd, pre + "self_attn.k_proj.weight", L, transpose=True),
            "v_w": _stack(sd, pre + "self_attn.v_proj.weight", L, transpose=True),
            "o_w": _stack(sd, pre + "self_attn.o_proj.weight", L, transpose=True),
            "mlp_norm_scale": _stack(sd, pre + "post_attention_layernorm.weight", L),
            "gate_w": _stack(sd, pre + "mlp.gate_proj.weight", L, transpose=True),
            "up_w": _stack(sd, pre + "mlp.up_proj.weight", L, transpose=True),
            "down_w": _stack(sd, pre + "mlp.down_proj.weight", L, transpose=True),
        }
        if cfg.qkv_bias:
            layers["q_b"] = _stack(sd, pre + "self_attn.q_proj.bias", L)
            layers["k_b"] = _stack(sd, pre + "self_attn.k_proj.bias", L)
            layers["v_b"] = _stack(sd, pre + "self_attn.v_proj.bias", L)
        params = {
            "embed": jnp.asarray(sd["model.embed_tokens.weight"], jnp.float32),
            "layers": layers,
            "final_norm_scale": jnp.asarray(sd["model.norm.weight"], jnp.float32),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = jnp.asarray(sd["lm_head.weight"], jnp.float32).T
        return params

    if has("model.decoder.embed_tokens.weight"):  # opt
        pre = "model.decoder.layers.{}."
        layers = {
            "attn_norm_scale": _stack(sd, pre + "self_attn_layer_norm.weight", L),
            "attn_norm_bias": _stack(sd, pre + "self_attn_layer_norm.bias", L),
            "q_w": _stack(sd, pre + "self_attn.q_proj.weight", L, transpose=True),
            "q_b": _stack(sd, pre + "self_attn.q_proj.bias", L),
            "k_w": _stack(sd, pre + "self_attn.k_proj.weight", L, transpose=True),
            "k_b": _stack(sd, pre + "self_attn.k_proj.bias", L),
            "v_w": _stack(sd, pre + "self_attn.v_proj.weight", L, transpose=True),
            "v_b": _stack(sd, pre + "self_attn.v_proj.bias", L),
            "o_w": _stack(sd, pre + "self_attn.out_proj.weight", L, transpose=True),
            "o_b": _stack(sd, pre + "self_attn.out_proj.bias", L),
            "mlp_norm_scale": _stack(sd, pre + "final_layer_norm.weight", L),
            "mlp_norm_bias": _stack(sd, pre + "final_layer_norm.bias", L),
            "up_w": _stack(sd, pre + "fc1.weight", L, transpose=True),
            "up_b": _stack(sd, pre + "fc1.bias", L),
            "down_w": _stack(sd, pre + "fc2.weight", L, transpose=True),
            "down_b": _stack(sd, pre + "fc2.bias", L),
        }
        params = {
            "embed": jnp.asarray(sd["model.decoder.embed_tokens.weight"], jnp.float32),
            "layers": layers,
            "pos_embed": jnp.asarray(sd["model.decoder.embed_positions.weight"], jnp.float32),
        }
        if has("model.decoder.final_layer_norm.weight"):  # pre-norm OPTs only
            params["final_norm_scale"] = jnp.asarray(
                sd["model.decoder.final_layer_norm.weight"], jnp.float32)
            params["final_norm_bias"] = jnp.asarray(
                sd["model.decoder.final_layer_norm.bias"], jnp.float32)
        if has("model.decoder.project_in.weight"):        # opt-350m family
            params["proj_in_w"] = jnp.asarray(
                sd["model.decoder.project_in.weight"], jnp.float32).T
            params["proj_out_w"] = jnp.asarray(
                sd["model.decoder.project_out.weight"], jnp.float32).T
        if not cfg.tie_word_embeddings:
            params["lm_head"] = jnp.asarray(sd["lm_head.weight"], jnp.float32).T
        return params

    if has("gpt_neox.embed_in.weight"):           # pythia / gpt_neox
        pre = "gpt_neox.layers.{}."
        H, Dh, D = cfg.num_heads, cfg.head_dim, cfg.hidden_size

        def split_qkv(i, part, bias=False):
            w = np.asarray(sd[pre.format(i) + f"attention.query_key_value.{'bias' if bias else 'weight'}"],
                           np.float32)
            idx = {"q": 0, "k": 1, "v": 2}[part]
            if bias:
                return w.reshape(H, 3, Dh)[:, idx].reshape(H * Dh)
            return w.reshape(H, 3, Dh, D)[:, idx].reshape(H * Dh, D).T

        layers = {
            "attn_norm_scale": _stack(sd, pre + "input_layernorm.weight", L),
            "attn_norm_bias": _stack(sd, pre + "input_layernorm.bias", L),
            "q_w": jnp.asarray(np.stack([split_qkv(i, "q") for i in range(L)])),
            "q_b": jnp.asarray(np.stack([split_qkv(i, "q", True) for i in range(L)])),
            "k_w": jnp.asarray(np.stack([split_qkv(i, "k") for i in range(L)])),
            "k_b": jnp.asarray(np.stack([split_qkv(i, "k", True) for i in range(L)])),
            "v_w": jnp.asarray(np.stack([split_qkv(i, "v") for i in range(L)])),
            "v_b": jnp.asarray(np.stack([split_qkv(i, "v", True) for i in range(L)])),
            "o_w": _stack(sd, pre + "attention.dense.weight", L, transpose=True),
            "o_b": _stack(sd, pre + "attention.dense.bias", L),
            "mlp_norm_scale": _stack(sd, pre + "post_attention_layernorm.weight", L),
            "mlp_norm_bias": _stack(sd, pre + "post_attention_layernorm.bias", L),
            "up_w": _stack(sd, pre + "mlp.dense_h_to_4h.weight", L, transpose=True),
            "up_b": _stack(sd, pre + "mlp.dense_h_to_4h.bias", L),
            "down_w": _stack(sd, pre + "mlp.dense_4h_to_h.weight", L, transpose=True),
            "down_b": _stack(sd, pre + "mlp.dense_4h_to_h.bias", L),
        }
        params = {
            "embed": jnp.asarray(sd["gpt_neox.embed_in.weight"], jnp.float32),
            "layers": layers,
            "final_norm_scale": jnp.asarray(sd["gpt_neox.final_layer_norm.weight"], jnp.float32),
            "final_norm_bias": jnp.asarray(sd["gpt_neox.final_layer_norm.bias"], jnp.float32),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = jnp.asarray(sd["embed_out.weight"], jnp.float32).T
        return params

    raise ValueError(f"Unrecognised HF state dict (sample keys: {sorted(keys)[:5]})")


def resize_embeddings(params: dict, cfg: DecoderConfig, new_vocab: int,
                      seed: int = 0) -> dict:
    """TWIST's resize_token_embeddings: keep overlapping rows, init new rows
    around the old embedding mean (reference unit_lm.py:102 via HF resize)."""
    old = params["embed"]
    if old.shape[0] == new_vocab:
        return params
    rng = jax.random.PRNGKey(seed)
    mean = jnp.mean(old, axis=0)
    n_keep = min(old.shape[0], new_vocab)
    fresh = mean + jax.random.normal(rng, (new_vocab, old.shape[1])) * cfg.initializer_range
    params = dict(params)
    params["embed"] = fresh.at[:n_keep].set(old[:n_keep])
    if "lm_head" in params:
        head = params["lm_head"]  # [D, V]
        fresh_h = (mean[:, None] + jax.random.normal(
            jax.random.fold_in(rng, 1), (head.shape[0], new_vocab)) * cfg.initializer_range)
        params["lm_head"] = fresh_h.at[:, :n_keep].set(head[:, :n_keep])
    return params


def export_hf_state_dict(params: dict, cfg: DecoderConfig) -> Dict[str, np.ndarray]:
    """Reverse conversion: stacked-layer params -> HF state dict (SURVEY.md
    §5.4 'keep an HF-compatible export for parity evals'). Covers the decoder
    families the recipes use: qwen2/llama layout and OPT layout."""
    lp = jax.device_get(params["layers"])
    out: Dict[str, np.ndarray] = {}

    def put(key, arr, transpose=False):
        a = np.asarray(arr, dtype=np.float32)
        # MUST be contiguous: safetensors silently serializes the raw buffer
        # of a transposed view under the transposed shape (data corruption)
        out[key] = np.ascontiguousarray(a.T if transpose else a)

    if cfg.pos == "rope" and not cfg.parallel_residual:   # qwen2 / llama
        pre = "model.layers.{}."
        for i in range(cfg.num_layers):
            put(pre.format(i) + "input_layernorm.weight", lp["attn_norm_scale"][i])
            put(pre.format(i) + "self_attn.q_proj.weight", lp["q_w"][i], transpose=True)
            put(pre.format(i) + "self_attn.k_proj.weight", lp["k_w"][i], transpose=True)
            put(pre.format(i) + "self_attn.v_proj.weight", lp["v_w"][i], transpose=True)
            put(pre.format(i) + "self_attn.o_proj.weight", lp["o_w"][i], transpose=True)
            put(pre.format(i) + "post_attention_layernorm.weight", lp["mlp_norm_scale"][i])
            put(pre.format(i) + "mlp.gate_proj.weight", lp["gate_w"][i], transpose=True)
            put(pre.format(i) + "mlp.up_proj.weight", lp["up_w"][i], transpose=True)
            put(pre.format(i) + "mlp.down_proj.weight", lp["down_w"][i], transpose=True)
            if cfg.qkv_bias:
                put(pre.format(i) + "self_attn.q_proj.bias", lp["q_b"][i])
                put(pre.format(i) + "self_attn.k_proj.bias", lp["k_b"][i])
                put(pre.format(i) + "self_attn.v_proj.bias", lp["v_b"][i])
        put("model.embed_tokens.weight", params["embed"])
        put("model.norm.weight", params["final_norm_scale"])
        if cfg.tie_word_embeddings:
            put("lm_head.weight", params["embed"])
        else:
            put("lm_head.weight", params["lm_head"], transpose=True)
        return out

    if cfg.pos == "learned":                               # opt
        pre = "model.decoder.layers.{}."
        for i in range(cfg.num_layers):
            put(pre.format(i) + "self_attn_layer_norm.weight", lp["attn_norm_scale"][i])
            put(pre.format(i) + "self_attn_layer_norm.bias", lp["attn_norm_bias"][i])
            for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                                 ("v", "v_proj"), ("o", "out_proj")):
                put(pre.format(i) + f"self_attn.{theirs}.weight",
                    lp[f"{ours}_w"][i], transpose=True)
                put(pre.format(i) + f"self_attn.{theirs}.bias", lp[f"{ours}_b"][i])
            put(pre.format(i) + "final_layer_norm.weight", lp["mlp_norm_scale"][i])
            put(pre.format(i) + "final_layer_norm.bias", lp["mlp_norm_bias"][i])
            put(pre.format(i) + "fc1.weight", lp["up_w"][i], transpose=True)
            put(pre.format(i) + "fc1.bias", lp["up_b"][i])
            put(pre.format(i) + "fc2.weight", lp["down_w"][i], transpose=True)
            put(pre.format(i) + "fc2.bias", lp["down_b"][i])
        put("model.decoder.embed_tokens.weight", params["embed"])
        put("model.decoder.embed_positions.weight", params["pos_embed"])
        if cfg.pre_norm:  # post-LN OPTs (opt-350m) have no top-level norm
            put("model.decoder.final_layer_norm.weight", params["final_norm_scale"])
            put("model.decoder.final_layer_norm.bias", params["final_norm_bias"])
        if cfg.embed_proj_dim:
            put("model.decoder.project_in.weight", params["proj_in_w"], transpose=True)
            put("model.decoder.project_out.weight", params["proj_out_w"], transpose=True)
        if cfg.tie_word_embeddings:
            put("lm_head.weight", params["embed"])
        else:
            put("lm_head.weight", params["lm_head"], transpose=True)
        return out

    raise ValueError(f"HF export not implemented for this architecture: "
                     f"pos={cfg.pos} parallel_residual={cfg.parallel_residual}")


def export_hf_checkpoint(params: dict, cfg: DecoderConfig, base_model_name: str,
                         save_directory: str):
    """Write an HF-loadable checkpoint dir (config.json + model.safetensors) so
    parity evals can run the trained model under transformers."""
    import json

    os.makedirs(save_directory, exist_ok=True)
    sd = export_hf_state_dict(params, cfg)
    from safetensors.numpy import save_file

    save_file(sd, os.path.join(save_directory, "model.safetensors"),
              metadata={"format": "pt"})
    if cfg.pos == "learned":
        hf_cfg = {
            "model_type": "opt", "architectures": ["OPTForCausalLM"],
            "hidden_size": cfg.hidden_size, "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads, "ffn_dim": cfg.intermediate_size,
            "vocab_size": cfg.vocab_size,
            "word_embed_proj_dim": cfg.embed_proj_dim or cfg.hidden_size,
            "max_position_embeddings": cfg.max_position_embeddings - 0,
            "do_layer_norm_before": cfg.pre_norm, "activation_function": "relu",
            "tie_word_embeddings": cfg.tie_word_embeddings,
            "pad_token_id": 0, "bos_token_id": 1, "eos_token_id": 1,
            "torch_dtype": "float32",
        }
    else:
        mt = "qwen2" if cfg.qkv_bias else "llama"
        hf_cfg = {
            "model_type": mt,
            "architectures": ["Qwen2ForCausalLM" if mt == "qwen2" else "LlamaForCausalLM"],
            "hidden_size": cfg.hidden_size, "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "num_key_value_heads": cfg.num_kv_heads, "head_dim": cfg.head_dim,
            "intermediate_size": cfg.intermediate_size, "vocab_size": cfg.vocab_size,
            "max_position_embeddings": cfg.max_position_embeddings,
            "rope_theta": cfg.rope_theta, "rms_norm_eps": cfg.norm_eps,
            "hidden_act": "silu", "tie_word_embeddings": cfg.tie_word_embeddings,
            "attention_bias": cfg.qkv_bias,
            "pad_token_id": 0, "bos_token_id": 1, "eos_token_id": 1,
            "torch_dtype": "float32",
        }
    with open(os.path.join(save_directory, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    logger.info("Exported HF checkpoint (%s) to %s", hf_cfg["model_type"],
                save_directory)


def load_twist_params(config, decoder_cfg: DecoderConfig, seed: int = 0) -> dict:
    """Full TWIST init: pretrained base weights -> convert -> vocab resize.
    Falls back to random init with a warning when weights are unreachable
    (zero-egress environments)."""
    # a re-headed variant (config_overrides touching the attention layout,
    # e.g. slam_dh128's 14x64/GQA-2 -> 7x128/MQA) can load the pretrained
    # projections shape-clean, but head boundaries and rope pairing no
    # longer match the trained function — a silently scrambled warm start.
    # Random init is the only honest start for such a variant.
    from .presets import resolve_base_config

    source = resolve_base_config(config.base_model_name,
                                 vocab_size=decoder_cfg.vocab_size)
    layout = ("num_heads", "num_kv_heads", "head_dim", "hidden_size",
              "num_layers", "intermediate_size")
    diffs = [k for k in layout
             if getattr(source, k) != getattr(decoder_cfg, k)]
    if diffs:
        logger.warning(
            "TWIST init requested but the decoder overrides change the "
            "architecture of %s (%s differ) — pretrained weights would be "
            "reinterpreted across head boundaries; using random init",
            config.base_model_name, ", ".join(diffs))
        return init_params(decoder_cfg, jax.random.PRNGKey(seed))
    try:
        sd = load_hf_state_dict(config.base_model_name)
    except Exception as e:
        logger.warning(
            "TWIST init requested but base weights for %s unavailable (%s); "
            "falling back to random init", config.base_model_name, e)
        return init_params(decoder_cfg, jax.random.PRNGKey(seed))
    # convert against the ORIGINAL vocab then resize to the unit vocab
    import dataclasses as dc

    orig_cfg = dc.replace(decoder_cfg)  # vocab mismatch is fine for conversion
    params = convert_state_dict(sd, orig_cfg)
    params = resize_embeddings(params, decoder_cfg, decoder_cfg.vocab_size, seed=seed)
    return params

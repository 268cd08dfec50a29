"""Numeric parity: HF torch forward vs converted JAX forward, per family.

Tiny random models are constructed locally from transformers configs (no hub
downloads), converted with hf_convert, and compared logit-for-logit. This is
the gate for TWIST-init correctness (reference unit_lm.py:94-102)."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from slamkit_tpu.models.hf_convert import convert_state_dict, resize_embeddings
from slamkit_tpu.models.presets import config_from_hf_dict
from slamkit_tpu.models.transformer import DecoderConfig, forward


def _compare(hf_model, hf_cfg_dict, atol=2e-4):
    hf_model.eval()
    cfg = DecoderConfig(**config_from_hf_dict(hf_cfg_dict),
                        dtype="float32", attn_impl="xla")
    sd = {k: v.detach().float().numpy() for k, v in hf_model.state_dict().items()}
    params = convert_state_dict(sd, cfg)

    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, size=(2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.float().numpy()
    ours, _ = forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=atol, rtol=1e-3)
    return cfg, params


def test_qwen2_parity():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=True, attn_implementation="eager")
    model = Qwen2ForCausalLM(hf_cfg)
    _compare(model, {**hf_cfg.to_dict(), "model_type": "qwen2"})


def test_llama_parity():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, tie_word_embeddings=False,
        attn_implementation="eager")
    model = LlamaForCausalLM(hf_cfg)
    _compare(model, {**hf_cfg.to_dict(), "model_type": "llama"})


def test_opt_parity():
    from transformers import OPTConfig, OPTForCausalLM

    hf_cfg = OPTConfig(
        vocab_size=99, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        do_layer_norm_before=True, activation_function="relu",
        word_embed_proj_dim=32, attn_implementation="eager")
    model = OPTForCausalLM(hf_cfg)
    _compare(model, {**hf_cfg.to_dict(), "model_type": "opt"})


def test_gptneox_parity():
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    hf_cfg = GPTNeoXConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, rotary_pct=0.25,
        use_parallel_residual=True, tie_word_embeddings=False,
        attn_implementation="eager")
    model = GPTNeoXForCausalLM(hf_cfg)
    _compare(model, {**hf_cfg.to_dict(), "model_type": "gpt_neox"})


def test_resize_embeddings_keeps_overlap():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        tie_word_embeddings=True, attn_implementation="eager")
    model = Qwen2ForCausalLM(hf_cfg)
    cfg, params = _compare(model, {**hf_cfg.to_dict(), "model_type": "qwen2"})
    resized = resize_embeddings(params, cfg, 502)
    assert resized["embed"].shape == (502, 32)
    np.testing.assert_array_equal(resized["embed"][:99], params["embed"][:99])


def test_export_hf_roundtrip_qwen_layout(tmp_path):
    """Export -> transformers load -> logits must match our forward."""
    import numpy as np
    import torch
    from transformers import AutoModelForCausalLM

    from slamkit_tpu.models.hf_convert import export_hf_checkpoint
    from slamkit_tpu.models.transformer import (DecoderConfig, forward,
                                                init_params)
    import jax

    cfg = DecoderConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
                        max_position_embeddings=128, norm="rmsnorm",
                        act="silu_glu", pos="rope", rope_theta=10000.0,
                        qkv_bias=True, tie_word_embeddings=True,
                        dtype="float32", attn_impl="xla")
    params = init_params(cfg, jax.random.PRNGKey(0))
    export_hf_checkpoint(params, cfg, "Qwen/Qwen2.5-0.5B", str(tmp_path / "hf"))

    hf = AutoModelForCausalLM.from_pretrained(str(tmp_path / "hf"),
                                              torch_dtype=torch.float32).eval()
    ids = np.array([[1, 5, 9, 3, 2, 60]], dtype=np.int64)
    with torch.inference_mode():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = forward(params, cfg, ids.astype(np.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_export_hf_roundtrip_opt_layout(tmp_path):
    import numpy as np
    import torch
    from transformers import AutoModelForCausalLM

    from slamkit_tpu.models.hf_convert import export_hf_checkpoint
    from slamkit_tpu.models.transformer import (DecoderConfig, forward,
                                                init_params)
    import jax

    cfg = DecoderConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=8,
                        max_position_embeddings=128, norm="layernorm",
                        norm_bias=True, act="relu", pos="learned",
                        learned_pos_offset=2, qkv_bias=True, attn_out_bias=True,
                        mlp_bias=True, tie_word_embeddings=True, norm_eps=1e-5,
                        dtype="float32", attn_impl="xla")
    params = init_params(cfg, jax.random.PRNGKey(1))
    export_hf_checkpoint(params, cfg, "facebook/opt-125m", str(tmp_path / "hf"))
    hf = AutoModelForCausalLM.from_pretrained(str(tmp_path / "hf"),
                                              torch_dtype=torch.float32).eval()
    ids = np.array([[1, 5, 9, 3]], dtype=np.int64)
    with torch.inference_mode():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = forward(params, cfg, ids.astype(np.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_load_reference_format_checkpoint(tmp_path):
    """A checkpoint dir as the REFERENCE toolkit saves it ('lm.'-prefixed HF
    weights + speech_language_model config) loads into UnitLM with logit
    parity (enables slprl/slam_scaled-style checkpoints)."""
    import json

    import numpy as np
    import torch
    from safetensors.torch import save_file
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from slamkit_tpu.models.unit_lm import UnitLM

    hf_cfg = Qwen2Config(vocab_size=502, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=128,
                         rope_theta=10000.0, tie_word_embeddings=True,
                         attn_implementation="eager")
    torch.manual_seed(0)
    base = Qwen2ForCausalLM(hf_cfg).eval()
    d = tmp_path / "ref_ckpt"
    d.mkdir()
    # HF drops tied lm_head.weight when saving (shared tensor)
    sd = {f"lm.{k}": v.contiguous().clone() for k, v in base.state_dict().items()
          if k != "lm_head.weight"}
    save_file(sd, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({"model_type": "speech_language_model",
                   "base_model_name": "Qwen/Qwen2.5-0.5B",
                   "base_config": {**hf_cfg.to_dict(), "model_type": "qwen2"},
                   "vocab_size": 502, "twist_init": True,
                   "pad_token_id": 0, "bos_token_id": 1, "eos_token_id": 1}, f)

    model = UnitLM.from_pretrained(str(d))
    ids = np.random.RandomState(0).randint(0, 502, size=(2, 10))
    with torch.inference_mode():
        want = base(torch.tensor(ids)).logits.numpy()
    import dataclasses

    model.decoder = dataclasses.replace(model.decoder, dtype="float32",
                                        attn_impl="xla")
    from slamkit_tpu.models.transformer import forward

    got, _ = forward(model.params, model.decoder, ids.astype(np.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def test_tlm_factory_forwards_remat_to_pretrained(tmp_path):
    """training_args.remat (wired into config_args by cli/train) must reach
    the model on the pretrained_model path too — a 360M cont_training run
    without remat silently OOMs on a 16G chip."""
    from slamkit_tpu.config import ConfigNode
    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig, tlm_factory

    cfg = UnitLMConfig(base_model_name="EleutherAI/pythia-14m", vocab_size=64,
                       twist_init=False)
    UnitLM(cfg, seed=0).save_pretrained(str(tmp_path / "ckpt"))

    node = ConfigNode({"tlm_type": "twist",
                       "pretrained_model": str(tmp_path / "ckpt"),
                       "config_args": {"remat": True}})
    model = tlm_factory(node)
    assert model.config.remat is True
    assert model.decoder.remat


def test_opt_350m_style_parity():
    """opt-350m shape: word_embed_proj_dim != hidden (project_in/out) AND
    do_layer_norm_before=False (post-LN, no top-level final norm) — the
    reference supports it via AutoModelForCausalLM (unit_lm.py:94-102)."""
    from transformers import OPTConfig, OPTForCausalLM

    hf_cfg = OPTConfig(
        vocab_size=99, hidden_size=48, ffn_dim=96, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        do_layer_norm_before=False, activation_function="relu",
        word_embed_proj_dim=24, attn_implementation="eager")
    model = OPTForCausalLM(hf_cfg)
    cfg, params = _compare(model, {**hf_cfg.to_dict(), "model_type": "opt"})
    assert cfg.embed_proj_dim == 24 and not cfg.pre_norm
    assert params["embed"].shape == (99, 24)
    assert params["proj_in_w"].shape == (24, 48)


def test_opt_350m_style_export_roundtrip(tmp_path):
    """export_hf_checkpoint for the opt-350m family loads back under
    transformers with identical logits."""
    import torch as _torch
    from transformers import AutoModelForCausalLM, OPTConfig, OPTForCausalLM

    from slamkit_tpu.models.hf_convert import export_hf_checkpoint

    hf_cfg = OPTConfig(
        vocab_size=99, hidden_size=48, ffn_dim=96, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        do_layer_norm_before=False, activation_function="relu",
        word_embed_proj_dim=24, attn_implementation="eager")
    model = OPTForCausalLM(hf_cfg)
    cfg, params = _compare(model, {**hf_cfg.to_dict(), "model_type": "opt"})

    out = str(tmp_path / "export")
    export_hf_checkpoint(params, cfg, "opt-350m-style", out)
    back = AutoModelForCausalLM.from_pretrained(out, attn_implementation="eager")
    back.eval()
    ids = np.random.RandomState(1).randint(0, 99, size=(2, 12))
    with _torch.no_grad():
        a = model(_torch.tensor(ids)).logits.float().numpy()
        b = back(_torch.tensor(ids)).logits.float().numpy()
    np.testing.assert_allclose(b, a, atol=2e-4, rtol=1e-3)


def test_llama_decoupled_head_dim_parity():
    """head_dim independent of hidden_size//num_heads (HF llama supports it
    since 4.45) — the TPU-optimal d_head=128 variants rely on this path."""
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=24, max_position_embeddings=128,
        tie_word_embeddings=False, attn_implementation="eager")
    model = LlamaForCausalLM(hf_cfg)
    cfg, _ = _compare(model, {**hf_cfg.to_dict(), "model_type": "llama"})
    assert cfg.head_dim == 24 and cfg.num_heads == 2 and cfg.num_kv_heads == 1


def test_config_args_route_to_decoder_overrides():
    """Reference parity (slamkit/model/unit_lm.py:62-68): extra config_args
    are decoder-config overrides, not silently dropped. HF attribute names
    alias onto DecoderConfig fields; kernel knobs pass straight through."""
    from slamkit_tpu.models.unit_lm import UnitLMConfig

    cfg = UnitLMConfig.from_dict({
        "base_model_name": "Qwen/Qwen2.5-0.5B", "vocab_size": 502,
        "twist_init": False,
        "num_hidden_layers": 2, "head_dim": 128, "num_attention_heads": 4,
        "num_key_value_heads": 2, "flash_block_k": 256})
    dec = cfg.decoder_config()
    assert dec.num_layers == 2 and dec.head_dim == 128
    assert dec.num_heads == 4 and dec.num_kv_heads == 2
    assert dec.flash_block_k == 256
    # survives save_pretrained round-trip (to_dict -> from_dict)
    again = UnitLMConfig.from_dict(cfg.to_dict())
    assert again.decoder_config() == dec
    # explicit UnitLMConfig fields still win over stray duplicates
    cfg2 = UnitLMConfig.from_dict({
        "base_model_name": "Qwen/Qwen2.5-0.5B", "vocab_size": 502,
        "twist_init": False, "rope_theta": 5000.0,
        "config_overrides": {"rope_theta": 777.0}})
    assert cfg2.decoder_config().rope_theta == 5000.0


def test_twist_init_refuses_reheaded_arch(caplog):
    """TWIST warm start + config overrides that change the head layout would
    load pretrained projections shape-clean but scrambled across head
    boundaries — load_twist_params must fall back to random init loudly."""
    import logging

    from slamkit_tpu.models.hf_convert import load_twist_params
    from slamkit_tpu.models.transformer import init_params, param_count
    from slamkit_tpu.models.unit_lm import UnitLMConfig

    cfg = UnitLMConfig.from_dict({
        "base_model_name": "EleutherAI/pythia-14m", "vocab_size": 502,
        "twist_init": True, "num_attention_heads": 2, "head_dim": 64})
    dec = cfg.decoder_config()
    assert (dec.num_heads, dec.head_dim) == (2, 64)
    with caplog.at_level(logging.WARNING):
        params = load_twist_params(cfg, dec, seed=0)
    assert any("reinterpreted" in r.message for r in caplog.records)
    import jax

    want = init_params(dec, jax.random.PRNGKey(0))
    assert param_count(params) == param_count(want)

"""CI gate for scripts/eval_parity.py (VERDICT r3 item 2b): the one-command
JAX-vs-transformers quality-parity harness runs end-to-end on fabricated
weights — both for our save_pretrained checkpoints (export_hf torch path) and
for reference-format HF dirs (direct lm.* torch load) — and the two paths
agree pair-for-pair. The moment real weights + benchmark audio exist, the
same command produces the real parity number."""
import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _write_noise_pairs(d: pathlib.Path, n_pairs: int = 3):
    from slamkit_tpu.utils.audio import save_wav

    rng = np.random.default_rng(7)
    for i in range(2 * n_pairs):
        n = 4000 + 800 * (i % 5)
        save_wav(str(d / f"{i}+x.wav"),
                 (rng.standard_normal(n) * 0.1).astype(np.float32), 16000)


def _run(ckpt: pathlib.Path, pairs: pathlib.Path):
    cmd = [sys.executable, str(REPO / "scripts" / "eval_parity.py"),
           "--ckpt", str(ckpt), "--pairs", str(pairs), "--sep", "+",
           "--fabricate-fe", "--num-units", "500", "--layer", "2",
           "--batch-size", "2"]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_eval_parity_our_checkpoint(tmp_path):
    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig

    # a tiny OPT-layout base (the flagship family) as a local config dir —
    # export_hf covers learned-pos/qwen layouts, so the torch side loads it
    base = tmp_path / "base"
    base.mkdir()
    (base / "config.json").write_text(json.dumps({
        "model_type": "opt", "vocab_size": 502, "hidden_size": 32,
        "ffn_dim": 64, "num_hidden_layers": 2, "num_attention_heads": 4,
        "max_position_embeddings": 256, "do_layer_norm_before": True,
        "activation_function": "relu", "word_embed_proj_dim": 32}))
    ckpt = tmp_path / "ckpt"
    UnitLM(UnitLMConfig(base_model_name=str(base), vocab_size=502,
                        twist_init=False),
           seed=0).save_pretrained(str(ckpt))
    pairs = tmp_path / "pairs"
    pairs.mkdir()
    _write_noise_pairs(pairs)
    res = _run(ckpt, pairs)
    assert res["pairs"] == 3
    assert res["decisions_equal"] and res["ll_within_atol"]
    assert res["score_jax"] == res["score_torch"]


def test_eval_parity_reference_checkpoint(tmp_path):
    """Reference-format dir: torch side loads the lm.* tensors directly into
    an AutoModelForCausalLM built from base_config — a path fully independent
    of our convert_state_dict, so conversion bugs cannot cancel out."""
    import torch
    from safetensors.torch import save_file
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(vocab_size=502, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=256,
                         rope_theta=10000.0, tie_word_embeddings=True,
                         attn_implementation="eager")
    torch.manual_seed(0)
    base = Qwen2ForCausalLM(hf_cfg).eval()
    ckpt = tmp_path / "ref_ckpt"
    ckpt.mkdir()
    sd = {f"lm.{k}": v.contiguous().clone()
          for k, v in base.state_dict().items() if k != "lm_head.weight"}
    save_file(sd, str(ckpt / "model.safetensors"))
    with open(ckpt / "config.json", "w") as f:
        json.dump({"model_type": "speech_language_model",
                   "base_model_name": "Qwen/Qwen2.5-0.5B",
                   "base_config": {**hf_cfg.to_dict(), "model_type": "qwen2"},
                   "vocab_size": 502, "twist_init": True,
                   "pad_token_id": 0, "bos_token_id": 1, "eos_token_id": 1}, f)
    pairs = tmp_path / "pairs"
    pairs.mkdir()
    _write_noise_pairs(pairs)
    res = _run(ckpt, pairs)
    assert res["decisions_equal"] and res["ll_within_atol"]
    assert res["score_jax"] == res["score_torch"]

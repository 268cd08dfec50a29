"""int8 weight-only quantization: quantize/dequantize round-trip error and
the Pallas dequant-gemv vs the XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slamkit_tpu.ops import dequantize_weight, dq_matmul, quantize_weight


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((896, 512)) * 0.02, jnp.float32)
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 512)
    back = dequantize_weight(q, s, jnp.float32)
    # per-channel symmetric int8: max error <= scale/2 per element
    err = np.abs(np.asarray(back - w))
    bound = np.asarray(s, np.float32) / 2 + 1e-8
    assert (err <= bound + 1e-6).all()


def test_quantize_zero_column():
    w = jnp.zeros((64, 128), jnp.float32)
    q, s = quantize_weight(w)
    assert np.asarray(q).sum() == 0
    np.testing.assert_array_equal(
        np.asarray(dequantize_weight(q, s, jnp.float32)), 0.0)


@pytest.mark.parametrize("b,k,n,block_n", [
    (16, 896, 4864, 512),   # MLP up panel, padded N grid
    (3, 896, 896, 512),     # unpadded-B odd batch, square panel
    (8, 128, 250, 512),     # N not a lane multiple -> padded + cropped
])
def test_dq_matmul_matches_reference(b, k, n, block_n):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.float32)
    q, s = quantize_weight(w)

    out = dq_matmul(x, q, s, block_n=block_n, interpret=True)
    ref = (x.astype(jnp.float32)
           @ dequantize_weight(q, s, jnp.float32)).astype(jnp.bfloat16)
    assert out.shape == (b, n)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def _tiny_lm():
    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig

    cfg = UnitLMConfig(base_model_name="EleutherAI/pythia-14m", vocab_size=502,
                       twist_init=False)
    return UnitLM(cfg, seed=0)


def test_int8_decode_logits_close_to_dense():
    """forward() with {"q","s"} weights (the int8 decode path through the
    Pallas dequant-gemv, interpret on CPU) vs a dense forward over the SAME
    dequantized weights — the only difference is accumulation order."""
    import jax.numpy as jnp

    from slamkit_tpu.models.generate import _QUANT_KEYS, _quantize_decode_params
    from slamkit_tpu.models.transformer import forward
    from slamkit_tpu.ops import dequantize_weight

    model = _tiny_lm()
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.ndim > 1 else x, model.params)
    qparams = _quantize_decode_params(params)
    assert any(isinstance(qparams["layers"].get(k), dict) for k in _QUANT_KEYS)

    dense = {**qparams, "layers": {
        k: (dequantize_weight(v["q"], v["s"]) if isinstance(v, dict) else v)
        for k, v in qparams["layers"].items()}}

    ids = jnp.asarray(np.random.default_rng(0).integers(2, 502, (2, 16)))
    lq, _ = forward(qparams, model.decoder, ids)
    ld, _ = forward(dense, model.decoder, ids)
    np.testing.assert_allclose(np.asarray(lq), np.asarray(ld),
                               rtol=5e-2, atol=5e-2)


def test_int8_generate_end_to_end():
    model = _tiny_lm()
    prompts = np.random.default_rng(1).integers(2, 502, (2, 8))
    out = model.generate(prompts, max_new_tokens=6, do_sample=False,
                         weight_quant="int8")
    out = np.asarray(out)
    assert out.shape == (2, 14)
    assert (out[:, :8] == prompts).all()
    assert ((out[:, 8:] >= 0) & (out[:, 8:] < 502)).all()


def test_int8_generate_gated_arch(tmp_path):
    """silu_glu (gate_w) arch: quantized decode end to end on a tiny
    Qwen2-shaped local config dir (GQA + RoPE + gated MLP)."""
    from transformers import Qwen2Config

    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig

    base = tmp_path / "qwen_tiny"
    Qwen2Config(hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, intermediate_size=128,
                vocab_size=502).save_pretrained(base)
    model = UnitLM(UnitLMConfig(base_model_name=str(base), vocab_size=502,
                                twist_init=False), seed=0)
    assert model.decoder.act == "silu_glu"
    prompts = np.random.default_rng(2).integers(2, 502, (2, 8))
    out = np.asarray(model.generate(prompts, max_new_tokens=5,
                                    do_sample=False, weight_quant="int8"))
    ref = np.asarray(model.generate(prompts, max_new_tokens=5,
                                    do_sample=False))
    assert out.shape == ref.shape == (2, 13)
    # int8 error is small; greedy decode from random weights may still
    # diverge, so assert validity of ids rather than token equality
    assert ((out[:, 8:] >= 0) & (out[:, 8:] < 502)).all()


def test_dq_matmul_row_grid_matches_single_block():
    """Prefill-sized row counts (B*L0 >> block_m) walk an M grid; the result
    must match the one-block path bit-for-bit (same K pass per block)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((600, 128)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((128, 256)) * 0.02, jnp.float32)
    q, s = quantize_weight(w)
    gridded = dq_matmul(x, q, s, block_m=256, interpret=True)
    single = dq_matmul(x, q, s, block_m=1024, interpret=True)
    assert gridded.shape == (600, 256)
    np.testing.assert_array_equal(np.asarray(gridded, np.float32),
                                  np.asarray(single, np.float32))


def test_prepare_int8_idempotent_and_cached():
    """_quantize_decode_params must pass pre-quantized dict leaves through
    untouched, and UnitLM caches the prepared pytree per params object."""
    from slamkit_tpu.models.generate import (_QUANT_KEYS,
                                             _quantize_decode_params,
                                             prepare_int8_decode_params)

    model = _tiny_lm()
    prepared = prepare_int8_decode_params(model.params, jnp.bfloat16)
    again = _quantize_decode_params(prepared)
    for k in _QUANT_KEYS:
        v = prepared["layers"].get(k)
        if isinstance(v, dict):
            assert again["layers"][k]["q"] is v["q"]  # untouched, not re-quantized

    first = model._int8_decode_params()
    assert model._int8_decode_params() is first  # cache hit
    model.params = jax.tree_util.tree_map(lambda x: x, model.params)
    assert model._int8_decode_params() is not first  # new params invalidate

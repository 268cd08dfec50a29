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

"""Flash-attention parity on REAL TPU (Mosaic-compiled, not interpret mode).

The main suite runs on a virtual CPU mesh (conftest), so this file always
skips there; run it directly on hardware with:
    JAX_PLATFORMS=<tpu backend> python -m pytest tests/test_flash_tpu.py --no-header
Last validated on v5e: fwd max diff 0.0156 (bf16 ulp), grad rel diff <= 0.7%.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="needs real TPU (the suite's conftest forces the CPU backend)")


def test_flash_parity_on_tpu():
    from slamkit_tpu.ops import flash_attention, mha_reference

    rng = np.random.default_rng(0)
    B, H, T, D = 2, 4, 1024, 64
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
               for _ in range(3))
    seg = jnp.asarray(np.repeat(np.arange(4), T // 4)[None].repeat(B, 0),
                      jnp.int32).at[:, -64:].set(-1)
    for s in (None, seg):
        out = flash_attention(q, k, v, segment_ids=s, causal=True, sm_scale=D ** -0.5)
        ref = mha_reference(q, k, v, segment_ids=s, causal=True, sm_scale=D ** -0.5)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32), atol=3e-2)

        def loss(fn):
            return lambda *a: jnp.sum(
                fn(*a, segment_ids=s, causal=True, sm_scale=D ** -0.5)
                .astype(jnp.float32) ** 2)

        g1 = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss(mha_reference), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            rel = (np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()
                   / (np.abs(np.asarray(b, np.float32)).max() + 1e-9))
            assert rel < 2e-2


def test_flash_gqa_parity_on_tpu():
    """GQA-folded path (un-repeated kv) on real hardware vs repeated reference."""
    from slamkit_tpu.ops import flash_attention, mha_reference

    rng = np.random.default_rng(1)
    B, Hq, Hkv, T, D = 2, 14, 2, 1024, 64
    q = jnp.asarray(rng.standard_normal((B, Hq, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.bfloat16)
    seg = jnp.asarray(np.repeat(np.arange(4), T // 4)[None].repeat(B, 0),
                      jnp.int32)
    groups = Hq // Hkv
    k_rep, v_rep = jnp.repeat(k, groups, axis=1), jnp.repeat(v, groups, axis=1)

    out = flash_attention(q, k, v, segment_ids=seg, causal=True, sm_scale=D ** -0.5)
    ref = mha_reference(q, k_rep, v_rep, segment_ids=seg, causal=True,
                        sm_scale=D ** -0.5)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, segment_ids=seg, causal=True,
                                       sm_scale=D ** -0.5).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        kr, vr = jnp.repeat(k, groups, axis=1), jnp.repeat(v, groups, axis=1)
        return jnp.sum(mha_reference(q, kr, vr, segment_ids=seg, causal=True,
                                     sm_scale=D ** -0.5).astype(jnp.float32) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        rel = (np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()
               / (np.abs(np.asarray(b, np.float32)).max() + 1e-9))
        assert rel < 2e-2

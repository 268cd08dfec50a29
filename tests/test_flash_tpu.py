"""Flash-attention parity on REAL TPU (Mosaic-compiled, not interpret mode).

The main suite runs on a virtual CPU mesh (conftest), so this file always
skips there; run it directly on hardware with:
    SLAMKIT_TEST_TPU=1 python -m pytest tests/test_flash_tpu.py --no-header
Last validated on v5e: fwd max diff 0.0156 (bf16 ulp), grad rel diff <= 0.7%.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="needs real TPU: run with SLAMKIT_TEST_TPU=1")


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


# --------------------------------------------------------------------------- #
# VERDICT r3 item 7: the hand-run bench_flash.py claims as regression tests
# --------------------------------------------------------------------------- #
def _inputs(B, Hq, Hkv, T, D, segs=8, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, Hq, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.bfloat16)
    seg = jnp.asarray(np.repeat(np.arange(segs), T // segs)[None].repeat(B, 0),
                      jnp.int32)
    return q, k, v, seg


def _time_chained(step, q, k, v, reps=8, iters=10):
    """reps data-chained invocations inside ONE jit amortize the ~1ms
    tunnel dispatch; float() pull because block_until_ready is unreliable
    over the tunnel (CLAUDE.md)."""
    import functools
    import time

    @functools.partial(jax.jit, static_argnums=())
    def many(q, k, v):
        def body(q, _):
            r = step(q, k, v)
            return q + r.astype(q.dtype) * 1e-6, None

        out, _ = jax.lax.scan(body, q, None, length=reps)
        return out

    r = many(q, k, v)
    float(np.asarray(r.reshape(-1)[0], np.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = many(q, k, v)
    float(np.asarray(r.reshape(-1)[0], np.float32))
    return (time.perf_counter() - t0) / (iters * reps)


@pytest.mark.parametrize("shape", [(8, 14, 2, 1024, 64), (8, 14, 2, 2048, 64)])
def test_flash_speedup_over_xla_fwd_bwd(shape):
    """The kernel must beat XLA attention by >=1.5x on fwd+bwd at the two
    recipe shapes (Slam ctx 1024, SIMS ctx 2048) — certifying the measured
    claim instead of trusting a hand-run script."""
    from slamkit_tpu.ops import flash_attention, mha_reference

    B, Hq, Hkv, T, D = shape
    q, k, v, seg = _inputs(B, Hq, Hkv, T, D)
    groups = Hq // Hkv

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, segment_ids=seg, causal=True,
                                       sm_scale=D ** -0.5)
                       .astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        kr, vr = jnp.repeat(k, groups, axis=1), jnp.repeat(v, groups, axis=1)
        return jnp.sum(mha_reference(q, kr, vr, segment_ids=seg, causal=True,
                                     sm_scale=D ** -0.5)
                       .astype(jnp.float32) ** 2)

    def grad_step(fn):
        g = jax.grad(fn)
        return lambda q, k, v: g(q, k, v)

    t_flash = _time_chained(grad_step(loss_flash), q, k, v)
    t_ref = _time_chained(grad_step(loss_ref), q, k, v)
    speedup = t_ref / t_flash
    print(f"\nshape {shape}: flash {t_flash * 1e3:.2f}ms "
          f"xla {t_ref * 1e3:.2f}ms speedup {speedup:.2f}x")
    assert speedup >= 1.5, (t_flash, t_ref)


def test_chunked_backward_parity_on_tpu():
    """ctx 2048 with block_k=128 runs the chunked dQ-partials backward
    (n_k=16 > _MAX_DQ_PARTIALS=4); grads must match both the unchunked
    large-block kernel and XLA."""
    from slamkit_tpu.ops import flash_attention, mha_reference
    from slamkit_tpu.ops.flash_attention import _MAX_DQ_PARTIALS

    B, Hq, Hkv, T, D = 2, 14, 2, 2048, 64
    q, k, v, seg = _inputs(B, Hq, Hkv, T, D, seed=3)
    groups = Hq // Hkv
    assert T // 128 > _MAX_DQ_PARTIALS

    def loss(block_k):
        def f(q, k, v):
            return jnp.sum(flash_attention(
                q, k, v, segment_ids=seg, causal=True, sm_scale=D ** -0.5,
                block_q=128, block_k=block_k).astype(jnp.float32) ** 2)
        return f

    def loss_ref(q, k, v):
        kr, vr = jnp.repeat(k, groups, axis=1), jnp.repeat(v, groups, axis=1)
        return jnp.sum(mha_reference(q, kr, vr, segment_ids=seg, causal=True,
                                     sm_scale=D ** -0.5)
                       .astype(jnp.float32) ** 2)

    g_chunked = jax.grad(loss(128), argnums=(0, 1, 2))(q, k, v)
    g_big = jax.grad(loss(512), argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_chunked, g_big):
        rel = (np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()
               / (np.abs(np.asarray(b, np.float32)).max() + 1e-9))
        assert rel < 1e-2, "chunked vs unchunked backward diverge"
    for a, b in zip(g_chunked, g_xla):
        rel = (np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()
               / (np.abs(np.asarray(b, np.float32)).max() + 1e-9))
        assert rel < 2e-2, "chunked backward vs XLA diverge"

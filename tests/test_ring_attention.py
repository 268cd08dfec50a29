"""Ring flash attention (context parallelism) vs the single-call kernel and
the XLA reference: forward + gradients on the virtual 8-device CPU mesh,
interpret-mode Pallas (same kernels compile on TPU).

The reference toolkit has no CP at all (SURVEY.md §2.8); correctness anchor
is therefore internal: a sequence-sharded ring pass must be numerically the
same function as one unsharded flash/XLA attention call.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slamkit_tpu.ops import flash_attention, mha_reference
from slamkit_tpu.ops.ring_attention import ring_flash_attention
from slamkit_tpu.parallel.mesh import make_mesh


def _qkv(key, b, hq, hkv, t, d):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, hq, t, d), jnp.float32) * 0.3
    k = jax.random.normal(ks[1], (b, hkv, t, d), jnp.float32) * 0.3
    v = jax.random.normal(ks[2], (b, hkv, t, d), jnp.float32) * 0.3
    return q, k, v


def _packed_segments(key, b, t, mean_len=200):
    """Monotone per-row segment ids with a padded tail (like the Batcher)."""
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    seg = np.full((b, t), -1, np.int32)
    for r in range(b):
        pos, s = 0, 0
        while pos < t - 16:
            ln = int(rng.integers(mean_len // 2, mean_len * 2))
            ln = min(ln, t - 16 - pos) or 16
            seg[r, pos:pos + ln] = s
            pos += ln
            s += 1
    return jnp.asarray(seg)


@pytest.mark.parametrize("mesh_shape,axes", [((1, 8), ("data", "seq")),
                                             ((2, 4), ("data", "seq"))])
def test_ring_forward_matches_flash(mesh_shape, axes):
    mesh = make_mesh(mesh_shape, axes)
    n_seq = mesh.shape["seq"]
    b, hq, hkv, t, d = 2, 4, 2, 128 * n_seq, 64
    q, k, v = _qkv(jax.random.PRNGKey(0), b, hq, hkv, t, d)
    ring = jax.jit(functools.partial(
        ring_flash_attention, mesh=mesh, interpret=True))
    out = ring(q, k, v)
    ref = flash_attention(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_with_segments_matches_reference():
    mesh = make_mesh((2, 4), ("data", "seq"))
    b, hq, hkv, t, d = 2, 2, 2, 512, 64
    q, k, v = _qkv(jax.random.PRNGKey(1), b, hq, hkv, t, d)
    seg = _packed_segments(jax.random.PRNGKey(2), b, t, mean_len=96)
    out = jax.jit(functools.partial(
        ring_flash_attention, mesh=mesh, interpret=True))(q, k, v, seg)
    ref = mha_reference(q, k, v, segment_ids=seg, causal=True)
    real = np.asarray(seg) >= 0
    np.testing.assert_allclose(np.asarray(out)[:, :, real[0]],
                               np.asarray(ref)[:, :, real[0]],
                               atol=2e-5, rtol=2e-5)


def test_ring_gradients_match_flash():
    """d(q,k,v) through the ring == through one flash call — the custom VJP
    ring (global-lse backward + travelling dk/dv accumulators) is exact."""
    mesh = make_mesh((2, 4), ("data", "seq"))
    b, hq, hkv, t, d = 2, 4, 2, 512, 64
    q, k, v = _qkv(jax.random.PRNGKey(3), b, hq, hkv, t, d)
    seg = _packed_segments(jax.random.PRNGKey(4), b, t, mean_len=160)

    def loss_ring(q, k, v):
        o = ring_flash_attention(q, k, v, seg, mesh=mesh, interpret=True)
        return jnp.sum(jnp.where((seg >= 0)[:, None, :, None], o, 0.0) ** 2)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, segment_ids=seg, causal=True,
                            interpret=True)
        return jnp.sum(jnp.where((seg >= 0)[:, None, :, None], o, 0.0) ** 2)

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b_ in zip("qkv", g_ring, g_flash):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, rtol=3e-5, err_msg=f"d{name}")


def test_ring_rejects_misaligned_chunks():
    mesh = make_mesh((1, 8), ("data", "seq"))
    q, k, v = _qkv(jax.random.PRNGKey(5), 1, 2, 2, 512, 64)  # 512/8 = 64 < 128
    with pytest.raises(ValueError, match="lane-aligned"):
        ring_flash_attention(q, k, v, mesh=mesh, interpret=True)
    # zigzag needs 2x alignment: chunk 128 is fine contiguous, not zigzag
    mesh2 = make_mesh((2, 4), ("data", "seq"))
    q2, k2, v2 = _qkv(jax.random.PRNGKey(6), 2, 2, 2, 512, 64)
    ring_flash_attention(q2, k2, v2, mesh=mesh2, interpret=True)
    with pytest.raises(ValueError, match="lane-aligned"):
        ring_flash_attention(q2, k2, v2, mesh=mesh2, schedule="zigzag",
                             interpret=True)


def _zigzag_args(key, b, hq, hkv, t, d, n, mean_len):
    """(q,k,v,seg) plus their zigzag-permuted copies and the permutation."""
    from slamkit_tpu.ops.ring_attention import zigzag_permutation

    q, k, v = _qkv(key, b, hq, hkv, t, d)
    seg = _packed_segments(jax.random.fold_in(key, 1), b, t, mean_len)
    idx = zigzag_permutation(t, n)
    perm = lambda x, ax: jnp.take(x, jnp.asarray(idx), axis=ax)  # noqa: E731
    return (q, k, v, seg,
            perm(q, 2), perm(k, 2), perm(v, 2), perm(seg, 1), idx)


def test_zigzag_forward_matches_flash():
    """Zigzag schedule on zigzag-permuted inputs == row-permuted output of
    one unsharded flash call (packed segments included)."""
    mesh = make_mesh((2, 4), ("data", "seq"))
    n = mesh.shape["seq"]
    b, hq, hkv, t, d = 2, 4, 2, 256 * 2 * n, 64
    q, k, v, seg, qp, kp, vp, sp, idx = _zigzag_args(
        jax.random.PRNGKey(7), b, hq, hkv, t, d, n, mean_len=300)
    out_p = jax.jit(functools.partial(
        ring_flash_attention, mesh=mesh, schedule="zigzag",
        interpret=True))(qp, kp, vp, sp)
    ref = flash_attention(q, k, v, segment_ids=seg, causal=True,
                          interpret=True)
    ref_p = jnp.take(ref, jnp.asarray(idx), axis=2)
    real_p = np.asarray(sp) >= 0
    np.testing.assert_allclose(np.asarray(out_p)[:, :, real_p[0]],
                               np.asarray(ref_p)[:, :, real_p[0]],
                               atol=2e-5, rtol=2e-5)


def test_zigzag_gradients_match_flash():
    """d(q,k,v) through the zigzag ring == permuted flash gradients: the
    half-pair dispatch, operand selection, and travelling half-accumulators
    are exact."""
    mesh = make_mesh((2, 4), ("data", "seq"))
    n = mesh.shape["seq"]
    b, hq, hkv, t, d = 2, 2, 1, 128 * 2 * n, 64
    q, k, v, seg, qp, kp, vp, sp, idx = _zigzag_args(
        jax.random.PRNGKey(8), b, hq, hkv, t, d, n, mean_len=160)
    mask_p = (np.asarray(sp) >= 0)[:, None, :, None]
    mask = (np.asarray(seg) >= 0)[:, None, :, None]

    def loss_ring(qp, kp, vp):
        o = ring_flash_attention(qp, kp, vp, sp, mesh=mesh,
                                 schedule="zigzag", interpret=True)
        return jnp.sum(jnp.where(mask_p, o, 0.0) ** 2)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, segment_ids=seg, causal=True,
                            interpret=True)
        return jnp.sum(jnp.where(mask, o, 0.0) ** 2)

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(qp, kp, vp)
    g_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b_ in zip("qkv", g_ring, g_flash):
        b_p = jnp.take(b_, jnp.asarray(idx), axis=2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_p),
                                   atol=3e-5, rtol=3e-5, err_msg=f"d{name}")

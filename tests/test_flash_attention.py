"""Flash attention kernel vs XLA reference: forward + gradients, causal and
segment-id (packing) masking. Runs in Pallas interpret mode on the CPU test
mesh; the same kernels compile on TPU."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slamkit_tpu.ops import flash_attention, mha_reference

FA = functools.partial(flash_attention, interpret=True)


def _rand_qkv(key, b, h, t, d, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    mk = lambda k: jax.random.normal(k, (b, h, t, d), dtype=dtype) * 0.3
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


@pytest.mark.parametrize("t,d", [(128, 64), (256, 128), (160, 64)])
def test_causal_forward_matches_reference(t, d):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 2, 3, t, d)
    out = FA(q, k, v, causal=True)
    ref = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_noncausal_forward_matches_reference():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 2, 2, 128, 64)
    out = FA(q, k, v, causal=False)
    ref = mha_reference(q, k, v, causal=False)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_segment_ids_block_cross_attention():
    b, h, t, d = 1, 2, 256, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), b, h, t, d)
    # two packed documents: [0]*100 + [1]*156
    seg = jnp.concatenate([jnp.zeros((b, 100), jnp.int32), jnp.ones((b, 156), jnp.int32)], axis=1)
    out = FA(q, k, v, segment_ids=seg, causal=True)
    ref = mha_reference(q, k, v, segment_ids=seg, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
    # the packed result equals attending to each document separately
    out_doc0 = FA(q[:, :, :100], k[:, :, :100], v[:, :, :100],
                  causal=True, sm_scale=d ** -0.5)
    np.testing.assert_allclose(out[:, :, :100], out_doc0, atol=2e-5, rtol=2e-5)


def test_padding_segment_rows_are_zero():
    b, h, t, d = 1, 1, 128, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), b, h, t, d)
    seg = jnp.where(jnp.arange(t)[None, :] < 64, 0, -1).astype(jnp.int32)
    out = FA(q, k, v, segment_ids=seg, causal=True)
    # padding queries (seg -1 matches other pads — but causal+same-id pads
    # attend among themselves, so only check REAL rows vs reference)
    ref = mha_reference(q, k, v, segment_ids=seg, causal=True)
    np.testing.assert_allclose(out[:, :, :64], ref[:, :, :64], atol=2e-5, rtol=2e-5)


def test_gradients_match_reference():
    b, h, t, d = 1, 2, 128, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), b, h, t, d)
    seg = jnp.concatenate([jnp.zeros((b, 48), jnp.int32), jnp.ones((b, 80), jnp.int32)], axis=1)

    def loss_flash(q, k, v):
        return jnp.sum(FA(q, k, v, segment_ids=seg, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, segment_ids=seg, causal=True) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(gf, gr, atol=5e-5, rtol=5e-4, err_msg=f"d{name}")


def test_gradients_causal_no_segments():
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), 1, 1, 256, 64)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v, causal=True) * jnp.cos(jnp.arange(64.0)))

    g_flash = jax.grad(functools.partial(loss, FA), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(functools.partial(loss, mha_reference), argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(gf, gr, atol=5e-5, rtol=5e-4)


def test_bf16_inputs():
    q, k, v = _rand_qkv(jax.random.PRNGKey(6), 1, 2, 128, 64, dtype=jnp.bfloat16)
    out = FA(q, k, v, causal=True)
    ref = mha_reference(q, k, v, causal=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(out.astype(jnp.float32), ref.astype(jnp.float32),
                               atol=2e-2, rtol=2e-2)


def test_unaligned_seq_len_padding():
    # T=100 not a block multiple: wrapper pads and slices back
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), 1, 1, 100, 64)
    out = FA(q, k, v, causal=True)
    ref = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("hq,hkv", [(4, 2), (6, 2), (4, 1), (7, 1)])
def test_gqa_unrepeated_kv_matches_repeated(hq, hkv):
    """GQA-native path: un-repeated [B, Hkv, T, D] k/v must equal the
    reference run on kv-major repeat_interleave'd heads (fwd + grads)."""
    key = jax.random.PRNGKey(8)
    ks = jax.random.split(key, 3)
    b, t, d = 2, 256, 64
    q = jax.random.normal(ks[0], (b, hq, t, d)) * 0.3
    k = jax.random.normal(ks[1], (b, hkv, t, d)) * 0.3
    v = jax.random.normal(ks[2], (b, hkv, t, d)) * 0.3
    groups = hq // hkv
    k_rep = jnp.repeat(k, groups, axis=1)
    v_rep = jnp.repeat(v, groups, axis=1)
    seg = jnp.asarray(np.repeat(np.arange(2), t // 2)[None].repeat(b, 0),
                      jnp.int32)

    out = FA(q, k, v, segment_ids=seg, causal=True)
    ref = mha_reference(q, k_rep, v_rep, segment_ids=seg, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    w = jnp.cos(jnp.arange(float(d)))

    def loss_flash(q, k, v):
        return jnp.sum(FA(q, k, v, segment_ids=seg, causal=True) * w)

    def loss_ref(q, k, v):
        kr = jnp.repeat(k, groups, axis=1)
        vr = jnp.repeat(v, groups, axis=1)
        return jnp.sum(mha_reference(q, kr, vr, segment_ids=seg, causal=True) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(gf, gr, atol=5e-5, rtol=5e-4,
                                   err_msg=f"d{name}")


def test_multi_k_block_dq_partials():
    """nK > 1 exercises the f32 dQ-partial sum across k blocks."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(9), 1, 2, 512, 64)
    seg = jnp.asarray(np.repeat(np.arange(4), 128)[None], jnp.int32)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v, segment_ids=seg, causal=True,
                          block_q=128, block_k=128) ** 2)

    out = FA(q, k, v, segment_ids=seg, causal=True, block_q=128, block_k=128)
    ref = mha_reference(q, k, v, segment_ids=seg, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
    g_flash = jax.grad(functools.partial(loss, FA), argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, segment_ids=seg, causal=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(gf, gr, atol=5e-5, rtol=5e-4)


def test_chunked_bwd_bounded_dq_partials():
    """nK > _MAX_DQ_PARTIALS runs the backward in k-axis chunks (bounded
    f32 partials); gradients must still match XLA, including the causal
    ik_offset in every chunk and GQA folding."""
    b, hq, hkv, t, d = 1, 4, 2, 1024, 64
    ks = jax.random.split(jax.random.PRNGKey(10), 3)
    q = jax.random.normal(ks[0], (b, hq, t, d)) * 0.3
    k = jax.random.normal(ks[1], (b, hkv, t, d)) * 0.3
    v = jax.random.normal(ks[2], (b, hkv, t, d)) * 0.3
    seg = jnp.asarray(np.repeat(np.arange(8), 128)[None], jnp.int32)
    kr = jnp.repeat(k, hq // hkv, axis=1)
    vr = jnp.repeat(v, hq // hkv, axis=1)

    def loss(q, k, v):
        return jnp.sum(FA(q, k, v, segment_ids=seg, causal=True,
                          block_q=128, block_k=128) ** 2)

    def loss_ref(q, kr, vr):
        return jnp.sum(mha_reference(q, kr, vr, segment_ids=seg,
                                     causal=True) ** 2)

    from slamkit_tpu.ops.flash_attention import _MAX_DQ_PARTIALS
    assert t // 128 > _MAX_DQ_PARTIALS  # the chunk path actually runs
    g_flash = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kr, vr)
    np.testing.assert_allclose(g_flash[0], g_ref[0], atol=5e-5, rtol=5e-4)
    # fold the repeated-head reference grads back onto the kv heads
    for gi, gr in ((1, g_ref[1]), (2, g_ref[2])):
        folded = gr.reshape(b, hkv, hq // hkv, t, d).sum(axis=2)
        np.testing.assert_allclose(g_flash[gi], folded, atol=5e-5, rtol=5e-4)


def test_seg_block_skip_equivalence():
    """seg_block_skip prunes panels whose segment-id ranges are disjoint;
    outputs and grads must match the unskipped kernel EXACTLY (the pruned
    panels are fully masked, contributing zeros either way)."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(11), 2, 4, 512, 64)
    # 3 packed segments + a padded (-1) tail, segment-sized k blocks
    seg = jnp.asarray(np.repeat([0, 1, 2, -1], [160, 160, 128, 64])[None]
                      .repeat(2, 0))

    def run(skip):
        out = FA(q, k, v, segment_ids=seg, causal=True,
                 block_q=128, block_k=128, seg_block_skip=skip)

        def loss(q, k, v):
            return jnp.sum(FA(q, k, v, segment_ids=seg, causal=True,
                              block_q=128, block_k=128,
                              seg_block_skip=skip) ** 2)

        return out, jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    out_s, grads_s = run(True)
    out_n, grads_n = run(False)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_n))
    for gs, gn in zip(grads_s, grads_n):
        np.testing.assert_array_equal(np.asarray(gs), np.asarray(gn))


def test_seg_block_skip_noncausal():
    q, k, v = _rand_qkv(jax.random.PRNGKey(12), 1, 2, 256, 64)
    seg = jnp.asarray(np.repeat([0, 1], [128, 128])[None])
    out_s = FA(q, k, v, segment_ids=seg, causal=False,
               block_q=128, block_k=128, seg_block_skip=True)
    out_n = FA(q, k, v, segment_ids=seg, causal=False,
               block_q=128, block_k=128, seg_block_skip=False)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_n))
    ref = mha_reference(q, k, v, segment_ids=seg, causal=False)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_seg_block_skip_gqa_straddling_blocks():
    """Sweep-shaped case: GQA (8q/2kv), ctx 1024, rectangular blocks
    (block_q=256, block_k=512), segment lengths that straddle every block
    boundary — range-overlap pruning must stay exact for outputs AND all
    three grads."""
    ks = jax.random.split(jax.random.PRNGKey(13), 3)
    q = jax.random.normal(ks[0], (2, 8, 1024, 64)) * 0.3
    k = jax.random.normal(ks[1], (2, 2, 1024, 64)) * 0.3  # un-repeated kv
    v = jax.random.normal(ks[2], (2, 2, 1024, 64)) * 0.3
    lens = [135, 247, 190, 260, 120, 72]  # sums to 1024, no aligned edges
    seg = jnp.asarray(np.repeat(np.arange(len(lens)), lens)[None].repeat(2, 0))

    def run(skip):
        def loss(q, k, v):
            return jnp.sum(FA(q, k, v, segment_ids=seg, causal=True,
                              block_q=256, block_k=512,
                              seg_block_skip=skip) ** 2)

        out = FA(q, k, v, segment_ids=seg, causal=True,
                 block_q=256, block_k=512, seg_block_skip=skip)
        return out, jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    out_s, grads_s = run(True)
    out_n, grads_n = run(False)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_n))
    for gs, gn in zip(grads_s, grads_n):
        np.testing.assert_array_equal(np.asarray(gs), np.asarray(gn))
    ref = mha_reference(q, jnp.repeat(k, 4, axis=1), jnp.repeat(v, 4, axis=1),
                        segment_ids=seg, causal=True)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_mqa_d128_slam_variant_shape():
    """The slam_dh128 recipe head layout (7 q heads, 1 kv head, d_head=128
    — config/model/slam_dh128.yaml): full-lane panels, group 7 folded into
    the M panel. fwd + grads vs the XLA reference."""
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 3)
    b, t, d, hq = 1, 256, 128, 7
    q = jax.random.normal(ks[0], (b, hq, t, d)) * 0.2
    k = jax.random.normal(ks[1], (b, 1, t, d)) * 0.2
    v = jax.random.normal(ks[2], (b, 1, t, d)) * 0.2
    seg = jnp.asarray(np.repeat(np.arange(2), t // 2)[None].repeat(b, 0),
                      jnp.int32)
    out = FA(q, k, v, segment_ids=seg, causal=True)
    ref = mha_reference(q, jnp.repeat(k, hq, 1), jnp.repeat(v, hq, 1),
                        segment_ids=seg, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    def loss_flash(q, k, v):
        return jnp.sum(FA(q, k, v, segment_ids=seg, causal=True) ** 2)

    def loss_ref(q, k, v):
        o = mha_reference(q, jnp.repeat(k, hq, 1), jnp.repeat(v, hq, 1),
                          segment_ids=seg, causal=True)
        return jnp.sum(o ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(a, b_, atol=5e-5, rtol=5e-5)

"""Pallas TPU flash attention: causal + segment-id (packing) masking, GQA-native.

Replaces the reference's flash_attention_2 CUDA path (reference README.md:15,
config/train_inter_scale.yaml:25) and its varlen packing collator
(hf_dataset.py:61-62): TPU kernels take per-token segment ids instead of
cu_seqlens, masking cross-segment attention block-wise (SURVEY.md §2.8, §5.7).

Design (FlashAttention-2 style, MXU-tiled, measured on v5e):
  * GQA folding: k/v are passed UN-repeated ([B, Hkv, T, D]); the G = Hq/Hkv
    query heads of a kv group fold into the matmul M dimension ((G*bq, d)
    blocks), so K/V stream from HBM once per group instead of once per query
    head and every matmul runs with a G× taller M panel.
  * forward: grid (B, Hkv, nQ, nK) with the k axis innermost/"arbitrary";
    online-softmax state (m, l, acc) lives in VMEM scratch across k steps.
  * backward: ONE fused kernel, grid (B, Hkv, nK, nQ) with q innermost:
    dK/dV accumulate in VMEM scratch; dQ is emitted as per-k-block partials
    (summed outside — a no-op at nK == 1) so scores/probabilities are
    recomputed once instead of twice (5 matmuls per block pair, not 7).
  * masking is one fused where per block: causal and segment tests are
    broadcast compares of (M, 1) row vectors against (1, bk) column vectors,
    the running max is clamped so masked lanes underflow exp() to exact 0.0
    (no second where), and fully-masked rows store an LSE sentinel (+1e30)
    that zeroes their backward contributions for free. Blocks strictly below
    the causal diagonal skip the causal compare entirely.
  * causal blocks entirely above the diagonal are skipped with pl.when.
  * all matmuls run on the MXU with f32 accumulation; inputs stay bf16.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
M_CLAMP = -1e25          # running-max floor: exp(NEG_INF - M_CLAMP) == 0.0
LSE_SENTINEL = 1e30      # rows that attend nowhere: exp(s - sentinel) == 0.0
_LANES = 128
_SUBLANES = 8


@dataclasses.dataclass(frozen=True)
class FlashConfig:
    causal: bool = True
    sm_scale: float = 1.0
    groups: int = 1                    # q heads per kv head, folded into M
    block_q: int = 128
    block_k: int = 128
    block_q_bwd: int = 128             # bwd VMEM holds more live [M, bk] tiles
    block_k_bwd: int = 128
    has_segments: bool = False
    seg_block_skip: bool = True        # skip panels whose seg-id ranges are disjoint
    interpret: bool = False
    ik_offset: int = 0                 # global index of this call's first k block
                                       # (the chunked backward slices the k axis)


def _row_positions(iq: int, bq: int, rows: int):
    """Query positions for the folded (G*bq, 1) row panel."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    return iq * bq + jax.lax.rem(r, bq)


def _masked_scores(s, iq, ik, q_seg, k_seg, cfg: FlashConfig, bq, bk,
                   apply_causal: bool):
    """One fused where over the (M, bk) score panel.

    Masks combine as broadcast compares of column vectors against row
    vectors — no (M, bk) iota materialisation, no mask tiling.
    """
    rows = s.shape[0]
    mask = None
    if apply_causal:
        qpos = _row_positions(iq, bq, rows)                       # (M, 1)
        kpos = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        mask = qpos >= kpos
    if cfg.has_segments:
        seg = q_seg == k_seg                                      # (M,1)==(1,bk)
        mask = seg if mask is None else (mask & seg)
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    return s


def _fold(ref):
    """(1, 1, G, bq, d) block -> (G*bq, d) MXU panel."""
    x = ref[0, 0]
    g, bq, d = x.shape
    return x.reshape(g * bq, d)


def _q_seg_panel(q_seg_ref, groups):
    """(1, bq, 128) lane-replicated block -> (G*bq, 1) row vector."""
    col = q_seg_ref[0][:, :1]                                     # (bq, 1)
    return jnp.tile(col, (groups, 1))


def _k_seg_panel(k_seg_ref):
    return k_seg_ref[0, :1]                                       # (1, bk)


def _seg_overlap(q_seg_ref, k_seg_ref):
    """True iff the q block's and k block's segment-id RANGES intersect.

    Packed rows carry monotone segment ids (pads are -1), but correctness
    needs no ordering: if any id appears in both blocks it lies inside both
    [min, max] ranges, so disjoint ranges prove the whole (M, bk) panel is
    segment-masked and its matmuls can be skipped. The test is conservative
    (overlapping ranges without a shared id still compute) and costs two
    small VPU reductions per panel."""
    qs = q_seg_ref[0][:, :1]                                      # (bq, 1)
    ks = k_seg_ref[0, :1]                                         # (1, bk)
    return ((jnp.max(qs) >= jnp.min(ks)) &
            (jnp.max(ks) >= jnp.min(qs)))


# --------------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------------- #
def _fwd_kernel(*refs, cfg: FlashConfig, num_k_blocks: int):
    if cfg.has_segments:
        q_seg_ref, k_seg_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
    else:
        q_seg_ref = k_seg_ref = None
        q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs

    iq, ik = pl.program_id(2), pl.program_id(3)
    bq, bk = cfg.block_q, cfg.block_k

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, M_CLAMP)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    run = (ik * bk <= iq * bq + bq - 1) if cfg.causal else None
    # blocks strictly below the diagonal never need the causal compare
    diag = (ik * bk + bk - 1 > iq * bq) if cfg.causal else False
    if cfg.has_segments and cfg.seg_block_skip:
        ov = _seg_overlap(q_seg_ref, k_seg_ref)
        run = ov if run is None else run & ov

    def step(apply_causal):
        qf = _fold(q_ref)                                         # (M, d)
        s = jax.lax.dot_general(
            qf, k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * cfg.sm_scale                                          # (M, bk)
        q_seg = _q_seg_panel(q_seg_ref, cfg.groups) if cfg.has_segments else None
        k_seg = _k_seg_panel(k_seg_ref) if cfg.has_segments else None
        s = _masked_scores(s, iq, ik, q_seg, k_seg, cfg, bq, bk, apply_causal)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        # masked lanes hold NEG_INF and m_new >= M_CLAMP, so exp underflows
        # to exact 0.0 — no second where needed.
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)
        acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

    if run is None:
        step(False)
    elif cfg.causal:
        @pl.when(run & diag)
        def _masked_step():
            step(True)

        @pl.when(run & jnp.logical_not(diag))
        def _interior_step():
            step(False)
    else:
        @pl.when(run)
        def _plain_step():
            step(False)

    @pl.when(ik == num_k_blocks - 1)
    def _finish():
        g, bq_, d = o_ref.shape[2:]
        l = l_scr[:, :1]
        alive = l > 0.0
        safe_l = jnp.where(alive, l, 1.0)
        o_ref[0, 0] = (acc_scr[...] / safe_l * alive).astype(
            o_ref.dtype).reshape(g, bq_, d)
        lse = jnp.where(alive, m_scr[:, :1] + jnp.log(safe_l), LSE_SENTINEL)
        lse_ref[0, 0] = lse.reshape(g, bq_, 1)


def _fwd(q5, k, v, q_seg, k_seg, cfg: FlashConfig):
    batch, h_kv, g, t_q, d = q5.shape
    t_k = k.shape[2]
    n_q, n_k = t_q // cfg.block_q, t_k // cfg.block_k
    grid = (batch, h_kv, n_q, n_k)
    bq, bk = cfg.block_q, cfg.block_k

    in_specs, args = [], []
    if cfg.has_segments:
        in_specs += [
            pl.BlockSpec((1, bq, _LANES), lambda b, h, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, _SUBLANES, bk), lambda b, h, iq, ik: (b, 0, ik)),
        ]
        args += [q_seg, k_seg]
    in_specs += [
        pl.BlockSpec((1, 1, g, bq, d), lambda b, h, iq, ik: (b, h, 0, iq, 0)),
        pl.BlockSpec((1, 1, bk, d), lambda b, h, iq, ik: (b, h, ik, 0)),
        pl.BlockSpec((1, 1, bk, d), lambda b, h, iq, ik: (b, h, ik, 0)),
    ]
    args += [q5, k, v]

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg, num_k_blocks=n_k),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, g, bq, d), lambda b, h, iq, ik: (b, h, 0, iq, 0)),
            pl.BlockSpec((1, 1, g, bq, 1), lambda b, h, iq, ik: (b, h, 0, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q5.shape, q5.dtype),
            jax.ShapeDtypeStruct((batch, h_kv, g, t_q, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g * bq, _LANES), jnp.float32),
            pltpu.VMEM((g * bq, _LANES), jnp.float32),
            pltpu.VMEM((g * bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=cfg.interpret,
    )(*args)
    return out, lse


# --------------------------------------------------------------------------- #
# fused backward: dK/dV accumulate in scratch, dQ written as per-ik partials
# --------------------------------------------------------------------------- #
def _bwd_kernel(*refs, cfg: FlashConfig, num_q_blocks: int):
    if cfg.has_segments:
        (q_seg_ref, k_seg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dk_ref, dv_ref, dk_scr, dv_scr) = refs
    else:
        q_seg_ref = k_seg_ref = None
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dk_ref, dv_ref, dk_scr, dv_scr) = refs

    ik, iq = pl.program_id(2) + cfg.ik_offset, pl.program_id(3)
    bq, bk = cfg.block_q_bwd, cfg.block_k_bwd

    @pl.when(iq == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    run = (ik * bk <= iq * bq + bq - 1) if cfg.causal else None
    diag = (ik * bk + bk - 1 > iq * bq) if cfg.causal else False
    if cfg.has_segments and cfg.seg_block_skip:
        ov = _seg_overlap(q_seg_ref, k_seg_ref)
        run = ov if run is None else run & ov

    def step(apply_causal):
        qf = _fold(q_ref)                                         # (M, d)
        do = _fold(do_ref)                                        # (M, d)
        g, bq_ = lse_ref.shape[2], lse_ref.shape[3]
        lse = lse_ref[0, 0].reshape(g * bq_, 1)
        delta = delta_ref[0, 0].reshape(g * bq_, 1)

        s = jax.lax.dot_general(
            qf, k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * cfg.sm_scale
        q_seg = _q_seg_panel(q_seg_ref, cfg.groups) if cfg.has_segments else None
        k_seg = _k_seg_panel(k_seg_ref) if cfg.has_segments else None
        s = _masked_scores(s, iq, ik, q_seg, k_seg, cfg, bq, bk, apply_causal)
        # masked lanes: exp(NEG_INF - lse) == 0; dead rows: lse sentinel -> 0
        p = jnp.exp(s - lse)

        # dV += P^T @ dO   (contraction over the folded M panel)
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dP = dO @ V^T ; dS = P * (dP - delta) * scale
        dp = jax.lax.dot_general(
            do, v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * cfg.sm_scale
        # dK += dS^T @ Q
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(qf.dtype), qf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dQ partial for this k block (summed across ik outside the kernel)
        dq = jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[0, 0, 0] = dq.astype(dq_ref.dtype).reshape(g, bq_, -1)

    if run is None:
        step(False)
    else:
        if cfg.causal:
            @pl.when(run & diag)
            def _masked_step():
                step(True)

            @pl.when(run & jnp.logical_not(diag))
            def _interior_step():
                step(False)
        else:
            @pl.when(run)
            def _seg_step():
                step(False)

        # skipped panels still own this (ik, iq) dQ-partial output block
        @pl.when(jnp.logical_not(run))
        def _skipped():
            dq_ref[...] = jnp.zeros_like(dq_ref)

    @pl.when(iq == num_q_blocks - 1)
    def _finish():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


# at most this many per-k-block dQ partials are ever live in HBM: past it the
# backward runs in k-axis chunks (each chunk's dk/dv slice is complete and the
# partial sum folds into an accumulator), so tuned-small-block configs don't
# pay O(n_k x |q|) f32 memory
_MAX_DQ_PARTIALS = 4


def _bwd(q5, k, v, q_seg, k_seg, out5, lse5, do5, cfg: FlashConfig):
    t_q, t_k = q5.shape[3], k.shape[2]
    bk = cfg.block_k_bwd
    n_k = t_k // bk

    delta = jnp.sum(do5.astype(jnp.float32) * out5.astype(jnp.float32),
                    axis=-1, keepdims=True)  # (B, Hkv, G, T, 1)

    if n_k <= _MAX_DQ_PARTIALS:
        return _bwd_call(q5, k, v, q_seg, k_seg, lse5, do5, delta, cfg)

    chunk = _MAX_DQ_PARTIALS * bk
    dq = jnp.zeros(q5.shape, jnp.float32)
    dks, dvs = [], []
    for c0 in range(0, t_k, chunk):
        c1 = min(c0 + chunk, t_k)
        if cfg.causal and c0 > t_q - 1:
            # k blocks entirely above the causal diagonal: zero gradients
            dks.append(jnp.zeros_like(k[:, :, c0:c1]))
            dvs.append(jnp.zeros_like(v[:, :, c0:c1]))
            continue
        ccfg = dataclasses.replace(cfg, ik_offset=c0 // bk)
        k_seg_c = k_seg[:, :, c0:c1] if cfg.has_segments else k_seg
        dq_c, dk_c, dv_c = _bwd_call(q5, k[:, :, c0:c1], v[:, :, c0:c1],
                                     q_seg, k_seg_c, lse5, do5, delta, ccfg)
        dq = dq + dq_c.astype(jnp.float32)
        dks.append(dk_c)
        dvs.append(dv_c)
    return (dq.astype(q5.dtype), jnp.concatenate(dks, axis=2),
            jnp.concatenate(dvs, axis=2))


def _bwd_call(q5, k, v, q_seg, k_seg, lse5, do5, delta, cfg: FlashConfig):
    batch, h_kv, g, t_q, d = q5.shape
    t_k = k.shape[2]
    bq, bk = cfg.block_q_bwd, cfg.block_k_bwd
    n_q, n_k = t_q // bq, t_k // bk

    lse_spec = pl.BlockSpec((1, 1, g, bq, 1), lambda b, h, ik, iq: (b, h, 0, iq, 0))
    common = [
        pl.BlockSpec((1, 1, g, bq, d), lambda b, h, ik, iq: (b, h, 0, iq, 0)),  # q
        pl.BlockSpec((1, 1, bk, d), lambda b, h, ik, iq: (b, h, ik, 0)),        # k
        pl.BlockSpec((1, 1, bk, d), lambda b, h, ik, iq: (b, h, ik, 0)),        # v
        pl.BlockSpec((1, 1, g, bq, d), lambda b, h, ik, iq: (b, h, 0, iq, 0)),  # do
        lse_spec,                                                                # lse
        lse_spec,                                                                # delta
    ]
    seg_specs = [
        pl.BlockSpec((1, bq, _LANES), lambda b, h, ik, iq: (b, iq, 0)),
        pl.BlockSpec((1, _SUBLANES, bk), lambda b, h, ik, iq: (b, 0, ik)),
    ]
    in_specs = (seg_specs if cfg.has_segments else []) + common
    args = ([q_seg, k_seg] if cfg.has_segments else []) + [q5, k, v, do5, lse5, delta]

    # per-k-block dQ partials: exact in f32 when they must be summed (nK > 1),
    # input dtype when the sum is a no-op
    dq_dtype = jnp.float32 if n_k > 1 else q5.dtype

    dq_part, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg, num_q_blocks=n_q),
        grid=(batch, h_kv, n_k, n_q),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, 1, g, bq, d),
                         lambda b, h, ik, iq: (b, h, ik, 0, iq, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b, h, ik, iq: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b, h, ik, iq: (b, h, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, h_kv, n_k, g, t_q, d), dq_dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=cfg.interpret,
    )(*args)

    dq5 = (dq_part[:, :, 0] if n_k == 1
           else jnp.sum(dq_part, axis=2)).astype(q5.dtype)
    return dq5, dk, dv


# --------------------------------------------------------------------------- #
# custom-VJP wrapper
# --------------------------------------------------------------------------- #
@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _flash(q5, k, v, q_seg, k_seg, cfg: FlashConfig):
    out, _ = _fwd(q5, k, v, q_seg, k_seg, cfg)
    return out


def _flash_fwd_rule(q5, k, v, q_seg, k_seg, cfg):
    out, lse = _fwd(q5, k, v, q_seg, k_seg, cfg)
    return out, (q5, k, v, q_seg, k_seg, out, lse)


def _flash_bwd_rule(cfg, residuals, do):
    q5, k, v, q_seg, k_seg, out, lse = residuals
    dq5, dk, dv = _bwd(q5, k, v, q_seg, k_seg, out, lse, do, cfg)
    return dq5, dk, dv, None, None


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _pad_to(x, axis, multiple, value=0):
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads, constant_values=value)


def default_block_sizes(t_q: int, t_k: int, groups: int = 1) -> tuple:
    """Measured-on-v5e defaults (see scripts/bench_flash.py --sweep).

    Forward holds two live (G*bq, bk) f32 panels, backward roughly three plus
    the dk/dv accumulators, so the folded M panel is capped to keep each
    kernel within VMEM; within that cap, the biggest blocks win — large tiles
    amortize grid/DMA overhead far better than causal block-skipping saves
    FLOPs (128x128 FlashAttention-paper blocks measured 2-3x slower).
    """
    bk = min(_round_up(t_k), 1024)
    bq_fwd = _fit_block_q(t_q, budget=8 * 1024 * 1024, panels=2, bk=bk,
                          groups=groups, floor=_LANES)
    # measured: G=7 bq=128 bwd beats bq=64 (2.015 vs 2.078 ms fwd+bwd at
    # [8,14/2,1024,64]); 12MB of panels still compiles since p aliases s
    bq_bwd = _fit_block_q(t_q, budget=12 * 1024 * 1024, panels=3, bk=bk,
                          groups=groups, floor=64)
    # the padding helper needs the smaller q block to divide the larger
    if max(bq_fwd, bq_bwd) % min(bq_fwd, bq_bwd):
        bq_bwd = bq_fwd
    return bq_fwd, bk, bq_bwd, bk


def _fit_block_q(t_q: int, budget: int, panels: int, bk: int, groups: int,
                 floor: int) -> int:
    bq = min(_round_up(t_q), 1024)
    while groups * bq * bk * 4 * panels > budget and bq > floor:
        bq //= 2
    return bq


def _round_up(x: int, m: int = _LANES) -> int:
    return ((x + m - 1) // m) * m


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    segment_ids: Optional[jax.Array] = None,
                    causal: bool = True,
                    sm_scale: Optional[float] = None,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    seg_block_skip: bool = True,
                    interpret: bool = False) -> jax.Array:
    """Flash attention over [B, H, T, D] tensors with optional [B, T] segment ids.

    GQA-native: k/v may carry fewer heads than q (Hq % Hkv == 0, q heads
    kv-major as in HF repeat_interleave); they are NOT materialised per
    q head — the group dimension folds into the kernel's matmul M panel.

    Handles arbitrary T and D by padding to block/lane multiples; padded keys
    are excluded via the causal mask (tail padding) or a -1 segment id.
    Block sizes default to measured VMEM-filling tiles (default_block_sizes).
    """
    batch, heads, t_q, d_orig = q.shape
    h_kv, t_k = k.shape[1], k.shape[2]
    if heads % h_kv:
        raise ValueError(f"q heads {heads} not a multiple of kv heads {h_kv}")
    groups = heads // h_kv

    dbq, dbk, dbq_bwd, dbk_bwd = default_block_sizes(t_q, t_k, groups)
    block_q_bwd = block_q or dbq_bwd
    block_k_bwd = block_k or dbk_bwd
    block_q = block_q or dbq
    block_k = block_k or dbk
    for name, b, m in (("block_q", block_q, _SUBLANES),
                       ("block_k", block_k, _LANES),
                       ("block_q_bwd", block_q_bwd, _SUBLANES),
                       ("block_k_bwd", block_k_bwd, _LANES)):
        if b % m:
            raise ValueError(f"{name} must be a multiple of {m}; got {b}")
    if sm_scale is None:
        sm_scale = d_orig ** -0.5

    bq_pad = max(block_q, block_q_bwd)
    bk_pad = max(block_k, block_k_bwd)
    needs_t_pad = (t_q % bq_pad) or (t_k % bk_pad)
    if needs_t_pad and segment_ids is None and not causal:
        # non-causal with tail padding needs explicit segments to mask pad keys
        segment_ids = jnp.zeros((batch, t_k), dtype=jnp.int32)

    qp = _pad_to(_pad_to(q, 2, bq_pad), 3, _LANES)
    kp = _pad_to(_pad_to(k, 2, bk_pad), 3, _LANES)
    vp = _pad_to(_pad_to(v, 2, bk_pad), 3, _LANES)
    t_qp = qp.shape[2]
    # kv-major q head layout: head h attends kv head h // groups
    q5 = qp.reshape(batch, h_kv, groups, t_qp, qp.shape[3])

    q_seg = k_seg = None
    if segment_ids is not None:
        seg = segment_ids.astype(jnp.int32)
        q_seg = jax.lax.broadcast_in_dim(
            _pad_to(seg, 1, bq_pad, value=-1),
            (batch, t_qp, _LANES), (0, 1))
        k_seg = jax.lax.broadcast_in_dim(
            _pad_to(seg, 1, bk_pad, value=-1),
            (batch, _SUBLANES, kp.shape[2]), (0, 2))

    cfg = FlashConfig(
        causal=causal, sm_scale=sm_scale, groups=groups,
        block_q=block_q, block_k=block_k,
        block_q_bwd=block_q_bwd, block_k_bwd=block_k_bwd,
        has_segments=segment_ids is not None, seg_block_skip=seg_block_skip,
        interpret=interpret,
    )
    out5 = _flash(q5, kp, vp, q_seg, k_seg, cfg)
    out = out5.reshape(batch, heads, t_qp, -1)
    return out[:, :, :t_q, :d_orig]

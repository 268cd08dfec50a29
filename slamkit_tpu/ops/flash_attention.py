"""Pallas TPU flash attention with causal and segment-id (packing) masking.

Replaces the reference's flash_attention_2 CUDA path (reference README.md:15,
config/train_inter_scale.yaml:25) and its varlen packing collator
(hf_dataset.py:61-62): TPU kernels take per-token segment ids instead of
cu_seqlens, masking cross-segment attention block-wise (SURVEY.md §2.8, §5.7).

Design (FlashAttention-2 style, MXU-tiled):
  * forward: grid (B, H, nQ, nK) with the k axis innermost/"arbitrary";
    online-softmax state (m, l, acc) lives in VMEM scratch across k steps.
  * backward: two kernels — dK/dV with grid (B, H, nK, nQ) and dQ with
    grid (B, H, nQ, nK) — recomputing probabilities from the saved
    log-sum-exp instead of materialising the [T, T] score matrix.
  * causal blocks entirely above the diagonal are skipped with pl.when.
  * all matmuls run on the MXU with f32 accumulation; inputs stay bf16.

TPU layout notes: segment ids are broadcast to lane/sublane-replicated 3-D
buffers ((B,T,128) for q, (B,8,T) for kv) and LSE/delta are stored (B,H,T,1)
so every block satisfies Mosaic's (8,128) tiling rules.
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
_LANES = 128
_SUBLANES = 8


@dataclasses.dataclass(frozen=True)
class FlashConfig:
    causal: bool = True
    sm_scale: float = 1.0
    block_q: int = 128
    block_k: int = 128
    has_segments: bool = False
    interpret: bool = False


def _broadcast_lanes(x):
    # row-scalars (bq, 1) are stored lane-replicated (bq, 128) for layout
    return jnp.broadcast_to(x, (x.shape[0], _LANES))


def _seg_mask(q_seg_ref, k_seg_ref, block_q, block_k):
    """[bq, bk] boolean mask from lane/sublane-replicated segment-id blocks."""
    qs = q_seg_ref[0]  # (bq, 128)
    ks = k_seg_ref[0, :1]  # (1, bk)
    qs_full = jnp.tile(qs, (1, block_k // _LANES))  # (bq, bk)
    return qs_full == ks


# --------------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------------- #
def _fwd_kernel(*refs, cfg: FlashConfig, num_k_blocks: int):
    if cfg.has_segments:
        q_seg_ref, k_seg_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs

    iq, ik = pl.program_id(2), pl.program_id(3)
    bq, bk = cfg.block_q, cfg.block_k

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    run = (ik * bk <= iq * bq + bq - 1) if cfg.causal else True

    @pl.when(run)
    def _step():
        s = jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * cfg.sm_scale  # [bq, bk]

        mask = None
        if cfg.causal:
            qi = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            ki = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            mask = qi >= ki
        if cfg.has_segments:
            seg = _seg_mask(q_seg_ref, k_seg_ref, bq, bk)
            mask = seg if mask is None else (mask & seg)
        if mask is not None:
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        if mask is not None:
            # robust to fully-masked rows: exp(NEG_INF - NEG_INF) would be 1
            p = jnp.where(mask, p, 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_scr[...] = _broadcast_lanes(l_scr[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True))
        acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[...] = _broadcast_lanes(m_new)

    @pl.when(ik == num_k_blocks - 1)
    def _finish():
        l = l_scr[:, :1]
        safe_l = jnp.where(l > 0.0, l, 1.0)
        o_ref[0, 0] = (acc_scr[...] / safe_l * (l > 0.0)).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scr[:, :1] + jnp.log(safe_l)


def _fwd(q, k, v, q_seg, k_seg, cfg: FlashConfig):
    batch, heads, t_q, d = q.shape
    t_k = k.shape[2]
    n_q, n_k = t_q // cfg.block_q, t_k // cfg.block_k
    grid = (batch, heads, n_q, n_k)
    bq, bk = cfg.block_q, cfg.block_k

    in_specs, args = [], []
    if cfg.has_segments:
        in_specs += [
            pl.BlockSpec((1, bq, _LANES), lambda b, h, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, _SUBLANES, bk), lambda b, h, iq, ik: (b, 0, ik)),
        ]
        args += [q_seg, k_seg]
    in_specs += [
        pl.BlockSpec((1, 1, bq, d), lambda b, h, iq, ik: (b, h, iq, 0)),
        pl.BlockSpec((1, 1, bk, d), lambda b, h, iq, ik: (b, h, ik, 0)),
        pl.BlockSpec((1, 1, bk, d), lambda b, h, iq, ik: (b, h, ik, 0)),
    ]
    args += [q, k, v]

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg, num_k_blocks=n_k),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, iq, ik: (b, h, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((batch, heads, t_q, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=cfg.interpret,
    )(*args)
    return out, lse


# --------------------------------------------------------------------------- #
# backward
# --------------------------------------------------------------------------- #
def _scores(q_ref, k_ref, cfg, iq, ik):
    bq, bk = cfg.block_q, cfg.block_k
    s = jax.lax.dot_general(
        q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * cfg.sm_scale
    mask = None
    if cfg.causal:
        qi = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        ki = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = qi >= ki
    return s, mask


def _dkv_kernel(*refs, cfg: FlashConfig, num_q_blocks: int):
    if cfg.has_segments:
        (q_seg_ref, k_seg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs

    ik, iq = pl.program_id(2), pl.program_id(3)
    bq, bk = cfg.block_q, cfg.block_k

    @pl.when(iq == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    run = (ik * bk <= iq * bq + bq - 1) if cfg.causal else True

    @pl.when(run)
    def _step():
        s, mask = _scores(q_ref, k_ref, cfg, iq, ik)
        if cfg.has_segments:
            seg = _seg_mask(q_seg_ref, k_seg_ref, bq, bk)
            mask = seg if mask is None else (mask & seg)
        p = jnp.exp(s - lse_ref[0, 0])  # lse block: (bq, 1)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        do = do_ref[0, 0]
        # dv += p^T @ dO
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dp = dO @ v^T ; ds = p * (dp - delta) * scale
        dp = jax.lax.dot_general(
            do, v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0]) * cfg.sm_scale
        # dk += ds^T @ q
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0, 0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(iq == num_q_blocks - 1)
    def _finish():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _dq_kernel(*refs, cfg: FlashConfig, num_k_blocks: int):
    if cfg.has_segments:
        (q_seg_ref, k_seg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dq_scr) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr) = refs

    iq, ik = pl.program_id(2), pl.program_id(3)
    bq, bk = cfg.block_q, cfg.block_k

    @pl.when(ik == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    run = (ik * bk <= iq * bq + bq - 1) if cfg.causal else True

    @pl.when(run)
    def _step():
        s, mask = _scores(q_ref, k_ref, cfg, iq, ik)
        if cfg.has_segments:
            seg = _seg_mask(q_seg_ref, k_seg_ref, bq, bk)
            mask = seg if mask is None else (mask & seg)
        p = jnp.exp(s - lse_ref[0, 0])
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        do = do_ref[0, 0]
        dp = jax.lax.dot_general(
            do, v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0]) * cfg.sm_scale
        dq_scr[...] += jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ik == num_k_blocks - 1)
    def _finish():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd(q, k, v, q_seg, k_seg, out, lse, do, cfg: FlashConfig):
    batch, heads, t_q, d = q.shape
    t_k = k.shape[2]
    n_q, n_k = t_q // cfg.block_q, t_k // cfg.block_k
    bq, bk = cfg.block_q, cfg.block_k

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)  # (B, H, T, 1)

    lse_spec_dkv = pl.BlockSpec((1, 1, bq, 1), lambda b, h, ik, iq: (b, h, iq, 0))
    common_dkv = [
        pl.BlockSpec((1, 1, bq, d), lambda b, h, ik, iq: (b, h, iq, 0)),  # q
        pl.BlockSpec((1, 1, bk, d), lambda b, h, ik, iq: (b, h, ik, 0)),  # k
        pl.BlockSpec((1, 1, bk, d), lambda b, h, ik, iq: (b, h, ik, 0)),  # v
        pl.BlockSpec((1, 1, bq, d), lambda b, h, ik, iq: (b, h, iq, 0)),  # do
        lse_spec_dkv,                                                      # lse
        lse_spec_dkv,                                                      # delta
    ]
    seg_specs_dkv = [
        pl.BlockSpec((1, bq, _LANES), lambda b, h, ik, iq: (b, iq, 0)),
        pl.BlockSpec((1, _SUBLANES, bk), lambda b, h, ik, iq: (b, 0, ik)),
    ]
    args = [q, k, v, do, lse, delta]
    dkv_specs = (seg_specs_dkv if cfg.has_segments else []) + common_dkv
    dkv_args = ([q_seg, k_seg] if cfg.has_segments else []) + args

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, cfg=cfg, num_q_blocks=n_q),
        grid=(batch, heads, n_k, n_q),
        in_specs=dkv_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bk, d), lambda b, h, ik, iq: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b, h, ik, iq: (b, h, ik, 0)),
        ],
        out_shape=[
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
    )(*dkv_args)

    lse_spec_dq = pl.BlockSpec((1, 1, bq, 1), lambda b, h, iq, ik: (b, h, iq, 0))
    common_dq = [
        pl.BlockSpec((1, 1, bq, d), lambda b, h, iq, ik: (b, h, iq, 0)),  # q
        pl.BlockSpec((1, 1, bk, d), lambda b, h, iq, ik: (b, h, ik, 0)),  # k
        pl.BlockSpec((1, 1, bk, d), lambda b, h, iq, ik: (b, h, ik, 0)),  # v
        pl.BlockSpec((1, 1, bq, d), lambda b, h, iq, ik: (b, h, iq, 0)),  # do
        lse_spec_dq,
        lse_spec_dq,
    ]
    seg_specs_dq = [
        pl.BlockSpec((1, bq, _LANES), lambda b, h, iq, ik: (b, iq, 0)),
        pl.BlockSpec((1, _SUBLANES, bk), lambda b, h, iq, ik: (b, 0, ik)),
    ]
    dq_specs = (seg_specs_dq if cfg.has_segments else []) + common_dq
    dq_args = ([q_seg, k_seg] if cfg.has_segments else []) + args

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, cfg=cfg, num_k_blocks=n_k),
        grid=(batch, heads, n_q, n_k),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b, h, iq, ik: (b, h, iq, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=cfg.interpret,
    )(*dq_args)
    return dq, dk, dv


# --------------------------------------------------------------------------- #
# custom-VJP wrapper
# --------------------------------------------------------------------------- #
@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _flash(q, k, v, q_seg, k_seg, cfg: FlashConfig):
    out, _ = _fwd(q, k, v, q_seg, k_seg, cfg)
    return out


def _flash_fwd_rule(q, k, v, q_seg, k_seg, cfg):
    out, lse = _fwd(q, k, v, q_seg, k_seg, cfg)
    return out, (q, k, v, q_seg, k_seg, out, lse)


def _flash_bwd_rule(cfg, residuals, do):
    q, k, v, q_seg, k_seg, out, lse = residuals
    dq, dk, dv = _bwd(q, k, v, q_seg, k_seg, out, lse, do, cfg)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _pad_to(x, axis, multiple, value=0):
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads, constant_values=value)


def default_block_sizes(t_q: int, t_k: int) -> tuple:
    """Largest blocks that keep the f32 score tile within ~4 MB of VMEM.
    Measured on v5e at [8,14,1024,64]: 1024x1024 blocks run the fwd+bwd in
    3.4ms vs 10.9ms at the FlashAttention-paper 128x128 — big blocks amortize
    grid/DMA overhead and keep the MXU busy despite the d=64 lane padding."""
    bq = min(_round_up(t_q), 1024)
    bk = min(_round_up(t_k), 1024)
    while bq * bk * 4 > 4 * 1024 * 1024 and bq > _LANES:
        bq //= 2
    return bq, bk


def _round_up(x: int, m: int = _LANES) -> int:
    return ((x + m - 1) // m) * m


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    segment_ids: Optional[jax.Array] = None,
                    causal: bool = True,
                    sm_scale: Optional[float] = None,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    interpret: bool = False) -> jax.Array:
    """Flash attention over [B, H, T, D] tensors with optional [B, T] segment ids.

    Handles arbitrary T and D by padding to block/lane multiples; padded keys
    are excluded via the causal mask (tail padding) or a -1 segment id.
    block sizes default to the largest VMEM-fitting tiles (see
    default_block_sizes) — far faster than small blocks on TPU.
    """
    batch, heads, t_q, d_orig = q.shape
    t_k = k.shape[2]
    if block_q is None or block_k is None:
        dbq, dbk = default_block_sizes(t_q, t_k)
        block_q = block_q or dbq
        block_k = block_k or dbk
    if block_q % _LANES or block_k % _LANES:
        raise ValueError(
            f"flash block sizes must be multiples of {_LANES} (the segment-id "
            f"mask tiles lane-replicated blocks); got block_q={block_q}, "
            f"block_k={block_k}")
    if sm_scale is None:
        sm_scale = d_orig ** -0.5

    needs_t_pad = (t_q % block_q) or (t_k % block_k)
    if needs_t_pad and segment_ids is None and not causal:
        # non-causal with tail padding needs explicit segments to mask pad keys
        segment_ids = jnp.zeros((batch, t_k), dtype=jnp.int32)

    qp = _pad_to(_pad_to(q, 2, block_q), 3, _LANES)
    kp = _pad_to(_pad_to(k, 2, block_k), 3, _LANES)
    vp = _pad_to(_pad_to(v, 2, block_k), 3, _LANES)

    q_seg = k_seg = None
    if segment_ids is not None:
        seg = segment_ids.astype(jnp.int32)
        q_seg = jax.lax.broadcast_in_dim(
            _pad_to(seg, 1, block_q, value=-1),
            (batch, qp.shape[2], _LANES), (0, 1))
        k_seg = jax.lax.broadcast_in_dim(
            _pad_to(seg, 1, block_k, value=-1),
            (batch, _SUBLANES, kp.shape[2]), (0, 2))

    cfg = FlashConfig(
        causal=causal, sm_scale=sm_scale, block_q=block_q, block_k=block_k,
        has_segments=segment_ids is not None, interpret=interpret,
    )
    out = _flash(qp, kp, vp, q_seg, k_seg, cfg)
    return out[:, :, :t_q, :d_orig]

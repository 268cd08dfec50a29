"""Ring flash attention: context parallelism for the Pallas flash kernel.

The reference has no sequence/context parallelism at all (SURVEY.md §2.8 —
its long-audio strategy is chunk-and-pack, reference slamkit/data/
hf_dataset.py:16-26); the 'seq' mesh axis here is the TPU-native stretch
goal. Before this module, CP required the XLA attention path so GSPMD could
all-gather k/v — giving up the flash kernel's measured whole-step win. This
module shards the sequence dim through the kernel itself:

  * the batch's time dim is sharded over the 'seq' mesh axis (shard_map);
    each device holds a contiguous q/k/v CHUNK of the sequence;
  * forward: k/v (and the packing segment ids) rotate around the ring via
    `lax.ppermute`; each step runs the local Pallas kernel on one
    (q_chunk, k_chunk) pair and merges the per-chunk outputs with an
    online-softmax combine of the kernel's exposed LSE;
  * chunk-level causality is dispatched OUTSIDE the kernel: step 0 is the
    diagonal chunk (causal kernel, local positions align), step t >= 1
    computes iff axis_index >= t (all keys strictly precede all queries, so
    the kernel runs non-causal) and is otherwise `lax.cond`-skipped;
  * packed segments ride through untouched: segment ids travel with their
    k chunk, the kernel's segment masking is position-free, and its
    seg-block skipping makes far-apart ring steps nearly free for packed
    short utterances (disjoint id ranges skip whole panels);
  * backward: one more ring pass. The kernel's backward takes the GLOBAL
    merged lse/out (p = exp(s - lse) is then the exact global softmax
    probability), so each (q_chunk, k_chunk) pair yields exact dq partials
    (accumulated locally in f32) and exact dk/dv partials that travel the
    ring WITH their k/v chunk and arrive home after a final rotation.

Ring schedule cost: device r computes r+1 chunk pairs but every device
waits n steps, so causal ring wall-clock is ~n/( (n+1)/2 ) of a perfectly
balanced split — the classic unbalanced-ring tax. A zigzag (striped) chunk
assignment would fix it at the cost of non-contiguous sequence layout;
measured packed workloads mostly skip the tail steps via segment ranges,
so contiguous chunks are kept for data-pipeline simplicity.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .flash_attention import (_LANES, _SUBLANES, LSE_SENTINEL, FlashConfig,
                              _bwd, _fwd, _pad_to, default_block_sizes)

# LSE values at or above this are the kernel's dead-row sentinel (rows that
# attend nowhere in a chunk); the merge treats them as -inf weight.
_DEAD = LSE_SENTINEL / 2


def zigzag_permutation(t: int, n: int):
    """Time-axis permutation for the zigzag (load-balanced) schedule.

    Returns idx of length t such that permuted[i] = original[idx[i]]:
    device r's contiguous chunk [r*C, (r+1)*C) then holds the logical
    half-chunks (r, 2n-1-r), h = t/(2n) positions each. Self-inverse is
    NOT guaranteed — invert with np.argsort(idx). Callers must permute
    every per-token array consistently (ids/labels/positions/segments) and
    PRE-SHIFT labels before permuting (next-token adjacency does not
    survive the permutation)."""
    import numpy as np

    if t % (2 * n):
        raise ValueError(f"T={t} not divisible by 2*n={2 * n}")
    h = t // (2 * n)
    order = []
    for r in range(n):
        order.extend(range(r * h, (r + 1) * h))
        order.extend(range((2 * n - 1 - r) * h, (2 * n - r) * h))
    return np.asarray(order)


def _rotate(tree, axis_name: str, n: int):
    """Send every device's copy to the next device on the ring (+1)."""
    perm = [(i, (i + 1) % n) for i in range(n)]
    return jax.tree_util.tree_map(
        lambda x: jax.lax.ppermute(x, axis_name, perm), tree)


def _merge_pair(out_a, lse_a, out_b, lse_b):
    """Online-softmax combine of two per-chunk partial attentions.

    out_a/out_b are each chunk's NORMALISED output, lse_* the matching
    log-sum-exp ([..., T, 1] f32, dead rows = sentinel). Returns (out f32,
    lse f32) with the same dead-row convention.
    """
    la = jnp.where(lse_a >= _DEAD, -jnp.inf, lse_a)
    lb = jnp.where(lse_b >= _DEAD, -jnp.inf, lse_b)
    m = jnp.maximum(la, lb)
    alive = m > -jnp.inf
    ms = jnp.where(alive, m, 0.0)
    wa = jnp.where(jnp.isinf(la), 0.0, jnp.exp(la - ms))
    wb = jnp.where(jnp.isinf(lb), 0.0, jnp.exp(lb - ms))
    l = wa + wb
    safe_l = jnp.where(alive, l, 1.0)
    out = (out_a.astype(jnp.float32) * wa
           + out_b.astype(jnp.float32) * wb) / safe_l
    lse = jnp.where(alive, ms + jnp.log(safe_l), LSE_SENTINEL)
    return out, lse


# --------------------------------------------------------------------------- #
# chunk-local ring (runs inside shard_map), custom VJP
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class _RingStatic:
    axis_name: str
    n: int
    cfg_diag: FlashConfig     # causal kernel for the aligned diagonal chunk
    cfg_off: FlashConfig      # non-causal kernel for strictly-past chunks
    schedule: str = "contiguous"   # contiguous | zigzag (load-balanced)


def _halves(x, axis):
    h = x.shape[axis] // 2
    lo = [slice(None)] * x.ndim
    hi = [slice(None)] * x.ndim
    lo[axis] = slice(0, h)
    hi[axis] = slice(h, None)
    return x[tuple(lo)], x[tuple(hi)]


def _split_kv(ring, has_seg):
    """Split a travelling (k, v[, k_seg]) tuple into time halves
    (k time axis 2, k_seg time axis 2)."""
    ka, kb = _halves(ring[0], 2)
    va, vb = _halves(ring[1], 2)
    if has_seg:
        sa, sb = _halves(ring[2], 2)
        return (ka, va, sa), (kb, vb, sb)
    return (ka, va, None), (kb, vb, None)


def _ring_forward(q5, k, v, q_seg, k_seg, st: _RingStatic):
    """Full ring pass; returns (out5 f32-merged->input dtype, lse5 f32)."""
    r = jax.lax.axis_index(st.axis_name)
    # step 0: the local causal call. Under zigzag the device's two logical
    # half-chunks (r, 2n-1-r) are locally ordered exactly like logical
    # time (low half strictly precedes high half), so the SAME local
    # causal kernel covers qa-ka diag, qb-ka full, qb-kb diag, and
    # correctly forbids qa-kb.
    out_d, lse = _fwd(q5, k, v, q_seg, k_seg, st.cfg_diag)
    out = out_d.astype(jnp.float32)
    ring = (k, v) if k_seg is None else (k, v, k_seg)
    if st.schedule == "zigzag":
        return _zigzag_forward_steps(q5, q_seg, ring, out, lse, r, st)
    for t in range(1, st.n):
        ring = _rotate(ring, st.axis_name, st.n)

        def compute(ops):
            ks = ops[2] if len(ops) > 2 else None
            o, s = _fwd(q5, ops[0], ops[1], q_seg, ks, st.cfg_off)
            return o.astype(jnp.float32), s

        def skip(ops):
            return jnp.zeros_like(out), jnp.full_like(lse, LSE_SENTINEL)

        o_t, lse_t = jax.lax.cond(r >= t, compute, skip, ring)
        out, lse = _merge_pair(out, lse, o_t, lse_t)
    return out.astype(q5.dtype), lse


def _zigzag_forward_steps(q5, q_seg, ring, out, lse, r, st: _RingStatic):
    """Zigzag off-diagonal steps: device r owns logical half-chunks
    (r, 2n-1-r) so EVERY step costs exactly two half-pair kernels on every
    device (the contiguous schedule's unbalanced tail is gone):

      received halves at step t are (j, 2n-1-j), j = r-t mod n;
      * qb (logical 2n-1-r) attends ka (logical j <= n-1): ALWAYS full;
      * if j < r (pred): qa attends ka — else qb attends kb — one more
        full half-pair, picked by operand selection, no lax.cond.
    """
    has_seg = q_seg is not None
    qa, qb = _halves(q5, 3)
    qsa, qsb = _halves(q_seg, 1) if has_seg else (None, None)
    out_a, out_b = _halves(out, 3)
    lse_a, lse_b = _halves(lse, 3)
    for t in range(1, st.n):
        ring = _rotate(ring, st.axis_name, st.n)
        (ka, va, sa), (kb, vb, sb) = _split_kv(ring, has_seg)
        pred = r >= t
        # call 1: qb vs the received low half — always valid
        o1, l1 = _fwd(qb, ka, va, qsb, sa, st.cfg_off)
        # call 2: (qa vs ka) when pred else (qb vs kb)
        q_sel = jnp.where(pred, qa, qb)
        k_sel = jnp.where(pred, ka, kb)
        v_sel = jnp.where(pred, va, vb)
        qs_sel = jnp.where(pred, qsa, qsb) if has_seg else None
        ks_sel = jnp.where(pred, sa, sb) if has_seg else None
        o2, l2 = _fwd(q_sel, k_sel, v_sel, qs_sel, ks_sel, st.cfg_off)
        # route call 2 into the half it belongs to
        dead = jnp.full_like(l2, LSE_SENTINEL)
        out_a, lse_a = _merge_pair(out_a, lse_a,
                                   jnp.where(pred, o2, 0.0),
                                   jnp.where(pred, l2, dead))
        out_b, lse_b = _merge_pair(out_b, lse_b, o1, l1)
        out_b, lse_b = _merge_pair(out_b, lse_b,
                                   jnp.where(pred, 0.0, o2),
                                   jnp.where(pred, dead, l2))
    out = jnp.concatenate([out_a, out_b], axis=3)
    lse = jnp.concatenate([lse_a, lse_b], axis=3)
    return out.astype(q5.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _ring(q5, k, v, q_seg, k_seg, st: _RingStatic):
    out, _ = _ring_forward(q5, k, v, q_seg, k_seg, st)
    return out


def _ring_fwd_rule(q5, k, v, q_seg, k_seg, st):
    out, lse = _ring_forward(q5, k, v, q_seg, k_seg, st)
    return out, (q5, k, v, q_seg, k_seg, out, lse)


def _ring_bwd_rule(st: _RingStatic, residuals, do5):
    q5, k, v, q_seg, k_seg, out5, lse5 = residuals
    r = jax.lax.axis_index(st.axis_name)
    # diagonal chunk: the kernel backward with the GLOBAL lse (and delta
    # derived inside _bwd from the merged out5) yields exact partials
    dq, dk0, dv0 = _bwd(q5, k, v, q_seg, k_seg, out5, lse5, do5, st.cfg_diag)
    dq = dq.astype(jnp.float32)
    # dk/dv accumulate in f32 and travel the ring with their k/v chunk
    ring = (k, v, dk0.astype(jnp.float32), dv0.astype(jnp.float32))
    if k_seg is not None:
        ring = ring + (k_seg,)
    if st.schedule == "zigzag":
        ring = _zigzag_backward_steps(q5, q_seg, out5, lse5, do5, dq, ring,
                                      r, st)
        dq = ring[-1]
    else:
        for t in range(1, st.n):
            ring = _rotate(ring, st.axis_name, st.n)

            def compute(ops):
                ks = ops[4] if len(ops) > 4 else None
                dq_t, dk_t, dv_t = _bwd(q5, ops[0], ops[1], q_seg, ks,
                                        out5, lse5, do5, st.cfg_off)
                return (dq_t.astype(jnp.float32), dk_t.astype(jnp.float32),
                        dv_t.astype(jnp.float32))

            def skip(ops):
                return (jnp.zeros(q5.shape, jnp.float32),
                        jnp.zeros(k.shape, jnp.float32),
                        jnp.zeros(v.shape, jnp.float32))

            dq_t, dk_t, dv_t = jax.lax.cond(r >= t, compute, skip, ring)
            dq = dq + dq_t
            ring = (ring[0], ring[1], ring[2] + dk_t, ring[3] + dv_t) + ring[4:]
    # chunks sit one-past-home after n-1 rotations; one more brings the
    # accumulated gradients back to their owner
    dk, dv = _rotate((ring[2], ring[3]), st.axis_name, st.n)
    return (dq.astype(q5.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None)


def _zigzag_backward_steps(q5, q_seg, out5, lse5, do5, dq, ring, r,
                           st: _RingStatic):
    """Zigzag backward off-diagonal steps (mirror of the forward dispatch):
    per step, two half-pair backward kernels with the GLOBAL lse/out; dq
    routes into the local (qa|qb) half, dk/dv into the travelling (ka|kb)
    accumulator half, both by operand/result selection."""
    has_seg = q_seg is not None
    qa, qb = _halves(q5, 3)
    qsa, qsb = _halves(q_seg, 1) if has_seg else (None, None)
    oa, ob = _halves(out5, 3)
    la, lb = _halves(lse5, 3)
    da, db = _halves(do5, 3)
    dq_a, dq_b = _halves(dq, 3)
    for t in range(1, st.n):
        ring = _rotate(ring, st.axis_name, st.n)
        (ka, va, sa), (kb, vb, sb) = _split_kv(ring[:2] + ring[4:], has_seg)
        dka_acc, dkb_acc = _halves(ring[2], 2)
        dva_acc, dvb_acc = _halves(ring[3], 2)
        pred = r >= t
        # call 1: qb vs received low half — always valid
        dq1, dk1, dv1 = _bwd(qb, ka, va, qsb, sa, ob, lb, db, st.cfg_off)
        # call 2: (qa vs ka) when pred else (qb vs kb)
        q_sel = jnp.where(pred, qa, qb)
        k_sel = jnp.where(pred, ka, kb)
        v_sel = jnp.where(pred, va, vb)
        qs_sel = jnp.where(pred, qsa, qsb) if has_seg else None
        ks_sel = jnp.where(pred, sa, sb) if has_seg else None
        o_sel = jnp.where(pred, oa, ob)
        l_sel = jnp.where(pred, la, lb)
        d_sel = jnp.where(pred, da, db)
        dq2, dk2, dv2 = _bwd(q_sel, k_sel, v_sel, qs_sel, ks_sel,
                             o_sel, l_sel, d_sel, st.cfg_off)
        dq1, dk1, dv1 = (x.astype(jnp.float32) for x in (dq1, dk1, dv1))
        dq2, dk2, dv2 = (x.astype(jnp.float32) for x in (dq2, dk2, dv2))
        dq_a = dq_a + jnp.where(pred, dq2, 0.0)
        dq_b = dq_b + dq1 + jnp.where(pred, 0.0, dq2)
        dka_acc = dka_acc + dk1 + jnp.where(pred, dk2, 0.0)
        dva_acc = dva_acc + dv1 + jnp.where(pred, dv2, 0.0)
        dkb_acc = dkb_acc + jnp.where(pred, 0.0, dk2)
        dvb_acc = dvb_acc + jnp.where(pred, 0.0, dv2)
        ring = (ring[0], ring[1],
                jnp.concatenate([dka_acc, dkb_acc], axis=2),
                jnp.concatenate([dva_acc, dvb_acc], axis=2)) + ring[4:]
    return ring + (jnp.concatenate([dq_a, dq_b], axis=3),)


_ring.defvjp(_ring_fwd_rule, _ring_bwd_rule)


# --------------------------------------------------------------------------- #
# block sizing for chunk-local kernels
# --------------------------------------------------------------------------- #
def _fit_divisor(b: int, c: int, floor: int) -> int:
    """Largest halving of b that divides the chunk length c."""
    b = min(b, c)
    while c % b and b > floor:
        b //= 2
    if c % b:
        raise ValueError(
            f"chunk length {c} has no block divisor >= {floor} under {b} — "
            f"pick a context_len whose per-device chunk is a multiple of "
            f"{_LANES}")
    return b


def _ring_blocks(c: int, groups: int, block_q: Optional[int],
                 block_k: Optional[int]):
    dbq, dbk, dbq_b, dbk_b = default_block_sizes(c, c, groups)
    bq = _fit_divisor(block_q or dbq, c, _SUBLANES)
    bk = _fit_divisor(block_k or dbk, c, _LANES)
    bq_b = _fit_divisor(block_q or dbq_b, c, _SUBLANES)
    bk_b = _fit_divisor(block_k or dbk_b, c, _LANES)
    if max(bq, bq_b) % min(bq, bq_b):
        bq_b = bq
    return bq, bk, bq_b, bk_b


# --------------------------------------------------------------------------- #
# public entry: global arrays in, shard_map inside
# --------------------------------------------------------------------------- #
def ring_flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         segment_ids: Optional[jax.Array] = None,
                         *, mesh, seq_axis: str = "seq",
                         sm_scale: Optional[float] = None,
                         block_q: Optional[int] = None,
                         block_k: Optional[int] = None,
                         schedule: str = "contiguous",
                         interpret: bool = False) -> jax.Array:
    """Causal flash attention over sequence-sharded [B, H, T, D] tensors.

    Called on GLOBAL arrays (under jit); internally shard_maps over `mesh`,
    sharding B over 'data' (if present), heads over 'model' (if present —
    the ring is per-head, so TP composes), and T over `seq_axis`. k/v may
    carry fewer heads than q (GQA-native, like flash_attention).
    segment_ids [B, T] with -1 pads ride along for packing.

    schedule='contiguous': device r holds logical chunk r (natural time
    order; device r computes r+1 chunk pairs — unbalanced tail).
    schedule='zigzag': the global time axis MUST already be permuted by
    zigzag_permutation(T, n), so device r holds logical half-chunks
    (r, 2n-1-r); every device then computes exactly 2 half-pairs per ring
    step (balanced — ~2x faster at large n for unpacked long context).

    T must divide by the seq-axis size into lane-aligned chunks
    (T/n % 128 == 0; zigzag: T/(2n) % 128 == 0); head_dim is lane-padded
    internally.
    """
    n = int(mesh.shape[seq_axis])
    batch, heads, t, d_orig = q.shape
    h_kv = k.shape[1]
    if heads % h_kv:
        raise ValueError(f"q heads {heads} not a multiple of kv heads {h_kv}")
    if schedule not in ("contiguous", "zigzag"):
        raise ValueError(f"unknown ring schedule {schedule!r}")
    unit = _LANES * (2 if schedule == "zigzag" else 1)
    if t % n or (t // n) % unit:
        raise ValueError(
            f"ring attention needs T divisible into lane-aligned chunks: "
            f"T={t}, seq axis={n} -> chunk {t / n} (must be a multiple of "
            f"{unit} for schedule={schedule})")
    if sm_scale is None:
        sm_scale = d_orig ** -0.5

    c = t // n
    # 'model' (TP) shards q and kv heads by the same factor, so the
    # group fold is unchanged on each shard
    groups = heads // h_kv
    bq, bk, bq_b, bk_b = _ring_blocks(c, groups, block_q, block_k)
    base = dict(sm_scale=sm_scale, groups=groups,
                has_segments=segment_ids is not None, interpret=interpret)
    # zigzag off-diagonal kernels run on HALF chunks — fit their blocks to h
    off_c = c // 2 if schedule == "zigzag" else c
    obq, obk, obq_b, obk_b = _ring_blocks(off_c, groups, block_q, block_k)
    st = _RingStatic(
        axis_name=seq_axis, n=n, schedule=schedule,
        cfg_diag=FlashConfig(causal=True, block_q=bq, block_k=bk,
                             block_q_bwd=bq_b, block_k_bwd=bk_b, **base),
        cfg_off=FlashConfig(causal=False, block_q=obq, block_k=obk,
                            block_q_bwd=obq_b, block_k_bwd=obk_b, **base))

    b_ax = "data" if "data" in mesh.axis_names else None
    h_ax = "model" if "model" in mesh.axis_names else None
    qkv_spec = P(b_ax, h_ax, seq_axis, None)
    seg_spec = P(b_ax, seq_axis)

    def local(q, k, v, seg=None):
        b, hq, c_loc, _ = q.shape
        hkv_loc = k.shape[1]
        qp = _pad_to(q, 3, _LANES)
        kp = _pad_to(k, 3, _LANES)
        vp = _pad_to(v, 3, _LANES)
        q5 = qp.reshape(b, hkv_loc, hq // hkv_loc, c_loc, qp.shape[3])
        q_seg = k_seg = None
        if seg is not None:
            seg = seg.astype(jnp.int32)
            q_seg = jax.lax.broadcast_in_dim(seg, (b, c_loc, _LANES), (0, 1))
            k_seg = jax.lax.broadcast_in_dim(seg, (b, _SUBLANES, c_loc), (0, 2))
        out5 = _ring(q5, kp, vp, q_seg, k_seg, st)
        return out5.reshape(b, hq, c_loc, -1)[..., :d_orig]

    shard = functools.partial(jax.shard_map, mesh=mesh, check_vma=False)
    if segment_ids is None:
        fn = shard(lambda q_, k_, v_: local(q_, k_, v_),
                   in_specs=(qkv_spec, qkv_spec, qkv_spec),
                   out_specs=qkv_spec)
        return fn(q, k, v)
    fn = shard(local,
               in_specs=(qkv_spec, qkv_spec, qkv_spec, seg_spec),
               out_specs=qkv_spec)
    return fn(q, k, v, segment_ids)

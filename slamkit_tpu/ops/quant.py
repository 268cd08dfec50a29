"""int8 weight-only quantization for the decode path.

Decode is HBM-bandwidth-bound (scripts/probe_step.py P3: 1.513ms/token vs a
0.875ms bf16 weight-streaming floor on v5e), so halving weight bytes is the
one lever left. Per-output-channel symmetric int8:

    w ~= q * s,   q int8 in [-127, 127],   s = max|w_col| / 127   (bf16)

`dq_matmul` is a Pallas kernel that streams the int8 weights from HBM,
dequantizes in VMEM and runs the matmul on the MXU — the bf16 tensor never
exists in HBM, so the read is genuinely half the bytes. (XLA's own
convert-then-dot materializes the bf16 copy; see scripts/probe_int8.py.)

Replaces nothing in the reference (its decode is HF `generate` on CUDA);
this is TPU-native serving headroom on top of parity.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[K, N] float -> (int8 [K, N], bf16 scale [1, N]) per-output-channel."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
    s = jnp.where(s == 0.0, 1.0, s)
    # round the scale to its stored precision FIRST so quantization and
    # dequantization agree (dividing by the f32 scale but multiplying by its
    # bf16 rounding would add |w| * 2^-8 of silent extra error)
    s = s.astype(jnp.bfloat16)
    q = jnp.clip(jnp.round(wf / s.astype(jnp.float32)), -127, 127).astype(jnp.int8)
    return q, s


def _dq_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[...].astype(jnp.bfloat16)                       # int8 -> bf16 in VMEM
    acc = jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = (acc * s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def dq_matmul(x: jax.Array, q: jax.Array, s: jax.Array,
              block_n: int = 512, block_m: int = 256,
              out_dtype=jnp.bfloat16,
              interpret: bool = False) -> jax.Array:
    """x [B, K] @ dequant(q [K, N], s [1, N]) -> [B, N].

    One K pass per (M, N) block (decode-sized K always fits VMEM); the grid
    walks rows then N panels. Decode batches fit one M block (identical to
    a 1-D N walk); the M grid exists so the PREFILL forward — B*L0 rows
    through the same quantized params — stays within VMEM instead of
    loading the whole activation matrix as a single block. B is padded to
    the sublane multiple (to a block_m multiple when gridded), N to the
    lane multiple.
    """
    b, kdim = x.shape
    _, n = q.shape
    bp = max(8, ((b + 7) // 8) * 8)
    block_m = min(block_m, bp)
    bp = ((bp + block_m - 1) // block_m) * block_m
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))
    block_n = min(block_n, ((n + _LANES - 1) // _LANES) * _LANES)
    npad = (-n) % block_n
    if npad:
        q = jnp.pad(q, ((0, 0), (0, npad)))
        s = jnp.pad(s, ((0, 0), (0, npad)))
    grid = (bp // block_m, q.shape[1] // block_n)
    out = pl.pallas_call(
        _dq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, kdim), lambda i, j: (i, 0)),
            pl.BlockSpec((kdim, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((bp, q.shape[1]), out_dtype),
        interpret=interpret,
    )(x, q, s)
    return out[:b, :n]


def dequantize_weight(q: jax.Array, s: jax.Array,
                      dtype=jnp.bfloat16) -> jax.Array:
    return (q.astype(jnp.float32) * s.astype(jnp.float32)).astype(dtype)

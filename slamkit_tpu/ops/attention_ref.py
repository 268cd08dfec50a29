"""Reference (pure-XLA) attention with causal + segment-id masking.

Serves three roles:
  * numerical ground truth for the Pallas flash kernel tests,
  * fallback path on CPU (virtual-device meshes) where Mosaic is unavailable,
  * the packing semantics contract: tokens attend only within their own
    segment, replacing the reference's FA2 varlen/cu_seqlens approach
    (reference hf_dataset.py:61-62 DataCollatorWithFlattening + CUDA FA2)
    with TPU-style segment-id block masking.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def attention_mask(t_q: int, t_k: int, *, causal: bool,
                   q_segment_ids: Optional[jax.Array] = None,
                   k_segment_ids: Optional[jax.Array] = None,
                   q_offset: int = 0) -> Optional[jax.Array]:
    """Build a boolean [.., t_q, t_k] mask (True = attend)."""
    mask = None
    if causal:
        qi = jnp.arange(t_q) + q_offset
        ki = jnp.arange(t_k)
        mask = qi[:, None] >= ki[None, :]
    if q_segment_ids is not None:
        seg = q_segment_ids[..., :, None] == k_segment_ids[..., None, :]
        seg = seg[..., None, :, :] if seg.ndim == 3 else seg  # [B, 1, Tq, Tk]
        mask = seg if mask is None else (mask & seg)
    return mask


def mha_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                  segment_ids: Optional[jax.Array] = None,
                  causal: bool = True,
                  sm_scale: Optional[float] = None,
                  dropout_rate: float = 0.0,
                  dropout_rng: Optional[jax.Array] = None) -> jax.Array:
    """Multi-head attention. q,k,v: [B, H, T, D]; segment_ids: [B, T] int32.

    Computes softmax in f32 regardless of input dtype (matching the Pallas
    kernel's accumulation precision). dropout_rate/dropout_rng apply
    inverted dropout to the attention probabilities (HF attention_dropout
    semantics); identity when the rng is None.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * sm_scale
    mask = attention_mask(
        q.shape[2], k.shape[2], causal=causal,
        q_segment_ids=segment_ids, k_segment_ids=segment_ids)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    # rows that can attend nowhere (padding segments) produce zeros, not NaNs
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - jax.lax.stop_gradient(row_max))
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = unnorm / jnp.maximum(denom, 1e-30)
    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate),
                          jnp.zeros_like(probs))
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)

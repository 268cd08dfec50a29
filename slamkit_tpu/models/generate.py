"""Jitted autoregressive sampling with KV cache.

TPU-native replacement for HF `model.generate` as the reference uses it
(reference slamkit/model/unit_lm.py:196-198, speech_lm.py:38-55): fixed-shape
decode loop under jit (lax.scan), left-padded prompts, temperature / top-k /
top-p sampling, eos early-stop, and `bad_words` as a static vocab mask instead
of HF's per-step bad_words_ids list processor (the reference only ever bans
single-token ids — speech_lm.py:46-48 — so a mask is exact and much faster).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .transformer import DecoderConfig, forward, init_cache

NEG_INF = -1e30


def _sample(logits, rng, do_sample, temperature, top_k, top_p):
    """temperature/top_p may be TRACED scalars (a knob sweep must not
    recompile the decode loop); only their None-ness is structural.
    temperature=1.0 / top_p=1.0 are numerical no-ops, so the always-apply
    path is exact."""
    if not do_sample:
        return jnp.argmax(logits, axis=-1)
    if temperature is not None:
        logits = logits / jnp.maximum(temperature, 1e-6)
    if top_k is not None and top_k > 0:
        # HF clamps top_k to the vocab size (TopKLogitsWarper semantics)
        kth = jax.lax.top_k(logits, min(top_k, logits.shape[-1]))[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p is not None:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest set of tokens whose cumulative prob exceeds top_p
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, NEG_INF, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def _apply_repetition_penalty(logits, seen, penalty):
    """HF semantics: logits of already-seen ids are divided by the penalty
    when positive, multiplied when negative."""
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


# temperature / top_p / repetition_penalty are TRACED: sweeping them (a
# temperature grid in generation evals) reuses ONE compiled program. Only
# shape/structure knobs are static: max_new_tokens, do_sample, top_k (the
# lax.top_k width), eos/pad ids, and each float's None-ness.
_QUANT_KEYS = ("q_w", "k_w", "v_w", "o_w", "up_w", "gate_w", "down_w")


def _quantize_decode_params(params: dict) -> dict:
    """int8 weight-only quantization of the stacked per-layer matmul weights
    for the decode loop (decode streams every weight per token — halved
    bytes halve the HBM floor, scripts/probe_step.py P3 / probe_int8.py).
    Embeddings (a gather) and the 502-wide f32 logit head stay dense."""
    from ..ops.quant import quantize_weight

    layers = dict(params["layers"])
    for key in _QUANT_KEYS:
        w = layers.get(key)
        # dict leaves are already {"q","s"} (pre-quantized via
        # prepare_int8_decode_params) — idempotent pass-through
        if w is not None and getattr(w, "ndim", None) == 3:   # [L, d, f] stacked
            q, s = jax.vmap(quantize_weight)(w)
            layers[key] = {"q": q, "s": s}
    return {**params, "layers": layers}


def prepare_int8_decode_params(params: dict, compute_dtype) -> dict:
    """One-time prep for REPEATED int8 decode calls. `generate` takes params
    as jit arguments (never closed over — CLAUDE.md tunnel rule), so its
    in-trace cast + quantize re-read every f32 master weight on every
    invocation; a per-batch generation loop would pay ~2 extra full weight
    streams per call. Pre-applying the identical cast + quantize outside the
    decode jit turns both in-trace passes into no-ops (the quantizer skips
    dict leaves) with bit-identical results."""
    cast = jax.tree_util.tree_map(
        lambda x: x.astype(compute_dtype)
        if x.dtype == jnp.float32 and x.ndim > 1 else x, params)
    return jax.jit(_quantize_decode_params)(cast)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "do_sample", "top_k",
                     "eos_token_id", "pad_token_id", "weight_quant"),
)
def generate(params: dict, cfg: DecoderConfig, input_ids: jax.Array,
             attention_mask: jax.Array, rng: jax.Array,
             *, max_new_tokens: int, do_sample: bool = True,
             temperature: float = 1.0, top_k: Optional[int] = None,
             top_p: Optional[float] = None,
             eos_token_id: Optional[int] = None,
             pad_token_id: int = 0,
             repetition_penalty: Optional[float] = None,
             bad_words_mask: Optional[jax.Array] = None,
             weight_quant: Optional[str] = None) -> jax.Array:
    """input_ids [B, L0] LEFT-padded, attention_mask [B, L0].
    Returns [B, L0 + max_new_tokens]; positions after eos hold pad_token_id.
    bad_words_mask: bool [V], True = banned id.
    """
    b, l0 = input_ids.shape
    total = l0 + max_new_tokens
    if max_new_tokens <= 0:  # HF returns the prompt unchanged
        return input_ids

    # cast weights to the compute dtype ONCE, outside the decode loop —
    # otherwise every scan step re-streams the f32 master weights from HBM
    # (decode is weight-bandwidth-bound; this halves the per-step reads)
    dt = cfg.compute_dtype
    params = jax.tree_util.tree_map(
        lambda x: x.astype(dt) if x.dtype == jnp.float32 and x.ndim > 1 else x,
        params)
    if weight_quant == "int8":
        params = _quantize_decode_params(params)
    elif weight_quant:
        raise ValueError(f"unknown weight_quant {weight_quant!r} (only 'int8')")

    mask = attention_mask.astype(jnp.int32)
    prompt_seg = jnp.where(mask > 0, 0, -1).astype(jnp.int32)
    seg_full = jnp.concatenate(
        [prompt_seg, jnp.zeros((b, max_new_tokens), jnp.int32)], axis=1)
    positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
    prompt_len = mask.sum(axis=1)  # real (unpadded) prompt length per row

    cache = init_cache(cfg, b, total)
    logits, cache = forward(params, cfg, input_ids, positions=positions,
                            segment_ids=prompt_seg, cache=cache,
                            cache_index=0)
    last_logits = logits[:, -1, :]  # rightmost position is the last real token

    def mask_logits(lg, seen):
        if bad_words_mask is not None:
            lg = jnp.where(bad_words_mask[None, :], NEG_INF, lg)
        if repetition_penalty is not None:  # traced; 1.0 is a no-op
            lg = _apply_repetition_penalty(lg, seen, repetition_penalty)
        return lg

    # per-row presence mask of prompt ids (pads excluded) for the penalty
    V = cfg.vocab_size
    seen = jnp.zeros((b, V), bool)
    one_hot = jax.nn.one_hot(input_ids, V, dtype=jnp.bool_)
    seen = seen | jnp.any(one_hot & (mask[..., None] > 0), axis=1)

    rng, sub = jax.random.split(rng)
    first = _sample(mask_logits(last_logits, seen), sub, do_sample,
                    temperature, top_k, top_p)
    seen = seen.at[jnp.arange(b), first].set(True)
    finished = jnp.zeros((b,), bool)
    if eos_token_id is not None:
        finished = first == eos_token_id

    def step(carry, i):
        cache, tok, finished, seen, rng = carry
        pos = (prompt_len + i)[:, None]  # [B,1] next position index
        logits, cache = forward(params, cfg, tok[:, None],
                                positions=pos, segment_ids=seg_full,
                                cache=cache, cache_index=l0 + i)
        rng, sub = jax.random.split(rng)
        nxt = _sample(mask_logits(logits[:, -1, :], seen), sub, do_sample,
                      temperature, top_k, top_p)
        nxt = jnp.where(finished, pad_token_id, nxt)
        seen = seen.at[jnp.arange(b), nxt].set(True)
        if eos_token_id is not None:
            finished = finished | (nxt == eos_token_id)
        return (cache, nxt, finished, seen, rng), tok

    (_, last_tok, _, _, _), toks = jax.lax.scan(
        step, (cache, first, finished, seen, rng), jnp.arange(max_new_tokens - 1))
    # toks: [steps, B] tokens fed at each step (i.e. generated tokens 0..n-2)
    gen = jnp.concatenate([toks.T, last_tok[:, None]], axis=1) \
        if max_new_tokens > 1 else first[:, None]
    return jnp.concatenate([input_ids, gen], axis=1)

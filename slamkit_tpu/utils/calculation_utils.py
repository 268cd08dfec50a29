"""Loss / likelihood / auto-BLEU helpers (reference slamkit/utils/calculation_utils.py:5-47)."""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def token_nll(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Per-token negative log likelihood. logits [.., V] f32, targets [..] int.

    Invalid targets (< 0) are looked up at index 0 and must be masked by the
    caller (mirrors torch cross_entropy(reduction='none') + external mask).
    """
    logz = jax.nn.logsumexp(logits, axis=-1)
    safe_t = jnp.maximum(targets, 0)
    gold = jnp.take_along_axis(logits, safe_t[..., None], axis=-1)[..., 0]
    return logz - gold


def calc_nll(logits: jax.Array, target: jax.Array, mask: jax.Array,
             len_norm: bool = True) -> jax.Array:
    """Masked per-sequence NLL, mean or sum over tokens
    (reference calculation_utils.py:5-29)."""
    losses = token_nll(logits, target) * mask
    ll = losses.sum(axis=-1)
    if len_norm:
        return ll / jnp.maximum(mask.sum(axis=-1), 1)
    return ll


def cross_entropy_loss(logits: jax.Array, labels: jax.Array,
                       num_items_in_batch: Optional[jax.Array] = None,
                       ignore_index: int = IGNORE_INDEX,
                       pre_shifted: bool = False) -> jax.Array:
    """Shifted causal-LM loss matching reference unit_lm.py:13-29:
    mean over valid tokens, or sum/num_items_in_batch when packing provides
    the global token count (grad-accum correctness).

    pre_shifted=True: labels[t] is ALREADY the target for logits[t]
    (next-token adjacency applied by the caller — the zigzag CP schedule
    permutes the time axis, so the shift must happen before permuting)."""
    if pre_shifted:
        shift_logits, shift_labels = logits, labels
    else:
        shift_logits = logits[..., :-1, :]
        shift_labels = labels[..., 1:]
    valid = shift_labels != ignore_index
    nll = token_nll(shift_logits, shift_labels) * valid
    if num_items_in_batch is not None:
        return nll.sum() / num_items_in_batch
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def calc_ngram(text: str, tokenizer, n: int) -> List[str]:
    tokens = tokenizer.tokenize(text) if hasattr(tokenizer, "tokenize") else text.split()
    return [" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]


def calc_auto_bleu(text: str, tokenizer, n: int) -> float:
    """Fraction of n-grams repeated elsewhere in the same text
    (reference calculation_utils.py:32-47)."""
    ngrams = calc_ngram(text, tokenizer, n)
    if len(ngrams) == 0:
        return 0
    counts = {}
    for g in ngrams:
        counts[g] = counts.get(g, 0) + 1
    return sum(1 for g in ngrams if counts[g] > 1) / len(ngrams)

"""Preference-optimization (DPO) dataset pipeline.

Counterpart of reference slamkit/data/hf_dataset.py:127-148: load
{prompt, chosen, rejected} jsonl rows, optionally drop samples whose
prompt+chosen text repeats itself (auto-BLEU >= max_auto_bleu)."""
from __future__ import annotations

import logging
from typing import Dict, List

from ..utils.calculation_utils import calc_auto_bleu
from .dataset import load_jsonl_rows

logger = logging.getLogger(__name__)


class _WhitespaceTokenizer:
    def tokenize(self, text):
        return text.split()


def get_repetition_filter_fn(auto_bleu_n: int, max_auto_bleu: float):
    """reference hf_dataset.py:127-135 (NLTK word tokenizer when available)."""
    try:
        from nltk.tokenize import NLTKWordTokenizer

        tokenizer = NLTKWordTokenizer()
    except ImportError:
        tokenizer = _WhitespaceTokenizer()

    def filter_fn(x):
        text = x["prompt_text"] + " " + x["chosen_text"]
        return calc_auto_bleu(text, tokenizer, auto_bleu_n) < max_auto_bleu

    return filter_fn


def init_preference_optimization_dataset(cfg) -> Dict[str, List[dict]]:
    """-> {'train': [...], 'validation': [...]} rows keeping only
    prompt/chosen/rejected (reference hf_dataset.py:138-148)."""
    splits = {"train": cfg.train_path}
    if cfg.get("val_path", None) is not None:
        splits["validation"] = cfg.val_path
    out = {}
    for name, path in splits.items():
        rows = list(load_jsonl_rows(path))
        if cfg.get("repetition_filter", False):
            fn = get_repetition_filter_fn(cfg.auto_bleu_n, cfg.max_auto_bleu)
            n0 = len(rows)
            rows = [r for r in rows if fn(r)]
            logger.info("repetition filter kept %d/%d %s rows", len(rows), n0, name)
        out[name] = [{k: r[k] for k in ("prompt", "chosen", "rejected")}
                     for r in rows]
    return out

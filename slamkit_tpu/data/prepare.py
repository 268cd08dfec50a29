"""Stage-2 token preparation: features jsonl -> tokens jsonl.

Per-line transform matching reference cli/prepare_tokens.py:14-35 exactly:
parse the feature record, optionally merge per-file metadata (aligned text for
interleaving), stringify in 'train' mode, drop the raw fields. Output key order
(file_name, audio_repr, ...) and json.dumps formatting are preserved so the
produced tokens.jsonl is byte-identical to the reference's.
"""
from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

_RAW_FIELDS = ("units", "duration", "text", "aligned_text", "split_sentence")


def process_feature_line(line: str, tokeniser, requires_meta: bool = False,
                         meta_path: Optional[str] = None) -> Optional[str]:
    """Transform one features.jsonl line into a tokens.jsonl line (or None to skip)."""
    try:
        cur = json.loads(line)
        if requires_meta:
            stem = (f"{meta_path}/{Path(cur['file_name']).stem}" if meta_path
                    else os.path.splitext(cur["file_name"])[0])
            meta_file = stem + ".json"
            if not os.path.exists(meta_file):
                logger.warning("%s does not exist. Skipping", meta_file)
                return None
            with open(meta_file, "r") as f:
                cur.update(json.load(f))
        cur["audio_repr"] = tokeniser.stringify_representation([cur], mode="train")[0]
        for field in _RAW_FIELDS:
            cur.pop(field, None)
        return json.dumps(cur)
    except Exception as e:  # per-line failures skip, never abort the run
        logger.warning("Failed to process %s. Error: %s, skipping", line, e)
        return None


def prepare_tokens_file(in_path: str, out_path: str, tokeniser,
                        requires_meta: bool = False, meta_path: Optional[str] = None,
                        n_threads: int = 32) -> int:
    """Stream a features jsonl through process_feature_line into out_path.

    Returns the number of lines written. Uses a thread pool like the reference
    (cli/prepare_tokens.py:51-55) — the work is string/regex bound, and the C++
    codec releases the GIL when available.
    """
    from multiprocessing.pool import ThreadPool
    from functools import partial

    fn = partial(process_feature_line, tokeniser=tokeniser,
                 requires_meta=requires_meta, meta_path=meta_path)
    written = 0
    with open(in_path, "r") as f_in, open(out_path, "a+") as f_out:
        with ThreadPool(n_threads) as pool:
            for jsonl in pool.imap(fn, f_in):
                if jsonl:
                    f_out.write(jsonl + "\n")
                    written += 1
    return written

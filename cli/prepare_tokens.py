"""Stage 2: features jsonl -> tokens jsonl {file_name, audio_repr}.

Surface parity with reference cli/prepare_tokens.py:14-57 (requires_meta
merge, per-line skip on error, thread pool)."""
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slamkit_tpu.config import main
from slamkit_tpu.data.prepare import prepare_tokens_file
from slamkit_tpu.tokeniser import tokeniser_factory

logger = logging.getLogger(__name__)


@main(config_name="prepare_tokens", config_path="../config")
def prepare_tokens(cfg):
    tokeniser = tokeniser_factory(cfg.tokeniser)
    requires_meta = bool(cfg.tokeniser.get("requires_meta", False))
    os.makedirs(os.path.dirname(os.path.abspath(cfg.out_path)), exist_ok=True)
    n = prepare_tokens_file(cfg.data_path, cfg.out_path, tokeniser,
                            requires_meta=requires_meta,
                            meta_path=cfg.get("meta_path", None),
                            n_threads=cfg.get("n_threads", 32))
    logger.info("Wrote %d lines to %s", n, cfg.out_path)


if __name__ == "__main__":
    prepare_tokens()

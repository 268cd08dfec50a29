"""Experiment-tracker init (reference slamkit/utils/init_utils.py:4-19).

wandb is optional in this environment; when missing, init_wandb logs a
warning and returns None so training falls back to the print logger."""
from __future__ import annotations

import logging
import os

from ..config import to_container

logger = logging.getLogger(__name__)


def init_compile():
    """Surface parity with the reference's torch.compile hook
    (reference init_utils.py:18-19). Everything here is jit-compiled
    unconditionally, so this only keeps the env contract."""
    os.environ["ACCELERATE_DYNAMO_USE_DYNAMIC"] = "1"


def init_wandb(cfg, name: str):
    """Start a wandb run (rank-0 only, reference cli/train.py:58-66) and
    upload the composed config as a run artifact."""
    try:
        import wandb
    except ImportError:
        logger.warning("wandb not installed; falling back to print logging")
        return None
    run = wandb.init(project=cfg.logger.project,
                     entity=cfg.logger.get("entity", None),
                     name=name,
                     group=cfg.logger.get("group", None),
                     resume=cfg.logger.get("resume", None),
                     config=to_container(cfg))
    import json

    config_path = os.path.join(run.dir, f"{run.entity}-{run.name}-config.json")
    with open(config_path, "w") as f:
        json.dump(to_container(cfg), f, indent=2)
    run.save(config_path, policy="now")
    return run

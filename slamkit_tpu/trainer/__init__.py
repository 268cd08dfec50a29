from .callbacks import (MaxTokensStopperCallback, RunTimeStopperCallback,
                        TrainerCallback, TrainerControl, TrainerState)
from .optim import make_optimizer, make_schedule, resolve_warmup_steps
from .slam_trainer import SLAMTrainer

__all__ = [
    "SLAMTrainer",
    "TrainerCallback",
    "TrainerControl",
    "TrainerState",
    "RunTimeStopperCallback",
    "MaxTokensStopperCallback",
    "make_optimizer",
    "make_schedule",
    "resolve_warmup_steps",
]

from .slam_dpo_trainer import SLAMDPOTrainer  # noqa: E402

__all__.append("SLAMDPOTrainer")

"""Preference stage 2: DPO training.

Surface parity with reference cli/preference_alignment_train.py:18-69:
interleave tokeniser rejected, repetition-filtered dataset, beta/lr from
dpo_training_args, run-time stopper, resume."""
import logging
import os
import sys

os.environ["TOKENIZERS_PARALLELISM"] = "false"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slamkit_tpu.config import main
from slamkit_tpu.data.preference import init_preference_optimization_dataset
from slamkit_tpu.models.unit_lm import tlm_factory
from slamkit_tpu.tokeniser import tokeniser_factory
from slamkit_tpu.trainer import RunTimeStopperCallback
from slamkit_tpu.trainer.slam_dpo_trainer import SLAMDPOTrainer
from slamkit_tpu.utils.init_utils import init_wandb

logger = logging.getLogger(__name__)


@main(config_name="preference_alignment_train", config_path="../config")
def train(cfg):
    logging.basicConfig(level=logging.INFO)
    if cfg.tokeniser.tokeniser_type == "interleave":
        raise ValueError("Interleave tokeniser not supported for Preference Alignment yet")

    tokeniser = tokeniser_factory(cfg.tokeniser)
    logger.info("tokeniser inited")
    ds = init_preference_optimization_dataset(cfg.data)
    logger.info("datasets loaded")

    if cfg.model.config_args.vocab_size == -1:
        cfg.model.config_args.vocab_size = len(tokeniser.text_tokeniser)
    model = tlm_factory(cfg.model)
    logger.info("model inited")

    log_fn = None
    if cfg.logger.report_to == "wandb":
        import jax

        name = os.path.basename(os.path.normpath(cfg.training_args.output_dir))
        if jax.process_index() == 0:
            run = init_wandb(cfg, name)
            if run is not None:
                log_fn = run.log

    callbacks = []
    if cfg.get("run_time", None) is not None:
        callbacks.append(RunTimeStopperCallback(cfg.run_time))

    trainer = SLAMDPOTrainer(
        model=model,
        tokenizer=tokeniser,
        args=cfg.training_args,
        train_dataset=ds["train"],
        eval_dataset=ds.get("validation"),
        callbacks=callbacks,
        log_fn=log_fn,
    )
    trainer.train(resume_from_checkpoint=cfg.get("cont_training", None))


if __name__ == "__main__":
    train()

"""Stage 3: tokens jsonl -> trained checkpoint.

Surface/behavior parity with reference cli/train.py:16-93:
  * interleave tokeniser forced to the model's base tokeniser;
  * num_train_epochs derived from train_max_tokens/ds_token_size (+1%);
  * vocab_size=-1 -> len(tokeniser.text_tokeniser);
  * warmup = max(warmup_steps, warmup_ratio·total) (handled in trainer/optim);
  * wandb on process 0 only; run_time / train_max_tokens budget stoppers;
  * resume via cont_training.
The packing⇒flash-attention-2 restriction does not exist here: the Pallas
flash kernel takes segment ids on any batch (SURVEY.md §2.8).
"""
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slamkit_tpu.config import main, to_container
from slamkit_tpu.data.dataset import init_dataset
from slamkit_tpu.models.unit_lm import tlm_factory
from slamkit_tpu.tokeniser import tokeniser_factory
from slamkit_tpu.trainer import (MaxTokensStopperCallback,
                                 RunTimeStopperCallback, SLAMTrainer)
from slamkit_tpu.utils.init_utils import init_wandb

logger = logging.getLogger(__name__)


@main(config_name="train", config_path="../config")
def train(cfg):
    logging.basicConfig(level=logging.INFO)
    if cfg.training_args.get("multihost", False):
        # multi-slice / multi-host: one process per host, data axis spans all
        # devices; host-side loading shards by process index (SURVEY.md §5.8)
        import jax

        jax.distributed.initialize()
    if cfg.tokeniser.tokeniser_type == "interleave":
        # interleaved data: text tokeniser must match the model base
        if cfg.tokeniser.params.text_tokeniser_path != cfg.model.config_args.base_model_name:
            logger.warning(
                "Text tokeniser %s doesn't match model, changing it to: %s",
                cfg.tokeniser.params.text_tokeniser_path,
                cfg.model.config_args.base_model_name)
            cfg.tokeniser.params.text_tokeniser_path = cfg.model.config_args.base_model_name

    if cfg.get("train_max_tokens", None) is not None and cfg.get("ds_token_size", 0) > 0:
        EPS = 0.01
        cfg.training_args.num_train_epochs = (
            cfg.train_max_tokens / cfg.ds_token_size) * (1 + EPS)
        logger.info("Updated num_train_epochs to %s from train_max_tokens",
                    cfg.training_args.num_train_epochs)

    tokeniser = tokeniser_factory(cfg.tokeniser)
    logger.info("tokeniser inited")

    ds = init_dataset(cfg, tokeniser)
    logger.info("datasets loaded: train=%d rows", len(ds["train"]))

    if cfg.model.config_args.vocab_size == -1:
        logger.info("Model vocab_size is -1, setting to tokeniser vocab size")
        cfg.model.config_args.vocab_size = len(tokeniser.text_tokeniser)
    # training_args.remat activates decoder-block checkpointing in the model
    # (the TPU analogue of HF gradient_checkpointing — required to fit the
    # 360M Slam recipe on a 16G chip)
    if bool(cfg.training_args.get("remat", False)) or \
            bool(cfg.training_args.get("gradient_checkpointing", False)):
        cfg.model.config_args.remat = True
    model = tlm_factory(cfg.model)
    logger.info("model inited")

    log_fn = None
    if cfg.logger.report_to == "wandb":
        name = os.path.basename(os.path.normpath(cfg.training_args.output_dir))
        import jax

        if jax.process_index() == 0:
            run = init_wandb(cfg, name)
            if run is not None:
                log_fn = run.log
        logger.info("wandb inited")

    callbacks = []
    if cfg.get("run_time", None) is not None:
        callbacks.append(RunTimeStopperCallback(cfg.run_time))
    if cfg.get("train_max_tokens", None) is not None:
        callbacks.append(MaxTokensStopperCallback(cfg.train_max_tokens))

    trainer = SLAMTrainer(
        model=model,
        args=cfg.training_args,
        train_dataset=ds["train"],
        eval_dataset=ds.get("validation"),
        callbacks=callbacks,
        packing=bool(cfg.data.get("packing", False)),
        # bestfit bin-packing reaches ~97.5% row occupancy (greedy in-order:
        # ~73% on ~500-token utterances) — 1.33x real-token throughput
        packing_strategy=cfg.data.get("packing_strategy", "bestfit"),
        context_len=cfg.model.context_len,
        log_fn=log_fn,
    )
    trainer.train(resume_from_checkpoint=cfg.get("cont_training", False))


if __name__ == "__main__":
    train()

"""Stage 4: evaluate a trained SpeechLM.

Surface parity with reference cli/eval.py:20-134: dispatch on
metric.metric_type × cross_modal, print scalar results, save generated
audio/text to metric.out_path, optional wandb logging resuming a run_id."""
import logging
import os
import sys

os.environ["TOKENIZERS_PARALLELISM"] = "false"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slamkit_tpu.config import main, to_container
from slamkit_tpu.utils.path_utils import resolve_reference_path

logger = logging.getLogger(__name__)


@main(config_name="eval", config_path="../config")
def eval_main(cfg):
    logging.basicConfig(level=logging.INFO)
    import numpy as np

    from slamkit_tpu.metric.generative_metric import (asr_perplexity, generate,
                                                      llm_as_judge)
    from slamkit_tpu.metric.modelling_metric import (salmon, sblimp, storycloze,
                                                     swuggy)
    from slamkit_tpu.models.speech_lm import SpeechLM
    from slamkit_tpu.models.unit_lm import tlm_factory
    from slamkit_tpu.tokeniser import tokeniser_factory
    from slamkit_tpu.vocoder.audio_vocoder import vocoder_factory

    if not cfg.model.pretrained_model:
        logger.warning("No pretrained model specified. please specify one with "
                       "model.pretrained_model=<path>")
    tokeniser = tokeniser_factory(cfg.tokeniser)
    if cfg.model.config_args.vocab_size == -1:
        cfg.model.config_args.vocab_size = len(tokeniser.text_tokeniser)
    tlm = tlm_factory(cfg.model)
    # TPU extension: eval_mesh=N shards every metric batch over an N-device
    # data mesh (optionally + fsdp params via eval_fsdp=true) — the sharded
    # eval path the multichip dryrun validates (__graft_entry__.py). The
    # reference evals single-device (slamkit/model/speech_lm.py:22).
    n_mesh = int(cfg.get("eval_mesh", 0) or 0)
    if n_mesh > 1:
        from slamkit_tpu.parallel.mesh import make_mesh

        tlm.shard(make_mesh([n_mesh]), fsdp=bool(cfg.get("eval_fsdp", False)))
        logger.info("eval sharded over a %d-device data mesh", n_mesh)
    vocoder = vocoder_factory(cfg.vocoder)
    model = SpeechLM(tlm, tokeniser, vocoder=vocoder, device=cfg.device)

    path = resolve_reference_path(cfg.metric.data_path, cfg.get("reference_path", None))
    used_token_modality = cfg.metric.get("used_token_modality", None)
    mean_nll = cfg.metric.get("mean_nll", True)
    cross_modal = cfg.metric.get("cross_modal", False)
    gen_kwargs = to_container(cfg.metric.get("generate_kwargs", None)) or {}

    if not cross_modal:
        mt = cfg.metric.metric_type
        # joint_pairs scores (pos, neg) in one [2B] call (metric.joint_pairs)
        jp = bool(cfg.metric.get("joint_pairs", False))
        if mt == "swuggy":
            res = swuggy(model, path, used_token_modality, mean_nll, cfg.batch_size,
                         cfg.num_workers, cfg.pin_memory, cfg.metric.get("subfolder", False),
                         joint_pairs=jp)
        elif mt == "sblimp":
            res = sblimp(model, path, used_token_modality, mean_nll, cfg.batch_size,
                         cfg.num_workers, cfg.pin_memory, cfg.metric.get("subfolder", False),
                         joint_pairs=jp)
        elif mt == "storycloze":
            res = storycloze(model, path, used_token_modality, mean_nll, cfg.batch_size,
                             cfg.num_workers, cfg.pin_memory, cfg.metric.get("subfolder", False),
                             joint_pairs=jp)
        elif mt == "salmon":
            res = salmon(model, path, used_token_modality, mean_nll, cfg.metric.parts,
                         cfg.batch_size, cfg.num_workers, cfg.pin_memory, joint_pairs=jp)
        elif mt == "generate":
            if cfg.vocoder.vocoder_type is None:
                logger.warning("Running generation without a vocoder generates "
                               "tokens only; set e.g. vocoder=vocoder_hubert_25")
            res = generate(model, path, cfg.batch_size, used_token_modality,
                           cfg.metric.prompt_length, cfg.metric.get("min_file_length", None),
                           cfg.metric.get("alignment_folder", None),
                           cfg.metric.get("use_alignment", False),
                           tokeniser.fe_sample_rate, cfg.metric.num_files,
                           cfg.num_workers, cfg.pin_memory, **gen_kwargs)
        elif mt == "asr_perplexity":
            res = asr_perplexity(model, path, cfg.batch_size, cfg.metric.whisper_model,
                                 cfg.metric.llm_name_or_path, used_token_modality,
                                 cfg.metric.prompt_length, cfg.metric.get("min_file_length", None),
                                 cfg.metric.get("alignment_folder", None),
                                 cfg.metric.get("use_alignment", False),
                                 cfg.metric.auto_bleu_n, tokeniser.fe_sample_rate,
                                 cfg.metric.get("num_files", None),
                                 cfg.num_workers, cfg.pin_memory,
                                 cfg.metric.get("torch_device", None),
                                 asr_backend=cfg.metric.get("asr_backend", "torch"),
                                 asr_dtype=cfg.metric.get("asr_dtype", "float32"),
                                 llm_backend=cfg.metric.get("llm_backend", "torch"),
                                 **gen_kwargs)
        elif mt == "llm_as_judge":
            res = llm_as_judge(model, path, cfg.batch_size, cfg.metric.whisper_model,
                               cfg.metric.llm_name_or_path, cfg.metric.instruction,
                               used_token_modality, cfg.metric.prompt_length,
                               cfg.metric.min_file_length,
                               cfg.metric.get("alignment_folder", None),
                               cfg.metric.get("use_alignment", False),
                               tokeniser.fe_sample_rate, cfg.metric.get("num_files", None),
                               cfg.num_workers, cfg.pin_memory,
                               cfg.metric.get("torch_device", None),
                               asr_backend=cfg.metric.get("asr_backend", "torch"),
                               asr_dtype=cfg.metric.get("asr_dtype", "float32"),
                               llm_backend=cfg.metric.get("llm_backend", "torch"),
                               **gen_kwargs)
        else:
            raise ValueError(f"Unknown metric type: {mt}")
    else:
        if cfg.metric.metric_type == "storycloze":
            from slamkit_tpu.metric.cross_modal_metric import cm_storycloze

            res = cm_storycloze(model, path, cfg.metric.prompt_modality,
                                cfg.metric.cont_modality, used_token_modality,
                                mean_nll, cfg.batch_size, cfg.num_workers,
                                cfg.pin_memory, cfg.metric.get("subfolder", False))
        elif cfg.metric.metric_type == "generate":
            from slamkit_tpu.metric.cross_modal_generation import \
                generate as cm_generate

            res = cm_generate(model, path, cfg.batch_size,
                              cfg.metric.prompt_modality,
                              cfg.metric.get("cont_modality", None),
                              cfg.metric.prompt_length, tokeniser.fe_sample_rate,
                              cfg.metric.num_files, cfg.num_workers,
                              cfg.pin_memory, **gen_kwargs)
        else:
            raise ValueError(f"Unknown cross-modal metric: {cfg.metric.metric_type}")

    if cfg.metric.metric_type != "generate":
        for key, val in res.items():
            if key in ("generate", "prompts"):
                continue
            if isinstance(val, list):
                print(f"{key}:")
                for i, v in enumerate(val):
                    print(f"\t{i}: {v}")
            else:
                print(f"{key}: {val}")

    if cfg.metric.get("out_path", False) and "generate" in res and \
            cfg.vocoder.vocoder_type is not None:
        from slamkit_tpu.utils.audio import save_wav

        os.makedirs(cfg.metric.out_path, exist_ok=True)
        for i, gen in enumerate(res["generate"]):
            if i == cfg.metric.get("num_log", -1):
                print(f"Only saving first {i} samples")
                break
            if isinstance(gen, str):
                with open(os.path.join(cfg.metric.out_path,
                                       f"{cfg.metric.metric_type}_{i}.txt"), "w") as f:
                    f.write(gen)
            else:
                if np.size(gen) == 0:
                    continue
                save_wav(os.path.join(cfg.metric.out_path,
                                      f"{cfg.metric.metric_type}_{i}.{cfg.metric.ext}"),
                         np.asarray(gen).ravel(), tokeniser.fe_sample_rate)

    if cfg.logger.report_to == "wandb":
        import wandb

        if cfg.logger.run_id is None:
            raise ValueError("No run_id specified for wandb logging")
        wandb.init(project=cfg.logger.project, entity=cfg.logger.entity,
                   id=cfg.logger.run_id, resume="must")
        if "generate" in res and "prompts" in res and \
                cfg.vocoder.vocoder_type is not None:
            logs = {}
            for i, (gen, prompt) in enumerate(zip(res["generate"], res["prompts"])):
                if i == cfg.metric.get("num_log", -1):
                    print(f"Only logging first {i} samples")
                    break
                if np.size(gen) == 0:
                    continue
                logs[f"generated/generated_{i}"] = wandb.Audio(
                    np.asarray(gen).ravel(), caption=f"generated_{i}",
                    sample_rate=tokeniser.fe_sample_rate)
                logs[f"prompt/prompt_{i}"] = wandb.Audio(
                    np.asarray(prompt).ravel(), caption=f"prompt_{i}",
                    sample_rate=tokeniser.fe_sample_rate)
                if "audio_transcription" in res:
                    logs[f"prompt/prompt_text_{i}"] = res["audio_transcription"][i][0]
                    logs[f"generated/generated_text_{i}"] = res["audio_transcription"][i][1]
            wandb.log(logs)
        metric_name = f"{cfg.metric.metric_type}/{os.path.basename(os.path.normpath(cfg.metric.data_path))}"
        wandb.log({f"{metric_name}-{part}": val for part, val in res.items()
                   if part not in ("generate", "prompts")})


if __name__ == "__main__":
    eval_main()

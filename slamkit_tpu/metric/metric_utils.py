"""Host-side eval tools: Whisper ASR pipeline, text-LM perplexity, LLM judges.

Counterpart of reference slamkit/metric/metric_utils.py:20-129. By default
these scoring components run on torch CPU (or any torch device) while the
SpeechLM under test runs on TPU; each has an opt-in 'jax' backend
(asr_backend / llm_backend) that runs it on the TPU stack instead —
whisper_jax.py for ASR, the UnitLM decoder for text-LM perplexity and HF
judge generation. The \\boxed{} parser, judge sampling params (temp 0.8,
512 new tokens) and the OpenAI fallback match the reference exactly."""
from __future__ import annotations

import logging
import os
import re
from typing import List

logger = logging.getLogger(__name__)

OPENAI_MODELS = ["gpt-3.5-turbo", "gpt-4", "gpt-4o"]


def get_whisper_pipeline(model_id, device="cpu", backend="torch",
                         dtype="float32"):
    """backend='jax' runs the TPU-native Whisper (whisper_jax.py) on the
    default JAX device — the whole GenPPL loop stays on-chip; `device`
    then only matters for the torch path. dtype='bfloat16' halves the
    jax path's weight reads (MXU-native); parity tests run float32."""
    if backend == "jax":
        from .whisper_jax import JaxWhisperPipeline

        return JaxWhisperPipeline(model_id, dtype=dtype)
    import torch
    from transformers import AutoModelForSpeechSeq2Seq, AutoProcessor, pipeline

    torch_dtype = torch.float16 if torch.cuda.is_available() else torch.float32
    model = AutoModelForSpeechSeq2Seq.from_pretrained(
        model_id, torch_dtype=torch_dtype, low_cpu_mem_usage=True,
        use_safetensors=True)
    model.to(device)
    processor = AutoProcessor.from_pretrained(model_id)
    return pipeline("automatic-speech-recognition", model=model,
                    tokenizer=processor.tokenizer,
                    feature_extractor=processor.feature_extractor,
                    torch_dtype=torch_dtype, device=device)


def get_llm(model_id, device="cpu", backend="torch"):
    """backend='jax' loads the text LM through the TPU decoder stack
    (models/transformer.py via the hf_convert family converters — llama/
    qwen2/opt/gpt_neox cover the reference's Llama-3.2-1B default), so the
    GenPPL perplexity stage runs on-chip next to the ASR. `device` then
    only matters for the torch path."""
    from transformers import AutoTokenizer

    tokeniser = AutoTokenizer.from_pretrained(model_id)
    if tokeniser.pad_token_id is None:
        tokeniser.pad_token = tokeniser.eos_token
    if backend == "jax":
        from transformers import AutoConfig

        from ..models.unit_lm import UnitLM, UnitLMConfig

        hf_vocab = AutoConfig.from_pretrained(model_id).vocab_size
        cfg = UnitLMConfig(base_model_name=model_id, vocab_size=hf_vocab,
                           twist_init=True,  # = load the real weights
                           pad_token_id=tokeniser.pad_token_id,
                           torch_dtype="float32")
        return UnitLM(cfg), tokeniser
    import torch  # noqa: F401 — device placement below
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_id, use_cache=False)
    model.to(device)
    return model, tokeniser


def get_llm_perplexity(model, tokeniser, text: List[str], device="cpu"):
    """Per-sequence mean NLL of each text under the text LM
    (reference metric_utils.py:51-60)."""
    if hasattr(model, "log_likelihood"):  # JAX backend (UnitLM)
        import numpy as np

        enc = tokeniser(text, padding=True, return_tensors="np")
        ids = enc["input_ids"].astype(np.int32)
        # log_likelihood masks == pad_token_id, exactly the torch branch's
        # labels[labels == pad_id] = -100 rule; mean_nll matches its
        # per-token normalization (both clamp empty rows to 1)
        return -np.asarray(model.log_likelihood(ids, mean_nll=True))
    import torch

    model_inputs = tokeniser(text, return_tensors="pt", padding=True).to(device)
    labels = model_inputs["input_ids"].clone()
    labels[labels == tokeniser.pad_token_id] = -100
    with torch.inference_mode():
        logits = model(input_ids=model_inputs["input_ids"],
                       attention_mask=model_inputs["attention_mask"]).logits
    shift_logits = logits[..., :-1, :]
    shift_labels = labels[..., 1:]
    mask = shift_labels.ne(-100)
    safe = shift_labels.clamp_min(0)
    logz = torch.logsumexp(shift_logits, dim=-1)
    gold = shift_logits.gather(-1, safe.unsqueeze(-1)).squeeze(-1)
    nll = (logz - gold) * mask
    return nll.sum(-1) / mask.sum(-1).clamp_min(1)


# kept under the reference's (misspelled) name for drop-in compatibility
get_llm_preplexity = get_llm_perplexity


def extract_digit_from_boxed(string: str):
    match = re.search(r"\\boxed\{(\d+)\}", string)
    return int(match.group(1)) if match else None


def judge_text(model, tokeniser, text: List[str], device="cpu"):
    tokeniser.padding_side = "left"
    if hasattr(model, "log_likelihood"):  # JAX backend (UnitLM)
        import numpy as np

        enc = tokeniser(text, return_tensors="np", padding=True)
        generation = np.asarray(model.generate(
            enc["input_ids"].astype(np.int32),
            attention_mask=enc["attention_mask"].astype(np.int32),
            max_new_tokens=512, do_sample=True, temperature=0.8))
    else:
        model_inputs = tokeniser(text, return_tensors="pt",
                                 padding=True).to(device)
        generation = model.generate(
            input_ids=model_inputs["input_ids"],
            attention_mask=model_inputs["attention_mask"],
            max_new_tokens=512, do_sample=True, temperature=0.8)
    decode = tokeniser.batch_decode(generation, skip_special_tokens=True)
    return [extract_digit_from_boxed(t) for t in decode]


class LLMJudge:
    def __init__(self, model, tokeniser, device, batch_size):
        self.model = model
        self.tokeniser = tokeniser
        self.device = device
        self.batch_size = batch_size

    def __call__(self, texts: List[str]) -> List:
        res = []
        for i in range(0, len(texts), self.batch_size):
            res.extend(judge_text(self.model, self.tokeniser,
                                  texts[i:i + self.batch_size], self.device))
        return res


class OpenAIJudge:
    def __init__(self, name):
        from openai import OpenAI

        self.client = OpenAI(api_key=os.environ["OPENAI_API_KEY"])
        self.model_name = name

    def __call__(self, texts: List[str]) -> List:
        res = []
        for text in texts:
            try:
                completion = self.client.chat.completions.create(
                    model=self.model_name,
                    messages=[{"role": "user", "content": text}])
            except Exception as e:  # log-and-skip (reference :116-118)
                logger.error("Error: %s", e)
                continue
            res.append(extract_digit_from_boxed(
                completion.choices[0].message.content))
        return res


def get_judge(name, device, batch_size, backend="torch"):
    """backend='jax' (HF judges only — OpenAI names always go to the API)
    runs the judge LM's sampling generation through the TPU decoder stack
    (UnitLM.generate: left-padded prompts, traced temperature)."""
    if name in OPENAI_MODELS:
        return OpenAIJudge(name)
    model, tokeniser = get_llm(name, device, backend=backend)
    if backend == "jax":
        # generation must stop at the judge model's own eos, not the
        # UnitLM default unit-vocab ids
        from transformers import AutoConfig

        hf = AutoConfig.from_pretrained(name)
        eos = (tokeniser.eos_token_id if tokeniser.eos_token_id is not None
               else hf.eos_token_id)
        if isinstance(eos, (list, tuple)):  # qwen-style multi-eos configs
            eos = eos[0]
        model.config.eos_token_id = int(eos)
        model.config.pad_token_id = int(tokeniser.pad_token_id)
    return LLMJudge(model, tokeniser, device, batch_size)

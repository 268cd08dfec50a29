"""Decode throughput A/B: dense bf16 vs int8 weight-only (Pallas dequant-
gemv), on the real chip.

Decode is weight-bandwidth-bound (scripts/probe_step.py P3: 1.513 ms/token
vs the 0.875 ms bf16 streaming floor at 360M); int8 halves the streamed
bytes, so the floor drops to ~0.44 ms + the measured ~0.64 ms non-weight
overhead. This script measures what is actually realized, and — when given
a checkpoint trained on the rehearse_slam Markov corpus — verifies that
generation QUALITY survives quantization (transition validity vs the
ground-truth successor table).

Usage:
  python scripts/bench_decode.py                       # random 360M weights
  python scripts/bench_decode.py --ckpt /tmp/slam_big/out/checkpoint-NNN
"""
import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

B, PROMPT, NEW = 16, 32, 150


def timed_generate(model, prompts, quant, iters=3):
    kw = dict(max_new_tokens=NEW, do_sample=True, temperature=0.8, top_k=25,
              seed=0, weight_quant=quant)
    out = model.generate(prompts, **kw)          # compile
    float(np.asarray(out)[0, -1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = model.generate(prompts, **kw)
    float(np.asarray(out)[-1, -1])
    return (time.perf_counter() - t0) / iters, np.asarray(out)


def validity(out, succ, id_offset):
    gen = out[:, PROMPT:] - id_offset
    prev = out[:, PROMPT - 1:PROMPT] - id_offset
    valid = total = 0
    for row in np.concatenate([prev, gen], axis=1):
        for a, b in zip(row[:-1], row[1:]):
            if 0 <= a < len(succ) and 0 <= b < len(succ):
                total += 1
                valid += int(b in succ[a])
    return valid, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig

    succ = None
    if args.ckpt:
        from eval_pretrained_markov import ID_OFFSET, succ_table
        model = UnitLM.from_pretrained(args.ckpt)
        succ = succ_table()
        rng = np.random.default_rng(7)
        from eval_pretrained_markov import sample_seq
        prompts = np.stack([sample_seq(succ, rng, PROMPT)
                            for _ in range(B)]) + ID_OFFSET
    else:
        model = UnitLM(UnitLMConfig(base_model_name="Qwen/Qwen2.5-0.5B",
                                    vocab_size=502, twist_init=False,
                                    torch_dtype="bfloat16"), seed=0)
        prompts = np.random.default_rng(7).integers(2, 502, (B, PROMPT))

    res = {"batch": B, "new_tokens": NEW}
    for name, quant in (("dense_bf16", None), ("int8", "int8")):
        dt, out = timed_generate(model, prompts, quant, iters=args.iters)
        res[f"{name}_ms_per_token"] = round(dt / NEW * 1e3, 3)
        if succ is not None:
            v, t = validity(out, succ, 2)
            res[f"{name}_valid_transitions"] = f"{v}/{t}"
    res["speedup"] = round(res["dense_bf16_ms_per_token"]
                           / res["int8_ms_per_token"], 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

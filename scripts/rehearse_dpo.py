"""DPO rehearsal on the real chip: preference-align the rehearsed Slam model.

Completes the paper pipeline (pretrain -> DPO) on hardware: takes the
checkpoint trained by scripts/rehearse_slam.py on the first-order-Markov
unit corpus and DPO-aligns it on synthetic preferences where `chosen` is a
true chain continuation of the prompt and `rejected` is uniform-random
units. A model that learned the chain should drive rewards/accuracies -> 1
within a few steps (the policy's margin on chain-valid continuations grows).

Usage:
  python scripts/rehearse_dpo.py --ckpt /tmp/slam_rehearsal/out/checkpoint-2000 \
      --steps 100
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

N_UNITS = 500


def gen_rows(succ, n_rows, seed, prompt_len=100, cont_len=50):
    rng = np.random.default_rng(seed)
    rows = []
    states = rng.integers(0, N_UNITS, size=n_rows)
    for i in range(n_rows):
        s = int(states[i])
        seq = [s]
        for _ in range(prompt_len + cont_len - 1):
            s = int(succ[s, rng.integers(0, 4)])
            seq.append(s)
        prompt, chosen = seq[:prompt_len], seq[prompt_len:]
        rejected = rng.integers(0, N_UNITS, size=cont_len).tolist()
        rows.append({
            "prompt": {"units": prompt, "duration": [1] * len(prompt)},
            "chosen": {"units": chosen, "duration": [1] * len(chosen)},
            "rejected": {"units": rejected, "duration": [1] * len(rejected)},
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/slam_rehearsal/out/checkpoint-2000")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--root", default="/tmp/dpo_rehearsal")
    ap.add_argument("--rows", type=int, default=2048)
    # rehearse_slam.gen_corpus fixes the table at seed 12345; checkpoints
    # trained on corpora generated BEFORE that fix used seed 0's first draw
    ap.add_argument("--succ-seed", type=int, default=12345)
    ap.add_argument("--extra", nargs="*", default=[])
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    # the transition table the rehearsal corpus was generated from
    # (rehearse_slam.gen_corpus)
    succ = np.random.default_rng(args.succ_seed).integers(
        0, N_UNITS, size=(N_UNITS, 4), dtype=np.int32)
    for name, n, seed in (("train", args.rows, 0), ("val", 256, 1)):
        path = os.path.join(args.root, f"{name}.jsonl")
        if not os.path.isfile(path):
            with open(path, "w") as f:
                for r in gen_rows(succ, n, seed):
                    f.write(json.dumps(r) + "\n")

    out = os.path.join(args.root, "out")
    cmd = [sys.executable, os.path.join(REPO, "cli/preference_alignment_train.py"),
           f"model.pretrained_model={args.ckpt}",
           f"data.train_path={args.root}/train.jsonl",
           f"data.val_path={args.root}/val.jsonl",
           "data.repetition_filter=false",   # units-only synthetic set
           f"training_args.output_dir={out}",
           f"training_args.max_steps={args.steps}",
           "training_args.per_device_train_batch_size=8",
           "training_args.logging_steps=10",
           "training_args.save_steps=0",
           "+model.config_args.remat=true",
           ] + args.extra
    print(" ".join(cmd), flush=True)
    t0 = time.time()
    r = subprocess.run(cmd)
    print(f"dpo rc={r.returncode} wall={time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()

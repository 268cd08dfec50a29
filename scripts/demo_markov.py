"""End-to-end hardware demo: train a unit LM from scratch on a synthetic
first-order Markov corpus via cli/train.py, then verify (a) pair scoring
separates chain-consistent from shuffled continuations and (b) sampled
generations follow the chain.

Round-1 result on v5e: eval loss -> 1.48 (floor ln4 = 1.386) at 31k tokens/s
through the full trainer loop; 200/200 pairs correct; 800/800 generated
transitions valid.

Usage:  python scripts/demo_markov.py [workdir]   (trains ~300 steps, ~10 min)
"""
import json
import os
import subprocess
import sys

import numpy as np


def build_corpus(d, K=500, n_train=4000):
    rng = np.random.default_rng(0)
    nxt = np.stack([rng.choice(K, 4, replace=False) for _ in range(K)])

    def sample_seq(n):
        u = int(rng.integers(K))
        out = [u]
        for _ in range(n - 1):
            u = int(rng.choice(nxt[u]))
            out.append(u)
        return out

    os.makedirs(d, exist_ok=True)
    with open(f"{d}/train.jsonl", "w") as f:
        for i in range(n_train):
            seq = sample_seq(int(rng.integers(100, 200)))
            f.write(json.dumps({"file_name": f"s{i}",
                                "audio_repr": "".join(f"<Un{u}>" for u in seq)}) + "\n")
    with open(f"{d}/val.jsonl", "w") as f:
        for i in range(100):
            f.write(json.dumps({"file_name": f"v{i}",
                                "audio_repr": "".join(f"<Un{u}>" for u in sample_seq(150))}) + "\n")
    pairs = []
    for _ in range(200):
        pos = sample_seq(60)
        neg = pos[:20] + [int(x) for x in rng.integers(0, K, 40)]
        pairs.append({"pos": pos, "neg": neg})
    return nxt, pairs


def main():
    if "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__)
        return
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/markov_demo"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    nxt, pairs = build_corpus(d)
    subprocess.run([sys.executable, os.path.join(repo, "cli/train.py"),
                    f"data.train_path={d}/train.jsonl", f"data.val_path={d}/val.jsonl",
                    "data.packing=true", "model=gslm", "model.context_len=512",
                    "model.config_args.base_model_name=EleutherAI/pythia-160m",
                    f"training_args.output_dir={d}/out", "training_args.max_steps=300",
                    "training_args.per_device_train_batch_size=8",
                    "training_args.logging_steps=25", "training_args.eval_steps=150",
                    "training_args.save_steps=0", "training_args.learning_rate=6e-4"],
                   check=True)

    sys.path.insert(0, repo)
    from slamkit_tpu.models.unit_lm import UnitLM

    model = UnitLM.from_pretrained(f"{d}/out/checkpoint-300")
    OFF = 2

    def batch(seqs):
        L = max(len(s) for s in seqs) + 2
        out = np.zeros((len(seqs), L), np.int32)
        for i, s in enumerate(seqs):
            row = [1] + [u + OFF for u in s] + [1]
            out[i, :len(row)] = row
        return out

    wins = 0.0
    for lo in range(0, len(pairs), 50):
        chunk = pairs[lo:lo + 50]
        pos = np.asarray(model.log_likelihood(batch([p["pos"] for p in chunk])))
        neg = np.asarray(model.log_likelihood(batch([p["neg"] for p in chunk])))
        wins += (pos > neg).sum() + 0.5 * (pos == neg).sum()
    print(f"pair accuracy: {wins / len(pairs):.3f}")

    rng = np.random.default_rng(0)
    prompts = []
    for _ in range(16):
        u = int(rng.integers(500))
        seq = [u]
        for _ in range(19):
            u = int(rng.choice(nxt[u]))
            seq.append(u)
        prompts.append([1] + [x + OFF for x in seq])
    P = np.array(prompts, np.int32)
    out = np.asarray(model.generate(P, max_new_tokens=50, do_sample=True,
                                    temperature=0.8, top_k=25, seed=0))
    gen = out[:, P.shape[1]:] - OFF
    valid = total = 0
    for r in range(gen.shape[0]):
        seq = [int(prompts[r][-1] - OFF)] + [int(x) for x in gen[r] if 0 <= x < 500]
        for a, b in zip(seq, seq[1:]):
            total += 1
            valid += int(b in nxt[a])
    print(f"generated transitions valid: {valid}/{total} = {valid / total:.3f}")


if __name__ == "__main__":
    main()

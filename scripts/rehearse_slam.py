"""Slam-recipe rehearsal on the real chip (VERDICT.md item 6).

Generates a realistically-shaped synthetic unit corpus (first-order Markov
chain over 500 units, utterance lengths like deduped 25Hz speech), writes it
as a saved_ds cache, and runs the ACTUAL config/train.yaml Slam recipe
(model=slam: Qwen2.5-0.5B TWIST-shape, ctx 1024, packing, accum 16,
cosine-min-lr, budget stoppers) through cli/train.py for --steps optimizer
steps — measuring FULL-LOOP tokens/s (host batching + device step), not just
the jitted step.

Usage:
  python scripts/rehearse_slam.py --tokens 3e8 --steps 2000
  python scripts/rehearse_slam.py --report /tmp/slam_rehearsal/out  # summarize
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
sys.path.insert(0, REPO)

N_UNITS = 500
ID_OFFSET = 2          # unit i -> token id i+2 (PAD=0, <S>=1)


def gen_corpus(out_dir, total_tokens, seed=0, mean_len=500):
    """Vectorized Markov generation: step all sequences one position at a
    time (columns are vectorized gathers over ~1e5 rows).

    The transition table is FIXED (its own rng) so train/val splits with
    different seeds describe the same language — otherwise eval loss is
    meaningless."""
    succ = np.random.default_rng(12345).integers(
        0, N_UNITS, size=(N_UNITS, 4), dtype=np.int32)
    rng = np.random.default_rng(seed)

    n_seqs = int(total_tokens / mean_len)
    lens = np.clip(rng.lognormal(np.log(mean_len), 0.35, n_seqs), 32,
                   4 * mean_len).astype(np.int64)
    max_len = int(lens.max())
    offsets = np.zeros(n_seqs + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])

    os.makedirs(out_dir, exist_ok=True)
    states = rng.integers(0, N_UNITS, size=n_seqs, dtype=np.int32)
    cols = np.empty((max_len, n_seqs), np.int32)
    choices = rng.integers(0, 4, size=(max_len, n_seqs), dtype=np.int8)
    for t in range(max_len):
        cols[t] = states
        states = succ[states, choices[t]]

    with open(os.path.join(out_dir, "tokens.bin"), "wb") as f:
        # write per-sequence prefixes (cols is [T, n]; slice per sequence)
        slab = 4096
        for lo in range(0, n_seqs, slab):
            hi = min(lo + slab, n_seqs)
            parts = [cols[:lens[i], i] + ID_OFFSET for i in range(lo, hi)]
            f.write(np.concatenate(parts).astype(np.int32).tobytes())
    np.save(os.path.join(out_dir, "offsets.npy"), offsets)
    return int(offsets[-1]), n_seqs


def summarize(out_dir):
    st_path = None
    for root, _, files in os.walk(out_dir):
        if "trainer_state.json" in files:
            st_path = os.path.join(root, "trainer_state.json")
    rates, losses = [], []
    if st_path:
        with open(st_path) as f:
            hist = json.load(f).get("log_history", [])
        rates = [r["tokens_per_sec"] for r in hist if "tokens_per_sec" in r]
        losses = [r["loss"] for r in hist if "loss" in r]
    if not rates:
        print("no log history found under", out_dir)
        return
    arr = np.array(rates[1:] or rates)  # drop the compile-laden first window
    med = float(np.median(arr))
    print(json.dumps({
        "full_loop_tokens_per_sec_median": round(med, 1),
        "full_loop_tokens_per_sec_p10": round(float(np.percentile(arr, 10)), 1),
        "windows": len(arr),
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "projected_24h_tokens_one_v5e": round(med * 86400 / 1e9, 2),
        "projected_24h_tokens_v4_8_ge": round(med * 4 * 86400 / 1e9, 2),
    }, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=float, default=3e8)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--root", default="/tmp/slam_rehearsal")
    ap.add_argument("--report", default=None)
    ap.add_argument("--extra", nargs="*", default=[])
    args = ap.parse_args()

    if args.report:
        summarize(args.report)
        return

    ds_dir = os.path.join(args.root, "ds")
    if not os.path.isfile(os.path.join(ds_dir, "train", "offsets.npy")):
        t0 = time.time()
        n_tok, n_seq = gen_corpus(os.path.join(ds_dir, "train"), args.tokens)
        gen_corpus(os.path.join(ds_dir, "validation"), 2e5, seed=1)
        print(f"corpus: {n_tok:,} tokens / {n_seq:,} seqs "
              f"in {time.time() - t0:.0f}s")

    out = os.path.join(args.root, "out")
    # an --extra training_args.output_dir=... override wins (the summary
    # must read the run that actually happened)
    for ov in args.extra:
        if ov.startswith("training_args.output_dir="):
            out = ov.split("=", 1)[1]
    cmd = [sys.executable, os.path.join(REPO, "cli/train.py"),
           "model=slam",
           f"data.saved_ds_path={ds_dir}",
           "data.train_path=unused", "data.val_path=null",
           "data.packing=true",
           f"training_args.output_dir={out}",
           f"training_args.max_steps={args.steps}",
           "training_args.per_device_train_batch_size=8",
           "training_args.gradient_accumulation_steps=16",
           "training_args.logging_steps=25",
           "training_args.save_steps=1000",
           "training_args.eval_steps=1000",
           "training_args.optim_state_dtype=bfloat16",
           "training_args.remat=true",
           "run_time=0-23:00:00",
           f"train_max_tokens={int(args.tokens):d}",
           ] + args.extra
    print(" ".join(cmd), flush=True)
    t0 = time.time()
    r = subprocess.run(cmd)
    print(f"train rc={r.returncode} wall={time.time() - t0:.0f}s")
    summarize(out)


if __name__ == "__main__":
    main()

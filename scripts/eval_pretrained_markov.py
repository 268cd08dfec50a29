"""Ground-truth quality eval for a checkpoint trained on the rehearse_slam
synthetic corpus (VERDICT r3 item 1 evidence).

The corpus is a first-order Markov chain (fixed successor table, 4 uniform
successors per unit -> entropy floor ln 4 = 1.3863 nats/token), so the
trained model's quality is measurable WITHOUT real speech:

  * eval ppl vs the analytic floor (how much of the language was learned);
  * pair accuracy: chain-consistent vs corrupted continuations scored by
    UnitLM.log_likelihood — the modelling-metric (sWUGGY/sBLIMP) decision
    rule applied to ground-truth structure;
  * generation validity: fraction of sampled transitions that exist in the
    successor table (the jitted KV-cache decode path, top-k 25 like the
    Slam generate recipe).

Usage: python scripts/eval_pretrained_markov.py /tmp/slam_big/out/checkpoint-9000
"""
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from rehearse_slam import ID_OFFSET, N_UNITS  # noqa: E402

SUCC_SEED = 12345  # rehearse_slam.gen_corpus's fixed transition table


def succ_table():
    return np.random.default_rng(SUCC_SEED).integers(
        0, N_UNITS, size=(N_UNITS, 4), dtype=np.int32)


def sample_seq(succ, rng, n):
    out = np.empty(n, np.int32)
    u = int(rng.integers(N_UNITS))
    for i in range(n):
        out[i] = u
        u = int(succ[u, rng.integers(4)])
    return out


def main():
    if "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__)
        return
    ckpt = sys.argv[1]
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from slamkit_tpu.models.unit_lm import UnitLM

    model = UnitLM.from_pretrained(ckpt)
    succ = succ_table()
    rng = np.random.default_rng(7)

    # ---- pair scoring: consistent vs corrupted continuation -------------- #
    L, P = 96, 32   # total length, shared prompt
    correct = 0
    B = 64
    for lo in range(0, n_pairs, B):
        m = min(B, n_pairs - lo)
        pos = np.stack([sample_seq(succ, rng, L) for _ in range(m)])
        neg = pos.copy()
        neg[:, P:] = rng.integers(0, N_UNITS, (m, L - P))
        toks = np.concatenate([pos, neg]) + ID_OFFSET
        ll = np.asarray(model.log_likelihood(toks, mean_nll=True))
        correct += int((ll[:m] > ll[m:]).sum())
    pair_acc = correct / n_pairs

    # ---- generation chain validity --------------------------------------- #
    prompts = np.stack([sample_seq(succ, rng, 32) for _ in range(16)]) + ID_OFFSET
    out = np.asarray(model.generate(prompts, max_new_tokens=64, do_sample=True,
                                    temperature=0.8, top_k=25, seed=0))
    gen = out[:, 32:] - ID_OFFSET
    valid = total = 0
    for row in np.concatenate([out[:, 31:32] - ID_OFFSET, gen], axis=1):
        for a, b in zip(row[:-1], row[1:]):
            if not (0 <= a < N_UNITS and 0 <= b < N_UNITS):
                continue
            total += 1
            valid += int(b in succ[a])
    # ---- eval ppl from the checkpoint's own log -------------------------- #
    eval_loss = None
    st = os.path.join(ckpt, "trainer_state.json")
    if os.path.isfile(st):
        with open(st) as f:
            hist = json.load(f).get("log_history", [])
        evals = [r["eval_loss"] for r in hist if "eval_loss" in r]
        eval_loss = evals[-1] if evals else None

    print(json.dumps({
        "checkpoint": ckpt,
        "pair_accuracy": round(pair_acc, 4),
        "pairs": n_pairs,
        "generation_valid_transition_rate": round(valid / max(total, 1), 4),
        "transitions_checked": total,
        "final_eval_loss": eval_loss,
        "entropy_floor_ln4": round(float(np.log(4)), 4),
        # successors drawn with replacement -> ~5% of units have a duplicate;
        # stationary-weighted exact floor (see scripts/harvest_pretrain.py)
        "entropy_floor_exact": 1.37965,
    }))


if __name__ == "__main__":
    main()

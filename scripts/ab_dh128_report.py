"""Stock-vs-dh128 A/B report (VERDICT r4 item 3).

Both arms train the REAL config/train.yaml recipe through cli/train.py on
the IDENTICAL corpus + batch stream (same saved_ds, same seeds, same
11100-step cosine; the dh128 arm is token-stopped at the stock arm's
milestone). This script extracts step-matched train-loss/throughput
milestones and the eval rows from the two supervisor logs and prints the
side-by-side table for docs/SLAM.md.

Usage: python scripts/ab_dh128_report.py \
    runs_local/slam_1p4b/run.log runs_local/dh128/run.log
"""
import json
import re
import sys

STEP_RE = re.compile(r"\{'loss': ([0-9.]+), 'learning_rate'.*"
                     r"'num_input_tokens_seen': (\d+), 'tokens_per_sec': "
                     r"([0-9.]+).*'step': (\d+)\}")
EVAL_RE = re.compile(r"\{'eval_loss': ([0-9.]+), 'eval_ppl': ([0-9.]+), "
                     r"'step': (\d+)\}")


def parse(path):
    steps, evals, rates = {}, {}, []
    for line in open(path):
        m = STEP_RE.search(line)
        if m:
            loss, tokens, rate, step = (float(m[1]), int(m[2]),
                                        float(m[3]), int(m[4]))
            steps[step] = (loss, tokens)
            if step > 50:          # drop compile-laden windows
                rates.append(rate)
        m = EVAL_RE.search(line)
        if m:
            evals[int(m[3])] = (float(m[1]), float(m[2]))
    import numpy as np

    med = float(np.median(rates)) if rates else 0.0
    return steps, evals, med


def main():
    if len(sys.argv) < 3 or "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__)
        return
    stock_log, dh_log = sys.argv[1], sys.argv[2]
    s_steps, s_evals, s_rate = parse(stock_log)
    d_steps, d_evals, d_rate = parse(dh_log)
    marks = sorted(set(s_steps) & set(d_steps) & {250, 500, 750, 1000,
                                                  1250, 1500})
    print("| step | tokens | stock loss | dh128 loss | Δ (dh128−stock) |")
    print("|---|---|---|---|---|")
    for m in marks:
        sl, st = s_steps[m]
        dl, _ = d_steps[m]
        print(f"| {m} | {st/1e6:.0f}M | {sl:.4f} | {dl:.4f} | {dl-sl:+.4f} |")
    print("\n| eval step | stock loss/ppl | dh128 loss/ppl |")
    print("|---|---|---|")
    for m in sorted(set(s_evals) | set(d_evals)):
        s = "%.4f / %.4f" % s_evals[m] if m in s_evals else "—"
        d = "%.4f / %.4f" % d_evals[m] if m in d_evals else "—"
        print(f"| {m} | {s} | {d} |")
    print(json.dumps({"stock_median_tokens_per_sec": round(s_rate, 1),
                      "dh128_median_tokens_per_sec": round(d_rate, 1),
                      "speedup": round(d_rate / max(s_rate, 1), 4)}))


if __name__ == "__main__":
    main()

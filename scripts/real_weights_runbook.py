"""One-command real-weights parity runbook (VERDICT r4 item 8).

The two evidence items still blocked by zero egress are (a) stage-1
bit-parity on the golden features.jsonl with the REAL mhubert-25hz + km500
weights, and (b) decision parity of the JAX eval path against transformers
on a reference checkpoint. Both harnesses are built and fixture-tested;
this script closes the loop the moment weights exist (network, a mirror
volume, or a pre-populated HF cache):

    python scripts/real_weights_runbook.py \
        [--hubert <dir-or-hub-id>] [--kmeans <path-or-url>] \
        [--ckpt <unitlm-or-reference-checkpoint>] [--pairs <sblimp dir>]

With no flags it probes the standard locations ($SLAMKIT_WEIGHTS_ROOT,
$HF_HOME / ~/.cache/huggingface, $SLAMKIT_CACHE) and reports exactly what
is missing, running whichever legs are satisfiable. Results append to
docs/runs/real_weights_parity.json.

Weights map (see docs/RUNBOOK_REAL_WEIGHTS.md):
  hubert : slprl/mhubert-base-25hz  (HF hub id or a local clone)
  kmeans : mhubert_base_25hz_cp_mls_cv_sp_fisher_L11_km500.bin
           (textless checkpoint registry name 'mhubert-base-25hz-km500';
           vocoder/checkpoint_manager.py resolves name -> url/sha)
  ckpt   : slprl/slam (or slam_scaled) reference checkpoint dir
  pairs  : any sBLIMP-layout wav-pair folder (sep '+')
"""
import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _probe(candidates):
    for c in candidates:
        if c and os.path.exists(os.path.expanduser(c)):
            return os.path.expanduser(c)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hubert", default=None)
    ap.add_argument("--kmeans", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--pairs", default=None)
    ap.add_argument("--layer", type=int, default=11)
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "runs", "real_weights_parity.json"))
    args = ap.parse_args()

    root = os.environ.get("SLAMKIT_WEIGHTS_ROOT", "")
    hubert = args.hubert or _probe([
        os.path.join(root, "mhubert-base-25hz"),
        "~/.cache/huggingface/hub/models--slprl--mhubert-base-25hz"])
    kmeans = args.kmeans or _probe([
        os.path.join(root,
                     "mhubert_base_25hz_cp_mls_cv_sp_fisher_L11_km500.bin"),
        os.path.join(os.environ.get("SLAMKIT_CACHE",
                                    "~/.cache/slamkit"),
                     "mhubert_base_25hz_cp_mls_cv_sp_fisher_L11_km500.bin")])
    ckpt = args.ckpt or _probe([os.path.join(root, "slam"),
                                os.path.join(root, "slam_scaled")])
    pairs = args.pairs or _probe([os.path.join(root, "sblimp")])

    results = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), "legs": {}}

    def leg(name, cmd):
        print(f"== {name}: {' '.join(cmd)}", flush=True)
        r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        tail = (r.stdout + r.stderr)[-3000:]
        print(tail)
        results["legs"][name] = {"rc": r.returncode, "cmd": cmd,
                                 "tail": tail[-800:]}
        return r.returncode == 0

    ok = True
    if hubert and kmeans:
        ok &= leg("stage1_bit_parity", [
            sys.executable, "scripts/stage1_parity.py",
            "--hubert", hubert, "--kmeans", kmeans,
            "--layer", str(args.layer)])
    else:
        missing = [n for n, v in [("hubert", hubert), ("kmeans", kmeans)]
                   if not v]
        print(f"SKIP stage1_bit_parity — missing: {missing} "
              f"(set $SLAMKIT_WEIGHTS_ROOT or pass --hubert/--kmeans)")
        results["legs"]["stage1_bit_parity"] = {"skipped": missing}

    if ckpt and pairs and hubert and kmeans:
        ok &= leg("eval_decision_parity", [
            sys.executable, "scripts/eval_parity.py",
            "--ckpt", ckpt, "--pairs", pairs, "--sep", "+",
            "--fe-model", hubert, "--kmeans", kmeans,
            "--layer", str(args.layer)])
    else:
        missing = [n for n, v in [("ckpt", ckpt), ("pairs", pairs),
                                  ("hubert", hubert), ("kmeans", kmeans)]
                   if not v]
        print(f"SKIP eval_decision_parity — missing: {missing}")
        results["legs"]["eval_decision_parity"] = {"skipped": missing}

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    hist = []
    if os.path.isfile(args.out):
        with open(args.out) as f:
            hist = json.load(f)
    hist.append(results)
    with open(args.out, "w") as f:
        json.dump(hist, f, indent=1)
    print(json.dumps({"ok": ok, "recorded": args.out}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

"""Mid-run kill + bit-identical resume rehearsal (VERDICT r3 item 10).

Reference semantics: `cont_training=true` resumes from the last checkpoint in
output_dir (reference cli/train.py:89). This rehearsal proves the whole
resume chain — orbax state, data-position replay, dropout-RNG stream, packing
-strategy guard — by running the SAME recipe twice:

  leg A  uninterrupted run to --steps, logging every --log-steps
  leg B  same run SIGKILLed (unclean, no atexit) once the log passes
         --kill-after-step, then resumed with cont_training=true to --steps

and asserting the two loss streams are IDENTICAL at every logged step (the
killed process's windows past its last checkpoint are recomputed on resume).
A third mini-leg asserts the packing-strategy resume guard refuses a
mismatched data.packing_strategy.

CPU harness check:   python scripts/rehearse_resume.py --cpu --root /tmp/rr
Real-chip rehearsal: python scripts/rehearse_resume.py --root /tmp/rr_tpu
"""
import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from rehearse_slam import gen_corpus  # noqa: E402  (same synthetic corpus)


def base_cmd(args, ds_dir, out_dir):
    cmd = [sys.executable, os.path.join(REPO, "cli/train.py"),
           f"data.saved_ds_path={ds_dir}",
           "data.train_path=unused", "data.val_path=null",
           "data.packing=true",
           f"training_args.output_dir={out_dir}",
           f"training_args.max_steps={args.steps}",
           f"training_args.logging_steps={args.log_steps}",
           f"training_args.save_steps={args.save_steps}",
           "training_args.eval_steps=0",
           "training_args.save_total_limit=10",
           ]
    if args.cpu:
        cmd += ["model=gslm", "model.context_len=128",
                "model.config_args.base_model_name=EleutherAI/pythia-14m",
                "training_args.per_device_train_batch_size=2",
                "training_args.gradient_accumulation_steps=2",
                # nonzero dropout so the resumed RNG stream is exercised too
                "model.config_args.dropout=0.1"]
    else:
        cmd += ["model=slam",
                "training_args.per_device_train_batch_size=8",
                "training_args.gradient_accumulation_steps=16",
                "training_args.optim_state_dtype=bfloat16",
                "training_args.remat=true"]
    return cmd + args.extra


def env(args):
    e = dict(os.environ)
    if args.cpu:
        e["JAX_PLATFORMS"] = "cpu"
        flags = e.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            e["XLA_FLAGS"] = (flags +
                              " --xla_force_host_platform_device_count=8").strip()
    return e


STEP_RE = re.compile(r"'loss':.*'step': (\d+)")


def run_to_completion(cmd, e, log_path):
    with open(log_path, "w") as f:
        r = subprocess.run(cmd, env=e, stdout=f, stderr=subprocess.STDOUT)
    assert r.returncode == 0, f"run failed, see {log_path}"


def run_and_kill(cmd, e, log_path, kill_after_step):
    """SIGKILL (no cleanup handlers) once a logged training step passes the
    threshold."""
    with open(log_path, "w") as f:
        p = subprocess.Popen(cmd, env=e, stdout=f, stderr=subprocess.STDOUT)
    try:
        pos = 0
        while p.poll() is None:
            time.sleep(0.5)
            with open(log_path) as lf:
                lf.seek(pos)
                chunk = lf.read()
                pos = lf.tell()
            for m in STEP_RE.finditer(chunk):
                if int(m.group(1)) >= kill_after_step:
                    os.kill(p.pid, signal.SIGKILL)
                    p.wait()
                    print(f"killed at logged step {m.group(1)}")
                    return
        raise AssertionError(
            f"run finished (rc={p.returncode}) before reaching "
            f"kill step {kill_after_step}")
    finally:
        if p.poll() is None:
            p.kill()


def loss_stream(out_dir):
    """Full log_history from the LATEST checkpoint's trainer_state.json."""
    ckpts = [d for d in os.listdir(out_dir) if d.startswith("checkpoint-")]
    assert ckpts, f"no checkpoints under {out_dir}"
    latest = max(ckpts, key=lambda d: int(d.split("-")[1]))
    with open(os.path.join(out_dir, latest, "trainer_state.json")) as f:
        hist = json.load(f).get("log_history", [])
    return {r["step"]: r["loss"] for r in hist if "loss" in r}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/resume_rehearsal")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--log-steps", type=int, default=5)
    ap.add_argument("--save-steps", type=int, default=20)
    ap.add_argument("--kill-after-step", type=int, default=35)
    ap.add_argument("--tokens", type=float, default=2e6)
    ap.add_argument("--cpu", action="store_true",
                    help="tiny-model harness check on the 8-dev CPU mesh")
    ap.add_argument("--extra", nargs="*", default=[])
    args = ap.parse_args()

    ds_dir = os.path.join(args.root, "ds")
    if not os.path.isfile(os.path.join(ds_dir, "train", "offsets.npy")):
        gen_corpus(os.path.join(ds_dir, "train"), args.tokens)
    e = env(args)

    out_a = os.path.join(args.root, "leg_a")
    out_b = os.path.join(args.root, "leg_b")
    t0 = time.time()
    print("leg A: uninterrupted", flush=True)
    run_to_completion(base_cmd(args, ds_dir, out_a), e,
                      os.path.join(args.root, "leg_a.log"))
    print("leg B: kill mid-run", flush=True)
    run_and_kill(base_cmd(args, ds_dir, out_b), e,
                 os.path.join(args.root, "leg_b_killed.log"),
                 args.kill_after_step)
    print("leg B: resume (cont_training=true)", flush=True)
    run_to_completion(base_cmd(args, ds_dir, out_b) + ["cont_training=true"],
                      e, os.path.join(args.root, "leg_b_resume.log"))

    a, b = loss_stream(out_a), loss_stream(out_b)
    assert set(a) == set(b), f"logged steps differ: {sorted(set(a) ^ set(b))}"
    diffs = {s: abs(a[s] - b[s]) for s in a}
    max_diff = max(diffs.values())
    bad = {s: d for s, d in diffs.items() if d != 0.0}
    print(json.dumps({"steps_compared": len(a),
                      "max_loss_diff": max_diff,
                      "bitwise_equal": not bad,
                      "wall_s": round(time.time() - t0)}))
    assert not bad, f"loss streams diverge after resume: {bad}"

    # packing-strategy guard: resuming under a different strategy must refuse
    r = subprocess.run(
        base_cmd(args, ds_dir, out_b) +
        ["cont_training=true", "data.packing_strategy=greedy"],
        env=e, capture_output=True, text=True)
    assert r.returncode != 0 and "packing" in (r.stdout + r.stderr).lower(), \
        "packing-strategy resume guard did not refuse"
    print("packing-strategy guard refused the mismatched resume: OK")


if __name__ == "__main__":
    main()

"""Stall-detecting supervisor for long training runs (SURVEY.md §5.3).

On remote/tunnel device backends an RPC can wedge silently mid-step: the
training process keeps running but stops making progress and never raises
(observed on the v5e HTTP tunnel: a 1.4B-token run froze mid-step with no
traceback; reference parity anchor: the reference's budget callbacks,
slamkit/trainer/callbacks.py, handle planned stops but nothing handles a
hung backend). This wraps any training command with:

  * stdout/stderr -> --log, stall = no log write for --stall-seconds;
  * on stall: SIGKILL the child's process GROUP (the child is launched in
    its own session — nothing else can match), then relaunch;
  * relaunches append `cont_training=true` once a checkpoint exists in the
    run's output_dir, so every restart resumes from the newest COMPLETE
    checkpoint (trainer/checkpoint.py latest_checkpoint skips dirs from a
    kill mid-save);
  * a clean child exit (rc 0) ends supervision; nonzero exits count
    against --max-restarts too (crash loops should not spin forever).

Usage:
  python scripts/supervise_train.py --log /tmp/run.log --stall-seconds 900 \
      -- python cli/train.py model=slam ... training_args.output_dir=/tmp/out
"""
import argparse
import os
import signal
import subprocess
import sys
import time


def _output_dir(cmd):
    for a in cmd:
        if a.lstrip("+").startswith("training_args.output_dir="):
            return a.split("=", 1)[1]
    return None


_CKPT_MOD = None


def _ckpt_module():
    """Load trainer/checkpoint.py STANDALONE (no package import): the
    watchdog must not pull the trainer package (jax, transformers, ...)
    just to check a directory; checkpoint.py keeps its heavy imports
    function-local for exactly this."""
    global _CKPT_MOD
    if _CKPT_MOD is None:
        import importlib.util

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "slamkit_tpu", "trainer", "checkpoint.py")
        spec = importlib.util.spec_from_file_location("_slamkit_ckpt", path)
        _CKPT_MOD = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(_CKPT_MOD)
    return _CKPT_MOD


def _has_checkpoint(out_dir):
    if not out_dir or not os.path.isdir(out_dir):
        return False
    # the trainer's own discovery (skips incomplete dirs from a kill mid-save)
    return _ckpt_module().latest_checkpoint(out_dir) is not None


def supervise(cmd, log_path, stall_seconds, max_restarts, poll_seconds=None,
              resume_override="cont_training=true", out_dir=None):
    """Run `cmd` under stall supervision; returns the final child rc.

    poll_seconds defaults to stall_seconds/4 (tests shrink both).
    resume_override is appended on restarts once a checkpoint exists
    (pass None to relaunch the command unchanged). out_dir: where to look
    for checkpoints; defaults to the `[+[+]]training_args.output_dir=` CLI
    token — pass it explicitly when the run's output dir comes from a
    config file, or restarts can never resume."""
    poll = poll_seconds or max(stall_seconds / 4.0, 1.0)
    out_dir = out_dir or _output_dir(cmd)
    if resume_override and out_dir is None:
        with open(log_path, "ab", buffering=0) as logf:
            logf.write(b"[supervisor] WARNING: output_dir not found in the "
                       b"command and --output-dir not given -- restarts run "
                       b"WITHOUT resume and may retrain from step 0 over "
                       b"existing checkpoints\n")
    restarts = 0
    while True:
        run_cmd = list(cmd)
        if (restarts and resume_override and resume_override not in run_cmd
                and _has_checkpoint(out_dir)):
            run_cmd.append(resume_override)
        with open(log_path, "ab", buffering=0) as logf:
            logf.write(f"[supervisor] launch (attempt {restarts + 1}): "
                       f"{' '.join(run_cmd)}\n".encode())
            # own session: the stall kill targets exactly this process group
            child = subprocess.Popen(run_cmd, stdout=logf, stderr=logf,
                                     start_new_session=True)
            stalled = False
            while True:
                try:
                    rc = child.wait(timeout=poll)
                    break
                except subprocess.TimeoutExpired:
                    age = time.time() - os.stat(log_path).st_mtime
                    if age > stall_seconds:
                        logf.write(f"[supervisor] stall {age:.0f}s > "
                                   f"{stall_seconds}s; killing group "
                                   f"{child.pid}\n".encode())
                        os.killpg(child.pid, signal.SIGKILL)
                        rc = child.wait()
                        stalled = True
                        break
            logf.write(f"[supervisor] child exited rc={rc}"
                       f"{' (stall kill)' if stalled else ''}\n".encode())
        if rc == 0:
            return 0
        restarts += 1
        if restarts > max_restarts:
            return rc


def main():
    ap = argparse.ArgumentParser(
        usage="%(prog)s [options] -- <training command ...>")
    ap.add_argument("--log", required=True)
    ap.add_argument("--stall-seconds", type=float, default=900)
    ap.add_argument("--max-restarts", type=int, default=20)
    ap.add_argument("--output-dir", default=None,
                    help="checkpoint dir for resume detection, when the "
                         "run's output_dir is set via config file rather "
                         "than a training_args.output_dir= CLI token")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="training command after --")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd[:1] == ["--"] else args.cmd
    if not cmd:
        ap.error("no training command given (pass it after --)")
    sys.exit(supervise(cmd, args.log, args.stall_seconds, args.max_restarts,
                       out_dir=args.output_dir))


if __name__ == "__main__":
    main()

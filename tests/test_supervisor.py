"""scripts/supervise_train.py stall detection and resume-override logic —
pure-subprocess tests (no jax): a fake trainer hangs on attempt 1 and
finishes on attempt 2, proving kill + relaunch + cont_training appending."""
import pathlib
import subprocess
import sys
import textwrap

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT / "scripts"))

from supervise_train import _has_checkpoint, supervise  # noqa: E402


def fake_trainer(tmp_path):
    """Writes a script that logs, then hangs forever on the first attempt;
    on later attempts writes a checkpoint-ish dir and exits 0. Also records
    its argv so the test can assert the resume override arrived."""
    marker = tmp_path / "attempt"
    out_dir = tmp_path / "out"
    script = tmp_path / "fake_trainer.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys, time, pathlib
        marker = pathlib.Path({str(marker)!r})
        out = pathlib.Path({str(out_dir)!r})
        n = int(marker.read_text()) if marker.exists() else 0
        marker.write_text(str(n + 1))
        (out / "argv.txt").parent.mkdir(exist_ok=True)
        (out / "argv.txt").write_text(" ".join(sys.argv[1:]))
        print("step 1", flush=True)
        if n == 0:
            # simulate a complete checkpoint, then a wedged backend
            d = out / "checkpoint-5" / "state"
            d.mkdir(parents=True, exist_ok=True)
            (out / "checkpoint-5" / "trainer_state.json").write_text("{{}}")
            time.sleep(3600)
        print("resumed fine", flush=True)
    """))
    return script, out_dir, marker


def test_supervisor_kills_stall_and_resumes(tmp_path):
    script, out_dir, marker = fake_trainer(tmp_path)
    log = tmp_path / "run.log"
    cmd = [sys.executable, str(script),
           f"training_args.output_dir={out_dir}"]
    # python cold-start in this image is ~4s (site shim): the stall window
    # must comfortably cover interpreter startup
    rc = supervise(cmd, str(log), stall_seconds=10, max_restarts=3,
                   poll_seconds=1.0)
    assert rc == 0
    assert marker.read_text() == "2"  # exactly one restart
    # the relaunch appended the resume override (checkpoint existed by then)
    assert "cont_training=true" in (out_dir / "argv.txt").read_text()
    text = log.read_text()
    assert "stall" in text and "rc=0" in text


def test_supervisor_gives_up_after_max_restarts(tmp_path):
    script = tmp_path / "crash.py"
    script.write_text("import sys; print('boom', flush=True); sys.exit(3)")
    log = tmp_path / "run.log"
    rc = supervise([sys.executable, str(script)], str(log),
                   stall_seconds=30, max_restarts=2, poll_seconds=0.5)
    assert rc == 3
    assert log.read_text().count("launch") == 3  # initial + 2 restarts


def test_has_checkpoint_requires_complete_dir(tmp_path):
    assert not _has_checkpoint(str(tmp_path))
    d = tmp_path / "checkpoint-7"
    (d / "state").mkdir(parents=True)
    assert not _has_checkpoint(str(tmp_path))  # json missing: mid-save kill
    (d / "trainer_state.json").write_text("{}")
    assert _has_checkpoint(str(tmp_path))

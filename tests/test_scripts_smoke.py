"""Every scripts/*.py entry point must parse --help cleanly.

The chip queue runs these unattended against scarce hardware time; a
syntax error or broken import must fail CI, not the queue. --help exits
before any device/corpus work, so this is import + argparse coverage only.
"""
import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(glob.glob(os.path.join(REPO, "scripts", "*.py")))


@pytest.mark.parametrize("script", SCRIPTS,
                         ids=[os.path.basename(s) for s in SCRIPTS])
def test_script_help(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, script, "--help"], timeout=240,
                       capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 0, (script, r.stderr[-800:])


def test_finalize_flagship_syntax():
    r = subprocess.run(["bash", "-n",
                        os.path.join(REPO, "scripts", "finalize_flagship.sh")],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

"""REAL multihost validation: two jax.distributed processes (4 CPU devices
each) must produce bit-identical losses to one 8-device process, and the
collective orbax checkpoint must save cleanly (SURVEY.md §5.8)."""
import json
import os
import pathlib
import re
import subprocess
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent

WORKER = r'''
import os, sys, json
proc_id = int(sys.argv[1]); nprocs = int(sys.argv[2]); out_dir = sys.argv[3]
port = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={8 // nprocs}"
import jax
jax.config.update("jax_platforms", "cpu")
if nprocs > 1:
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nprocs,
                               process_id=proc_id)
sys.path.insert(0, %(repo)r)
import numpy as np
from slamkit_tpu.config import compose
from slamkit_tpu.data.dataset import TokenDataset
from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig
from slamkit_tpu.trainer import SLAMTrainer

rng = np.random.default_rng(0)
ds = TokenDataset.from_lists(
    [rng.integers(2, 64, size=rng.integers(8, 30)).tolist() for _ in range(64)])
model = UnitLM(UnitLMConfig(base_model_name="EleutherAI/pythia-14m",
                            vocab_size=64, twist_init=False,
                            torch_dtype="float32"), seed=0)
args = compose(%(cfg)r, "train", [
    f"training_args.output_dir={out_dir}",
    "training_args.per_device_train_batch_size=1",
    "training_args.max_steps=3", "training_args.logging_steps=1",
    "training_args.eval_strategy=no", "training_args.save_steps=0",
    "data.train_path=/dev/null", "data.val_path=/dev/null"]).training_args
tr = SLAMTrainer(model, args, ds, packing=True, context_len=32)
state = tr.train()
losses = [r["loss"] for r in state.log_history if "loss" in r]
print(f"LOSSES{proc_id}: {json.dumps(losses)}")
'''


def _run_worker(tmp_path, proc_id, nprocs, out_dir, port):
    script = tmp_path / f"worker_{nprocs}_{proc_id}.py"
    script.write_text(WORKER % {"repo": str(REPO_ROOT),
                                "cfg": str(REPO_ROOT / "config")})
    return subprocess.Popen(
        [sys.executable, str(script), str(proc_id), str(nprocs), out_dir, str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def _losses(output):
    m = re.search(r"LOSSES\d: (\[.*\])", output)
    assert m, f"no losses in worker output:\n{output[-2000:]}"
    return json.loads(m.group(1))


DPO_WORKER = r'''
import os, sys, json
proc_id = int(sys.argv[1]); nprocs = int(sys.argv[2]); out_dir = sys.argv[3]
port = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={8 // nprocs}"
import jax
jax.config.update("jax_platforms", "cpu")
if nprocs > 1:
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nprocs,
                               process_id=proc_id)
sys.path.insert(0, %(repo)r)
import numpy as np
from slamkit_tpu.config import compose
from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig
from slamkit_tpu.tokeniser.unit_tokeniser import UnitTokeniser
from slamkit_tpu.trainer.slam_dpo_trainer import SLAMDPOTrainer

unit_str = lambda ids: "".join(f"<Un{i}>" for i in ids)
tok = UnitTokeniser(load_fe=False, num_units=60)
rng = np.random.default_rng(3)
rows = [{"prompt": unit_str(rng.integers(0, 60, 5)),
         "chosen": unit_str([7, 8, 9]),
         "rejected": unit_str(rng.integers(20, 60, 4))} for _ in range(64)]
model = UnitLM(UnitLMConfig(base_model_name="EleutherAI/pythia-14m",
                            vocab_size=64, twist_init=False,
                            torch_dtype="float32"), seed=0)
args = compose(%(cfg)r, "preference_alignment_train", [
    "data.train_path=/dev/null", "data.val_path=/dev/null",
    f"training_args.output_dir={out_dir}",
    "training_args.per_device_train_batch_size=1",
    "training_args.max_steps=3", "training_args.logging_steps=1",
    "training_args.fsdp=true"]).training_args
tr = SLAMDPOTrainer(model, tok, args, rows)
state = tr.train()
losses = [round(r["loss"], 6) for r in state.log_history if "loss" in r]
print(f"LOSSES{proc_id}: {json.dumps(losses)}")
'''


@pytest.mark.slow
def test_two_process_dpo_equivalence(tmp_path):
    """DPO trainer under 2 jax.distributed processes + fsdp: bit-identical
    losses vs 1 process, collective checkpoint (no device_get of
    non-addressable shards), process-0-only artifacts (VERDICT r2 item 3)."""
    def worker(proc_id, nprocs, out_dir, port):
        script = tmp_path / f"dpo_worker_{nprocs}_{proc_id}.py"
        script.write_text(DPO_WORKER % {"repo": str(REPO_ROOT),
                                        "cfg": str(REPO_ROOT / "config")})
        return subprocess.Popen(
            [sys.executable, str(script), str(proc_id), str(nprocs), out_dir,
             str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

    p = worker(0, 1, str(tmp_path / "single"), 0)
    try:
        out, _ = p.communicate(timeout=420)
    finally:
        p.kill()
    assert p.returncode == 0, out[-2000:]
    single = _losses(out)

    port = 9550 + os.getpid() % 200
    workers = [worker(i, 2, str(tmp_path / "multi"), port) for i in range(2)]
    outs = []
    try:
        for w in workers:
            out, _ = w.communicate(timeout=420)
            outs.append(out)
    finally:
        for w in workers:
            w.kill()
    for w, out in zip(workers, outs):
        assert w.returncode == 0, out[-2000:]
    multi0, multi1 = map(_losses, outs)
    assert multi0 == multi1 == single
    assert (tmp_path / "multi" / "checkpoint-3" / "trainer_state.json").exists()


CP_WORKER = WORKER.replace(
    '"data.train_path=/dev/null", "data.val_path=/dev/null"]',
    '"data.train_path=/dev/null", "data.val_path=/dev/null",\n'
    '    "training_args.per_device_train_batch_size=2",\n'
    '    "training_args.mesh_shape=[4,2]",\n'
    '    "training_args.mesh_axes=[data,seq]"]')


@pytest.mark.slow
def test_two_process_context_parallel_equivalence(tmp_path):
    """Context parallelism across PROCESS boundaries: a (data=4, seq=2) mesh
    split over 2 jax.distributed processes must produce bit-identical losses
    to the same mesh in 1 process (the per-device (row, time) tile callback
    in _put_train_batch; VERDICT r4 weak #1 'single-process only')."""
    def worker(proc_id, nprocs, out_dir, port):
        script = tmp_path / f"cp_worker_{nprocs}_{proc_id}.py"
        script.write_text(CP_WORKER % {"repo": str(REPO_ROOT),
                                       "cfg": str(REPO_ROOT / "config")})
        return subprocess.Popen(
            [sys.executable, str(script), str(proc_id), str(nprocs), out_dir,
             str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

    p = worker(0, 1, str(tmp_path / "single"), 0)
    try:
        out, _ = p.communicate(timeout=420)
    finally:
        p.kill()
    assert p.returncode == 0, out[-2000:]
    single = _losses(out)

    port = 9350 + os.getpid() % 200
    workers = [worker(i, 2, str(tmp_path / "multi"), port) for i in range(2)]
    outs = []
    try:
        for w in workers:
            out, _ = w.communicate(timeout=420)
            outs.append(out)
    finally:
        for w in workers:
            w.kill()
    for w, out in zip(workers, outs):
        assert w.returncode == 0, out[-2000:]
    multi0, multi1 = map(_losses, outs)
    assert multi0 == multi1 == single


@pytest.mark.slow
def test_two_process_equivalence(tmp_path):
    p = _run_worker(tmp_path, 0, 1, str(tmp_path / "single"), 0)
    try:
        out, _ = p.communicate(timeout=420)
    finally:
        p.kill()
    assert p.returncode == 0, out[-2000:]
    single = _losses(out)

    port = 9750 + os.getpid() % 200
    workers = [_run_worker(tmp_path, i, 2, str(tmp_path / "multi"), port)
               for i in range(2)]
    outs = []
    try:
        for w in workers:
            out, _ = w.communicate(timeout=420)
            outs.append(out)
    finally:  # never leak a worker holding the coordinator port
        for w in workers:
            w.kill()
    for w, out in zip(workers, outs):
        assert w.returncode == 0, out[-2000:]
    multi0, multi1 = map(_losses, outs)

    assert multi0 == multi1 == single
    # the collective checkpoint landed in the SHARED dir
    assert (tmp_path / "multi" / "checkpoint-3" / "trainer_state.json").exists()

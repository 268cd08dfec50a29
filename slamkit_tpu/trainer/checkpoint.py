"""Shared checkpoint machinery for SLAMTrainer / SLAMDPOTrainer
(SURVEY.md §5.4): collective orbax save/restore of possibly-sharded train
state, process-0-only host artifacts, save_total_limit rotation, latest-dir
discovery. Trainer-specific payloads (data_pos, packing guard, DPO fields)
stay in the trainers — only the layout and the multihost hardening live
here, so a fix applies to both."""
from __future__ import annotations

import json
import logging
import os
import shutil
from typing import Optional

import jax

logger = logging.getLogger(__name__)

CKPT_PREFIX = "checkpoint-"


def ckpt_dir(output_dir: str, step: int) -> str:
    return os.path.join(output_dir, f"{CKPT_PREFIX}{step}")


def _step_of(dirname: str) -> Optional[int]:
    if dirname.startswith(CKPT_PREFIX) and dirname[len(CKPT_PREFIX):].isdigit():
        return int(dirname[len(CKPT_PREFIX):])
    return None


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Newest checkpoint dir that actually carries an orbax state payload."""
    if not os.path.isdir(output_dir):
        return None
    cands = [(s, d) for d in os.listdir(output_dir)
             if (s := _step_of(d)) is not None
             and os.path.isdir(os.path.join(output_dir, d, "state"))]
    return os.path.join(output_dir, max(cands)[1]) if cands else None


def rotate_checkpoints(output_dir: str, limit: Optional[int]):
    if not limit:
        return
    steps = sorted(s for d in os.listdir(output_dir)
                   if (s := _step_of(d)) is not None)
    for step in steps[:-limit]:
        shutil.rmtree(ckpt_dir(output_dir, step), ignore_errors=True)


def collective_save(path: str, train_state, proc: int, n_procs: int,
                    sync_tag: str = "ckpt_clean"):
    """Orbax save with multihost hardening: proc-0 clears a stale dir, all
    processes sync past the cleanup, then EVERY process participates in the
    save, passing the (possibly fsdp-sharded) device arrays directly — no
    device_get of shards a process cannot address."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if proc == 0 and os.path.isdir(path):
        shutil.rmtree(path)
    if n_procs > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(sync_tag)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), train_state)
    ckptr.wait_until_finished()


def collective_restore(path: str, train_state):
    """Restore onto the mesh via an abstract shape/dtype/sharding template —
    works for replicated AND fsdp-sharded multihost state."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    template = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        train_state)
    return ckptr.restore(os.path.abspath(os.path.join(path, "state")),
                         target=template)


def save_host_artifacts(path: str, trainer_json: dict, model, train_state):
    """Process-0-only: trainer_state.json + best-effort HF-style export
    (impossible for non-addressable multihost shards — logged, not fatal)."""
    with open(os.path.join(path, "trainer_state.json"), "w") as f:
        json.dump(trainer_json, f)
    try:
        model.params = jax.device_get(train_state["params"])
        model.save_pretrained(path)
    except Exception as e:  # noqa: BLE001 — any backend gather error
        logger.warning("skipping model export (non-addressable shards?): %s", e)

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

# jax is imported INSIDE the functions that need it: latest_checkpoint /
# rotate_checkpoints are pure path logic consumed by light watchdog
# processes (scripts/supervise_train.py loads this file standalone), which
# must not pay a jax import to check a directory.

logger = logging.getLogger(__name__)

CKPT_PREFIX = "checkpoint-"


def ckpt_dir(output_dir: str, step: int) -> str:
    return os.path.join(output_dir, f"{CKPT_PREFIX}{step}")


def _step_of(dirname: str) -> Optional[int]:
    if dirname.startswith(CKPT_PREFIX) and dirname[len(CKPT_PREFIX):].isdigit():
        return int(dirname[len(CKPT_PREFIX):])
    return None


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Newest COMPLETE checkpoint dir: the orbax state payload (renamed into
    place atomically) AND the trainer_state.json written after it. A run
    killed between the two leaves a state-only dir — resume must skip it."""
    if not os.path.isdir(output_dir):
        return None
    cands = [(s, d) for d in os.listdir(output_dir)
             if (s := _step_of(d)) is not None
             and os.path.isdir(os.path.join(output_dir, d, "state"))
             and os.path.isfile(os.path.join(output_dir, d, "trainer_state.json"))]
    return os.path.join(output_dir, max(cands)[1]) if cands else None


def rotate_checkpoints(output_dir: str, limit: Optional[int]):
    if not limit:
        return
    steps = sorted(s for d in os.listdir(output_dir)
                   if (s := _step_of(d)) is not None)
    for step in steps[:-limit]:
        shutil.rmtree(ckpt_dir(output_dir, step), ignore_errors=True)


def snapshot_device(train_state):
    """Device-side copy of a (possibly sharded) train-state pytree.

    Both trainers donate the state through their jitted step, so a
    background save cannot serialize the live buffers — the next step
    invalidates them. The copy is dispatched on the device stream BEFORE
    the next step (caller runs on the dispatch thread), costs one HBM
    round-trip (~ms for the 360M recipe's 2.9GB state), and preserves
    each leaf's sharding."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.copy, train_state)


class AsyncSaver:
    """One-slot background checkpoint writer.

    On tunnel backends the blocking part of an orbax save is a full
    device->host pull of the state (~126s for the 360M recipe at the
    tunnel's ~30MB/s) — in-loop, that is 4-8% of step time at the Slam
    recipe's save cadence. The async pipeline keeps only the device-side
    snapshot in the loop and runs serialize + host artifacts + rotation on
    a worker thread, overlapping the pull with device compute.

    One slot: submitting (or any `wait()` call — restore and train-end
    join through it) first drains the previous save, so at most one save
    is in flight, writes land in order, and a failed save surfaces at the
    next checkpoint boundary instead of being lost."""

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(1, thread_name_prefix="ckpt-save")
        self._inflight = None

    def wait(self):
        if self._inflight is not None:
            fut, self._inflight = self._inflight, None
            fut.result()

    def submit(self, fn):
        self.wait()
        self._inflight = self._pool.submit(fn)


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
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    template = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        train_state)
    return ckptr.restore(os.path.abspath(os.path.join(path, "state")),
                         target=template)


def async_allowed(requested: bool, n_procs: int) -> bool:
    """Async saves issue their collectives (the cleanup barrier + the orbax
    gather) from a worker thread; with >1 process the point where they
    interleave with the main thread's train-step collectives becomes
    scheduling-dependent PER PROCESS, and JAX multi-controller requires the
    identical collective order everywhere — a mismatch deadlocks the fleet.
    Force the synchronous path on multihost."""
    if requested and n_procs > 1:
        logger.warning("async_save disabled on multihost (%d processes): "
                       "background collectives cannot guarantee identical "
                       "issue order across processes", n_procs)
        return False
    return requested


def save_host_artifacts(path: str, trainer_json: dict, model, train_state):
    """Process-0-only: trainer_state.json + best-effort HF-style export
    (impossible for non-addressable multihost shards — logged, not fatal).

    trainer_state.json is the completeness marker `latest_checkpoint` keys
    on, so it must be the LAST artifact and appear atomically: a kill at
    any instant leaves either a dir without the marker (skipped on resume)
    or a fully-written checkpoint — never a truncated json, and never a
    marker pointing at a half-written weights export. Runs on the async
    saver thread; must NOT touch shared trainer/model state (the snapshot
    params are passed to the export explicitly instead of mutating the
    live model)."""
    import jax

    try:
        model.save_pretrained(path, params=jax.device_get(train_state["params"]))
    except Exception as e:  # noqa: BLE001 — any backend gather error
        logger.warning("skipping model export (non-addressable shards?): %s", e)
    tmp = os.path.join(path, ".trainer_state.json.tmp")
    with open(tmp, "w") as f:
        json.dump(trainer_json, f)
    os.replace(tmp, os.path.join(path, "trainer_state.json"))

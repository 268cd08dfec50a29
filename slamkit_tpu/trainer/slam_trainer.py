"""SLAMTrainer — the TPU-native training loop.

Replaces the reference's HF Trainer subclass + accelerate/DDP stack
(reference slamkit/trainer/slam_trainer.py:20-71) with a jitted, mesh-sharded
train step:

  * one `jax.jit` step over a Mesh('data'[, 'model']) — batches sharded over
    'data', params replicated or fsdp-sharded (ZeRO-3) via NamedSharding;
    gradient reduction is XLA's problem (psum over ICI), not a NCCL call.
  * gradient accumulation as a `lax.scan` over stacked microbatches inside
    the step — grads summed in-carry (activation memory freed per micro),
    loss normalized by the GLOBAL valid-token count exactly like the
    reference's `num_items_in_batch` contract (reference unit_lm.py:24-28).
  * `num_input_tokens_seen` counted on-device in the configured id range
    (reference slam_trainer.py:59-71, min/max_token_id_count) — the global
    sum is free under jit (the array is already global), no explicit gather.
  * budget stops, eval, checkpoint/resume via orbax, save_total_limit.
"""
from __future__ import annotations

import json
import logging
import os
import shutil
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data.dataset import Batcher, TokenDataset
from ..parallel.mesh import (make_mesh, param_shardings, replicated,
                             seq_axis_size)
from .callbacks import TrainerCallback, TrainerControl, TrainerState
from .optim import make_optimizer

logger = logging.getLogger(__name__)

from . import checkpoint

CKPT_PREFIX = checkpoint.CKPT_PREFIX  # re-export (existing import sites)


def _stack_microbatches(batches: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


class SLAMTrainer:
    """Train a UnitLM over TokenDatasets.

    args is the composed `training_args` config node (the reference passes HF
    TrainingArguments; the surface is preserved — SURVEY.md §5.6)."""

    def __init__(self, model, args, train_dataset: TokenDataset,
                 eval_dataset: Optional[TokenDataset] = None,
                 callbacks: Optional[List[TrainerCallback]] = None,
                 packing: bool = False, context_len: Optional[int] = None,
                 log_fn=None, mesh=None, packing_strategy: str = "bestfit"):
        self.model = model
        self.args = args
        self.callbacks = callbacks or []
        self.log_fn = log_fn
        self.mesh = mesh or make_mesh(args.get("mesh_shape", None),
                                      args.get("mesh_axes", None))
        self.accum = int(args.get("gradient_accumulation_steps", 1) or 1)
        n_data = self.mesh.shape["data"]
        self.global_batch = int(args.per_device_train_batch_size) * n_data
        self.context_len = int(context_len or model.decoder.max_position_embeddings)
        self.state = TrainerState()
        self.control = TrainerControl()
        self._data_pos = (0, 0)  # (epoch, microbatches consumed in epoch)
        # (epoch, index) of every microbatch consumed from the stream but not
        # yet stepped; entries carry their OWN epoch so a checkpoint saved
        # right after an epoch roll still resumes at the oldest un-stepped
        # microbatch of the PREVIOUS epoch instead of flooring at (e+1, 0)
        from collections import deque

        self._pending_positions = deque()

        # every process iterates the IDENTICAL global batch stream (shuffle is
        # seed-deterministic); each keeps only its own row shard at device_put
        # time (slicing the stream by process index would double-shard with
        # the 'data'-axis batch sharding and silently drop (P-1)/P of the data)
        self._n_procs = jax.process_count()
        self._proc = jax.process_index()
        # background checkpoint pipeline (trainer/checkpoint.py): in-loop
        # save cost becomes a device-side snapshot; async_save=false keeps
        # the fully synchronous path
        self._async_save = checkpoint.async_allowed(
            bool(args.get("async_save", True)), self._n_procs)
        self._saver = checkpoint.AsyncSaver()
        self.train_batcher = Batcher(
            train_dataset, self.global_batch, self.context_len,
            pad_id=model.config.pad_token_id, packing=packing,
            shuffle=True, seed=int(args.get("seed", 0)),
            packing_strategy=packing_strategy)
        self.eval_batcher = None
        if eval_dataset is not None and len(eval_dataset):
            self.eval_batcher = Batcher(
                eval_dataset,
                int(args.get("per_device_eval_batch_size",
                             args.per_device_train_batch_size)) * n_data,
                self.context_len, pad_id=model.config.pad_token_id,
                packing=packing, shuffle=False,
                packing_strategy=packing_strategy)

        # -- steps accounting ------------------------------------------------
        max_steps = int(args.get("max_steps", -1) or -1)
        if max_steps > 0:
            # avoid the exact packed-batch dry pass (O(corpus)) when the step
            # budget is explicit; estimate steps/epoch from the token count
            if packing:
                est = max(train_dataset.num_tokens
                          // (self.global_batch * self.context_len), 1)
            else:
                est = max((len(train_dataset) + self.global_batch - 1)
                          // self.global_batch, 1)
            self.steps_per_epoch = max(est // self.accum, 1)
            self.total_steps = max_steps
        else:
            batches_per_epoch = self.train_batcher.batches_per_epoch()
            self.steps_per_epoch = max(batches_per_epoch // self.accum, 1)
            epochs = float(args.get("num_train_epochs", 1))
            self.total_steps = max(int(epochs * self.steps_per_epoch), 1)
        self.state.max_steps = self.total_steps

        # -- optimizer + jitted step ------------------------------------------
        self.tx, self.schedule = make_optimizer(args, self.total_steps)
        self._build_step()

    # ------------------------------------------------------------------ #
    # jitted compute
    # ------------------------------------------------------------------ #
    def _build_step(self):
        mesh = self.mesh
        model, tx = self.model, self.tx
        min_id = self.args.get("min_token_id_count", None)
        max_id = self.args.get("max_token_id_count", None)

        def count_tokens(labels):
            valid = labels != -100
            if min_id is not None:
                valid &= labels >= min_id
            if max_id is not None:
                valid &= labels <= max_id
            return valid.sum()

        uses_dropout = bool(getattr(model, "uses_dropout", False))

        def step_fn(state, batch):
            # the GLOBAL valid-token count, computed on-device (a host-side
            # scalar would disagree across processes in multihost runs)
            num_items = (batch["labels"] != -100).sum()
            micro = {k: batch[k] for k in
                     ("input_ids", "labels", "segment_ids", "positions")}

            def one(params, mb, sub=None):
                # cp_mesh/cp_zigzag are assigned later in _build_step
                # (late-bound closure; tracing happens after _build_step
                # returns)
                if cp_zigzag:
                    mb = zz_transform(mb)
                return model.loss_fn(params,
                                     {**mb, "num_items_in_batch": num_items},
                                     dropout_rng=sub, cp_mesh=cp_mesh,
                                     cp_schedule=cp_schedule,
                                     pre_shifted=cp_zigzag)

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state["params"])
            if uses_dropout:
                # a per-microbatch dropout key, threaded through the scan;
                # the post-step key lives in train_state so checkpoints
                # resume the exact mask stream
                def body(carry, mb):
                    loss_acc, grad_acc, rng = carry
                    rng, sub = jax.random.split(rng)
                    loss, grads = jax.value_and_grad(one)(state["params"], mb, sub)
                    return (loss_acc + loss,
                            jax.tree_util.tree_map(jnp.add, grad_acc, grads),
                            rng), None

                (loss, grads, new_rng), _ = jax.lax.scan(
                    body, (jnp.float32(0.0), zeros, state["rng"]), micro)
            else:
                def body(carry, mb):
                    loss_acc, grad_acc = carry
                    loss, grads = jax.value_and_grad(one)(state["params"], mb)
                    return (loss_acc + loss,
                            jax.tree_util.tree_map(jnp.add, grad_acc, grads)), None

                (loss, grads), _ = jax.lax.scan(
                    body, (jnp.float32(0.0), zeros), micro)
            import optax

            updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            # ONE stacked f32 metrics array -> ONE host pull per step (each
            # pull is a full RTT on remote/tunnel backends); per-step token
            # counts are far below f32's 2^24 exact-integer range
            metrics = jnp.stack(
                [loss, count_tokens(batch["labels"]).astype(jnp.float32)])
            new_state = {"params": new_params, "opt_state": new_opt}
            if uses_dropout:
                new_state["rng"] = new_rng
            return new_state, metrics

        # eval: sum NLL + valid count per batch (host accumulates)
        def eval_step(params, batch):
            from ..models.transformer import forward
            from ..utils.calculation_utils import token_nll
            if cp_zigzag:
                batch = zz_transform(batch)
            logits, _ = forward(params, model.decoder, batch["input_ids"],
                                positions=batch["positions"],
                                segment_ids=batch["segment_ids"],
                                cp_mesh=cp_mesh, cp_schedule=cp_schedule)
            labels = batch["labels"]
            if cp_zigzag:   # labels already carry next-token targets
                shift_logits, shift_labels = logits, labels
            else:
                shift_logits = logits[..., :-1, :]
                shift_labels = labels[..., 1:]
            valid = shift_labels != -100
            nll = token_nll(shift_logits, shift_labels) * valid
            return nll.sum(), valid.sum()

        fsdp = bool(self.args.get("fsdp", False))
        # context parallelism (SURVEY §2.8 stretch goal): a 'seq' mesh axis
        # shards the TIME dim of every batch array. On the flash path the
        # kernel itself runs sequence-sharded (ring attention,
        # ops/ring_attention.py: ppermute k/v rotation + LSE merge); on the
        # XLA path GSPMD inserts the attention k/v all-gathers instead.
        n_seq = seq_axis_size(self.mesh)
        cp_mesh = None
        cp_schedule = str(self.args.get("cp_schedule", "contiguous")
                          or "contiguous")
        if n_seq > 1:
            from ..models.transformer import _use_flash
            if self.context_len % n_seq != 0:
                raise ValueError(f"context_len {self.context_len} not "
                                 f"divisible by seq axis {n_seq}")
            if _use_flash(model.decoder):
                align = 256 if cp_schedule == "zigzag" else 128
                if (self.context_len // n_seq) % align != 0:
                    raise ValueError(
                        f"ring-attention context parallelism needs "
                        f"lane-aligned chunks: context_len "
                        f"{self.context_len} / seq axis {n_seq} = "
                        f"{self.context_len // n_seq} (must be a multiple "
                        f"of {align} for cp_schedule={cp_schedule}); use "
                        f"the XLA path "
                        f"(model.config_args.attn_implementation=xla) for "
                        f"smaller chunks")
                cp_mesh = self.mesh
            elif cp_schedule != "contiguous":
                raise ValueError("cp_schedule=zigzag needs the flash "
                                 "attention path (ring attention); the XLA "
                                 "CP path has no ring schedule")
        cp_zigzag = cp_mesh is not None and cp_schedule == "zigzag"
        if cp_zigzag:
            from ..ops.ring_attention import zigzag_permutation

            zz_idx = jnp.asarray(zigzag_permutation(self.context_len, n_seq))

            def zz_transform(mb):
                # pre-shift labels (next-token targets) BEFORE permuting —
                # adjacency does not survive the permutation — then permute
                # every per-token array so device r holds logical
                # half-chunks (r, 2n-1-r). num_items is computed from the
                # RAW labels upstream, keeping the stock normalization.
                lab = mb["labels"]
                lab = jnp.concatenate(
                    [lab[..., 1:], jnp.full_like(lab[..., :1], -100)], -1)
                mb = {**mb, "labels": lab}
                return {k: (jnp.take(v, zz_idx, axis=-1)
                            if k in ("input_ids", "labels", "segment_ids",
                                     "positions") else v)
                        for k, v in mb.items()}
            # multihost CP: _put_train_batch switches to a per-device tile
            # callback (every process already holds the identical global
            # batch), so a time-sharded global array needs no special map
        seq = ("seq",) if n_seq > 1 else ()
        tp = mesh.shape.get("model", 1) > 1
        if tp:
            # 2-D mesh: Megatron-style TP over 'model' (optionally + fsdp
            # over 'data' on the remaining dims) — VERDICT.md item 7
            from ..parallel.mesh import tp_shardings

            self._param_sh = tp_shardings(self.model.params, mesh, fsdp=fsdp)
        else:
            self._param_sh = param_shardings(self.model.params, mesh, fsdp=fsdp)
        rep = replicated(mesh)
        opt_state = self.tx.init(self.model.params)
        # moment pytrees mirror the params tree: match by path suffix (a
        # shape map would collapse same-shape params with different TP specs)
        from ..parallel.mesh import opt_state_shardings

        opt_sh = opt_state_shardings(opt_state, self.model.params,
                                     self._param_sh, mesh)
        self._state_sh = {"params": self._param_sh, "opt_state": opt_sh}
        init_state = {"params": self.model.params, "opt_state": opt_state}
        if uses_dropout:
            self._state_sh["rng"] = rep
            init_state["rng"] = jax.random.PRNGKey(
                int(self.args.get("seed", 0)))

        batch_sh = {k: NamedSharding(mesh, P(None, "data", *seq))
                    for k in ("input_ids", "labels", "segment_ids", "positions")}
        self._batch_sh = batch_sh
        self._train_step = jax.jit(step_fn, donate_argnums=(0,),
                                   in_shardings=(self._state_sh, batch_sh),
                                   out_shardings=(self._state_sh, None))
        self._eval_batch_keys = ("input_ids", "labels", "segment_ids",
                                 "positions")
        eval_batch_sh = {k: NamedSharding(mesh, P("data", *seq))
                         for k in self._eval_batch_keys}
        self._eval_step = jax.jit(eval_step,
                                  in_shardings=(self._param_sh, eval_batch_sh))
        self.train_state = jax.device_put(init_state, self._state_sh)

    # ------------------------------------------------------------------ #
    # checkpointing (SURVEY.md §5.4 — orbax + json trainer state)
    # ------------------------------------------------------------------ #
    def _ckpt_dir(self, step: int) -> str:
        return checkpoint.ckpt_dir(self.args.output_dir, step)

    def save_checkpoint(self):
        path = os.path.abspath(self._ckpt_dir(self.state.global_step))
        # host-side state captured NOW (the loop mutates it after we return);
        # resume replays from the oldest consumed-but-unstepped microbatch
        # (possibly last epoch)
        data_pos = (tuple(self._pending_positions[0])
                    if self._pending_positions else self._data_pos)
        trainer_json = {
            "global_step": self.state.global_step,
            "epoch": self.state.epoch,
            "data_pos": list(data_pos),
            # resume fast-forwards batch-by-batch through the SAME stream; a
            # different packing strategy would silently skip/duplicate data
            # (see load_checkpoint)
            "packing_strategy": (self.train_batcher.packing_strategy
                                 if self.train_batcher.packing else None),
            "num_input_tokens_seen": self.state.num_input_tokens_seen,
            "log_history": self.state.log_history[-50:]}
        self._saver.wait()  # one slot: drain the previous background save
        state_ref = (checkpoint.snapshot_device(self.train_state)
                     if self._async_save else self.train_state)
        proc, n_procs = self._proc, self._n_procs

        def _write():
            checkpoint.collective_save(path, state_ref, proc, n_procs)
            if proc == 0:
                checkpoint.save_host_artifacts(
                    path, trainer_json, self.model, state_ref)
                checkpoint.rotate_checkpoints(
                    self.args.output_dir, self.args.get("save_total_limit", None))
            logger.info("Saved checkpoint %s", path)

        if self._async_save:
            self._saver.submit(_write)
        else:
            _write()

    def _latest_checkpoint(self) -> Optional[str]:
        return checkpoint.latest_checkpoint(self.args.output_dir)

    def load_checkpoint(self, path: str):
        self._saver.wait()  # never restore past an in-flight save
        self.train_state = checkpoint.collective_restore(path, self.train_state)
        with open(os.path.join(path, "trainer_state.json")) as f:
            st = json.load(f)
        self.state.global_step = st["global_step"]
        self.state.epoch = st["epoch"]
        self.state.num_input_tokens_seen = st["num_input_tokens_seen"]
        self.state.log_history = st.get("log_history", [])
        saved_strategy = st.get("packing_strategy")
        if (saved_strategy is not None and self.train_batcher.packing
                and saved_strategy != self.train_batcher.packing_strategy):
            raise ValueError(
                f"Checkpoint was trained with packing_strategy="
                f"{saved_strategy!r} but this run uses "
                f"{self.train_batcher.packing_strategy!r}: the resume "
                f"fast-forward would replay a DIFFERENT batch stream "
                f"(skipped/duplicated data). Set "
                f"data.packing_strategy={saved_strategy} to continue this run.")
        if "data_pos" in st:
            self._data_pos = tuple(st["data_pos"])
        else:  # legacy checkpoints: derive (exact in pad mode)
            epoch = int(self.state.epoch)
            self._data_pos = (epoch, max(self.state.global_step
                                         - epoch * self.steps_per_epoch, 0) * self.accum)
        logger.info("Resumed from %s at step %d", path, self.state.global_step)

    # ------------------------------------------------------------------ #
    # loops
    # ------------------------------------------------------------------ #
    def evaluate(self) -> Dict[str, float]:
        if self.eval_batcher is None:
            return {}
        from ..parallel.mesh import shard_batch

        # accumulate ON DEVICE: a float() pull per batch would serialize host
        # transfers with compute (expensive on remote/tunnel backends)
        total_nll, total_tokens = jnp.float32(0.0), jnp.int32(0)
        for batch in self.eval_batcher.epoch(0):
            # tensor keys only: the Batcher's host-side num_items_in_batch
            # stat is never a step input (steps recompute the count
            # on-device; test_dataset gates the two definitions agree)
            batch = {k: batch[k] for k in self._eval_batch_keys}
            batch = shard_batch(batch, self.mesh)
            nll, n = self._eval_step(self.train_state["params"], batch)
            total_nll = total_nll + nll
            total_tokens = total_tokens + n
        loss = float(total_nll) / max(int(total_tokens), 1)
        metrics = {"eval_loss": loss, "eval_ppl": float(np.exp(min(loss, 30.0)))}
        self._log({**metrics, "step": self.state.global_step})
        return metrics

    def _put_train_batch(self, stacked: Dict[str, np.ndarray]):
        """Place a [A, B_global, T] host batch on the mesh. Multihost: every
        process holds the identical global batch; each contributes only its
        addressable row shard — or, under context parallelism (time sharded
        too), each device slices its own (row, time) tile from the global
        batch via make_array_from_callback."""
        stacked = {k: stacked[k] for k in self._batch_sh}
        if self._n_procs == 1:
            return jax.device_put(stacked, self._batch_sh)
        if any(len(sh.spec) > 2 and sh.spec[2] is not None
               for sh in self._batch_sh.values()):
            return {k: jax.make_array_from_callback(
                        v.shape, self._batch_sh[k],
                        lambda idx, v=v: v[idx])
                    for k, v in stacked.items()}
        rows = stacked["input_ids"].shape[1] // self._n_procs
        lo = self._proc * rows
        return {
            k: jax.make_array_from_process_local_data(
                self._batch_sh[k], v[:, lo:lo + rows], v.shape)
            for k, v in stacked.items()
        }


    def _log(self, record: dict):
        self.state.log_history.append(record)
        logger.info("%s", record)
        if self.log_fn is not None:
            self.log_fn(record)

    def train(self, resume_from_checkpoint=False):
        args, state, control = self.args, self.state, self.control
        if resume_from_checkpoint:
            path = (resume_from_checkpoint if isinstance(resume_from_checkpoint, str)
                    else self._latest_checkpoint())
            if not path:
                # HF Trainer parity: never silently restart from scratch
                raise ValueError(
                    f"No valid checkpoint found in {args.output_dir} "
                    f"(resume_from_checkpoint was requested)")
            self.load_checkpoint(path)

        for cb in self.callbacks:
            cb.on_train_begin(args, state, control)

        logging_steps = int(args.get("logging_steps", 50) or 50)
        save_steps = int(args.get("save_steps", 0) or 0)
        eval_steps = int(args.get("eval_steps", 0) or 0)
        do_eval = args.get("eval_strategy", "no") == "steps" and self.eval_batcher
        # profiling hook (SURVEY.md §5.1): capture a jax.profiler trace of
        # steps [profile_start, profile_start + profile_steps) into output_dir
        profile_steps = int(args.get("profile_steps", 0) or 0)
        profile_start = int(args.get("profile_start", 3) or 3)
        profiling = False

        # Catch-up due-step schedule: fire when the processed step REACHES the
        # next due multiple rather than testing `step % interval == 0`.
        # Equivalent in the normal case, but if a step ever slips past its
        # multiple unprocessed (observed once on the flaky tunnel backend:
        # a 1000-step interval lost a save and with it 1000+ steps of resume
        # progress), the action fires at the next processed step instead of a
        # full interval later.
        def _next_due(step: int, interval: int) -> int:
            return (step // interval + 1) * interval if interval else 0

        save_due = _next_due(state.global_step, save_steps)
        eval_due = _next_due(state.global_step, eval_steps)

        window_loss, window_t0, window_tokens = [], time.time(), 0
        # exact data-stream position, tracked explicitly (steps_per_epoch may
        # be an estimate under packing) and saved in every checkpoint
        epoch, skip = self._data_pos

        # pending accumulates ACROSS epochs: a corpus smaller than one
        # accumulation group still makes progress instead of spinning forever
        pending: List[dict] = []
        last_eval_step = last_save_step = -1
        # Pipelined loop (on remote/tunnel backends every host<->device
        # round-trip is a full RTT, which serialized the round-1 loop):
        #   * batch UPLOAD runs in a worker thread: group N+1 uploads while
        #     the device computes group N (`staged` holds the upload future);
        #   * the metrics PULL runs in a second worker thread with lag 1:
        #     step N's (loss, tokens) array is fetched while step N+1 runs.
        # Scheduled eval/save steps are static, so we drain before
        # dispatching past them; budget callbacks may observe their
        # threshold one step late (<=1 extra step on a 17k-step run).
        # Un-stepped staged groups stay in _pending_positions, so checkpoint
        # data_pos replays them on resume.
        inflight: Optional[tuple] = None  # (step_no, metrics future)

        def process(entry):
            nonlocal last_eval_step, last_save_step, save_due, eval_due
            nonlocal window_loss, window_t0, window_tokens
            step_no, metrics_fut = entry
            metrics = metrics_fut.result()
            loss = float(metrics[0])
            tokens = int(metrics[1])
            state.num_input_tokens_seen += tokens
            window_loss.append(loss)
            window_tokens += tokens
            if step_no % logging_steps == 0:
                dt = time.time() - window_t0
                self._log({
                    "loss": float(np.mean(window_loss)),
                    "learning_rate": float(self.schedule(step_no)),
                    "num_input_tokens_seen": state.num_input_tokens_seen,
                    "tokens_per_sec": window_tokens / max(dt, 1e-9),
                    "epoch": round(step_no / self.steps_per_epoch, 4),
                    "step": step_no,
                })
                window_loss, window_t0, window_tokens = [], time.time(), 0
            for cb in self.callbacks:
                cb.on_step_end(args, state, control)
            if do_eval and eval_steps and step_no >= eval_due:
                control.should_evaluate = True
                eval_due = _next_due(step_no, eval_steps)
            if save_steps and step_no >= save_due:
                control.should_save = True
                save_due = _next_due(step_no, save_steps)
            if control.should_evaluate:
                control.should_evaluate = False
                self.evaluate()
                last_eval_step = state.global_step
            if control.should_save:
                control.should_save = False
                self.save_checkpoint()
                last_save_step = state.global_step

        def is_sync_step(step_no: int) -> bool:
            return bool(
                (save_steps and step_no >= save_due)
                or (do_eval and eval_steps and step_no >= eval_due))

        from concurrent.futures import ThreadPoolExecutor

        put_pool = ThreadPoolExecutor(1, thread_name_prefix="batch-upload")
        pull_pool = ThreadPoolExecutor(1, thread_name_prefix="metrics-pull")
        staged: Optional[tuple] = None  # upload future of a consumed group

        def dispatch_staged():
            nonlocal staged, inflight, profiling
            # drain BEFORE dispatching past a scheduled eval/save step so
            # checkpoints snapshot exactly that step's train_state
            if inflight is not None and is_sync_step(inflight[0]):
                process(inflight)
                inflight = None
                if control.should_training_stop:
                    return
            dev_batch = staged.result()
            staged = None
            for _ in range(self.accum):  # the staged group is the oldest
                self._pending_positions.popleft()
            if profile_steps and state.global_step == profile_start and not profiling:
                jax.profiler.start_trace(
                    os.path.join(args.output_dir, "profile"))
                profiling = True
            self.train_state, metrics = self._train_step(self.train_state, dev_batch)
            if profiling and state.global_step >= profile_start + profile_steps - 1:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                profiling = False
                logger.info("Saved profiler trace to %s/profile", args.output_dir)
            state.global_step += 1
            state.epoch = state.global_step / self.steps_per_epoch
            if inflight is not None:
                process(inflight)
            inflight = (state.global_step, pull_pool.submit(np.asarray, metrics))

        try:
            while state.global_step < self.total_steps and not control.should_training_stop:
                yielded = 0
                for batch in self.train_batcher.epoch(epoch, skip_batches=skip):
                    yielded += 1
                    pending.append(batch)
                    self._pending_positions.append((epoch, self._data_pos[1]))
                    self._data_pos = (epoch, self._data_pos[1] + 1)
                    if len(pending) < self.accum:
                        continue
                    stacked = _stack_microbatches(pending)
                    pending = []
                    # start this group's upload FIRST, then step the previous
                    # group: the upload overlaps device compute
                    fut = put_pool.submit(self._put_train_batch, stacked)
                    if staged is not None:
                        dispatch_staged()
                    staged = fut
                    if control.should_training_stop or state.global_step >= self.total_steps:
                        break
                else:  # epoch exhausted (no break): roll to the next epoch
                    if yielded == 0 and not pending and skip == 0:
                        # (skip > 0 just means we resumed at an epoch boundary)
                        raise RuntimeError(
                            "training dataset produced no batches (empty after "
                            "filters?) — cannot make progress")
                    epoch += 1
                    skip = 0
                    self._data_pos = (epoch, 0)
                    continue
                break
            # flush the last staged group (data exhausted right after assembly)
            while staged is not None and not control.should_training_stop \
                    and state.global_step < self.total_steps:
                dispatch_staged()
            staged = None
            if inflight is not None:
                process(inflight)
                inflight = None
            put_pool.shutdown(wait=True)
            pull_pool.shutdown(wait=True)
        finally:
            # no-op on the clean path; on an exception this stops the worker
            # threads and drops the in-flight device_put instead of leaking them
            put_pool.shutdown(wait=False, cancel_futures=True)
            pull_pool.shutdown(wait=False, cancel_futures=True)

        # final evaluate + save (a budget-boxed run always ends usable) —
        # skipped when a budget-stop callback already did both at this step
        if do_eval and last_eval_step != state.global_step:
            self.evaluate()
        if last_save_step != state.global_step:
            self.save_checkpoint()
        self._saver.wait()  # train() returns only with the final save on disk
        for cb in self.callbacks:
            cb.on_train_end(args, state, control)
        try:  # fsdp multihost shards may not be host-addressable
            self.model.params = jax.device_get(self.train_state["params"])
        except Exception as e:
            logger.warning("leaving model params on device "
                           "(non-addressable shards?): %s", e)
        return state

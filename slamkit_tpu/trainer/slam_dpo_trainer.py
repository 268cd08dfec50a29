"""SLAMDPOTrainer — Direct Preference Optimization, TPU-native.

The reference delegates the DPO algorithm to trl.DPOTrainer and only
overrides tokenize_row (reference slamkit/trainer/slam_dpo_trainer.py:4-64).
Here the whole algorithm is implemented natively (trl is torch-only):

  loss = -log σ(β [(logπ(chosen) - logπ(rejected))
                  - (logref(chosen) - logref(rejected))])

with the frozen reference model = the initial policy params (trl's implicit
ref model). tokenize_row matches the reference byte-for-byte: prompt =
[bos] + ids (no specials), completions get a trailing eos, prompt truncates
from the LEFT, completions from the right (slam_dpo_trainer.py:40-55).

The jitted step runs both policy and reference forwards over a mesh-sharded
[2B, T] batch (chosen rows stacked over rejected rows) and reports the
standard DPO diagnostics (rewards/accuracies/margins).
"""
from __future__ import annotations

import logging
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.transformer import forward
from ..parallel.mesh import make_mesh, param_shardings, replicated
from ..utils.calculation_utils import token_nll
from .callbacks import TrainerControl, TrainerState
from .optim import make_optimizer

logger = logging.getLogger(__name__)


def tokenize_row(features: dict, processing_class, max_prompt_length: Optional[int],
                 max_completion_length: Optional[int], add_special_tokens: bool):
    """Reference SLAMDPOTrainer.tokenize_row (slam_dpo_trainer.py:6-64)."""
    tokenizer = processing_class

    def enc(x):
        ids = tokenizer(x, add_special_tokens=False)["input_ids"]
        return list(ids[0]) if ids and isinstance(ids[0], (list, np.ndarray)) else list(ids)

    prompt_input_ids = [tokenizer.bos_token_id] + enc(features["prompt"])
    chosen_input_ids = enc(features["chosen"])
    rejected_input_ids = enc(features["rejected"])
    if add_special_tokens and tokenizer.eos_token_id is not None:
        prompt_input_ids = prompt_input_ids + [tokenizer.eos_token_id]
    chosen_input_ids = chosen_input_ids + [tokenizer.eos_token_id]
    rejected_input_ids = rejected_input_ids + [tokenizer.eos_token_id]
    if max_prompt_length is not None:
        prompt_input_ids = prompt_input_ids[-max_prompt_length:]
    if max_completion_length is not None:
        chosen_input_ids = chosen_input_ids[:max_completion_length]
        rejected_input_ids = rejected_input_ids[:max_completion_length]
    return {"prompt_input_ids": prompt_input_ids,
            "chosen_input_ids": chosen_input_ids,
            "rejected_input_ids": rejected_input_ids}


class SLAMDPOTrainer:
    def __init__(self, model, tokenizer, args, train_dataset: List[dict],
                 eval_dataset: Optional[List[dict]] = None, callbacks=None,
                 mesh=None, log_fn=None):
        self.model = model
        self.tokenizer = tokenizer
        self.args = args
        self.callbacks = callbacks or []
        self.log_fn = log_fn
        self.mesh = mesh or make_mesh(args.get("mesh_shape", None),
                                      args.get("mesh_axes", None))
        if "seq" in self.mesh.axis_names and self.mesh.shape["seq"] > 1:
            raise NotImplementedError(
                "context parallelism ('seq' mesh axis) is a pretrain-trainer "
                "feature; DPO batches are short prompt+completion rows")
        self.beta = float(args.get("beta", 0.1))
        self.state = TrainerState()
        self.control = TrainerControl()
        # multihost: identical global batch stream on every process, row
        # shard kept at device-placement time (same single mechanism as
        # SLAMTrainer._put_train_batch)
        self._n_procs = jax.process_count()
        self._proc = jax.process_index()
        from . import checkpoint as _ckpt
        self._async_save = _ckpt.async_allowed(
            bool(args.get("async_save", True)), self._n_procs)
        self._saver = _ckpt.AsyncSaver()

        tok_kwargs = dict(
            processing_class=tokenizer.text_tokeniser
            if hasattr(tokenizer.text_tokeniser, "bos_token_id") else tokenizer,
            max_prompt_length=args.get("max_prompt_length", None),
            max_completion_length=args.get("max_completion_length", None),
            add_special_tokens=False)
        # UnitTokeniser case: the tokeniser itself carries bos/eos + __call__
        if hasattr(tokenizer, "bos_token_id"):
            tok_kwargs["processing_class"] = tokenizer
        self.train_rows = [tokenize_row(r, **tok_kwargs) for r in train_dataset]
        self.eval_rows = ([tokenize_row(r, **tok_kwargs) for r in eval_dataset]
                          if eval_dataset else None)
        self.max_len = self._max_len(self.train_rows + (self.eval_rows or []))
        # length_buckets=K > 1: pad each batch to the smallest of K corpus
        # length-quantile targets instead of the corpus-global max — bounded
        # compiles (K shapes), fewer padded FLOPs on a long-tail corpus, and
        # an UNCHANGED loss stream (batch composition is untouched; pads are
        # fully masked). K=1 (default) keeps the single global-max compile.
        self.bucket_lens = self._bucket_lens(
            self.train_rows + (self.eval_rows or []),
            int(args.get("length_buckets", 1) or 1), self.max_len)

        bsz = int(args.per_device_train_batch_size) * self.mesh.shape["data"]
        self.batch_size = bsz
        epochs = float(args.get("num_train_epochs", 1))
        steps_per_epoch = max(len(self.train_rows) // bsz, 1)
        max_steps = int(args.get("max_steps", -1) or -1)
        self.total_steps = (max_steps if max_steps > 0
                            else max(int(epochs * steps_per_epoch), 1))
        self.steps_per_epoch = steps_per_epoch
        self.tx, self.schedule = make_optimizer(args, self.total_steps)
        self._build_step()

    @staticmethod
    def _row_len(r):
        return (len(r["prompt_input_ids"]) +
                max(len(r["chosen_input_ids"]), len(r["rejected_input_ids"])))

    @classmethod
    def _max_len(cls, rows):
        return max(cls._row_len(r) for r in rows)

    @classmethod
    def _bucket_lens(cls, rows, n_buckets: int, max_len: int) -> List[int]:
        """Ascending pad targets: the (i/K)-quantiles of row lengths rounded
        up to a multiple of 8, topped by the exact corpus max (so K=1
        reproduces today's single compile bit-for-bit)."""
        if n_buckets <= 1:
            return [max_len]
        lens = sorted(cls._row_len(r) for r in rows)
        qs = {lens[(len(lens) * (i + 1)) // n_buckets - 1]
              for i in range(n_buckets - 1)}
        return sorted({min(-8 * (-q // 8), max_len) for q in qs} | {max_len})

    def _collate(self, rows: List[dict]) -> Dict[str, np.ndarray]:
        """[2B, T]: chosen rows then rejected rows; completion_mask marks the
        answer tokens whose logprob enters the DPO objective. T is the
        smallest bucket target covering the batch's longest row."""
        pad = self.model.config.pad_token_id
        batch_max = max(self._row_len(r) for r in rows)
        B = len(rows)
        T = next(b for b in self.bucket_lens if b >= batch_max)
        ids = np.full((2 * B, T), pad, np.int32)
        comp = np.zeros((2 * B, T), np.float32)
        seg = np.full((2 * B, T), -1, np.int32)
        for i, r in enumerate(rows):
            p = r["prompt_input_ids"]
            for j, c in enumerate((r["chosen_input_ids"], r["rejected_input_ids"])):
                row = (p + c)[:T]
                ids[i + j * B, :len(row)] = row
                seg[i + j * B, :len(row)] = 0
                comp[i + j * B, len(p):len(row)] = 1.0
        return {"input_ids": ids, "completion_mask": comp, "segment_ids": seg}

    def _build_step(self):
        model, tx, beta = self.model, self.tx, self.beta
        decoder = model.decoder
        uses_dropout = bool(getattr(model, "uses_dropout", False))

        def seq_logp(params, batch, dropout_rng=None):
            logits, _ = forward(params, decoder, batch["input_ids"],
                                segment_ids=batch["segment_ids"],
                                dropout_rng=dropout_rng)
            targets = batch["input_ids"][:, 1:]
            lp = -token_nll(logits[:, :-1], targets)
            return (lp * batch["completion_mask"][:, 1:]).sum(-1)

        def dpo_loss(params, ref_params, batch, dropout_rng=None):
            # dropout on the POLICY forward only — trl keeps the reference
            # model in eval mode (deterministic)
            lp = seq_logp(params, batch, dropout_rng)
            ref_lp = jax.lax.stop_gradient(seq_logp(ref_params, batch))
            B = lp.shape[0] // 2
            pi_diff = lp[:B] - lp[B:]
            ref_diff = ref_lp[:B] - ref_lp[B:]
            logits = beta * (pi_diff - ref_diff)
            loss = -jax.nn.log_sigmoid(logits).mean()
            metrics = {
                "rewards/chosen": (beta * (lp[:B] - ref_lp[:B])).mean(),
                "rewards/rejected": (beta * (lp[B:] - ref_lp[B:])).mean(),
                "rewards/accuracies": (logits > 0).mean(),
                "rewards/margins": logits.mean(),
            }
            return loss, metrics

        def step_fn(state, ref_params, batch):
            import optax

            sub = None
            if uses_dropout:
                # per-step key threaded through train_state so checkpoints
                # resume the exact mask stream (same scheme as SLAMTrainer)
                new_rng, sub = jax.random.split(state["rng"])

            def loss_fn(params):
                return dpo_loss(params, ref_params, batch, sub)

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["params"])
            updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            new_state = {"params": new_params, "opt_state": new_opt}
            if uses_dropout:
                new_state["rng"] = new_rng
            return new_state, {"loss": loss, **metrics}

        mesh = self.mesh
        self._param_sh = param_shardings(self.model.params, mesh,
                                         fsdp=bool(self.args.get("fsdp", False)))
        opt_state = self.tx.init(self.model.params)
        # moment pytrees mirror the params tree: match by path suffix, same
        # mechanism as SLAMTrainer (a shape map would collapse same-shape
        # params carrying different specs)
        from ..parallel.mesh import opt_state_shardings

        opt_sh = opt_state_shardings(opt_state, self.model.params,
                                     self._param_sh, mesh)
        self._state_sh = {"params": self._param_sh, "opt_state": opt_sh}
        init_state = {"params": self.model.params, "opt_state": opt_state}
        if uses_dropout:
            rep = NamedSharding(mesh, P())
            self._state_sh["rng"] = rep
            init_state["rng"] = jax.random.PRNGKey(
                int(self.args.get("seed", 0)))
        batch_sh = {k: NamedSharding(mesh, P("data"))
                    for k in ("input_ids", "completion_mask", "segment_ids")}
        self._batch_sh = batch_sh
        self._step = jax.jit(step_fn, donate_argnums=(0,),
                             in_shardings=(self._state_sh, self._param_sh, batch_sh),
                             out_shardings=(self._state_sh, None))
        # eval stays deterministic (no dropout rng), HF eval-mode semantics
        self._eval_loss = jax.jit(
            lambda p, r, b: dpo_loss(p, r, b, None),
            in_shardings=(self._param_sh, self._param_sh, batch_sh))
        self.train_state = jax.device_put(init_state, self._state_sh)
        # the frozen implicit reference model = initial policy (trl semantics);
        # must be a COPY — the policy buffers are donated into the step
        self.ref_params = jax.device_put(
            jax.tree_util.tree_map(np.array, jax.device_get(self.model.params)),
            self._param_sh)

    def _put_batch(self, host_batch: Dict[str, np.ndarray]):
        """Place a [2B, T] host batch on the mesh; under multihost each
        process contributes only its addressable row shard."""
        if self._n_procs == 1:
            return jax.device_put(host_batch, self._batch_sh)
        rows = host_batch["input_ids"].shape[0] // self._n_procs
        lo = self._proc * rows
        return {
            k: jax.make_array_from_process_local_data(
                self._batch_sh[k], v[lo:lo + rows], v.shape)
            for k, v in host_batch.items()
        }

    def _log(self, record: dict):
        self.state.log_history.append(record)
        logger.info("%s", record)
        if self.log_fn:
            self.log_fn(record)

    def evaluate(self):
        if not self.eval_rows:
            return {}
        losses, accs = [], []
        rows = self.eval_rows
        # pad to a batch multiple by wrapping so the TAIL is scored too
        # (previously rows beyond the last full batch were silently dropped)
        rem = (-len(rows)) % self.batch_size
        if rem:
            rows = rows + rows[:rem] if rem <= len(rows) else \
                (rows * (-(-self.batch_size // len(rows))))[:self.batch_size]
        for start in range(0, len(rows) - self.batch_size + 1, self.batch_size):
            batch = self._put_batch(self._collate(rows[start:start + self.batch_size]))
            loss, metrics = self._eval_loss(self.train_state["params"],
                                            self.ref_params, batch)
            losses.append(float(loss))
            accs.append(float(metrics["rewards/accuracies"]))
        out = {"eval_loss": float(np.mean(losses)) if losses else float("nan"),
               "eval_rewards/accuracies": float(np.mean(accs)) if accs else float("nan")}
        self._log({**out, "step": self.state.global_step})
        return out

    # -- checkpointing: shared machinery (trainer/checkpoint.py) carries the
    # layout and the multihost hardening for BOTH trainers --------------------
    def save_checkpoint(self):
        import os

        from . import checkpoint

        path = os.path.abspath(checkpoint.ckpt_dir(self.args.output_dir,
                                                   self.state.global_step))
        trainer_json = {"global_step": self.state.global_step,
                        "epoch": self.state.epoch,
                        "log_history": self.state.log_history[-50:]}
        self._saver.wait()  # one slot: drain the previous background save
        state_ref = (checkpoint.snapshot_device(self.train_state)
                     if self._async_save else self.train_state)
        proc, n_procs = self._proc, self._n_procs

        def _write():
            checkpoint.collective_save(path, state_ref, proc, n_procs,
                                       sync_tag="dpo_ckpt_clean")
            if proc == 0:
                checkpoint.save_host_artifacts(
                    path, trainer_json, self.model, state_ref)
                checkpoint.rotate_checkpoints(
                    self.args.output_dir, self.args.get("save_total_limit", None))
            logger.info("Saved DPO checkpoint %s", path)

        if self._async_save:
            self._saver.submit(_write)
        else:
            _write()

    def _load_checkpoint(self, path):
        import json
        import os

        from . import checkpoint

        self._saver.wait()  # never restore past an in-flight save
        self.train_state = checkpoint.collective_restore(path, self.train_state)
        with open(os.path.join(path, "trainer_state.json")) as f:
            st = json.load(f)
        self.state.global_step = st["global_step"]
        self.state.epoch = st.get("epoch", 0.0)
        self.state.log_history = st.get("log_history", [])
        logger.info("Resumed DPO from %s at step %d", path, self.state.global_step)

    def _latest_checkpoint(self):
        from . import checkpoint

        return checkpoint.latest_checkpoint(self.args.output_dir)

    def train(self, resume_from_checkpoint=None):
        args, state, control = self.args, self.state, self.control
        if resume_from_checkpoint:
            path = (resume_from_checkpoint
                    if isinstance(resume_from_checkpoint, str)
                    else self._latest_checkpoint())
            if path:
                self._load_checkpoint(path)
        for cb in self.callbacks:
            cb.on_train_begin(args, state, control)
        logging_steps = int(args.get("logging_steps", 50) or 50)
        save_steps = int(args.get("save_steps", 0) or 0)
        # catch-up due-step schedule (see SLAMTrainer.train): a step that
        # slips past its multiple saves at the next step, not never
        save_due = (state.global_step // save_steps + 1) * save_steps \
            if save_steps else 0
        rng = np.random.default_rng(int(args.get("seed", 0)))
        n_rows = len(self.train_rows)
        order_len = n_rows if n_rows >= self.batch_size else \
            -(-self.batch_size // n_rows) * n_rows  # wrap-around fill
        spe = max(order_len // self.batch_size, 1)  # steps per epoch
        epoch = int(state.epoch)
        # replay the RNG stream for completed epochs so resume continues the
        # exact permutation sequence
        for _ in range(epoch):
            rng.permutation(n_rows)
        first_skip = round((state.epoch - epoch) * spe)
        # one-slot upload pipeline (as in SLAMTrainer.train): batch N+1's
        # device_put runs in a worker thread while the device computes step N.
        # The data order is derived from global_step, so a staged-but-unstepped
        # batch at a stop is simply dropped and recomputed on resume.
        from concurrent.futures import ThreadPoolExecutor

        put_pool = ThreadPoolExecutor(1, thread_name_prefix="dpo-upload")
        staged = None  # (upload future, epoch, b_idx) of a collated batch

        def dispatch_staged():
            nonlocal staged, save_due
            fut, s_epoch, s_b_idx = staged
            staged = None
            self.train_state, metrics = self._step(self.train_state,
                                                   self.ref_params, fut.result())
            state.global_step += 1
            state.epoch = s_epoch + (s_b_idx + 1) / spe
            if state.global_step % logging_steps == 0:
                self._log({k: float(v) for k, v in metrics.items()} |
                          {"learning_rate": float(self.schedule(state.global_step)),
                           "step": state.global_step})
            for cb in self.callbacks:
                cb.on_step_end(args, state, control)
            if save_steps and state.global_step >= save_due:
                save_due = (state.global_step // save_steps + 1) * save_steps
                self.save_checkpoint()

        try:
            while state.global_step < self.total_steps and not control.should_training_stop:
                order = rng.permutation(n_rows)
                if n_rows < self.batch_size:
                    order = np.tile(order, order_len // n_rows)
                for b_idx, start in enumerate(
                        range(0, len(order) - self.batch_size + 1, self.batch_size)):
                    if first_skip and b_idx < first_skip:
                        continue
                    rows = [self.train_rows[i] for i in order[start:start + self.batch_size]]
                    fut = put_pool.submit(
                        lambda r=rows: self._put_batch(self._collate(r)))
                    if staged is not None:
                        dispatch_staged()
                    staged = (fut, epoch, b_idx)
                    if control.should_training_stop or state.global_step >= self.total_steps:
                        break
                first_skip = 0
                epoch += 1
            while staged is not None and not control.should_training_stop \
                    and state.global_step < self.total_steps:
                dispatch_staged()
            staged = None
            put_pool.shutdown(wait=True)
        finally:
            # no-op on the clean path; on an exception this stops the upload
            # thread and drops the in-flight device_put instead of leaking it
            put_pool.shutdown(wait=False, cancel_futures=True)
        self.evaluate()
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

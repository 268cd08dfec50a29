"""Round-3 throughput probes (VERDICT r3 item 9): measured keep/reject
verdicts for the three unmeasured candidates, on the real chip.

  P1 loss-epilogue fusion (9a): time fwd-only vs fwd+CE at the recipe shape.
     The unit head is 502-wide — if CE is ~1% of the step there is nothing
     for a fused epilogue to win.
  P2 split-jit update overlap (9c): one-jit (accum scan + update) vs
     grad-jit + update-jit. TPU cores execute one op at a time (overlap
     exists only between compute and DMA), so an in-step overlap of the last
     microbatch with the optimizer update is architecturally unavailable;
     the split probe measures whether two dispatches cost or save anything.
  P3 decode-path flash kernel (9b): per-token decode time vs the
     weight-bandwidth floor (param_bytes / HBM BW). If decode sits at the
     floor, attention is not the bottleneck and a decode kernel is moot.

Usage (real chip, after the box is idle):
    python scripts/probe_step.py
"""
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

V5E_HBM_GBPS = 819.0  # v5e spec: 16 GB @ ~819 GB/s


def _pull(x):
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    float(np.asarray(leaves[0]).reshape(-1)[0])


def _time(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    _pull(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _pull(r)
    return (time.perf_counter() - t0) / iters


def build(smoke=False):
    import jax
    import jax.numpy as jnp

    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig

    if smoke:  # tiny CPU harness check
        jax.config.update("jax_platforms", "cpu")
        cfg = UnitLMConfig(base_model_name="EleutherAI/pythia-14m",
                           vocab_size=502, twist_init=False)
        model = UnitLM(cfg, seed=0)
        B, T, A = 2, 128, 2
    else:
        cfg = UnitLMConfig(base_model_name="Qwen/Qwen2.5-0.5B", vocab_size=502,
                           twist_init=False, rope_theta=10000.0,
                           torch_dtype="bfloat16", remat=True)
        model = UnitLM(cfg, seed=0)
        B, T, A = 8, 1024, 16
    rng = np.random.default_rng(0)
    seg = np.repeat(np.arange(8), T // 8)[None].repeat(B, 0)
    pos = np.tile(np.arange(T // 8), 8)[None].repeat(B, 0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(2, 502, (A, B, T)), jnp.int32),
        "labels": jnp.asarray(rng.integers(2, 502, (A, B, T)), jnp.int32),
        "segment_ids": jnp.asarray(np.broadcast_to(seg, (A,) + seg.shape), jnp.int32),
        "positions": jnp.asarray(np.broadcast_to(pos, (A,) + pos.shape), jnp.int32),
    }
    return model, batch, (B, T, A)


def probe_loss_epilogue(model, batch, shape):
    """P1: CE share of the accum step."""
    import jax
    import jax.numpy as jnp

    from slamkit_tpu.models.transformer import forward

    B, T, A = shape
    params = jax.device_put(model.params)

    @jax.jit
    def fwd_only(params, batch):
        def body(acc, mb):
            logits, _ = forward(params, model.decoder, mb["input_ids"],
                                positions=mb["positions"],
                                segment_ids=mb["segment_ids"])
            return acc + logits.mean(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), batch)
        return acc

    @jax.jit
    def fwd_loss(params, batch):
        num_items = (batch["labels"] != -100).sum()

        def body(acc, mb):
            return acc + model.loss_fn(
                params, {**mb, "num_items_in_batch": num_items}), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), batch)
        return acc

    t_f = _time(fwd_only, params, batch)
    t_fl = _time(fwd_loss, params, batch)
    share = (t_fl - t_f) / t_fl
    return {"probe": "loss_epilogue_fusion", "fwd_ms": round(t_f * 1e3, 1),
            "fwd_plus_ce_ms": round(t_fl * 1e3, 1),
            "ce_share_of_fwd_pass": round(share, 4),
            "verdict": "reject" if share < 0.03 else "investigate",
            "why": "CE over a 502-wide head is this share of the forward; a "
                   "fused epilogue can win at most that"}


def probe_split_jit(model, batch, shape):
    """P2: one-jit accum+update vs grad-jit + update-jit."""
    import jax
    import jax.numpy as jnp
    import optax

    from slamkit_tpu.trainer.optim import make_optimizer

    class _A(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k) from None

    tx, _ = make_optimizer(_A({"learning_rate": 1e-3, "max_grad_norm": 0.5,
                               "lr_scheduler_type": "constant",
                               "optim": "adamw_torch",
                               "optim_state_dtype": "bfloat16"}),
                           total_steps=17625)
    params = jax.device_put(model.params)
    opt_state = jax.device_put(tx.init(params))

    def accum_grads(params, batch):
        num_items = (batch["labels"] != -100).sum()

        def body(carry, mb):
            loss_acc, grad_acc = carry
            loss, grads = jax.value_and_grad(model.loss_fn)(
                params, {**mb, "num_items_in_batch": num_items})
            return (loss_acc + loss,
                    jax.tree_util.tree_map(jnp.add, grad_acc, grads)), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        (loss, grads), _ = jax.lax.scan(body, (jnp.float32(0.0), zeros), batch)
        return loss, grads

    @jax.jit
    def one_jit(params, opt_state, batch):
        loss, grads = accum_grads(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    grad_jit = jax.jit(accum_grads)

    @jax.jit
    def update_jit(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def two_jit(params, opt_state, batch):
        loss, grads = grad_jit(params, batch)
        params, opt_state = update_jit(params, opt_state, grads)
        return params, opt_state, loss

    @jax.jit
    def one_jit_firstcarry(params, opt_state, batch):
        """Variant: the first microbatch's grads ARE the carry (no zeros
        tree + no add of zeros — saves one full f32 grad-tree round trip)."""
        num_items = (batch["labels"] != -100).sum()

        def lf(params, mb):
            return model.loss_fn(params,
                                 {**mb, "num_items_in_batch": num_items})

        first = jax.tree_util.tree_map(lambda x: x[0], batch)
        rest = jax.tree_util.tree_map(lambda x: x[1:], batch)
        loss0, grads0 = jax.value_and_grad(lf)(params, first)

        def body(carry, mb):
            loss_acc, grad_acc = carry
            loss, grads = jax.value_and_grad(lf)(params, mb)
            return (loss_acc + loss,
                    jax.tree_util.tree_map(jnp.add, grad_acc, grads)), None

        (loss, grads), _ = jax.lax.scan(body, (loss0, grads0), rest)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def run(fn):
        def go(params, opt_state, batch):
            p, o, loss = fn(params, opt_state, batch)
            return loss
        return go

    t_one = _time(run(one_jit), params, opt_state, batch, iters=6)
    t_two = _time(run(two_jit), params, opt_state, batch, iters=6)
    t_fc = _time(run(one_jit_firstcarry), params, opt_state, batch, iters=6)
    return {"probe": "split_jit_update_overlap",
            "one_jit_ms": round(t_one * 1e3, 1),
            "two_jit_ms": round(t_two * 1e3, 1),
            "first_carry_ms": round(t_fc * 1e3, 1),
            "verdict": "keep-split" if t_two < t_one * 0.99 else (
                "keep-first-carry" if t_fc < t_one * 0.99 else "reject"),
            "why": "TPU compute is serial per core; splitting only changes "
                   "dispatch/donation behavior (and loses buffer donation "
                   "of grads into the update); first-carry skips the zeros "
                   "grad-tree materialization"}


def probe_decode_floor(model):
    """P3: per-token decode vs the weight-bandwidth floor."""
    import jax
    import jax.numpy as jnp

    from slamkit_tpu.models.generate import generate as gen

    B, L0, NEW = 8, 64, 128
    ids = jnp.asarray(np.random.default_rng(0).integers(2, 502, (B, L0)),
                      jnp.int32)
    mask = jnp.ones_like(ids)

    def run():
        return gen(model.params, model.decoder, ids, mask,
                   jax.random.PRNGKey(0), max_new_tokens=NEW, do_sample=True,
                   temperature=1.0, top_k=25, pad_token_id=0)

    t = _time(lambda: run(), iters=4)
    per_tok = t / NEW
    n_bytes = sum(np.prod(p.shape) * 2 for p in
                  jax.tree_util.tree_leaves(model.params))  # bf16 stream
    floor = n_bytes / (V5E_HBM_GBPS * 1e9)
    return {"probe": "decode_flash_kernel",
            "per_token_ms": round(per_tok * 1e3, 3),
            "weight_bw_floor_ms": round(floor * 1e3, 3),
            "floor_fraction": round(floor / per_tok, 3),
            "verdict": ("reject" if floor / per_tok > 0.5 else "investigate"),
            "why": "decode streams every weight per token; if the measured "
                   "per-token time is near param_bytes/HBM_BW, attention is "
                   "not the bottleneck and a decode kernel cannot help"}


def main():
    if "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__)
        return
    smoke = "--smoke" in sys.argv
    model, batch, shape = build(smoke=smoke)
    results = [probe_loss_epilogue(model, batch, shape),
               probe_split_jit(model, batch, shape),
               probe_decode_floor(model)]
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()

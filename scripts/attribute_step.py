"""Ablation-based time attribution for the Slam train step (VERDICT r3
item 3: "where does the other half of the chip go?").

The axon tunnel backend cannot collect device-side profiler traces, so the
attribution is done by ablation instead: the bench step (B=8 x accum 16,
ctx 1024, 360M Qwen2.5-shaped decoder, bf16 compute, full remat, AdamW
bf16 moments) is re-timed with one component removed/substituted at a time:

  full       — the bench step (Pallas flash attention)
  xla_attn   — flash swapped for the XLA reference attention
  no_attn    — attention replaced by a broadcast of v (measures the
               attention share: full - no_attn)
  no_loss    — CE epilogue replaced by logits.mean() (loss share)
  fwd_only   — forward pass alone, no grad/remat (the remat recompute adds
               ~one forward per microbatch: no-remat step ~= full - fwd_only)
  opt_only   — optimizer update alone on cached grads (AdamW share)

Alongside, model-FLOP times at the v5e's 197 bf16 TFLOP/s peak:
  dense fwd+bwd+remat ~= 8N/token; attention (causal, packed segments)
  ~= 6 * T/2 * d_attn * L per token forward, x3.5 with bwd+remat — so the
  gap between measured and ideal is attributable per component.

Usage: python scripts/attribute_step.py [--iters 8]   (real chip)
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK = 197e12
B, CTX, ACCUM = 8, 1024, 16
BASE = "Qwen/Qwen2.5-0.5B"
FLASH = "flash_attention_2"


def make_batch(rng):
    import jax.numpy as jnp

    seg_len = CTX // 8
    seg = np.repeat(np.arange(8), seg_len)[None].repeat(B, 0)
    pos = np.tile(np.arange(seg_len), 8)[None].repeat(B, 0)
    return {
        "input_ids": jnp.asarray(rng.integers(2, 502, (ACCUM, B, CTX)), jnp.int32),
        "labels": jnp.asarray(rng.integers(2, 502, (ACCUM, B, CTX)), jnp.int32),
        "segment_ids": jnp.asarray(np.broadcast_to(seg, (ACCUM,) + seg.shape), jnp.int32),
        "positions": jnp.asarray(np.broadcast_to(pos, (ACCUM,) + pos.shape), jnp.int32),
    }


def build_model(attn):
    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig

    cfg = UnitLMConfig(base_model_name=BASE, vocab_size=502,
                       twist_init=False, rope_theta=10000.0,
                       torch_dtype="bfloat16", remat=True,
                       attn_implementation=attn)
    return UnitLM(cfg, seed=0)


def build_step(model, loss_mode="ce"):
    import jax
    import jax.numpy as jnp
    import optax

    from slamkit_tpu.models.transformer import forward
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

    def loss_fn(params, mb):
        if loss_mode == "ce":
            return model.loss_fn(params, mb)
        logits, _ = forward(params, model.decoder, mb["input_ids"],
                            positions=mb.get("positions"),
                            segment_ids=mb.get("segment_ids"))
        return logits.astype(jnp.float32).mean()  # no_loss: skip CE epilogue

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        num_items = (batch["labels"] != -100).sum()

        def body(carry, mb):
            loss_acc, grad_acc = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                params, {**mb, "num_items_in_batch": num_items})
            return (loss_acc + loss,
                    jax.tree_util.tree_map(jnp.add, grad_acc, grads)), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        (loss, grads), _ = jax.lax.scan(body, (jnp.float32(0.0), zeros), batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return tx, step


def time_step(step, params, opt_state, batch, iters):
    params, opt_state, loss = step(params, opt_state, batch)
    float(loss)
    params, opt_state, loss = step(params, opt_state, batch)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, batch)
    float(loss)
    return (time.perf_counter() - t0) / iters


def run_variant(name, attn, loss_mode, batch, iters, patch_no_attn=False):
    import jax
    import jax.numpy as jnp

    from slamkit_tpu.models import transformer

    model = build_model(attn)
    tx, step = build_step(model, loss_mode)
    params = jax.device_put(model.params)
    opt_state = jax.device_put(tx.init(params))
    orig = transformer._attention
    if patch_no_attn:
        def _skip_attention(q, k, v, segment_ids, cfg, causal=True,
                            dropout_rng=None):
            reps = q.shape[1] // k.shape[1]
            return jnp.repeat(v, reps, axis=1) if reps > 1 else v
        transformer._attention = _skip_attention
    try:
        dt = time_step(step, params, opt_state, batch, iters)
    finally:
        transformer._attention = orig
    print(json.dumps({"variant": name, "step_ms": round(dt * 1e3, 1),
                      "tokens_per_sec": round(ACCUM * B * CTX / dt, 1)}),
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: pythia-14m, xla attention, tiny shapes")
    args = ap.parse_args()
    global B, CTX, ACCUM, BASE, FLASH
    import jax

    if args.tiny:
        B, CTX, ACCUM = 2, 128, 2
        BASE, FLASH = "EleutherAI/pythia-14m", None
        # the site shim re-forces the axon platform; never let a CPU smoke
        # touch the (possibly busy) chip
        jax.config.update("jax_platforms", "cpu")

    from slamkit_tpu.models.transformer import param_count

    batch = make_batch(np.random.default_rng(0))
    full = run_variant("full", FLASH, "ce", batch, args.iters)
    # "xla" forces the XLA reference path; None/auto would re-select flash
    # on TPU (the bug behind the r4 first-run identical timings)
    xla = run_variant("xla_attn", None if args.tiny else "xla", "ce", batch,
                      args.iters)
    noat = run_variant("no_attn", FLASH, "ce", batch, args.iters,
                       patch_no_attn=True)
    nols = run_variant("no_loss", FLASH, "noloss", batch,
                       args.iters)

    # fwd_only: forward CE without grad (measures one forward = the remat tax)
    import jax.numpy as jnp
    model = build_model(FLASH)
    params = jax.device_put(model.params)

    @jax.jit
    def fwd(params, batch):
        def body(acc, mb):
            return acc + model.loss_fn(params, mb), None
        loss, _ = jax.lax.scan(body, jnp.float32(0.0), batch)
        return loss

    float(fwd(params, batch)); float(fwd(params, batch))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        loss = fwd(params, batch)
    float(loss)
    fwd_dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({"variant": "fwd_only",
                      "step_ms": round(fwd_dt * 1e3, 1)}), flush=True)

    # opt_only: AdamW update on fixed grads
    tx, _ = build_step(model)
    opt_state = jax.device_put(tx.init(params))
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)

    import optax

    @jax.jit
    def opt_step(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    p2, o2 = opt_step(params, opt_state, grads)
    float(jax.tree_util.tree_leaves(p2)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        p2, o2 = opt_step(p2, o2, grads)
    float(jax.tree_util.tree_leaves(p2)[0].ravel()[0])
    opt_dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({"variant": "opt_only",
                      "step_ms": round(opt_dt * 1e3, 1)}), flush=True)

    n = param_count(params)
    tokens = ACCUM * B * CTX
    ideal_dense = 8 * n * tokens / V5E_PEAK  # fwd 2N + bwd 4N + remat 2N
    summary = {
        "attention_share_ms": round((full - noat) * 1e3, 1),
        "flash_vs_xla_gain_ms": round((xla - full) * 1e3, 1),
        "loss_epilogue_ms": round((full - nols) * 1e3, 1),
        "remat_recompute_ms(~fwd)": round(fwd_dt * 1e3, 1),
        "optimizer_ms": round(opt_dt * 1e3, 1),
        "dense_ideal_ms_at_peak": round(ideal_dense * 1e3, 1),
        "full_step_ms": round(full * 1e3, 1),
        "residual_ms(full - ideal_dense - attn - loss - opt)": round(
            (full - ideal_dense - (full - noat) - (full - nols) - opt_dt)
            * 1e3, 1),
        "params": int(n),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

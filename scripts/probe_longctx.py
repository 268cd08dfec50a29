"""Single-chip long-context train-step throughput (VERDICT r4 item 1).

Times the flagship Slam train step (360M Qwen2.5-0.5B-arch UnitLM, Pallas
flash attention, full remat, bf16 AdamW moments) at ctx 1024..8192 on ONE
chip, holding tokens/microbatch constant at 8192 (B scales down as ctx
scales up). These are the "single-chip" columns of the CP throughput/ctx
table in docs/CONTEXT_PARALLEL.md; the virtual-mesh CP side comes from
scripts/rehearse_cp.py.

Usage: python scripts/probe_longctx.py [--ctx 2048 4096 8192] [--accum 4]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(context_len, accum, n_steps=5):
    import jax
    import jax.numpy as jnp
    import optax

    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig
    from slamkit_tpu.trainer.optim import make_optimizer

    batch_size = max(1, 8192 // context_len)
    cfg = UnitLMConfig(base_model_name="Qwen/Qwen2.5-0.5B", vocab_size=502,
                       twist_init=False, rope_theta=10000.0,
                       torch_dtype="bfloat16", remat=True)
    model = UnitLM(cfg, seed=0)

    rng = np.random.default_rng(0)
    # ~8 packed segments per row at any ctx (same utterance mix as bench.py)
    seg_len = context_len // 8
    seg = np.repeat(np.arange(8), seg_len)[None].repeat(batch_size, 0)
    pos = np.tile(np.arange(seg_len), 8)[None].repeat(batch_size, 0)
    batch = {
        "input_ids": rng.integers(2, 502, (accum, batch_size, context_len)).astype(np.int32),
        "labels": rng.integers(2, 502, (accum, batch_size, context_len)).astype(np.int32),
        "segment_ids": np.broadcast_to(seg, (accum,) + seg.shape).astype(np.int32),
        "positions": np.broadcast_to(pos, (accum,) + pos.shape).astype(np.int32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

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
                           total_steps=1000)
    params = jax.device_put(model.params)
    opt_state = jax.device_put(tx.init(params))

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        num_items = (batch["labels"] != -100).sum()

        def body(carry, mb):
            loss_acc, grad_acc = carry
            loss, grads = jax.value_and_grad(model.loss_fn)(
                params, {**mb, "num_items_in_batch": num_items})
            return (loss_acc + loss,
                    jax.tree_util.tree_map(jnp.add, grad_acc, grads)), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        (loss, grads), _ = jax.lax.scan(body, (jnp.float32(0.0), zeros), batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    for _ in range(2):  # compile + warmup
        params, opt_state, loss = step(params, opt_state, batch)
        float(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state, batch)
    float(loss)
    dt = time.perf_counter() - t0
    toks = n_steps * accum * batch_size * context_len
    return {"ctx": context_len, "batch": batch_size, "accum": accum,
            "tokens_per_sec": round(toks / dt, 1),
            "step_ms": round(1e3 * dt / n_steps, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, nargs="*",
                    default=[1024, 2048, 4096, 8192])
    ap.add_argument("--accum", type=int, default=4)
    args = ap.parse_args()
    for ctx in args.ctx:
        print(json.dumps(probe(ctx, args.accum)), flush=True)


if __name__ == "__main__":
    main()

"""Probe remat x optimizer-state combos for the Slam recipe on the real chip.

Round-1 finding: no-remat OOMs on the 16G v5e with f32 AdamW moments.
bf16 moments free 1.45GB and adafactor ~2.9GB — this measures which combos
fit and their tokens/s (VERDICT.md item 4).

Usage: python scripts/probe_remat.py [--accum 16] [--combos all]
"""
import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

COMBOS = [
    # (name, remat, optim, state_dtype, remat_policy, remat_layers, batch, accum)
    # effective batch stays 128 rows x 1024 ctx (the Slam recipe) throughout
    ("remat+f32adamw", True, "adamw_torch", "float32", "full", -1, 8, 16),
    ("remat+bf16adamw", True, "adamw_torch", "bfloat16", "full", -1, 8, 16),
    ("noremat+f32adamw", False, "adamw_torch", "float32", "full", -1, 8, 16),
    ("noremat+bf16adamw", False, "adamw_torch", "bfloat16", "full", -1, 8, 16),
    ("noremat+adafactor", False, "adafactor", "float32", "full", -1, 8, 16),
    ("qkvremat+bf16adamw", True, "adamw_torch", "bfloat16", "qkv", -1, 8, 16),
    ("qkvremat+adafactor", True, "adafactor", "float32", "qkv", -1, 8, 16),
    ("remat12+bf16adamw", True, "adamw_torch", "bfloat16", "full", 12, 8, 16),
    ("remat16+bf16adamw", True, "adamw_torch", "bfloat16", "full", 16, 8, 16),
    ("remat20+bf16adamw", True, "adamw_torch", "bfloat16", "full", 20, 8, 16),
    ("qkvremat12+bf16adamw", True, "adamw_torch", "bfloat16", "qkv", 12, 8, 16),
    ("b16a8+f32adamw", True, "adamw_torch", "float32", "full", -1, 16, 8),
    ("b16a8+bf16adamw", True, "adamw_torch", "bfloat16", "full", -1, 16, 8),
    ("b32a4+bf16adamw", True, "adamw_torch", "bfloat16", "full", -1, 32, 4),
    ("b64a2+bf16adamw", True, "adamw_torch", "bfloat16", "full", -1, 64, 2),
    ("b128a1+bf16adamw", True, "adamw_torch", "bfloat16", "full", -1, 128, 1),
]


def run_one(name, remat, optim, state_dtype, remat_policy, remat_layers,
            batch_size, accum, accum_override=None):
    import json

    import numpy as np

    import jax
    import jax.numpy as jnp

    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig
    from slamkit_tpu.trainer.optim import make_optimizer

    context_len = 1024
    accum = accum_override or accum
    cfg = UnitLMConfig(base_model_name="Qwen/Qwen2.5-0.5B", vocab_size=502,
                       twist_init=False, rope_theta=10000.0,
                       torch_dtype="bfloat16", remat=remat,
                       remat_policy=remat_policy, remat_layers=remat_layers)
    model = UnitLM(cfg, seed=0)

    rng = np.random.default_rng(0)
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

    args = {"learning_rate": 1e-3, "max_grad_norm": 0.5,
            "lr_scheduler_type": "constant",
            "optim": optim, "optim_state_dtype": state_dtype}

    class A(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k) from None

    tx, _ = make_optimizer(A(args), total_steps=1000)

    import optax
    from functools import partial

    params = jax.device_put(model.params)
    opt_state = jax.device_put(tx.init(params))

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

    params, opt_state, loss = step(params, opt_state, batch)
    float(loss)
    params, opt_state, loss = step(params, opt_state, batch)
    float(loss)
    n_steps = 4
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state, batch)
    final_loss = float(loss)
    dt = time.perf_counter() - t0
    tps = n_steps * accum * batch_size * context_len / dt
    print(json.dumps({"combo": name, "tokens_per_sec": round(tps, 1),
                      "loss": round(final_loss, 4)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--accum", type=int, default=None)
    ap.add_argument("--only", default=None, help="substring filter")
    ap.add_argument("--combo", default=None, help="run one combo in-process")
    args = ap.parse_args()

    if args.combo:
        spec = next(c for c in COMBOS if c[0] == args.combo)
        run_one(*spec, accum_override=args.accum)
        return

    # each combo in a fresh process: an OOM must not kill the sweep
    names = [c[0] for c in COMBOS]
    if args.only:
        wanted = args.only.split(",")
        names = [n for n in names if any(n.startswith(w) for w in wanted)]
    for name in names:
        cmd = [sys.executable, os.path.abspath(__file__), "--combo", name]
        if args.accum:
            cmd += ["--accum", str(args.accum)]
        r = subprocess.run(
            cmd,
            capture_output=True, text=True, timeout=900)
        out = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if r.returncode == 0 and out:
            print(out[-1], flush=True)
        else:
            err = (r.stderr or "")[-400:]
            tag = "OOM" if ("RESOURCE_EXHAUSTED" in r.stderr or
                            "Out of memory" in r.stderr) else f"rc={r.returncode}"
            print(f'{{"combo": "{name}", "failed": "{tag}"}}', flush=True)
            if tag.startswith("rc"):
                print(err, flush=True)


if __name__ == "__main__":
    main()

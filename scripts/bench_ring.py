"""Context-parallel ring attention cost model, measured on the real chip.

Only ONE physical chip is reachable here (the axon tunnel), so a live
multi-chip ring cannot be timed end to end. What CAN be measured honestly,
and what this script does:

  1. the single-chip cost a CP user avoids: flash attention fwd+bwd at the
     FULL context (the memory/compute wall CP exists to break), per layer
     shape of the Slam recipe (14 q / 2 kv heads, d=64);
  2. the per-step cost a CP device pays: the chunk-pair kernel at C = ctx/n
     (causal diagonal pair and non-causal off-diagonal pair timed
     separately — a ring device executes 1 diagonal + (rank) off pairs);
  3. the ring bytes per step (k+v chunk + segment ids) vs the measured pair
     time — whether ICI (or here, the derived requirement) hides under
     compute.

Derived per-device ring step time (worst device, rank n-1):
    T_ring(n) = t_diag(C) + (n-1) * t_off(C),  C = ctx / n
compared against T_full(ctx) on one chip. Correctness of the actual
ppermute schedule is gated separately on the virtual 8-device mesh
(tests/test_ring_attention.py, tests/test_trainer.py CP parity).

Usage:  python scripts/bench_ring.py [--ctx 2048 4096 8192] [--n 2 4 8]
Writes a markdown table to stdout and JSON to --out (default
docs/runs/ring_bench.json).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

B, HQ, HKV, D = 8, 14, 2, 64   # Slam-recipe attention shape per layer


def _time(fn, *args, iters=8):
    import jax

    out = fn(*args)
    jax.tree_util.tree_map(lambda x: None, out)
    # float() pull: block_until_ready is unreliable on the tunnel
    float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, nargs="*", default=[2048, 4096, 8192])
    ap.add_argument("--n", type=int, nargs="*", default=[2, 4, 8])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(HERE), "docs", "runs", "ring_bench.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from slamkit_tpu.ops import flash_attention

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)

    def qkv(t):
        q = jnp.asarray(rng.standard_normal((B, HQ, t, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, HKV, t, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, HKV, t, D)), jnp.bfloat16)
        return q, k, v

    def fwd_bwd(causal):
        def loss(q, k, v):
            return flash_attention(q, k, v, causal=causal).astype(
                jnp.float32).sum()

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    rows = []
    for ctx in args.ctx:
        q, k, v = qkv(ctx)
        t_full = _time(fwd_bwd(True), q, k, v, iters=args.iters)
        row = {"ctx": ctx, "full_ms": round(t_full, 3), "cp": []}
        for n in args.n:
            c = ctx // n
            if c % 128:
                continue
            qc, kc, vc = qkv(c)
            t_diag = _time(fwd_bwd(True), qc, kc, vc, iters=args.iters)
            t_off = _time(fwd_bwd(False), qc, kc, vc, iters=args.iters)
            t_ring = t_diag + (n - 1) * t_off
            entry = {
                "n": n, "chunk": c,
                "diag_ms": round(t_diag, 3), "off_ms": round(t_off, 3),
                "ring_worst_dev_ms": round(t_ring, 3),
                "vs_full": round(t_ring / t_full, 3),
            }
            kv_bytes = 2 * B * HKV * c * D * 2  # bf16 k+v chunk per step
            entry["kv_mb_per_step"] = round(kv_bytes / 2**20, 2)
            # ICI bandwidth needed to fully hide the rotation under one
            # off-diagonal pair (v5e ICI ~186 GB/s/link for scale)
            entry["hide_gbps"] = round(kv_bytes / (t_off * 1e-3) / 1e9, 1)
            if c % 256 == 0:
                # zigzag: every step = 2 half-pair kernels on every device
                qh, kh, vh = qkv(c // 2)
                t_half = _time(fwd_bwd(False), qh, kh, vh, iters=args.iters)
                t_zz = t_diag + (n - 1) * 2 * t_half
                entry["zigzag_step_ms"] = round(2 * t_half, 3)
                entry["zigzag_dev_ms"] = round(t_zz, 3)
                entry["zigzag_vs_contiguous"] = round(t_zz / t_ring, 3)
            row["cp"].append(entry)
        rows.append(row)
        print(json.dumps(row))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"shape": {"B": B, "HQ": HQ, "HKV": HKV, "D": D},
                   "iters": args.iters, "rows": rows}, f, indent=1)

    print("\n| ctx | 1-chip full (ms) | n | chunk | ring worst-dev (ms) | "
          "ratio | kv MB/step | hide GB/s |")
    print("|---|---|---|---|---|---|---|---|")
    for row in rows:
        for cp in row["cp"]:
            print(f"| {row['ctx']} | {row['full_ms']} | {cp['n']} | "
                  f"{cp['chunk']} | {cp['ring_worst_dev_ms']} | "
                  f"{cp['vs_full']} | {cp['kv_mb_per_step']} | "
                  f"{cp['hide_gbps']} |")


if __name__ == "__main__":
    main()

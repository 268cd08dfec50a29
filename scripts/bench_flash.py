"""Flash-attention microbenchmark on the real chip.

Times fwd and fwd+bwd at the flagship Slam shape [8,14,1024,64] (Qwen2.5-0.5B,
packed ctx 1024) plus optional sweeps over block sizes, so kernel changes can
be judged by measurement instead of the 4MB heuristic (VERDICT.md item 3).

Usage:
    python scripts/bench_flash.py                 # headline shape, current kernel
    python scripts/bench_flash.py --sweep         # block-size sweep
    python scripts/bench_flash.py --matmul-probe  # d=64 vs d=128 contraction cost
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, iters=20, warmup=2):
    import jax
    for _ in range(warmup):
        r = fn(*args)
    _pull(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _pull(r)
    return (time.perf_counter() - t0) / iters


def _pull(r):
    import jax
    leaves = jax.tree_util.tree_leaves(r)
    # float() pull: block_until_ready is unreliable over the tunnel (CLAUDE.md)
    float(leaves[0].reshape(-1)[0])


def make_inputs(B=8, H=14, T=1024, D=64, segs=8, seed=0, Hkv=None):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
    k, v = (jnp.asarray(rng.standard_normal((B, Hkv or H, T, D)), jnp.bfloat16)
            for _ in range(2))
    seg = jnp.asarray(np.repeat(np.arange(segs), T // segs)[None].repeat(B, 0),
                      jnp.int32)
    return q, k, v, seg


def bench_shape(B, H, T, D, block_q=None, block_k=None, segs=8, iters=20,
                reps=16, Hkv=None, seg_block_skip=True):
    """Times `reps` chained kernel invocations inside ONE jit (the data
    dependency forces sequential execution), so per-dispatch tunnel latency
    (~1ms) is amortized out of the per-call numbers."""
    import jax
    import jax.numpy as jnp
    from slamkit_tpu.ops import flash_attention

    q, k, v, seg = make_inputs(B, H, T, D, segs, Hkv=Hkv)

    kw = dict(segment_ids=seg, causal=True, sm_scale=D ** -0.5,
              block_q=block_q, block_k=block_k, seg_block_skip=seg_block_skip)

    @jax.jit
    def fwd(q, k, v):
        def body(q, _):
            o = flash_attention(q, k, v, **kw)
            return o.astype(q.dtype), None
        out, _ = jax.lax.scan(body, q, None, length=reps)
        return out

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, **kw).astype(jnp.float32) ** 2)

    @jax.jit
    def grad(q, k, v):
        def body(q, _):
            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            return (q + 1e-6 * dq.astype(q.dtype)), None
        out, _ = jax.lax.scan(body, q, None, length=reps)
        return out

    t_f = _timeit(fwd, q, k, v, iters=iters) / reps
    t_g = _timeit(grad, q, k, v, iters=iters) / reps
    return t_f, t_g


def matmul_probe():
    """Is a d=64 contraction cheaper than its 128-padded version on the MXU?"""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(a_ref, b_ref, o_ref, *, reps):
        acc = jnp.zeros_like(o_ref)
        for _ in range(reps):
            acc += jax.lax.dot_general(
                a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[...] = acc

    def run(M, K, N, reps=64):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        f = jax.jit(lambda a, b: pl.pallas_call(
            partial(kern, reps=reps),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b))
        t = _timeit(f, a, b, iters=10)
        print(f"  [{M},{K}]x[{K},{N}] x{reps}: {t*1e3:.3f} ms")
        return t

    print("contraction-dim probe (S = q @ k^T shape):")
    t64 = run(1024, 64, 1024)
    t128 = run(1024, 128, 1024)
    print(f"  K=64 / K=128 ratio: {t64/t128:.3f}")
    print("output-dim probe (O = p @ v shape):")
    t64n = run(1024, 1024, 64)
    t128n = run(1024, 1024, 128)
    print(f"  N=64 / N=128 ratio: {t64n/t128n:.3f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--skip-sweep", action="store_true",
                    help="segment-block-skip A/B: block_k x skip-flag x "
                         "segment length (recipe-like 512-token and short "
                         "128-token segments)")
    ap.add_argument("--matmul-probe", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--hkv", type=int, default=None,
                    help="kv heads (GQA); default = all heads")
    ap.add_argument("--heads", type=int, default=14,
                    help="q heads (14 = Slam baseline; 7 for slam_dh128)")
    ap.add_argument("--dim", type=int, default=64,
                    help="head_dim (64 = Slam baseline; 128 for slam_dh128)")
    args = ap.parse_args()

    if args.matmul_probe:
        matmul_probe()
        return

    B, H, T, D = 8, args.heads, 1024, args.dim
    hkv = args.hkv
    if args.skip_sweep:
        for segs in (2, 8):
            for bk in (256, 512, 1024):
                row = [f"segs={segs} ({T//segs} tok) bk={bk:4d}:"]
                for skip in (False, True):
                    try:
                        t_f, t_g = bench_shape(
                            B, H, T, D, None, bk, segs=segs,
                            iters=args.iters, Hkv=hkv, seg_block_skip=skip)
                        row.append(f"skip={int(skip)} fwd {t_f*1e3:7.3f} "
                                   f"bwd+fwd {t_g*1e3:7.3f} ms")
                    except Exception as e:
                        row.append(f"skip={int(skip)} FAILED {type(e).__name__}")
                print("  ".join(row), flush=True)
        return
    if args.sweep:
        for bq in (64, 128, 256, 512, 1024):
            for bk in (512, 1024):
                try:
                    t_f, t_g = bench_shape(B, H, T, D, bq, bk,
                                           iters=args.iters, Hkv=hkv)
                except Exception as e:
                    print(f"bq={bq:5d} bk={bk:5d}: FAILED "
                          f"{type(e).__name__}: {str(e)[:80]}")
                    continue
                print(f"bq={bq:5d} bk={bk:5d}: fwd {t_f*1e3:7.3f} ms  "
                      f"fwd+bwd {t_g*1e3:7.3f} ms")
    else:
        t_f, t_g = bench_shape(B, H, T, D, iters=args.iters, Hkv=hkv)
        print(f"[{B},{H}/{hkv or H},{T},{D}] AUTO blocks: fwd {t_f*1e3:.3f} ms  "
              f"fwd+bwd {t_g*1e3:.3f} ms")


if __name__ == "__main__":
    main()

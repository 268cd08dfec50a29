"""int8 weight-only decode probe: can halved weight bytes reach the decode
path's HBM floor? (probe_step.py P3 measured decode at 1.513ms/token vs the
0.875ms bf16 weight-bandwidth floor — int8 weights halve the floor to
0.44ms IF the int8->bf16 dequant fuses into the matmul's HBM read.)

Times decode-shaped gemv chains over the 360M recipe's heavy matrices
(896x4864 MLP panels, 24 layers' worth chained to amortize dispatch):

  bf16        — today's decode weight read
  int8_deq    — int8 weights + per-channel scale, converted in-graph
                (wins ONLY if XLA fuses the convert into the dot and
                streams int8 bytes from HBM)
  int8_native — both operands int8, int32 accumulate (the MXU's int8 mode;
                needs activation quantization, shown as the upper bound)

Verdict: keep (int8_deq < 0.75x bf16) -> wire a quantized decode path;
reject -> a Pallas dequant-gemv kernel would be required to realize the
bandwidth, note as future work.

Usage: python scripts/probe_int8.py   (real chip)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 16          # decode batch
D, F = 896, 4864
LAYERS = 24     # chain length ~ one model's worth of MLP panels


def _timeit(fn, *args, iters=20):
    import jax
    r = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    if "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__)
        return
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
    w_f = [jnp.asarray(rng.standard_normal((D, F)) * 0.02, jnp.bfloat16)
           for _ in range(LAYERS)]
    down = [jnp.asarray(rng.standard_normal((F, D)) * 0.02, jnp.bfloat16)
            for _ in range(LAYERS)]

    def quant(w):
        s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True) / 127.0
        q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
        return q, s.astype(jnp.bfloat16)

    w_q = [quant(w) for w in w_f]
    d_q = [quant(w) for w in down]

    @jax.jit
    def bf16(x, w_f, down):
        for w, d in zip(w_f, down):
            h = jax.nn.gelu(x @ w)
            x = (h @ d).astype(jnp.bfloat16)
        return x

    @jax.jit
    def int8_deq(x, w_q, d_q):
        for (qw, sw), (qd, sd) in zip(w_q, d_q):
            h = jax.nn.gelu((x @ qw.astype(jnp.bfloat16)) * sw)
            x = ((h @ qd.astype(jnp.bfloat16)) * sd).astype(jnp.bfloat16)
        return x

    @jax.jit
    def int8_native(xq, w_q, d_q):
        for (qw, _), (qd, _) in zip(w_q, d_q):
            h = jax.lax.dot_general(xq, qw, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            hq = (h >> 7).astype(jnp.int8)
            o = jax.lax.dot_general(hq, qd, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            xq = (o >> 7).astype(jnp.int8)
        return xq

    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 16), -127, 127).astype(jnp.int8)

    t_bf = _timeit(bf16, x, w_f, down)
    t_dq = _timeit(int8_deq, x, w_q, d_q)
    t_nat = _timeit(int8_native, xq, w_q, d_q)

    bytes_bf = LAYERS * 2 * D * F * 2
    res = {
        "bf16_ms": round(t_bf * 1e3, 3),
        "bf16_vs_bw_floor": round(t_bf / (bytes_bf / 819e9), 2),
        "int8_dequant_ms": round(t_dq * 1e3, 3),
        "int8_native_ms": round(t_nat * 1e3, 3),
        "dequant_ratio": round(t_dq / t_bf, 3),
        "shape": f"B={B}, {LAYERS}x({D}x{F} + {F}x{D})",
    }
    res["verdict"] = (
        "keep: XLA streams int8 — wire a quantized decode path"
        if t_dq < 0.75 * t_bf else
        "reject for now: convert materializes bf16; a Pallas dequant-gemv "
        "kernel would be needed to realize the bandwidth")
    print(json.dumps(res))


if __name__ == "__main__":
    main()

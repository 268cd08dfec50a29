"""Head-pair (2 x d=64 -> one 128-lane panel) layout probe — the experiment
named in STATUS r3 "known gaps" / VERDICT r3 item 3.

Counting argument (why no layout can win): the MXU contracts 128 lanes per
pass. Two d=64 heads need 2*M*bk*64 = M*bk*128 useful MACs for their score
panels, but every packing of the pair

  (a) two separate matmuls, contraction padded 64->128         (today)
  (b) block-diagonal K~ = [[kA,0],[0,kB]], one (M,128)@(128,2bk)
  (c) sum/diff: S_A = (S+ + S-)/2 with Q~=[qA|qB], [qA|-qB] dense

performs 2*M*bk*128 MACs — the output side needs 2*M*bk score values and a
single (M,K,N) matmul only yields M*N, so two matmul-passes are unavoidable
and each pads or zero-fills half its contraction. Identical for PV and the
backward's dp/dk/dv (output lanes per head = 64). d=64 attention is
therefore INHERENTLY <=50% MXU-utilized on 128-lane hardware; the only fix
is an architecture with d_head=128.

This probe confirms the argument on the real chip: (a), (b), (c) should
time within noise of each other, and none should approach the dense-128
matmul that computes the same useful MACs.

Usage: python scripts/probe_headpair.py   (real chip; prints a JSON table)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=30):
    import jax

    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(np.asarray(x).ravel()[0]), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # device->host pull forces sync (block_until_ready unreliable on tunnel)
    jax.tree_util.tree_map(lambda x: float(np.asarray(x).ravel()[0]), out)
    return (time.perf_counter() - t0) / iters


def main():
    if "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__)
        return
    import jax
    import jax.numpy as jnp

    M, bk, d = 1024, 1024, 64  # the measured flash tile at G-folded M
    rng = np.random.default_rng(0)
    qa, qb = (jnp.asarray(rng.standard_normal((M, d)), jnp.bfloat16)
              for _ in range(2))
    ka, kb = (jnp.asarray(rng.standard_normal((bk, d)), jnp.bfloat16)
              for _ in range(2))

    # (a) two separate matmuls (contraction 64, padded by hardware)
    @jax.jit
    def separate(qa, qb, ka, kb):
        sa = jax.lax.dot_general(qa, ka, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sb = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return sa, sb

    # (b) block-diagonal packing: one (M,128) @ (128, 2bk)
    @jax.jit
    def blockdiag(qa, qb, ka, kb):
        q2 = jnp.concatenate([qa, qb], axis=1)                      # (M, 128)
        z = jnp.zeros_like(ka)
        kt = jnp.concatenate([jnp.concatenate([ka, z], 1),
                              jnp.concatenate([z, kb], 1)], 0)      # (2bk, 128)
        s = jax.lax.dot_general(q2, kt, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return s[:, :bk], s[:, bk:]

    # (c) sum/diff: two DENSE 128-contraction matmuls, recover per-head
    @jax.jit
    def sumdiff(qa, qb, ka, kb):
        qp = jnp.concatenate([qa, qb], axis=1)
        qm = jnp.concatenate([qa, -qb], axis=1)
        k2 = jnp.concatenate([ka, kb], axis=1)                      # (bk, 128)
        sp = jax.lax.dot_general(qp, k2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sm = jax.lax.dot_general(qm, k2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return (sp + sm) * 0.5, (sp - sm) * 0.5

    # reference: ONE dense d=128 matmul = the same useful MAC count
    q128 = jnp.concatenate([qa, qb], axis=1)
    k128 = jnp.concatenate([ka, kb], axis=1)

    @jax.jit
    def dense128(q, k):
        return jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # numerical check first
    sa, sb = jax.jit(separate)(qa, qb, ka, kb)
    for name, fn in (("blockdiag", blockdiag), ("sumdiff", sumdiff)):
        xa, xb = jax.jit(fn)(qa, qb, ka, kb)
        np.testing.assert_allclose(np.asarray(xa), np.asarray(sa),
                                   rtol=2e-2, atol=2e-2, err_msg=name)
        np.testing.assert_allclose(np.asarray(xb), np.asarray(sb),
                                   rtol=2e-2, atol=2e-2, err_msg=name)

    res = {
        "separate_ms": round(timeit(separate, qa, qb, ka, kb) * 1e3, 4),
        "blockdiag_ms": round(timeit(blockdiag, qa, qb, ka, kb) * 1e3, 4),
        "sumdiff_ms": round(timeit(sumdiff, qa, qb, ka, kb) * 1e3, 4),
        "dense128_same_macs_ms": round(timeit(dense128, q128, k128) * 1e3, 4),
        "shape": f"2 heads, M={M}, bk={bk}, d={d}",
    }
    res["verdict"] = (
        "reject head-pair layout" if min(res["blockdiag_ms"], res["sumdiff_ms"])
        > 0.8 * res["separate_ms"] else "head-pair layout wins — investigate")
    print(json.dumps(res))


if __name__ == "__main__":
    main()

"""Headline benchmark: Slam-recipe training throughput on one chip.

Trains the flagship configuration (Qwen2.5-0.5B decoder over the 502-id unit
vocabulary, context 1024, packed batches, per-device batch 8 x grad-accum 16
— reference config/model/slam.yaml + README.md:89) on synthetic packed
batches and reports LM tokens/sec/chip. Accumulation runs as a lax.scan
inside the jitted step, exactly like the trainer.

Baseline: the reference's Slam run processes 1.4B tokens in 24h on 1×A5000
(BASELINE.md) ≈ 16,204 tokens/sec. vs_baseline = ours / that.
"""
import json
import os
import sys
import threading
import time

import numpy as np

BASELINE_TOKENS_PER_SEC = 1.4e9 / (24 * 3600)  # reference Slam: 24h / 1.4B tokens
V5E_PEAK_BF16_FLOPS = 197e12  # per-chip MXU peak, v5e datasheet

# Regression floor for the headline recipe: 0.97 x the best recorded round
# (BENCH_r02/r03 = 40,340 tokens/s). A run below this prints its JSON line
# and then exits 4, so a silent throughput regression fails the driver's
# bench step loudly instead of drifting (VERDICT r4, weak #3). Tunnel noise
# measured across rounds is under +-0.6%; 3% headroom clears it.
SLAM_THROUGHPUT_FLOOR = 0.97 * 40340.0


def _backend_answers(timeout):
    """Probe the device backend in a SUBPROCESS. A wedged tunnel can hang
    jax backend init process-wide (even past recovery), so the health gate
    must not touch this process's jax until a fresh interpreter proves the
    backend answers."""
    import subprocess

    code = ("import jax.numpy as jnp; "
            "assert float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()) > 0")
    try:
        return subprocess.run([sys.executable, "-c", code], timeout=timeout,
                              stdout=subprocess.DEVNULL,
                              stderr=subprocess.DEVNULL).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _require_live_device(probe_timeout=240, run_timeout=1500, fatal=True):
    """The tunnel backend can wedge so hard that even jax.devices() blocks
    forever. Fail FAST and honestly instead of hanging the caller: a tiny
    bounded matmul must answer within probe_timeout, and the run is
    hard-capped at run_timeout. fatal=True exits the process (os._exit: a
    hung RPC thread would otherwise block interpreter shutdown) — callers
    embedded in a larger process pass fatal=False to get a RuntimeError.

    Before declaring the backend dead, subprocess probes retry for up to
    $SLAMKIT_BENCH_WAIT_S seconds (default 900) so a measurement that lands
    during a brief tunnel outage waits it out instead of failing instantly.
    Set SLAMKIT_BENCH_WAIT_S=0 to restore single-probe fail-fast."""
    wait_budget = float(os.environ.get("SLAMKIT_BENCH_WAIT_S", "900"))
    deadline = time.monotonic() + wait_budget
    alive = _backend_answers(min(probe_timeout, 120))
    while not alive and time.monotonic() < deadline:
        remaining = deadline - time.monotonic()
        print(f"bench.py: backend not answering; retrying for another "
              f"{remaining:.0f}s", file=sys.stderr)
        time.sleep(min(30, max(0, remaining)))
        alive = _backend_answers(min(probe_timeout, 120))
    done = []

    if alive:
        def probe():
            import jax.numpy as jnp

            done.append(float((jnp.ones((128, 128)) @ jnp.ones((128, 128))).sum()))

        t = threading.Thread(target=probe, daemon=True)
        t.start()
        t.join(probe_timeout)
    if not done:
        msg = (f"device backend unreachable (probe matmul silent; waited "
               f"{wait_budget:.0f}s) — no measurement")
        if not fatal:
            raise RuntimeError(msg)
        print(f"bench.py: {msg}", file=sys.stderr)
        os._exit(2)
    if not fatal:  # embedded caller: probe only, never kill the host process
        return None
    killer = threading.Timer(run_timeout, lambda: (
        print(f"bench.py: backend wedged mid-run (>{run_timeout}s) — "
              f"aborting without a measurement", file=sys.stderr),
        os._exit(3)))
    killer.daemon = True
    killer.start()
    return killer


def main(model_name: str = "slam"):
    # resolve the variant BEFORE touching the device: a typo'd --model must
    # not burn the (possibly minutes-long) backend probe first, and the
    # config tree lives next to this file, not in the caller's cwd
    repo = os.path.dirname(os.path.abspath(__file__))
    if model_name != "slam" and not os.path.isfile(
            os.path.join(repo, "config", "model", f"{model_name}.yaml")):
        print(f"bench.py: no config/model/{model_name}.yaml", file=sys.stderr)
        raise SystemExit(2)

    import jax
    import jax.numpy as jnp

    watchdog = _require_live_device()

    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig

    batch_size, context_len, accum = 8, 1024, 16
    if model_name == "slam":  # the headline recipe, spelled out
        cfg = UnitLMConfig(base_model_name="Qwen/Qwen2.5-0.5B", vocab_size=502,
                           twist_init=False, rope_theta=10000.0,
                           torch_dtype="bfloat16", remat=True)
    else:  # A/B a config/model/<name>.yaml variant (e.g. slam_dh128)
        from slamkit_tpu.config import compose, to_container

        mc = compose(os.path.join(repo, "config"), "train",
                     [f"model={model_name}", "data.train_path=/dev/null"])
        cfg = UnitLMConfig.from_dict({
            **to_container(mc.model.config_args),
            "vocab_size": 502, "twist_init": False,
            "torch_dtype": "bfloat16", "remat": True})
    model = UnitLM(cfg, seed=0)

    rng = np.random.default_rng(0)
    # fully-packed batch: ~8 segments per row, like real deduped unit streams
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

    import optax

    params = jax.device_put(model.params)
    # the recipe's measured optimum: bf16 AdamW moments (docs/SLAM.md) —
    # half the optimizer-state HBM traffic per step at equal convergence
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

    # compile + warmup
    params, opt_state, loss = step(params, opt_state, batch)
    float(loss)  # device->host sync (block_until_ready is a no-op on the tunnel)
    params, opt_state, loss = step(params, opt_state, batch)
    float(loss)

    # enough timed steps that the single final device->host pull (a full
    # RTT on the tunnel backend) is amortized to <1% of the measurement
    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state, batch)
    float(loss)
    dt = time.perf_counter() - t0

    tokens_per_sec = n_steps * accum * batch_size * context_len / dt

    # MFU: model FLOPs (6N per token, fwd+bwd) over the chip's bf16 peak.
    # Attention matmuls add <0.5% here (packed 128-token segments, so ~64
    # avg keys: 6*S_avg*d_attn*L ≈ 8M vs 6N ≈ 2.2G per token) — omitted.
    # hw_util additionally counts the full-remat recompute (one extra fwd
    # ≈ 2N/token), i.e. the fraction of peak the MXU actually sustains.
    from slamkit_tpu.models.transformer import param_count

    n_params = param_count(params)
    mfu = tokens_per_sec * 6 * n_params / V5E_PEAK_BF16_FLOPS
    hw_util = tokens_per_sec * 8 * n_params / V5E_PEAK_BF16_FLOPS
    watchdog.cancel()
    result = {
        "metric": ("slam_train_tokens_per_sec_per_chip" if model_name == "slam"
                   else f"{model_name}_train_tokens_per_sec_per_chip"),
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_sec / BASELINE_TOKENS_PER_SEC, 3),
        "mfu": round(mfu, 4),
        "hw_util_with_remat": round(hw_util, 4),
        "params": int(n_params),
    }
    if model_name == "slam":
        result["floor"] = round(SLAM_THROUGHPUT_FLOOR, 1)
        result["above_floor"] = tokens_per_sec >= SLAM_THROUGHPUT_FLOOR
    print(json.dumps(result))
    if model_name == "slam" and tokens_per_sec < SLAM_THROUGHPUT_FLOOR:
        print(f"bench.py: THROUGHPUT REGRESSION — {tokens_per_sec:.0f} "
              f"tokens/s is below the floor {SLAM_THROUGHPUT_FLOOR:.0f} "
              f"(0.97 x best recorded round)", file=sys.stderr)
        raise SystemExit(4)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="slam",
                    help="config/model/<name>.yaml arch variant to bench "
                         "(e.g. slam_dh128); default is the headline recipe")
    main(ap.parse_args().model)

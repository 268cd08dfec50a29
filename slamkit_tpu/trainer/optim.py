"""Optimizer + LR schedules matching the reference's HF TrainingArguments
surface (reference config/training_args/default.yaml:3-15, cli/train.py:48-54):
adamw, max_grad_norm clipping, warmup = max(warmup_steps, warmup_ratio·total),
and scheduler types {linear, cosine, cosine_with_min_lr, constant,
constant_with_warmup}."""
from __future__ import annotations

import math
from typing import Optional

import optax


def resolve_warmup_steps(warmup_steps: int, warmup_ratio: float,
                         total_steps: int) -> int:
    """The reference takes the max of the explicit step count and the ratio
    (reference cli/train.py:48-54)."""
    return max(int(warmup_steps or 0), math.ceil((warmup_ratio or 0.0) * total_steps))


def make_schedule(lr_scheduler_type: str, learning_rate: float, total_steps: int,
                  warmup_steps: int = 0, min_lr: Optional[float] = None):
    """HF-style schedule as an optax schedule fn of the global step."""
    warmup_steps = min(warmup_steps, total_steps)
    decay_steps = max(total_steps - warmup_steps, 1)
    if lr_scheduler_type == "constant":
        return lambda step: learning_rate
    if lr_scheduler_type == "constant_with_warmup":
        warm = optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1))
        return optax.join_schedules([warm, lambda s: learning_rate], [warmup_steps])
    if lr_scheduler_type == "linear":
        warm = optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1))
        decay = optax.linear_schedule(learning_rate, 0.0, decay_steps)
        return optax.join_schedules([warm, decay], [warmup_steps])
    if lr_scheduler_type in ("cosine", "cosine_with_min_lr"):
        end = float(min_lr or 0.0) if lr_scheduler_type == "cosine_with_min_lr" else 0.0
        warm = optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1))
        # cosine from learning_rate down to end over decay_steps
        alpha = end / learning_rate if learning_rate else 0.0
        decay = optax.cosine_decay_schedule(learning_rate, decay_steps, alpha=alpha)
        return optax.join_schedules([warm, decay], [warmup_steps])
    raise ValueError(f"Unknown lr_scheduler_type: {lr_scheduler_type}")


def scale_by_adam_compact(b1: float, b2: float, eps: float, state_dtype):
    """Adam moment tracking with BOTH moments stored in `state_dtype`
    (optax.scale_by_adam only downcasts mu). All arithmetic runs in f32;
    only the carried state is compressed — bf16 moments halve the optimizer
    HBM footprint (2.9GB -> 1.4GB for the 360M Slam recipe), which is what
    lets the no-remat step fit on a 16G v5e."""
    import jax
    import jax.numpy as jnp

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=state_dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params))

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        f32 = lambda t: t.astype(jnp.float32)

        def upd_mu(g, mu):
            return b1 * f32(mu) + (1.0 - b1) * f32(g)

        def upd_nu(g, nu):
            g = f32(g)
            return b2 * f32(nu) + (1.0 - b2) * g * g

        mu = jax.tree_util.tree_map(upd_mu, updates, state.mu)
        nu = jax.tree_util.tree_map(upd_nu, updates, state.nu)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        new_updates = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu)
        store = lambda t: t.astype(state_dtype)
        return new_updates, optax.ScaleByAdamState(
            count=count,
            mu=jax.tree_util.tree_map(store, mu),
            nu=jax.tree_util.tree_map(store, nu))

    return optax.GradientTransformation(init, update)


def make_optimizer(args, total_steps: int):
    """Optimizer + global-norm clip, driven by the training_args config node.
    Returns (optax transform, schedule fn) — the schedule is also returned so
    the trainer can log lr without peeking into opt state.

    HF-surface keys honored: `optim` (adamw_* -> AdamW, the default;
    `adafactor` -> optax.adafactor with negligible state) plus the TPU-native
    `optim_state_dtype` (float32 | bfloat16) compressing the AdamW moments."""
    import jax.numpy as jnp

    warmup = resolve_warmup_steps(args.get("warmup_steps", 0),
                                  args.get("warmup_ratio", 0.0), total_steps)
    kwargs = args.get("lr_scheduler_kwargs", None)
    min_lr = None
    if kwargs is not None:
        get = kwargs.get if hasattr(kwargs, "get") else dict(kwargs).get
        min_lr = get("min_lr", None)
    schedule = make_schedule(args.get("lr_scheduler_type", "linear"),
                             float(args.learning_rate), total_steps,
                             warmup_steps=warmup, min_lr=min_lr)

    optim = str(args.get("optim", "adamw_torch") or "adamw_torch").lower()
    clip = optax.clip_by_global_norm(float(args.get("max_grad_norm", 1.0)))
    weight_decay = float(args.get("weight_decay", 0.0))

    if optim == "adafactor":
        # optax.adafactor's weight_decay_rate is a MULTIPLICATIVE relative
        # decay, not the lr-scaled decoupled decay the adamw path applies —
        # build the chain explicitly so the same `weight_decay` config value
        # means the same regularisation under both optimizers
        # (scale_by_factored_rms + param-block scaling = adafactor with
        # multiply_by_parameter_scale, clipping_threshold=None as before;
        # scale_by_learning_rate supplies the final sign flip that
        # optax.adafactor's trailing scale(-1) would)
        tx = optax.chain(
            clip,
            optax.scale_by_factored_rms(),
            optax.scale_by_param_block_rms(),
            optax.add_decayed_weights(weight_decay) if weight_decay
            else optax.identity(),
            optax.scale_by_learning_rate(schedule))
        return tx, schedule
    if not optim.startswith("adamw"):
        raise ValueError(f"Unsupported optim: {optim!r} (adamw_*, adafactor)")

    state_dtype = str(args.get("optim_state_dtype", "float32") or "float32")
    b1 = float(args.get("adam_beta1", 0.9))
    b2 = float(args.get("adam_beta2", 0.999))
    eps = float(args.get("adam_epsilon", 1e-8))
    if state_dtype == "float32":
        adam = optax.scale_by_adam(b1=b1, b2=b2, eps=eps)
    elif state_dtype == "bfloat16":
        adam = scale_by_adam_compact(b1=b1, b2=b2, eps=eps,
                                     state_dtype=jnp.bfloat16)
    else:
        raise ValueError(f"Unsupported optim_state_dtype: {state_dtype!r}")
    tx = optax.chain(
        clip,
        adam,
        optax.add_decayed_weights(weight_decay) if weight_decay
        else optax.identity(),
        optax.scale_by_learning_rate(schedule),
    )
    return tx, schedule

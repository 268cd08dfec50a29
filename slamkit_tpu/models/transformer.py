"""Functional causal-transformer decoder for TPU.

This is the compute core behind UnitLM (the reference wraps arbitrary HF
AutoModelForCausalLM instances — reference slamkit/model/unit_lm.py:94-102).
Here one configurable decoder covers the model families the reference's
configs use (facebook/opt-*, Qwen/Qwen2.5-*, meta-llama/*, EleutherAI/pythia-*)
with a TPU-first design:

  * pure-functional params pytree; layers STACKED along a leading axis and
    applied with lax.scan — O(1) compile time in depth, remat-friendly.
  * bf16 compute / f32 params; logits in f32 for the loss.
  * attention via the Pallas flash kernel (TPU) or the XLA reference (CPU),
    both taking segment ids so padding and sequence packing share one path.
  * GQA via kv-head repetition; RoPE (configurable theta/pct) or learned
    positions (OPT's offset-by-2 scheme, reference uses opt-125m by default).
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..ops import flash_attention, mha_reference


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 512
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    num_kv_heads: int = 12
    head_dim: int = 64
    max_position_embeddings: int = 2048
    # family knobs
    norm: str = "rmsnorm"            # rmsnorm | layernorm
    act: str = "silu_glu"            # silu_glu | gelu_glu | relu | gelu
    pos: str = "rope"                # rope | learned
    rope_theta: float = 10000.0
    rotary_pct: float = 1.0          # gptneox uses 0.25
    learned_pos_offset: int = 0      # OPT uses 2
    parallel_residual: bool = False  # gptneox/pythia
    qkv_bias: bool = False           # qwen2: True
    attn_out_bias: bool = False
    mlp_bias: bool = False
    norm_bias: bool = False          # layernorm bias (opt/neox: True)
    # OPT-350m family: embeddings live at word_embed_proj_dim with
    # project_in/project_out linears around the decoder stack (reference
    # supports any AutoModelForCausalLM — unit_lm.py:94-102); 0 = hidden_size
    embed_proj_dim: int = 0
    # False = post-LN blocks (OPT do_layer_norm_before=False); the top-level
    # final norm only exists for pre-norm models (HF OPT semantics)
    pre_norm: bool = True
    tie_word_embeddings: bool = True
    norm_eps: float = 1e-6
    initializer_range: float = 0.02
    # training-time regularisation (reference passes these into the HF model,
    # config/model/default.yaml:8-10; active only when a dropout_rng is
    # passed to forward — eval/generate stay deterministic)
    dropout: float = 0.0             # embeddings + residual branches
    attention_dropout: float = 0.0   # attention probabilities (XLA path only)
    layerdrop: float = 0.0           # skip whole layers with prob p (OPT)
    # execution knobs
    dtype: str = "bfloat16"          # compute dtype
    attn_impl: str = "auto"          # auto | flash | xla
    remat: bool = False
    # full: recompute everything (min memory); qkv: save q/k/v + attention
    # output so backward never re-runs the attention forward (the flash
    # kernel's vjp recomputes blockwise from q/k/v), only the cheap
    # projections/MLP — ~half the remat recompute for +~50MB/layer.
    remat_policy: str = "full"       # full | qkv
    # checkpoint only the first N layers (the rest keep activations): trades
    # freed HBM for less recompute. -1 = all layers.
    remat_layers: int = -1
    flash_block_q: int = 0          # 0 = auto (largest VMEM-fitting tiles)
    flash_block_k: int = 0

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


# --------------------------------------------------------------------------- #
# init
# --------------------------------------------------------------------------- #
def init_params(cfg: DecoderConfig, rng: jax.Array) -> dict:
    """Random init (the reference's gslm mode: same arch, fresh weights —
    reference config/model/gslm.yaml:6). Weights stored f32."""
    k_embed, k_layers, k_head, k_pos = jax.random.split(rng, 4)
    std = cfg.initializer_range
    D, L = cfg.hidden_size, cfg.num_layers

    def normal(key, shape):
        return jax.random.normal(key, shape, jnp.float32) * std

    ks = jax.random.split(k_layers, 8)
    layers = {
        "attn_norm_scale": jnp.ones((L, D)),
        "q_w": normal(ks[0], (L, D, cfg.q_dim)),
        "k_w": normal(ks[1], (L, D, cfg.kv_dim)),
        "v_w": normal(ks[2], (L, D, cfg.kv_dim)),
        "o_w": normal(ks[3], (L, cfg.q_dim, D)),
        "mlp_norm_scale": jnp.ones((L, D)),
        "up_w": normal(ks[4], (L, D, cfg.intermediate_size)),
        "down_w": normal(ks[5], (L, cfg.intermediate_size, D)),
    }
    if cfg.act.endswith("_glu"):
        layers["gate_w"] = normal(ks[6], (L, D, cfg.intermediate_size))
    if cfg.qkv_bias:
        layers.update(q_b=jnp.zeros((L, cfg.q_dim)), k_b=jnp.zeros((L, cfg.kv_dim)),
                      v_b=jnp.zeros((L, cfg.kv_dim)))
    if cfg.attn_out_bias:
        layers["o_b"] = jnp.zeros((L, D))
    if cfg.mlp_bias:
        layers.update(up_b=jnp.zeros((L, cfg.intermediate_size)),
                      down_b=jnp.zeros((L, D)))
        if cfg.act.endswith("_glu"):
            layers["gate_b"] = jnp.zeros((L, cfg.intermediate_size))
    if cfg.norm == "layernorm" and cfg.norm_bias:
        layers.update(attn_norm_bias=jnp.zeros((L, D)), mlp_norm_bias=jnp.zeros((L, D)))

    E = cfg.embed_proj_dim or D
    params = {
        "embed": normal(k_embed, (cfg.vocab_size, E)),
        "layers": layers,
    }
    if cfg.pre_norm:
        params["final_norm_scale"] = jnp.ones((D,))
        if cfg.norm == "layernorm" and cfg.norm_bias:
            params["final_norm_bias"] = jnp.zeros((D,))
    if cfg.embed_proj_dim:
        kp1, kp2 = jax.random.split(k_head)
        params["proj_in_w"] = normal(kp1, (E, D))
        params["proj_out_w"] = normal(kp2, (D, E))
    if cfg.pos == "learned":
        params["pos_embed"] = normal(k_pos, (cfg.max_position_embeddings + cfg.learned_pos_offset, D))
    if not cfg.tie_word_embeddings:
        params["lm_head"] = normal(k_head, (E, cfg.vocab_size))
    return params


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


# --------------------------------------------------------------------------- #
# building blocks
# --------------------------------------------------------------------------- #
def _norm(x, scale, bias, cfg: DecoderConfig):
    x32 = x.astype(jnp.float32)
    if cfg.norm == "rmsnorm":
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        out = x32 * jax.lax.rsqrt(var + cfg.norm_eps) * scale
    else:
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + cfg.norm_eps) * scale
        if bias is not None:
            out = out + bias
    return out.astype(x.dtype)


def _rope(x, positions, cfg: DecoderConfig):
    """NeoX-style rotary embedding. x: [B, H, T, Dh]; positions: [B, T]."""
    rot_dim = int(cfg.head_dim * cfg.rotary_pct)
    if rot_dim == 0:
        return x
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    half = rot_dim // 2
    freqs = cfg.rope_theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions[:, None, :, None].astype(jnp.float32) * freqs  # [B,1,T,half]
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = x_rot[..., :half], x_rot[..., half:]
    rotated = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return jnp.concatenate([rotated.astype(x.dtype), x_pass], axis=-1)


# With auto (VMEM-filling) block sizes the Pallas flash kernel beats XLA's
# fused attention decisively on v5e: full-model remat grad step at
# [8, 14, 1024, 64] is 224ms flash vs 359ms XLA (36.6k vs 22.8k tok/s) —
# the FlashAttention-paper 128x128 blocks were the earlier bottleneck
# (487ms); 1024x1024 tiles amortize grid/DMA overhead, and the custom VJP
# never materialises the [B, H, T, T] probabilities XLA saves for backward.
def _use_flash(cfg: DecoderConfig) -> bool:
    if cfg.attn_impl == "flash":
        return True
    if cfg.attn_impl == "xla":
        return False
    return jax.default_backend() not in ("cpu",)


def _attention(q, k, v, segment_ids, cfg: DecoderConfig, causal=True,
               dropout_rng=None, cp_mesh=None, cp_schedule="contiguous"):
    if _use_flash(cfg):
        # interpret mode runs the same kernels on the CPU test mesh (like
        # quant.dq_matmul) so attn_implementation=flash_attention_2 works
        # everywhere; TPU compiles them for real
        interpret = jax.default_backend() == "cpu"
        if cp_mesh is not None:
            # context parallelism: the time dim is sharded over the 'seq'
            # mesh axis — ring schedule around the kernel (ops/ring_attention)
            from ..ops.ring_attention import ring_flash_attention

            return ring_flash_attention(q, k, v, segment_ids=segment_ids,
                                        mesh=cp_mesh,
                                        sm_scale=cfg.head_dim ** -0.5,
                                        block_q=cfg.flash_block_q or None,
                                        block_k=cfg.flash_block_k or None,
                                        schedule=cp_schedule,
                                        interpret=interpret)
        # forward() rejects attention_dropout>0 + flash up front
        return flash_attention(q, k, v, segment_ids=segment_ids, causal=causal,
                               sm_scale=cfg.head_dim ** -0.5,
                               block_q=cfg.flash_block_q or None,
                               block_k=cfg.flash_block_k or None,
                               interpret=interpret)
    return mha_reference(q, k, v, segment_ids=segment_ids, causal=causal,
                         sm_scale=cfg.head_dim ** -0.5,
                         dropout_rate=cfg.attention_dropout,
                         dropout_rng=dropout_rng)


def _proj_w(x, w, dt):
    """[..., d] @ [d, f] projection; w is either a dense array or an int8
    weight-only dict {"q": int8 [d, f], "s": bf16 [1, f]} (decode path —
    generate._quantize_decode_params). The Pallas dequant-gemv streams the
    int8 bytes from HBM so the bf16 tensor never exists there."""
    if isinstance(w, dict):
        from ..ops.quant import dq_matmul

        lead = x.shape[:-1]
        y = dq_matmul(x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16),
                      w["q"], w["s"],
                      interpret=jax.default_backend() == "cpu")
        return y.reshape(*lead, y.shape[-1]).astype(dt)
    return jnp.einsum("btd,df->btf", x, w.astype(dt))


def _mlp(x, lp, cfg: DecoderConfig):
    def proj(x, w, b):
        y = _proj_w(x, w, x.dtype)
        return y + b.astype(x.dtype) if b is not None else y

    up = proj(x, lp["up_w"], lp.get("up_b"))
    if cfg.act == "silu_glu":
        h = jax.nn.silu(proj(x, lp["gate_w"], lp.get("gate_b"))) * up
    elif cfg.act == "gelu_glu":
        h = jax.nn.gelu(proj(x, lp["gate_w"], lp.get("gate_b"))) * up
    elif cfg.act == "relu":
        h = jax.nn.relu(up)
    else:
        h = jax.nn.gelu(up)
    return proj(h, lp["down_w"], lp.get("down_b"))


def _split_heads(x, n_heads, head_dim):
    b, t, _ = x.shape
    return x.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def _dropout(x, rate: float, rng):
    """Inverted dropout; identity when rate==0 or rng is None."""
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def _layer(x, lp, positions, segment_ids, cfg: DecoderConfig, cache_kv=None,
           cache_index=None, dropout_rng=None, cp_mesh=None,
           cp_schedule="contiguous"):
    """One decoder block. cache_kv: optional (k, v) [B, Hkv, Tmax, Dh] to update
    at cache_index (decode); returns (out, new_cache_kv)."""
    dt = x.dtype
    # pre-norm: normalise the attention input; post-norm (OPT
    # do_layer_norm_before=False): attend to the raw residual stream and
    # normalise AFTER each residual add
    h = (_norm(x, lp["attn_norm_scale"], lp.get("attn_norm_bias"), cfg)
         if cfg.pre_norm else x)

    def proj(inp, w, b):
        y = _proj_w(inp, w, dt)
        return y + b.astype(dt) if b is not None else y

    q = _split_heads(proj(h, lp["q_w"], lp.get("q_b")), cfg.num_heads, cfg.head_dim)
    k = _split_heads(proj(h, lp["k_w"], lp.get("k_b")), cfg.num_kv_heads, cfg.head_dim)
    v = _split_heads(proj(h, lp["v_w"], lp.get("v_b")), cfg.num_kv_heads, cfg.head_dim)

    if cfg.pos == "rope":
        q = _rope(q, positions, cfg)
        k = _rope(k, positions, cfg)

    if cfg.remat and cfg.remat_policy == "qkv":
        from jax.ad_checkpoint import checkpoint_name

        q = checkpoint_name(q, "attn_q")
        k = checkpoint_name(k, "attn_k")
        v = checkpoint_name(v, "attn_v")

    new_cache = None
    decode = cache_kv is not None and q.shape[2] == 1
    if cache_kv is not None:
        ck, cv = cache_kv
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, cache_index, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, cache_index, 0))
        new_cache = (ck, cv)
        if decode:
            k, v = ck.astype(dt), cv.astype(dt)

    groups = cfg.num_heads // cfg.num_kv_heads

    if decode:
        # single-step decode: grouped-query attention against the UN-REPEATED
        # cache (materialising the groups-fold of [B,Hkv,T,Dh] per layer per
        # token would multiply the bandwidth of an already bandwidth-bound
        # loop). q heads are kv-major, so head i uses kv head i // groups.
        b_, _, _, dh = q.shape
        t_k = k.shape[2]
        qg = q[:, :, 0].reshape(b_, cfg.num_kv_heads, groups, dh)
        scores = jnp.einsum("bkgd,bktd->bkgt", qg, k,
                            preferred_element_type=jnp.float32) * cfg.head_dim ** -0.5
        key_idx = jnp.arange(t_k)[None, None, None, :]
        valid = key_idx <= cache_index
        if segment_ids is not None:
            valid = valid & (segment_ids[:, None, None, :] >= 0)
        scores = jnp.where(valid, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        attn = jnp.einsum("bkgt,bktd->bkgd", probs, v)
        attn = attn.reshape(b_, cfg.num_heads, 1, dh)
    else:
        if groups > 1 and not _use_flash(cfg):
            # the Pallas kernel is GQA-native (kv groups fold into its matmul
            # M panel); only the XLA reference path needs materialised heads
            k = jnp.repeat(k, groups, axis=1)
            v = jnp.repeat(v, groups, axis=1)
        # training or prefill: attend within the current window (the window IS
        # the full history during prefill)
        attn = _attention(q, k, v, segment_ids, cfg, causal=True,
                          dropout_rng=(dropout_rng[0]
                                       if dropout_rng is not None else None),
                          cp_mesh=cp_mesh, cp_schedule=cp_schedule)

    if cfg.remat and cfg.remat_policy == "qkv":
        from jax.ad_checkpoint import checkpoint_name

        attn = checkpoint_name(attn, "attn_out")
    attn_out = proj(_merge_heads(attn), lp["o_w"], lp.get("o_b"))
    # residual-branch dropout (HF hidden dropout semantics); dropout_rng is a
    # [3, 2] key array: (attn probs, attn residual, mlp residual)
    k_attn_r = dropout_rng[1] if dropout_rng is not None else None
    k_mlp_r = dropout_rng[2] if dropout_rng is not None else None
    attn_out = _dropout(attn_out, cfg.dropout, k_attn_r)

    if cfg.parallel_residual:
        h2 = _norm(x, lp["mlp_norm_scale"], lp.get("mlp_norm_bias"), cfg)
        out = x + attn_out + _dropout(_mlp(h2, lp, cfg), cfg.dropout, k_mlp_r)
    elif cfg.pre_norm:
        x = x + attn_out
        h2 = _norm(x, lp["mlp_norm_scale"], lp.get("mlp_norm_bias"), cfg)
        out = x + _dropout(_mlp(h2, lp, cfg), cfg.dropout, k_mlp_r)
    else:  # post-LN (OPT-350m): norm(x + attn), then norm(x + mlp)
        x = _norm(x + attn_out, lp["attn_norm_scale"],
                  lp.get("attn_norm_bias"), cfg)
        out = _norm(x + _dropout(_mlp(x, lp, cfg), cfg.dropout, k_mlp_r),
                    lp["mlp_norm_scale"], lp.get("mlp_norm_bias"), cfg)
    return out, new_cache


# --------------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------------- #
def forward(params: dict, cfg: DecoderConfig, input_ids: jax.Array,
            positions: Optional[jax.Array] = None,
            segment_ids: Optional[jax.Array] = None,
            cache: Optional[Any] = None,
            cache_index: Optional[jax.Array] = None,
            dropout_rng: Optional[jax.Array] = None,
            cp_mesh=None, cp_schedule: str = "contiguous"):
    """Run the decoder. Returns (logits_f32 [B,T,V], new_cache).

    positions default to 0..T-1; pass explicit positions for left-padded
    prompts. segment_ids: [B,T] ints; -1 marks padding (pads attend nowhere
    that matters and are excluded as keys). dropout_rng activates the
    config's dropout/attention_dropout/layerdrop rates (training); without
    it the forward is deterministic (reference: HF model.eval() semantics).
    cp_mesh: a Mesh with a 'seq' axis — the flash path runs ring attention
    with the time dim sequence-sharded (context parallelism); everything
    else in the block stays GSPMD-sharded by the caller's in_shardings.
    """
    use_do = dropout_rng is not None and (
        cfg.dropout > 0.0 or cfg.attention_dropout > 0.0 or cfg.layerdrop > 0.0)
    if use_do and cfg.attention_dropout > 0.0 and _use_flash(cfg):
        # refuse loudly rather than silently skipping probability dropout —
        # the Pallas kernel never materialises the prob matrix to mask
        raise ValueError(
            "attention_dropout > 0 requires attn_implementation='xla' (the "
            "flash kernel does not support probability dropout); set "
            "model.config_args.attn_implementation=null on CPU or use "
            "dropout/layerdrop instead")
    dt = cfg.compute_dtype
    b, t = input_ids.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))

    x = params["embed"][input_ids].astype(dt)
    if cfg.embed_proj_dim:
        # OPT-350m: project word_embed_proj_dim -> hidden BEFORE the learned
        # positions are added (HF OPTDecoder order)
        x = jnp.einsum("bte,ed->btd", x, params["proj_in_w"].astype(dt))
    if cfg.pos == "learned":
        # JAX gather CLAMPS out-of-range indices (torch raises) — overflowing
        # the position table would silently reuse the last row's embedding
        if t > cfg.max_position_embeddings:
            raise ValueError(
                f"sequence length {t} exceeds max_position_embeddings "
                f"{cfg.max_position_embeddings} for learned positions")
        x = x + params["pos_embed"][positions + cfg.learned_pos_offset].astype(dt)

    layer_params = params["layers"]

    if cache is None:
        if use_do:
            k_embed, k_layers = jax.random.split(dropout_rng)
            x = _dropout(x, cfg.dropout, k_embed)
            # per-layer keys ride the scan: [L, 4, 2] = (layerdrop decision,
            # attn probs, attn residual, mlp residual)
            layer_keys = jax.random.split(
                k_layers, cfg.num_layers * 4).reshape(cfg.num_layers, 4, 2)

            def body(carry, xs):
                lp, keys = xs
                out, _ = _layer(carry, lp, positions, segment_ids, cfg,
                                dropout_rng=keys[1:], cp_mesh=cp_mesh,
                                cp_schedule=cp_schedule)
                if cfg.layerdrop > 0.0:
                    # HF layerdrop: skip the whole layer with prob p, no
                    # rescale (train-only)
                    keep = jax.random.bernoulli(keys[0], 1.0 - cfg.layerdrop)
                    out = jnp.where(keep, out, carry)
                return out, None

            xs = (layer_params, layer_keys)
        else:
            def body(carry, lp):
                out, _ = _layer(carry, lp, positions, segment_ids, cfg,
                                cp_mesh=cp_mesh, cp_schedule=cp_schedule)
                return out, None

            xs = layer_params

        if cfg.remat:
            if cfg.remat_policy == "qkv":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_q", "attn_k", "attn_v", "attn_out")
                ck_body = jax.checkpoint(body, policy=policy)
            else:
                ck_body = jax.checkpoint(body)
            n_ck = cfg.num_layers if cfg.remat_layers < 0 else \
                min(cfg.remat_layers, cfg.num_layers)
            if n_ck == cfg.num_layers:
                x, _ = jax.lax.scan(ck_body, x, xs)
            else:  # partial remat: first n_ck layers checkpointed, rest plain
                head = jax.tree_util.tree_map(lambda a: a[:n_ck], xs)
                tail = jax.tree_util.tree_map(lambda a: a[n_ck:], xs)
                x, _ = jax.lax.scan(ck_body, x, head)
                x, _ = jax.lax.scan(body, x, tail)
        else:
            x, _ = jax.lax.scan(body, x, xs)
        new_cache = None
    else:
        def body(carry, xs):
            lp, ck, cv = xs
            out, new_kv = _layer(carry, lp, positions, segment_ids, cfg,
                                 cache_kv=(ck, cv), cache_index=cache_index)
            return out, new_kv

        x, new_cache = jax.lax.scan(body, x, (layer_params, cache[0], cache[1]))

    if cfg.pre_norm:
        x = _norm(x, params["final_norm_scale"], params.get("final_norm_bias"), cfg)
    if cfg.embed_proj_dim:
        x = jnp.einsum("btd,de->bte", x, params["proj_out_w"].astype(x.dtype))
    head = params["embed"].T if cfg.tie_word_embeddings else params["lm_head"]
    logits = jnp.einsum("btd,dv->btv", x.astype(jnp.float32), head.astype(jnp.float32))
    return logits, new_cache


def init_cache(cfg: DecoderConfig, batch: int, max_len: int, dtype=None):
    """KV cache arrays [L, B, Hkv, Tmax, Dh] (stacked for the layer scan)."""
    dtype = dtype or cfg.compute_dtype
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

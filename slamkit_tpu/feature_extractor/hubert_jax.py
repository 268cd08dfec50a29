"""JAX HuBERT encoder (conv frontend + transformer) with a layer tap.

Numerical counterpart of HF's HubertModel as the reference drives it
(reference slamkit/feature_extractor/hubert_feature_extractor.py:33-42):
forward a padded wav batch WITHOUT attention mask and read
hidden_states[layer]. TPU-first details:

  * layers stacked on a leading axis + lax.scan — the tap is an early-exit:
    only `layer` blocks run, not all 12 (the reference computes all hidden
    states and throws most away);
  * weight-norm on the positional conv is folded at conversion time;
  * the k-means assignment fuses into the same jit as one matmul + argmin
    (ops/kmeans) — no GPU->CPU hop like the reference's sklearn predict
    (hubert_feature_extractor.py:42-43).

hidden_states indexing parity: tap k = activations after k encoder blocks,
where tap 0 is the post-(pos_conv + layernorm) encoder input — exactly HF's
`output_hidden_states` tuple indexing.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"      # group | layer
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = False
    feat_proj_layer_norm: bool = True
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_hf_dict(cls, d: dict) -> "HubertConfig":
        keep = {f.name for f in dataclasses.fields(cls)}
        vals = {k: (tuple(v) if isinstance(v, list) else v)
                for k, v in d.items() if k in keep}
        return cls(**vals)

    @property
    def total_stride(self) -> int:
        out = 1
        for s in self.conv_stride:
            out *= s
        return out


def _layer_norm(x, scale, bias, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _conv1d(x, w, b, stride=1, padding=0, groups=1):
    """x: [B, C, T]; w: [O, I/groups, K] (torch layout kept verbatim)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=groups,
        precision=jax.lax.Precision.HIGHEST)
    if b is not None:
        out = out + b[None, :, None]
    return out


def conv_frontend(params: dict, cfg: HubertConfig, wav: jax.Array) -> jax.Array:
    """Raw wav [B, T] -> features [B, T', conv_dim[-1]] (HF HubertFeatureEncoder)."""
    x = wav[:, None, :].astype(jnp.float32)
    for i in range(len(cfg.conv_dim)):
        lp = params["conv_layers"][i]
        x = _conv1d(x, lp["conv_w"], lp.get("conv_b"), stride=cfg.conv_stride[i])
        if i == 0 and cfg.feat_extract_norm == "group":
            # GroupNorm(groups == channels): per-channel norm over time
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
            x = x * lp["norm_scale"][None, :, None] + lp["norm_bias"][None, :, None]
        elif cfg.feat_extract_norm == "layer":
            xt = x.transpose(0, 2, 1)
            xt = _layer_norm(xt, lp["norm_scale"], lp["norm_bias"], cfg.layer_norm_eps)
            x = xt.transpose(0, 2, 1)
        x = jax.nn.gelu(x, approximate=False)
    return x.transpose(0, 2, 1)


def _pos_conv(params, cfg: HubertConfig, x):
    """HubertPositionalConvEmbedding: grouped conv + same-pad trim + gelu."""
    pad = cfg.num_conv_pos_embeddings // 2
    h = _conv1d(x.transpose(0, 2, 1), params["pos_conv_w"], params["pos_conv_b"],
                padding=pad, groups=cfg.num_conv_pos_embedding_groups)
    if cfg.num_conv_pos_embeddings % 2 == 0:
        h = h[:, :, :-1]
    return jax.nn.gelu(h, approximate=False).transpose(0, 2, 1)


def _encoder_block(x, lp, cfg: HubertConfig, stable: bool):
    """One HubertEncoderLayer (post-norm) or StableLayerNorm (pre-norm)."""
    H, Dh = cfg.num_attention_heads, cfg.hidden_size // cfg.num_attention_heads
    B, T, D = x.shape
    eps = cfg.layer_norm_eps

    def attn(h):
        q = (h @ lp["q_w"].T + lp["q_b"]) * Dh ** -0.5
        k = h @ lp["k_w"].T + lp["k_b"]
        v = h @ lp["v_w"].T + lp["v_b"]
        q = q.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        return out @ lp["o_w"].T + lp["o_b"]

    def ff(h):
        h = jax.nn.gelu(h @ lp["ff_in_w"].T + lp["ff_in_b"], approximate=False)
        return h @ lp["ff_out_w"].T + lp["ff_out_b"]

    if stable:
        x = x + attn(_layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], eps))
        x = x + ff(_layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], eps))
    else:
        x = x + attn(x)
        x = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], eps)
        x = x + ff(x)
        x = _layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], eps)
    return x


def forward(params: dict, cfg: HubertConfig, wav: jax.Array,
            tap_layer: Optional[int] = None) -> jax.Array:
    """wav [B, T] -> hidden_states[tap_layer] [B, T', hidden] (f32).

    tap_layer follows HF indexing (see module docstring); None = all layers
    + final output (incl. the stable variant's final layer norm).
    """
    feats = conv_frontend(params, cfg, wav)
    if cfg.feat_proj_layer_norm:
        feats = _layer_norm(feats, params["fp_norm_scale"], params["fp_norm_bias"],
                            cfg.layer_norm_eps)
    x = feats @ params["fp_proj_w"].T + params["fp_proj_b"]

    x = x + _pos_conv(params, cfg, x)
    stable = cfg.do_stable_layer_norm
    if not stable:
        x = _layer_norm(x, params["enc_norm_scale"], params["enc_norm_bias"],
                        cfg.layer_norm_eps)

    n = cfg.num_hidden_layers if tap_layer is None else tap_layer
    if n > 0:
        layers = jax.tree_util.tree_map(lambda a: a[:n], params["layers"])

        def body(h, lp):
            return _encoder_block(h, lp, cfg, stable), None

        x, _ = jax.lax.scan(body, x, layers)

    if stable and (tap_layer is None or tap_layer == cfg.num_hidden_layers):
        x = _layer_norm(x, params["enc_norm_scale"], params["enc_norm_bias"],
                        cfg.layer_norm_eps)
    return x


# --------------------------------------------------------------------------- #
# weight conversion (HF torch HubertModel state_dict -> params pytree)
# --------------------------------------------------------------------------- #
def convert_hf_state_dict(sd: dict, cfg: HubertConfig) -> dict:
    """Map an HF HubertModel state_dict (numpy-valued) to the params pytree.
    Weight-norm on the positional conv is folded (inference only)."""

    def get(k):
        return np.asarray(sd[k], dtype=np.float32)

    conv_layers = []
    for i in range(len(cfg.conv_dim)):
        lp = {"conv_w": get(f"feature_extractor.conv_layers.{i}.conv.weight")}
        if cfg.conv_bias:
            lp["conv_b"] = get(f"feature_extractor.conv_layers.{i}.conv.bias")
        if (i == 0 and cfg.feat_extract_norm == "group") or cfg.feat_extract_norm == "layer":
            lp["norm_scale"] = get(f"feature_extractor.conv_layers.{i}.layer_norm.weight")
            lp["norm_bias"] = get(f"feature_extractor.conv_layers.{i}.layer_norm.bias")
        conv_layers.append(lp)

    # fold weight norm: w = g * v / ||v|| over dims (0, 1), per kernel position
    if "encoder.pos_conv_embed.conv.parametrizations.weight.original0" in sd:
        g = get("encoder.pos_conv_embed.conv.parametrizations.weight.original0")
        v = get("encoder.pos_conv_embed.conv.parametrizations.weight.original1")
    else:
        g = get("encoder.pos_conv_embed.conv.weight_g")
        v = get("encoder.pos_conv_embed.conv.weight_v")
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    pos_conv_w = g * v / np.maximum(norm, 1e-12)

    def stack(fmt):
        return np.stack([get(fmt.format(i=i)) for i in range(cfg.num_hidden_layers)])

    layers = {
        "q_w": stack("encoder.layers.{i}.attention.q_proj.weight"),
        "q_b": stack("encoder.layers.{i}.attention.q_proj.bias"),
        "k_w": stack("encoder.layers.{i}.attention.k_proj.weight"),
        "k_b": stack("encoder.layers.{i}.attention.k_proj.bias"),
        "v_w": stack("encoder.layers.{i}.attention.v_proj.weight"),
        "v_b": stack("encoder.layers.{i}.attention.v_proj.bias"),
        "o_w": stack("encoder.layers.{i}.attention.out_proj.weight"),
        "o_b": stack("encoder.layers.{i}.attention.out_proj.bias"),
        "ln1_scale": stack("encoder.layers.{i}.layer_norm.weight"),
        "ln1_bias": stack("encoder.layers.{i}.layer_norm.bias"),
        "ff_in_w": stack("encoder.layers.{i}.feed_forward.intermediate_dense.weight"),
        "ff_in_b": stack("encoder.layers.{i}.feed_forward.intermediate_dense.bias"),
        "ff_out_w": stack("encoder.layers.{i}.feed_forward.output_dense.weight"),
        "ff_out_b": stack("encoder.layers.{i}.feed_forward.output_dense.bias"),
        "ln2_scale": stack("encoder.layers.{i}.final_layer_norm.weight"),
        "ln2_bias": stack("encoder.layers.{i}.final_layer_norm.bias"),
    }

    params = {
        "conv_layers": conv_layers,
        "fp_proj_w": get("feature_projection.projection.weight"),
        "fp_proj_b": get("feature_projection.projection.bias"),
        "pos_conv_w": pos_conv_w,
        "pos_conv_b": get("encoder.pos_conv_embed.conv.bias"),
        "enc_norm_scale": get("encoder.layer_norm.weight"),
        "enc_norm_bias": get("encoder.layer_norm.bias"),
        "layers": layers,
    }
    if cfg.feat_proj_layer_norm:
        params["fp_norm_scale"] = get("feature_projection.layer_norm.weight")
        params["fp_norm_bias"] = get("feature_projection.layer_norm.bias")
    return params


def load_hf_hubert(model_name_or_path: str):
    """Load an HF Hubert checkpoint (local dir or cached hub id) -> (params, cfg).
    A path ending in .pt is treated as a fairseq/textless checkpoint instead
    (the layout textlesslib's registry ships, e.g. hubert_base_ls960.pt)."""
    if str(model_name_or_path).endswith(".pt"):
        return load_fairseq_hubert(model_name_or_path)
    from transformers import HubertConfig as HFConfig, HubertModel

    model = HubertModel.from_pretrained(model_name_or_path)
    cfg = HubertConfig.from_hf_dict(model.config.to_dict())
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return convert_hf_state_dict(sd, cfg), cfg


# --------------------------------------------------------------------------- #
# fairseq / textless checkpoint layout (.pt with {"model": sd, "cfg"|"args"})
# --------------------------------------------------------------------------- #
def _parse_conv_feature_layers(spec):
    """fairseq encodes the conv stack as a python-expression string like
    '[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2'; parse it without
    eval: literal lists joined by '+', optionally repeated with '* n'."""
    if isinstance(spec, (list, tuple)):
        return [tuple(x) for x in spec]
    import ast

    layers = []
    for term in str(spec).split("+"):
        term, reps = term.strip(), 1
        if "*" in term:
            term, n = term.rsplit("*", 1)
            term, reps = term.strip(), int(n.strip())
        layers.extend([tuple(t) for t in ast.literal_eval(term)] * reps)
    return layers


def config_from_fairseq(model_cfg: dict) -> HubertConfig:
    """fairseq HubertConfig field names -> ours (HF-equivalent semantics:
    extractor_mode 'default' = group norm on block 0, 'layer_norm' =
    per-block fp32 layer norm; layer_norm_first = stable-layer-norm)."""
    triples = _parse_conv_feature_layers(model_cfg.get(
        "conv_feature_layers",
        "[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2"))
    dims, kernels, strides = (tuple(t) for t in zip(*triples))
    mode = str(model_cfg.get("extractor_mode", "default"))
    return HubertConfig(
        conv_dim=dims, conv_kernel=kernels, conv_stride=strides,
        conv_bias=bool(model_cfg.get("conv_bias", False)),
        feat_extract_norm="layer" if mode == "layer_norm" else "group",
        hidden_size=int(model_cfg.get("encoder_embed_dim", 768)),
        num_hidden_layers=int(model_cfg.get("encoder_layers", 12)),
        num_attention_heads=int(model_cfg.get("encoder_attention_heads", 12)),
        intermediate_size=int(model_cfg.get("encoder_ffn_embed_dim", 3072)),
        num_conv_pos_embeddings=int(model_cfg.get("conv_pos", 128)),
        num_conv_pos_embedding_groups=int(model_cfg.get("conv_pos_groups", 16)),
        do_stable_layer_norm=bool(model_cfg.get("layer_norm_first", False)),
    )


def _fairseq_key_to_hf(key: str) -> Optional[str]:
    """Rename one fairseq HubertModel weight key to HF HubertModel layout
    (the mapping HF's conversion script applies); None = pretraining-only
    weight (mask embedding, target codebook, final projection) we drop."""
    import re

    if key in ("mask_emb", "label_embs_concat") or key.startswith("final_proj"):
        return None
    if key.startswith("layer_norm."):             # pre-projection norm
        return "feature_projection." + key
    if key.startswith("post_extract_proj."):
        return key.replace("post_extract_proj.", "feature_projection.projection.")
    if key.startswith("encoder.pos_conv.0."):
        return key.replace("encoder.pos_conv.0.", "encoder.pos_conv_embed.conv.")
    m = re.fullmatch(r"feature_extractor\.conv_layers\.(\d+)\.(.+)", key)
    if m:
        i, rest = m.groups()
        if rest in ("0.weight", "0.bias"):
            return f"feature_extractor.conv_layers.{i}.conv.{rest[2:]}"
        if rest in ("2.weight", "2.bias", "2.1.weight", "2.1.bias"):
            # block-0 GroupNorm (default mode) / per-block Fp32LayerNorm
            return (f"feature_extractor.conv_layers.{i}.layer_norm."
                    + rest.rsplit(".", 1)[-1])
        return None
    if key.startswith("encoder.layers."):
        return (key.replace(".self_attn_layer_norm.", ".layer_norm.")
                .replace(".self_attn.", ".attention.")
                .replace(".fc1.", ".feed_forward.intermediate_dense.")
                .replace(".fc2.", ".feed_forward.output_dense."))
    if key.startswith("encoder.layer_norm."):
        return key
    return None


def fairseq_model_cfg(state: dict) -> dict:
    """Pull the model-config dict out of a fairseq checkpoint: new-style
    {'cfg': {'model': ...}} (cfg may be an omegaconf node) or old-style
    {'args': Namespace-or-dict}."""
    meta = state.get("cfg")
    if meta is not None:
        model_cfg = meta["model"] if isinstance(meta, dict) else meta.model
    else:
        args = state.get("args", {})
        model_cfg = args if isinstance(args, dict) else vars(args)
    return model_cfg if isinstance(model_cfg, dict) else dict(model_cfg)


def convert_fairseq_state(state: dict):
    """fairseq/textless checkpoint dict -> (params pytree, HubertConfig);
    weights under 'model'."""
    cfg = config_from_fairseq(fairseq_model_cfg(state))

    sd = {}
    for k, v in state["model"].items():
        nk = _fairseq_key_to_hf(str(k))
        if nk is not None:
            sd[nk] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return convert_hf_state_dict(sd, cfg), cfg


def load_fairseq_hubert(path: str):
    """Load a fairseq-format HuBERT .pt (the textless registry layout)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    return convert_fairseq_state(state)

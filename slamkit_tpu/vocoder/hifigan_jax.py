"""JAX CodeHiFiGAN: unit-conditioned neural vocoder.

Counterpart of the reference's vendored textlesslib generator
(reference slamkit/vocoder/hifigan/generator.py:24-238, resblock.py:27-118):
unit embedding -> optional VariancePredictor duration re-expansion
(repeat_interleave of round(exp(logdur)-1), generator.py:150-160) -> conv_pre
-> N x (ConvTranspose upsample + multi-kernel ResBlocks averaged) -> conv_post
-> tanh. Weight norm is folded at conversion (inference only). Convs run
through lax.conv_general_dilated in torch's NCH/OIK layout so torch
checkpoints map verbatim; transpose convs are fractionally-strided convs
(lhs_dilation) with flipped kernels.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import math
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


def _lrelu(x, slope=LRELU_SLOPE):
    return jnp.where(x >= 0, x, x * slope)


def _conv1d(x, w, b, stride=1, padding=0, dilation=1):
    """x [B, C, T]; w [O, I, K] (torch layout)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NCH", "OIH", "NCH"))
    if b is not None:
        out = out + b[None, :, None]
    return out


def _conv_transpose1d(x, w, b, stride, padding):
    """torch ConvTranspose1d(stride=u, padding=p) == fractionally-strided conv:
    lhs_dilation=u, kernel flipped along K and [in, out, k] -> [out, in, k]."""
    k = w.shape[-1]
    w_t = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # [O, I, K]
    pad = k - 1 - padding
    out = jax.lax.conv_general_dilated(
        x, w_t, window_strides=(1,), padding=[(pad, pad)],
        lhs_dilation=(stride,), dimension_numbers=("NCH", "OIH", "NCH"))
    if b is not None:
        out = out + b[None, :, None]
    return out


def _get_padding(kernel_size, dilation=1):
    return (kernel_size * dilation - dilation) // 2


def _resblock(x, rp, kernel_size, dilations):
    for i, d in enumerate(dilations):
        xt = _lrelu(x)
        xt = _conv1d(xt, rp["convs1"][i]["w"], rp["convs1"][i]["b"],
                     padding=_get_padding(kernel_size, d), dilation=d)
        xt = _lrelu(xt)
        xt = _conv1d(xt, rp["convs2"][i]["w"], rp["convs2"][i]["b"],
                     padding=_get_padding(kernel_size, 1))
        x = xt + x
    return x


@dataclasses.dataclass(frozen=True)
class _GenCfg:
    """Hashable slice of the checkpoint config — the static jit key for the
    fixed-shape generator program."""

    upsample_rates: tuple
    upsample_kernel_sizes: tuple
    resblock_kernel_sizes: tuple
    resblock_dilation_sizes: tuple  # tuple of tuples

    @classmethod
    def from_dict(cls, cfg: dict) -> "_GenCfg":
        return cls(
            tuple(cfg["upsample_rates"]),
            tuple(cfg["upsample_kernel_sizes"]),
            tuple(cfg["resblock_kernel_sizes"]),
            tuple(tuple(d) for d in cfg["resblock_dilation_sizes"]))

    @property
    def hop(self) -> int:
        return math.prod(self.upsample_rates)


def _generator_fwd(params: dict, gcfg: _GenCfg, x: jax.Array) -> jax.Array:
    num_kernels = len(gcfg.resblock_kernel_sizes)
    x = _conv1d(x, params["conv_pre"]["w"], params["conv_pre"]["b"], padding=3)
    for i, (u, k) in enumerate(zip(gcfg.upsample_rates,
                                   gcfg.upsample_kernel_sizes)):
        x = _lrelu(x)
        x = _conv_transpose1d(x, params["ups"][i]["w"], params["ups"][i]["b"],
                              stride=u, padding=(k - u) // 2)
        xs = None
        for j in range(num_kernels):
            rb = _resblock(x, params["resblocks"][i * num_kernels + j],
                           gcfg.resblock_kernel_sizes[j],
                           gcfg.resblock_dilation_sizes[j])
            xs = rb if xs is None else xs + rb
        x = xs / num_kernels
    x = _lrelu(x, 0.01)  # torch F.leaky_relu default slope at the output conv
    x = _conv1d(x, params["conv_post"]["w"], params["conv_post"]["b"], padding=3)
    return jnp.tanh(x)


# params are jit ARGUMENTS (closure-captured weights would be baked into the
# program — see CLAUDE.md); one compile per (gcfg, [B, C, T]) shape
_generator_jit = jax.jit(_generator_fwd, static_argnames=("gcfg",))


def generator_forward(params: dict, cfg: dict, x: jax.Array) -> jax.Array:
    """x: [B, model_in_dim, T] -> waveform [B, 1, T * prod(upsample_rates)]."""
    return _generator_jit(params, _GenCfg.from_dict(cfg), x)


def variance_predictor(params: dict, cfg: dict, x: jax.Array,
                       eps: float = 1e-5) -> jax.Array:
    """x: [B, T, C] -> log durations [B, T]
    (reference generator.py:200-238; dropout inactive at inference)."""
    kernel = cfg["var_pred_kernel_size"]
    h = _conv1d(x.transpose(0, 2, 1), params["conv1"]["w"], params["conv1"]["b"],
                padding=(kernel - 1) // 2).transpose(0, 2, 1)
    h = jax.nn.relu(h)
    mean = h.mean(-1, keepdims=True)
    var = h.var(-1, keepdims=True)
    h = (h - mean) * jax.lax.rsqrt(var + eps) * params["ln1"]["scale"] + params["ln1"]["bias"]
    h = _conv1d(h.transpose(0, 2, 1), params["conv2"]["w"], params["conv2"]["b"],
                padding=1).transpose(0, 2, 1)
    h = jax.nn.relu(h)
    mean = h.mean(-1, keepdims=True)
    var = h.var(-1, keepdims=True)
    h = (h - mean) * jax.lax.rsqrt(var + eps) * params["ln2"]["scale"] + params["ln2"]["bias"]
    return (h @ params["proj"]["w"].T + params["proj"]["b"])[..., 0]


def _upsample_to(signal, max_frames):
    """Repeat a [1, C, T0] conditioning signal to T frames
    (reference generator.py:127-148)."""
    b, c, t0 = signal.shape
    if max_frames % t0:
        raise NotImplementedError(
            "Padding condition signal - misalignment between condition features.")
    return jnp.repeat(signal, max_frames // t0, axis=2)


def _build_conditioning(params: dict, cfg: dict, code,
                        dur_prediction: bool = False,
                        speaker_id: int = 0, style_id: int = 0,
                        f0: Optional[np.ndarray] = None) -> jax.Array:
    """Unit ids [T] or [1, T] -> generator conditioning [1, C_in, T']
    (embedding, optional duration re-expansion, f0/speaker/style concat).
    Cheap eager ops; the data-dependent re-expansion stays host-side."""
    code = jnp.atleast_2d(jnp.asarray(code))
    x = params["dict"][code]  # [1, T, C]

    if dur_prediction and "dur_predictor" in params:
        log_dur = variance_predictor(params["dur_predictor"],
                                     cfg["dur_predictor_params"], x)
        dur = np.maximum(np.round(np.exp(np.asarray(log_dur)) - 1).astype(int), 1)
        # dynamic re-expansion happens host-side (inference, single sample)
        x = jnp.asarray(np.repeat(np.asarray(x)[0], dur[0], axis=0))[None]

    if cfg.get("f0", None):
        assert f0 is not None, "this vocoder requires an f0 input"
        f0 = jnp.atleast_2d(jnp.asarray(f0))
        if "f0_quant_embed" in params:
            f0c = params["f0_quant_embed"][f0.astype(jnp.int32)].transpose(0, 2, 1)
        else:
            f0c = f0[:, None, :].astype(jnp.float32)
        xc = x.transpose(0, 2, 1)
        if xc.shape[-1] < f0c.shape[-1]:
            xc = _upsample_to(xc, f0c.shape[-1])
        elif xc.shape[-1] > f0c.shape[-1]:
            f0c = _upsample_to(f0c, xc.shape[-1])
        x = jnp.concatenate([xc, f0c], axis=1).transpose(0, 2, 1)

    feats = [x.transpose(0, 2, 1)]
    if cfg.get("multispkr", None):
        spk = params["spkr"][jnp.asarray([[speaker_id]])]  # [1,1,C]
        feats.append(jnp.broadcast_to(spk.transpose(0, 2, 1),
                                      (1, spk.shape[-1], feats[0].shape[-1])))
    if cfg.get("multistyle", None):
        st = params["style"][jnp.asarray([[style_id]])]
        feats.append(jnp.broadcast_to(st.transpose(0, 2, 1),
                                      (1, st.shape[-1], feats[0].shape[-1])))
    return jnp.concatenate(feats, axis=1) if len(feats) > 1 else feats[0]


def code_generator_forward(params: dict, cfg: dict, code: np.ndarray,
                           dur_prediction: bool = False,
                           speaker_id: int = 0, style_id: int = 0,
                           f0: Optional[np.ndarray] = None) -> np.ndarray:
    """Unit ids [T] or [1, T] -> waveform [T_wav]
    (reference generator.py:150-197 + vocoder.py:56-88 semantics: negative
    codes dropped by the caller; optional f0 conditioning). EXACT path: one
    compile per distinct conditioning length — prefer synthesize_batch for
    generation evals that vocode many variable-length continuations."""
    h = _build_conditioning(params, cfg, code, dur_prediction, speaker_id,
                            style_id, f0)
    wav = generator_forward(params, cfg, h)
    return np.asarray(wav).squeeze()


def synthesize_batch(params: dict, cfg: dict, codes: Sequence[np.ndarray],
                     dur_prediction: bool = False,
                     speaker_ids=None, style_ids=None, f0s=None,
                     bucket_frames: Optional[int] = None,
                     max_batch: int = 8) -> List[np.ndarray]:
    """Batched synthesis over variable-length codes (VERDICT r3 missing #5).

    bucket_frames=None (default, reference-exact): samples group by EXACT
    conditioning length — same-length samples share one jitted call and the
    outputs are bit-identical to the per-sample path; distinct lengths
    compile per length.

    bucket_frames=N: lengths pad up to multiples of N so hundreds of
    variable-length continuations compile a handful of programs. The
    generator is fully convolutional with zero 'same' padding, so each
    sample's interior is unchanged; only the tail inside the network's
    receptive field (~conv_post/resblock kernels, a few hundred output
    samples) can differ slightly, because padded frames carry conv biases
    instead of implicit zeros. Outputs are trimmed to the true T*hop."""
    n = len(codes)
    spk = list(speaker_ids) if speaker_ids is not None else [0] * n
    sty = list(style_ids) if style_ids is not None else [0] * n
    f0l = list(f0s) if f0s is not None else [None] * n

    hs = [_build_conditioning(params, cfg, c, dur_prediction, s, st, f)
          for c, s, st, f in zip(codes, spk, sty, f0l)]
    gcfg = _GenCfg.from_dict(cfg)
    hop = gcfg.hop

    buckets: Dict[int, List[int]] = {}
    for i, h in enumerate(hs):
        t = h.shape[-1]
        tb = t if not bucket_frames else \
            max(-(-t // bucket_frames) * bucket_frames, bucket_frames)
        buckets.setdefault(tb, []).append(i)

    out: List[Optional[np.ndarray]] = [None] * n
    for tb, idxs in sorted(buckets.items()):
        for lo in range(0, len(idxs), max_batch):
            group = idxs[lo:lo + max_batch]
            batch = jnp.concatenate(
                [jnp.pad(hs[i], ((0, 0), (0, 0), (0, tb - hs[i].shape[-1])))
                 for i in group], axis=0)
            wavs = np.asarray(_generator_jit(params, gcfg, batch))
            for row, i in enumerate(group):
                out[i] = wavs[row, 0, :hs[i].shape[-1] * hop]
    return out


# --------------------------------------------------------------------------- #
# weight conversion (torch checkpoint -> params pytree)
# --------------------------------------------------------------------------- #
def _fold_weight_norm(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    """weight_g/weight_v (norm over dims != 0) -> folded weight + bias."""
    if f"{prefix}.weight_g" in sd:
        g = np.asarray(sd[f"{prefix}.weight_g"], np.float32)
        v = np.asarray(sd[f"{prefix}.weight_v"], np.float32)
        axes = tuple(range(1, v.ndim))
        w = g * v / np.maximum(np.sqrt((v ** 2).sum(axis=axes, keepdims=True)), 1e-12)
    else:
        w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    b = sd.get(f"{prefix}.bias")
    return {"w": w, "b": np.asarray(b, np.float32) if b is not None else None}


def convert_torch_generator(sd: Dict[str, np.ndarray], cfg: dict) -> dict:
    """Map the textless checkpoint's `generator` state dict (numpy-valued)
    to the JAX params pytree."""
    num_kernels = len(cfg["resblock_kernel_sizes"])
    num_ups = len(cfg["upsample_rates"])
    params = {
        "conv_pre": _fold_weight_norm(sd, "conv_pre"),
        "conv_post": _fold_weight_norm(sd, "conv_post"),
        "ups": [_fold_weight_norm(sd, f"ups.{i}") for i in range(num_ups)],
        "resblocks": [],
        "dict": np.asarray(sd["dict.weight"], np.float32),
    }
    for r in range(num_ups * num_kernels):
        n_d = len(cfg["resblock_dilation_sizes"][r % num_kernels])
        params["resblocks"].append({
            "convs1": [_fold_weight_norm(sd, f"resblocks.{r}.convs1.{i}")
                       for i in range(n_d)],
            "convs2": [_fold_weight_norm(sd, f"resblocks.{r}.convs2.{i}")
                       for i in range(n_d)],
        })
    if "spkr.weight" in sd:
        params["spkr"] = np.asarray(sd["spkr.weight"], np.float32)
    if "style.weight" in sd:
        params["style"] = np.asarray(sd["style.weight"], np.float32)
    if "f0_quant_embed.weight" in sd:
        params["f0_quant_embed"] = np.asarray(sd["f0_quant_embed.weight"], np.float32)
    if any(k.startswith("dur_predictor") for k in sd):
        params["dur_predictor"] = {
            "conv1": {"w": np.asarray(sd["dur_predictor.conv1.0.weight"], np.float32),
                      "b": np.asarray(sd["dur_predictor.conv1.0.bias"], np.float32)},
            "ln1": {"scale": np.asarray(sd["dur_predictor.ln1.weight"], np.float32),
                    "bias": np.asarray(sd["dur_predictor.ln1.bias"], np.float32)},
            "conv2": {"w": np.asarray(sd["dur_predictor.conv2.0.weight"], np.float32),
                      "b": np.asarray(sd["dur_predictor.conv2.0.bias"], np.float32)},
            "ln2": {"scale": np.asarray(sd["dur_predictor.ln2.weight"], np.float32),
                    "bias": np.asarray(sd["dur_predictor.ln2.bias"], np.float32)},
            "proj": {"w": np.asarray(sd["dur_predictor.proj.weight"], np.float32),
                     "b": np.asarray(sd["dur_predictor.proj.bias"], np.float32)},
        }
    return params


def load_checkpoint(model_path: str, config_path: str):
    """Load a textless CodeHiFiGAN torch checkpoint -> (params, cfg)."""
    import torch

    with open(config_path) as f:
        cfg = json.load(f)
    state = torch.load(model_path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in state["generator"].items()}
    return convert_torch_generator(sd, cfg), cfg

"""Whisper transcription throughput on one chip (metric/whisper_jax.py).

Random weights at a REAL Whisper architecture (default: large-v3-turbo —
the ASR workhorse for GenPPL-style evals); throughput is weight-
independent. Drives `encode` + `greedy_decode` directly (no tokenizer:
text decoding is host-side string work measured in the pipeline, not
here) and reports audio-seconds transcribed per wall second.

Greedy decode cost depends on emitted length; real transcription stops
at eos after ~1 token/word, so --decode-tokens bounds the measured loop
(default 64 ≈ a dense 30 s utterance).

Usage: python scripts/bench_whisper.py [--cpu] [--arch tiny|base|large-v3-turbo]
"""
import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (mel_bins, d_model, enc_layers, dec_layers, heads, ffn)
ARCHS = {
    "tiny": (80, 384, 4, 4, 6, 1536),
    "base": (80, 512, 6, 6, 8, 2048),
    "small": (80, 768, 12, 12, 12, 3072),
    "large-v3-turbo": (128, 1280, 32, 4, 20, 5120),
}
VOCAB = 51866
WINDOW_S = 30.0


def fabricate(cfg, seed=0):
    from slamkit_tpu.metric.whisper_jax import convert_whisper_state_dict

    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    sd = {
        "model.encoder.conv1.weight": w(cfg.d_model, cfg.num_mel_bins, 3),
        "model.encoder.conv1.bias": w(cfg.d_model),
        "model.encoder.conv2.weight": w(cfg.d_model, cfg.d_model, 3),
        "model.encoder.conv2.bias": w(cfg.d_model),
        "model.encoder.embed_positions.weight": w(cfg.max_source_positions,
                                                  cfg.d_model),
        "model.encoder.layer_norm.weight": np.ones(cfg.d_model, np.float32),
        "model.encoder.layer_norm.bias": w(cfg.d_model),
        "model.decoder.embed_tokens.weight": w(cfg.vocab_size, cfg.d_model),
        "model.decoder.embed_positions.weight": w(cfg.max_target_positions,
                                                  cfg.d_model),
        "model.decoder.layer_norm.weight": np.ones(cfg.d_model, np.float32),
        "model.decoder.layer_norm.bias": w(cfg.d_model),
    }

    def layer(prefix, i, ffn, cross):
        d = cfg.d_model
        out = {
            f"{prefix}.layers.{i}.self_attn.q_proj.weight": w(d, d),
            f"{prefix}.layers.{i}.self_attn.q_proj.bias": w(d),
            f"{prefix}.layers.{i}.self_attn.k_proj.weight": w(d, d),
            f"{prefix}.layers.{i}.self_attn.v_proj.weight": w(d, d),
            f"{prefix}.layers.{i}.self_attn.v_proj.bias": w(d),
            f"{prefix}.layers.{i}.self_attn.out_proj.weight": w(d, d),
            f"{prefix}.layers.{i}.self_attn.out_proj.bias": w(d),
            f"{prefix}.layers.{i}.self_attn_layer_norm.weight": np.ones(d, np.float32),
            f"{prefix}.layers.{i}.self_attn_layer_norm.bias": w(d),
            f"{prefix}.layers.{i}.fc1.weight": w(ffn, d),
            f"{prefix}.layers.{i}.fc1.bias": w(ffn),
            f"{prefix}.layers.{i}.fc2.weight": w(d, ffn),
            f"{prefix}.layers.{i}.fc2.bias": w(d),
            f"{prefix}.layers.{i}.final_layer_norm.weight": np.ones(d, np.float32),
            f"{prefix}.layers.{i}.final_layer_norm.bias": w(d),
        }
        if cross:
            out.update({
                f"{prefix}.layers.{i}.encoder_attn.q_proj.weight": w(d, d),
                f"{prefix}.layers.{i}.encoder_attn.q_proj.bias": w(d),
                f"{prefix}.layers.{i}.encoder_attn.k_proj.weight": w(d, d),
                f"{prefix}.layers.{i}.encoder_attn.v_proj.weight": w(d, d),
                f"{prefix}.layers.{i}.encoder_attn.v_proj.bias": w(d),
                f"{prefix}.layers.{i}.encoder_attn.out_proj.weight": w(d, d),
                f"{prefix}.layers.{i}.encoder_attn.out_proj.bias": w(d),
                f"{prefix}.layers.{i}.encoder_attn_layer_norm.weight":
                    np.ones(d, np.float32),
                f"{prefix}.layers.{i}.encoder_attn_layer_norm.bias": w(d),
            })
        return out

    for i in range(cfg.encoder_layers):
        sd.update(layer("model.encoder", i, cfg.encoder_ffn, cross=False))
    for i in range(cfg.decoder_layers):
        sd.update(layer("model.decoder", i, cfg.decoder_ffn, cross=True))
    return convert_whisper_state_dict(sd, cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--arch", default="large-v3-turbo", choices=sorted(ARCHS))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--decode-tokens", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from bench import _require_live_device

        _require_live_device(fatal=False)

    import jax.numpy as jnp

    from slamkit_tpu.metric.whisper_jax import (WhisperCfg, encode,
                                                greedy_decode)

    mels, d, el, dl, h, ffn = ARCHS[args.arch]
    cfg = WhisperCfg(
        vocab_size=VOCAB, num_mel_bins=mels, d_model=d,
        encoder_layers=el, encoder_heads=h, decoder_layers=dl,
        decoder_heads=h, encoder_ffn=ffn, decoder_ffn=ffn,
        max_source_positions=1500, max_target_positions=448,
        decoder_start_token_id=1, eos_token_id=0xFFFF_FFF,  # never hit: full loop
        dtype=args.dtype)
    params = jax.device_put(fabricate(cfg))
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal(
        (args.batch, mels, 3000)).astype(np.float32))
    start = jnp.asarray([1], jnp.int32)

    def run():
        enc = encode(params, cfg, mel)
        return greedy_decode(params, cfg, enc, start,
                             max_new_tokens=args.decode_tokens, n_forced=1)

    toks = run()
    _ = np.asarray(toks[0, :1])  # compile + sync
    t0 = time.perf_counter()
    for _i in range(args.iters):
        toks = run()
    _ = np.asarray(toks[0, :1])
    dt = time.perf_counter() - t0
    audio = args.iters * args.batch * WINDOW_S
    print(f"{args.arch} ({args.dtype}): {audio / dt:.1f}x realtime/chip "
          f"(B={args.batch}, {args.decode_tokens} decode tokens, "
          f"{dt / args.iters * 1e3:.0f} ms per batch-window)")


if __name__ == "__main__":
    main()

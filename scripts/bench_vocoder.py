"""Vocoder synthesis throughput on one chip: x-realtime generated audio.

The reference vocodes with torch CodeHiFiGAN on GPU (slamkit/vocoder/
hifigan/vocoder.py); here the JAX port (vocoder/hifigan_jax.py) runs the
generator as fixed-shape jitted convs. Weights are RANDOM at the real
textless CodeHiFiGAN architecture (50 Hz unit stream, 320x upsample to
16 kHz) — throughput does not depend on weight values, and real
checkpoints are egress-blocked in this environment (first contact:
vocoder/checkpoint_manager.py).

Reports seconds of 16 kHz audio generated per wall second (xRT) for
batched synthesis through `synthesize_batch` with frame bucketing (a
handful of compiled shapes over a realistic length distribution).

Usage: python scripts/bench_vocoder.py [--cpu] [--samples 64] [--frames 500]
"""
import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# real textless CodeHiFiGAN shape (fairseq speech2unit vocoder config):
# 50 Hz unit stream -> 320x upsample -> 16 kHz waveform
FULL_CFG = {
    "model_in_dim": 128,
    "num_embeddings": 504,
    "embedding_dim": 128,
    "upsample_initial_channel": 512,
    "upsample_rates": [5, 4, 4, 2, 2],
    "upsample_kernel_sizes": [11, 8, 8, 4, 4],
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    "dur_predictor_params": {
        "encoder_embed_dim": 128, "var_pred_hidden_dim": 256,
        "var_pred_kernel_size": 3, "var_pred_dropout": 0.5,
    },
}
SAMPLE_RATE = 16000


def random_state_dict(cfg: dict, seed: int = 0) -> dict:
    """Torch-layout generator state dict with random weights (plain
    .weight/.bias keys; convert_torch_generator folds/maps them)."""
    rng = np.random.default_rng(seed)

    def w(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    c0 = cfg["upsample_initial_channel"]
    sd = {
        "dict.weight": w(cfg["num_embeddings"], cfg["embedding_dim"], scale=1.0),
        "conv_pre.weight": w(c0, cfg["model_in_dim"], 7),
        "conv_pre.bias": w(c0),
        "conv_post.weight": w(1, c0 // 2 ** len(cfg["upsample_rates"]), 7),
        "conv_post.bias": w(1),
    }
    ch = c0
    for i, k in enumerate(cfg["upsample_kernel_sizes"]):
        sd[f"ups.{i}.weight"] = w(ch, ch // 2, k)  # ConvTranspose1d [in, out, k]
        sd[f"ups.{i}.bias"] = w(ch // 2)
        ch //= 2
    n_kernels = len(cfg["resblock_kernel_sizes"])
    ch = c0
    for i in range(len(cfg["upsample_rates"])):
        ch //= 2
        for j, ks in enumerate(cfg["resblock_kernel_sizes"]):
            r = i * n_kernels + j
            n_d = len(cfg["resblock_dilation_sizes"][j])
            for c in range(n_d):
                sd[f"resblocks.{r}.convs1.{c}.weight"] = w(ch, ch, ks)
                sd[f"resblocks.{r}.convs1.{c}.bias"] = w(ch)
                sd[f"resblocks.{r}.convs2.{c}.weight"] = w(ch, ch, ks)
                sd[f"resblocks.{r}.convs2.{c}.bias"] = w(ch)
    dp = cfg["dur_predictor_params"]
    h = dp["var_pred_hidden_dim"]
    sd.update({
        "dur_predictor.conv1.0.weight": w(h, dp["encoder_embed_dim"], 3),
        "dur_predictor.conv1.0.bias": w(h),
        "dur_predictor.ln1.weight": np.ones(h, np.float32),
        "dur_predictor.ln1.bias": np.zeros(h, np.float32),
        "dur_predictor.conv2.0.weight": w(h, h, 3),
        "dur_predictor.conv2.0.bias": w(h),
        "dur_predictor.ln2.weight": np.ones(h, np.float32),
        "dur_predictor.ln2.bias": np.zeros(h, np.float32),
        "dur_predictor.proj.weight": w(1, h),
        "dur_predictor.proj.bias": w(1),
    })
    return sd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke; numbers meaningless)")
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--frames", type=int, default=500,
                    help="mean unit-frames per sample (50 Hz: 500 = 10 s)")
    ap.add_argument("--bucket", type=int, default=128,
                    help="vocoder frame bucket (compile count bound)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from bench import _require_live_device

        _require_live_device(fatal=False)

    from slamkit_tpu.vocoder.hifigan_jax import (convert_torch_generator,
                                                 synthesize_batch)

    params = convert_torch_generator(random_state_dict(FULL_CFG), FULL_CFG)
    rng = np.random.default_rng(1)
    lens = np.clip(rng.normal(args.frames, args.frames / 4, args.samples),
                   32, None).astype(int)
    codes = [rng.integers(0, 500, size=(1, t)) for t in lens]

    # warmup: compile every bucket shape
    wavs = synthesize_batch(params, FULL_CFG, codes, dur_prediction=False,
                            bucket_frames=args.bucket)
    total_audio = sum(w.size for w in wavs) / SAMPLE_RATE
    _ = float(sum(w[-1] for w in wavs))  # ONE host pull = sync

    t0 = time.perf_counter()
    wavs = synthesize_batch(params, FULL_CFG, codes, dur_prediction=False,
                            bucket_frames=args.bucket)
    # sync with ONE scalar pull: per-wav np.asarray would pay a full
    # tunnel RTT 64 times and measure the relay, not the synthesis
    _ = float(sum(w[-1] for w in wavs))
    dt = time.perf_counter() - t0

    print(f"synthesized {total_audio:.1f}s of 16kHz audio for "
          f"{args.samples} samples in {dt:.2f}s -> {total_audio / dt:.1f}x "
          f"realtime/chip (bucket={args.bucket})")


if __name__ == "__main__":
    main()

"""Record a HuBERT activation fixture: seeded tiny HF HubertModel weights,
an input wav, and the torch hidden states at the tap layers — committed to
tests/fixtures/ so the JAX encoder's numerics are gated even without torch
or network access (VERDICT.md item 5).

When the REAL mhubert-25hz weights are available locally, rerun with
    python scripts/make_hubert_fixture.py --model <dir> --out <npz> --layers 11
to record real-weight slices for the bit-parity proof.
"""
import argparse
import io
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY = dict(
    hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
    intermediate_size=128, vocab_size=32,
    conv_dim=(32, 32, 32, 32, 32, 32, 32),
    do_stable_layer_norm=True, feat_extract_norm="layer")

# hubert-base architecture at TRUE shapes (12 layers, 768 dim, 512-dim conv
# stack) — fabricated weights, so the conv-length/trim/argmin semantics are
# gated at real scale without network access (VERDICT r3 item 2a)
FULL = dict(
    hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
    intermediate_size=3072, vocab_size=32,
    conv_dim=(512,) * 7,
    do_stable_layer_norm=False, feat_extract_norm="group")

N_KMEANS = 500


def fabricate_state_dict(model, seed: int = 0) -> dict:
    """Deterministic per-key fabricated weights (numpy, torch-version
    independent): the npz stores only activations/units; weights are
    re-created from this recipe at test time. Keyed per parameter name so
    iteration order cannot matter."""
    import zlib

    import torch

    sd = {}
    for k, v in model.state_dict().items():
        rng = np.random.default_rng((seed, zlib.crc32(k.encode())))
        shape = tuple(v.shape)
        if k.endswith(("_g",)) or ".weight_g" in k:
            w = 1.0 + 0.05 * rng.standard_normal(shape)
        elif "norm" in k.lower() and k.endswith("weight"):
            w = 1.0 + 0.05 * rng.standard_normal(shape)
        elif k.endswith("bias"):
            w = 0.02 * rng.standard_normal(shape)
        else:
            w = 0.05 * rng.standard_normal(shape)
        sd[k] = torch.tensor(np.asarray(w, dtype=np.float32))
    return sd


def fabricate_kmeans(dim: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng((seed, N_KMEANS, dim))
    return (rng.standard_normal((N_KMEANS, dim)) * 0.5).astype(np.float32)


def record_full_size(out_path: str, tap_layer: int = 9):
    """Record the REFERENCE extraction semantics (hubert_feature_extractor.py:
    40-48: batch padded to max, F.pad(wav, (40, 40)), hidden_states[tap],
    ceil-relative-length trim, k-means argmin) with a fabricated full-size
    hubert-base over the REAL example_data audio. The npz carries the wavs'
    source names, per-file unit ids, and the tap activations (f16) — weights
    and centroids are re-created from the fabricate_* recipes at test time."""
    import torch
    import torch.nn.functional as F
    import transformers

    from slamkit_tpu.utils.audio import load_audio

    model = transformers.HubertModel(transformers.HubertConfig(**FULL))
    model.load_state_dict(fabricate_state_dict(model))
    model.eval()
    km = fabricate_kmeans(FULL["hidden_size"])

    audio_dir = "/root/reference/example_data/audio"
    names = sorted(os.listdir(audio_dir))
    wavs = [np.asarray(load_audio(os.path.join(audio_dir, n), 16000),
                       dtype=np.float32) for n in names]
    lens = np.array([len(w) for w in wavs], dtype=np.int64)
    batch = np.zeros((len(wavs), int(lens.max())), np.float32)
    for i, w in enumerate(wavs):
        batch[i, :len(w)] = w

    with torch.no_grad():
        out = model(F.pad(torch.tensor(batch), (40, 40)),
                    output_hidden_states=True)
    hidden = out.hidden_states[tap_layer].numpy()  # [B, T, D]
    # k-means assign (reference batch_cluster: flat predict) + relative trim
    flat = hidden.reshape(-1, hidden.shape[-1])
    d = (flat ** 2).sum(-1, keepdims=True) - 2 * flat @ km.T + (km ** 2).sum(-1)
    units = d.argmin(-1).reshape(hidden.shape[:2])
    rel_l = np.ceil(lens / batch.shape[1] * hidden.shape[1]).astype(int)

    payload = {
        "full::tap_layer": np.int64(tap_layer),
        "full::names": np.frombuffer("\n".join(names).encode(), dtype=np.uint8),
        "full::lens": lens,
        "full::hidden_f16": hidden.astype(np.float16),
    }
    for i, n in enumerate(names):
        payload[f"full::units_{i}"] = units[i, :rel_l[i]].astype(np.int32)
    return payload


def main():
    import torch
    import transformers

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="HF checkpoint dir; default = seeded tiny model")
    ap.add_argument("--out", default="tests/fixtures/hubert_parity.npz")
    ap.add_argument("--layers", type=int, nargs="+", default=[2, 3])
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--full-size", action="store_true",
                    help="also record the fabricated full-size hubert-base "
                         "over the real example_data audio")
    args = ap.parse_args()

    if args.model:
        model = transformers.HubertModel.from_pretrained(args.model)
    else:
        torch.manual_seed(0)
        model = transformers.HubertModel(transformers.HubertConfig(**TINY))
    model.eval()

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(int(16000 * args.seconds)) * 0.1).astype(np.float32)

    with torch.no_grad():
        out = model(torch.tensor(wav[None]), output_hidden_states=True)

    payload = {"wav": wav,
               "config_json": np.frombuffer(
                   json.dumps(model.config.to_dict(), default=str).encode(),
                   dtype=np.uint8)}
    for l in args.layers:
        payload[f"hidden_{l}"] = out.hidden_states[l].numpy()
    if args.model is None:  # tiny fixture carries its own weights
        for k, v in model.state_dict().items():
            payload[f"sd::{k}"] = v.numpy()
    if args.full_size:
        payload.update(record_full_size(args.out))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **payload)
    size = os.path.getsize(args.out)
    print(f"wrote {args.out} ({size / 1024:.0f} KB, layers {args.layers})")


if __name__ == "__main__":
    main()

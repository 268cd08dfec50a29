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


def main():
    import torch
    import transformers

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="HF checkpoint dir; default = seeded tiny model")
    ap.add_argument("--out", default="tests/fixtures/hubert_parity.npz")
    ap.add_argument("--layers", type=int, nargs="+", default=[2, 3])
    ap.add_argument("--seconds", type=float, default=1.0)
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

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **payload)
    size = os.path.getsize(args.out)
    print(f"wrote {args.out} ({size / 1024:.0f} KB, layers {args.layers})")


if __name__ == "__main__":
    main()

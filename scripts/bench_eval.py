"""Modelling-metric eval throughput on the real chip (VERDICT.md item 8).

Builds offline fixtures (random mHuBERT-shaped HF checkpoint + km500 + a
Slam-shaped 360M UnitLM), a synthetic sBLIMP-layout wav set, and times
the full eval path — FE + k-means + LM scoring — with the round-1 separate
pos/neg calls vs the joint-pair batch.

Usage: python scripts/bench_eval.py [--pairs 64] [--batch 8]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_fixtures(root):
    # one fabricated-mHuBERT builder for every offline harness
    from stage1_parity import fabricate

    return fabricate(root)


def build_wavs(root, pairs, seed=0, args_maxsec=4.0):
    from slamkit_tpu.utils.audio import save_wav

    wav_dir = os.path.join(root, "sblimp")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(pairs):
        for j, tag in ((0, "p"), (1, "n")):
            path = os.path.join(wav_dir, f"{2 * i + j}+{tag}.wav")
            if not os.path.isfile(path):
                n = int(16000 * rng.uniform(2.0, args_maxsec))
                save_wav(path, rng.standard_normal(n).astype(np.float32) * 0.1,
                         16000)
    return wav_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--root", default="/tmp/bench_eval")
    ap.add_argument("--maxsec", type=float, default=4.0)
    ap.add_argument("--bucket", type=int, default=0,
                    help="FE bucket_samples (0 = batch-max padding)")
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    hub_dir, km = build_fixtures(args.root)
    wav_dir = build_wavs(args.root, args.pairs, args_maxsec=args.maxsec)

    from slamkit_tpu.feature_extractor.hubert_feature_extractor import (
        HubertFeatureExtractor)
    from slamkit_tpu.metric.modelling_metric import (ModellingMetricDataset,
                                                     modelling_metric)
    from slamkit_tpu.models.speech_lm import SpeechLM
    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig
    from slamkit_tpu.tokeniser.unit_tokeniser import UnitTokeniser

    fe = HubertFeatureExtractor(pretrained_model=hub_dir, kmeans_path=km,
                                layer=9, num_units=500,
                                bucket_samples=args.bucket or None)
    tok = UnitTokeniser(fe, num_units=500)
    lm = UnitLM(UnitLMConfig(base_model_name="Qwen/Qwen2.5-0.5B",
                             vocab_size=502, twist_init=False,
                             rope_theta=10000.0, torch_dtype="bfloat16"),
                seed=0)
    model = SpeechLM(lm, tok)
    ds = ModellingMetricDataset(wav_dir, sep="+", subfolder=False)
    print(f"{len(ds)} pairs, batch {args.batch}")

    for joint in (False, True):
        # warmup compiles for this path's shapes
        modelling_metric(model, ds, None, batch_size=args.batch,
                         joint_pairs=joint)
        t0 = time.perf_counter()
        res = modelling_metric(model, ds, None, batch_size=args.batch,
                               joint_pairs=joint)
        dt = time.perf_counter() - t0
        print(f"joint_pairs={joint}: {dt:.3f}s  "
              f"{len(ds) / dt:.2f} pairs/s  (score {res:.3f})")


if __name__ == "__main__":
    main()

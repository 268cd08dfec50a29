"""One-command quality-parity harness: JAX eval path vs transformers (torch).

VERDICT r3 item 2b. Given ANY checkpoint dir — our UnitLM.save_pretrained
format OR a reference-format HF dir (model_type 'speech_language_model',
e.g. a local slprl/slam_scaled mirror) — plus a folder of wav pairs in the
modelling-metric layout (reference slamkit/metric/modelling_metric.py:12-30),
this scores every pair through BOTH:

  * the JAX path actually used by cli/eval.py: tokeniser -> UnitLM
    .log_likelihood (-inf ignore masking, pad exclusion, mean_nll)
  * an independent torch path: the checkpoint loaded under transformers
    (reference-format dirs load their lm.* weights directly; our dirs go
    through UnitLM.export_hf) scored with an explicit masked-NLL replica of
    reference unit_lm.py:184-194

and asserts per-pair decision equality + NLL closeness, printing one JSON
line with both sBLIMP-style scores. The moment real weights/benchmark audio
exist, parity is:

    python scripts/eval_parity.py --ckpt <dir> --pairs <sblimp_dir> --sep + \
        --fe-model <mhubert dir> --kmeans <km.bin> --layer 11

Offline CI (zero egress): --fabricate-fe builds a deterministic tiny HuBERT
+ k-means from scripts/make_hubert_fixture.py's recipes, so the harness is
fully exercised with fabricated weights (tests/test_eval_parity.py).
"""
import argparse
import importlib.util
import json
import os
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def _load_fixture_recipes():
    spec = importlib.util.spec_from_file_location(
        "make_hubert_fixture", os.path.join(HERE, "make_hubert_fixture.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_fe(args, workdir: str):
    from slamkit_tpu.feature_extractor.hubert_feature_extractor import \
        HubertFeatureExtractor

    if args.fabricate_fe:
        import transformers

        mk = _load_fixture_recipes()
        model = transformers.HubertModel(transformers.HubertConfig(**mk.TINY))
        model.load_state_dict(mk.fabricate_state_dict(model))
        fe_dir = os.path.join(workdir, "fe")
        model.save_pretrained(fe_dir)
        km = os.path.join(workdir, "km.npy")
        # the SAME deterministic recipe the fixture tests use — one source
        # of truth for fabricated centroids
        cents = mk.fabricate_kmeans(mk.TINY["hidden_size"])
        np.save(km, cents[:args.num_units])
        # the tiny model has few layers; clamp an unset/out-of-range tap
        layer = min(args.layer, mk.TINY["num_hidden_layers"])
        return HubertFeatureExtractor(pretrained_model=fe_dir, kmeans_path=km,
                                      layer=layer, num_units=args.num_units)
    if not args.fe_model or not args.kmeans:
        sys.exit("need --fe-model and --kmeans (or --fabricate-fe for CI)")
    return HubertFeatureExtractor(pretrained_model=args.fe_model,
                                  kmeans_path=args.kmeans, layer=args.layer,
                                  num_units=args.num_units)


def load_torch_lm(ckpt: str, jax_lm, workdir: str):
    """transformers-loaded model for the SAME weights.

    Reference-format dirs (HF config.json) load their lm.* tensors straight
    into an AutoModelForCausalLM built from the nested base_config — an
    import path fully independent of our convert_state_dict. Our own
    save_pretrained dirs have no torch-loadable artifact, so they go through
    UnitLM.export_hf (which test_hf_convert.py round-trip-gates per family).
    """
    import torch
    import transformers

    cfg_path = os.path.join(ckpt, "config.json")
    if os.path.isfile(cfg_path):
        with open(cfg_path) as f:
            ref_cfg = json.load(f)
        base_config = ref_cfg.get("base_config") or {}
        if ref_cfg.get("model_type") == "speech_language_model" and \
                base_config.get("model_type"):
            from slamkit_tpu.models.hf_convert import load_hf_state_dict

            model_type = base_config.pop("model_type")
            hf_cfg = transformers.AutoConfig.for_model(model_type, **base_config)
            model = transformers.AutoModelForCausalLM.from_config(hf_cfg)
            sd = {(k[3:] if k.startswith("lm.") else k): torch.tensor(v)
                  for k, v in load_hf_state_dict(ckpt).items()}
            missing, unexpected = model.load_state_dict(sd, strict=False)
            missing = [k for k in missing if not k.endswith(
                ("rotary_emb.inv_freq", "masked_bias", "attn.bias"))]
            if getattr(hf_cfg, "tie_word_embeddings", False):
                # HF drops the tied lm_head tensor on save; tie_weights
                # re-links it to the loaded embedding
                missing = [k for k in missing if k != "lm_head.weight"]
                model.tie_weights()
            if missing:
                raise RuntimeError(f"missing torch weights: {missing}")
            model.eval()
            return model
    hf_dir = os.path.join(workdir, "hf_export")
    jax_lm.export_hf(hf_dir)
    model = transformers.AutoModelForCausalLM.from_pretrained(hf_dir)
    model.eval()
    return model


def torch_log_likelihood(model, tokens: np.ndarray, pad_token_id: int,
                         ignore_tokens, mean_nll: bool) -> np.ndarray:
    """Replica of _ll_jit's semantics (models/unit_lm.py:94-105) in torch:
    -inf over ignored vocab ids, shift, pads excluded, mean or sum."""
    import torch

    tok = torch.tensor(tokens, dtype=torch.long)
    attn = (tok != pad_token_id).long()
    with torch.no_grad():
        logits = model(tok, attention_mask=attn).logits.float()
    if ignore_tokens is not None and len(ignore_tokens) > 0:
        logits[..., list(map(int, ignore_tokens))] = float("-inf")
    logp = torch.log_softmax(logits, dim=-1)
    shifted = tok[:, 1:]
    gathered = logp[:, :-1].gather(-1, shifted[..., None]).squeeze(-1)
    mask = (shifted != pad_token_id).float()
    ll = (gathered * mask).sum(-1)
    if mean_nll:
        ll = ll / mask.sum(-1).clamp(min=1)
    return ll.numpy()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="UnitLM.save_pretrained dir or reference-format HF dir")
    ap.add_argument("--pairs", required=True,
                    help="folder of (pos, neg) wav pairs")
    ap.add_argument("--sep", default="+", help="'_' swuggy/storycloze, '+' sblimp")
    ap.add_argument("--subfolder", action="store_true")
    ap.add_argument("--fe-model", default=None)
    ap.add_argument("--kmeans", default=None)
    ap.add_argument("--layer", type=int, default=9)
    ap.add_argument("--num-units", type=int, default=500)
    ap.add_argument("--fabricate-fe", action="store_true",
                    help="deterministic tiny fabricated HuBERT + k-means (CI)")
    ap.add_argument("--used-token-modality", default=None)
    ap.add_argument("--sum-nll", action="store_true",
                    help="score by total (not per-token mean) log likelihood")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--atol", type=float, default=2e-3,
                    help="per-sequence |NLL_jax - NLL_torch| bound")
    ap.add_argument("--keep-dtype", action="store_true",
                    help="score the JAX path in the checkpoint's compute "
                         "dtype (default: force float32 so both paths "
                         "compare at equal precision)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", os.environ.get("EVAL_PARITY_PLATFORM",
                                                      "cpu"))

    from slamkit_tpu.metric.modelling_metric import (ModellingMetricDataset,
                                                     _pad_batch)
    from slamkit_tpu.models.unit_lm import UnitLM
    from slamkit_tpu.tokeniser.unit_tokeniser import UnitTokeniser

    mean_nll = not args.sum_nll
    workdir = tempfile.mkdtemp(prefix="eval_parity_")
    fe = build_fe(args, workdir)
    tokeniser = UnitTokeniser(fe, num_units=args.num_units)
    lm = UnitLM.from_pretrained(args.ckpt)
    if not args.keep_dtype:
        import dataclasses

        lm.decoder = dataclasses.replace(lm.decoder, dtype="float32")
    torch_lm = load_torch_lm(args.ckpt, lm, workdir)
    ignore = tokeniser.get_ignore_tokens(args.used_token_modality)

    ds = ModellingMetricDataset(args.pairs, sep=args.sep,
                                subfolder=args.subfolder)
    assert len(ds) > 0, f"no wav pairs under {args.pairs}"

    jax_ll, th_ll = [], []
    for lo in range(0, len(ds), args.batch_size):
        items = [ds[i] for i in range(lo, min(lo + args.batch_size, len(ds)))]
        # pos|neg share one padded wav length: identical stage-1 inputs for
        # both halves of each pair
        wavs, lens = _pad_batch([it[0] for it in items]
                                + [it[1] for it in items])
        tokeniser.text_tokeniser.padding_side = "right"
        tokens = np.asarray(tokeniser.tokenise(wavs, lens)["input_ids"])
        jax_ll.append(np.asarray(lm.log_likelihood(tokens, mean_nll, ignore)))
        th_ll.append(torch_log_likelihood(torch_lm, tokens,
                                          lm.config.pad_token_id, ignore,
                                          mean_nll))
    jax_ll = np.concatenate(jax_ll)
    th_ll = np.concatenate(th_ll)
    n = len(ds)

    def pair_score(ll_flat):
        # each chunk was [pos...neg...]; reconstruct per-chunk halves
        out = []
        off = 0
        for lo in range(0, n, args.batch_size):
            m = min(lo + args.batch_size, n) - lo
            pos, neg = ll_flat[off:off + m], ll_flat[off + m:off + 2 * m]
            out.append(np.where(pos > neg, 1.0,
                                np.where(pos == neg, 0.5, 0.0)))
            off += 2 * m
        return np.concatenate(out)

    d_jax = pair_score(jax_ll)
    d_torch = pair_score(th_ll)
    max_diff = float(np.abs(jax_ll - th_ll).max())
    result = {
        "pairs": n,
        "score_jax": float(d_jax.mean()),
        "score_torch": float(d_torch.mean()),
        "max_abs_ll_diff": max_diff,
        "decisions_equal": bool((d_jax == d_torch).all()),
        "ll_within_atol": bool(max_diff <= args.atol),
    }
    print(json.dumps(result))
    if not (result["decisions_equal"] and result["ll_within_atol"]):
        sys.exit(1)


if __name__ == "__main__":
    main()

"""Stage-1/2 bit-parity harness against the reference's golden example data
(VERDICT.md item 5).

With the REAL weights (network or a local mirror):
    python scripts/stage1_parity.py \
        --hubert slprl/mhubert-base-25hz \
        --kmeans https://dl.fbaipublicfiles.com/textless_nlp/twist/speech_tokenizer/mhubert_base_25hz_cp_mls_cv_sp_fisher_L11_km500.bin
regenerates features.jsonl + tokens.jsonl from /root/reference/example_data
audio through cli/extract_features.py + cli/prepare_tokens.py and
byte-compares them (per file_name) to the committed golden jsonls
(reference cli/extract_features.py:91-97, README.md:48,65).

Offline CI mode (zero egress): --fabricate builds random tiny weights and
verifies HARNESS health instead — extraction is deterministic across two
runs and the comparator actually detects the (expected) mismatch vs golden.
"""
import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
REF = "/root/reference/example_data"
sys.path.insert(0, REPO)


def run_stage1(hubert, kmeans, layer, out_path, audio_dir, ext="flac"):
    cmd = [sys.executable, os.path.join(REPO, "cli/extract_features.py"),
           f"data_path={audio_dir}", f"out_path={out_path}", f"ext={ext}",
           "tokeniser=unit_hubert_25",
           f"tokeniser.feature_extractor.pretrained_model={hubert}",
           f"tokeniser.feature_extractor.kmeans_path={kmeans}",
           f"tokeniser.feature_extractor.layer={layer}",
           "device=cpu"]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
        raise RuntimeError("extract_features failed")


def run_stage2(features_path, out_path):
    cmd = [sys.executable, os.path.join(REPO, "cli/prepare_tokens.py"),
           f"data_path={features_path}", f"out_path={out_path}"]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
        raise RuntimeError("prepare_tokens failed")


def by_file(path):
    out = {}
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            key = os.path.basename(d["file_name"])
            out[key] = {k: v for k, v in d.items() if k != "file_name"}
    return out


def compare(got_path, ref_path, label):
    got, ref = by_file(got_path), by_file(ref_path)
    if set(got) != set(ref):
        print(f"{label}: FILE SET MISMATCH got={sorted(got)} ref={sorted(ref)}")
        return False
    bad = [k for k in ref if got[k] != ref[k]]
    if bad:
        print(f"{label}: MISMATCH on {bad}")
        return False
    print(f"{label}: bit-parity OK ({len(ref)} files)")
    return True


def _fixture_recipes():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_hubert_fixture", os.path.join(HERE, "make_hubert_fixture.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def fabricate(root):
    """Full-size hubert-base with the SAME deterministic fabricated weights
    the recorded fixture uses (make_hubert_fixture.FULL + fabricate_*), so
    the CLI output can be compared against the torch-recorded unit ids."""
    import numpy as np
    import transformers

    mk = _fixture_recipes()
    hub = os.path.join(root, "hubert")
    if not os.path.isdir(hub):
        model = transformers.HubertModel(transformers.HubertConfig(**mk.FULL))
        model.load_state_dict(mk.fabricate_state_dict(model))
        model.save_pretrained(hub)
    km = os.path.join(root, "km500.npy")
    if not os.path.isfile(km):
        np.save(km, mk.fabricate_kmeans(mk.FULL["hidden_size"]))
    return hub, km


def check_against_recorded_units(feats_path) -> bool:
    """Gate the CLI's features.jsonl against the committed torch-recorded
    fixture: per file, RLE-deduped recorded units must equal the jsonl's
    'units'. This ties the WHOLE stage-1 CLI (native audio decode, batching,
    JAX encoder, k-means, trim, dedup) to the reference torch semantics at
    true hubert-base shapes — no network needed."""
    import numpy as np

    fixture = os.path.join(REPO, "tests", "fixtures", "hubert_parity.npz")
    z = np.load(fixture)
    if "full::tap_layer" not in z.files:
        print("fixture lacks the full-size recording; skipping unit gate")
        return True
    names = bytes(z["full::names"]).decode().split("\n")
    got = by_file(feats_path)
    ok = True
    for i, name in enumerate(names):
        raw = z[f"full::units_{i}"]
        dedup = raw[np.insert(np.diff(raw) != 0, 0, True)].tolist()
        if got[name]["units"] != dedup:
            print(f"UNIT MISMATCH vs recorded torch semantics: {name}")
            ok = False
    if ok:
        print(f"stage-1 CLI == recorded torch units ({len(names)} files)")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hubert", default="slprl/mhubert-base-25hz")
    ap.add_argument("--kmeans", default=(
        "https://dl.fbaipublicfiles.com/textless_nlp/twist/speech_tokenizer/"
        "mhubert_base_25hz_cp_mls_cv_sp_fisher_L11_km500.bin"))
    ap.add_argument("--layer", type=int, default=11)
    ap.add_argument("--audio", default=os.path.join(REF, "audio"))
    ap.add_argument("--work", default="/tmp/stage1_parity")
    ap.add_argument("--fabricate", action="store_true",
                    help="offline harness-health mode (random tiny weights)")
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    hubert, kmeans, layer = args.hubert, args.kmeans, args.layer
    if args.fabricate:
        hubert, kmeans = fabricate(args.work)
        layer = 9

    feats = os.path.join(args.work, "features.jsonl")
    toks = os.path.join(args.work, "tokens.jsonl")
    for p in (feats, toks):
        if os.path.exists(p):
            os.remove(p)
    run_stage1(hubert, kmeans, layer, feats, args.audio)
    run_stage2(feats, toks)

    if args.fabricate:
        # harness health: (1) determinism across runs, (2) the comparator
        # detects the expected fabricated-weight mismatch against golden,
        # (3) CLI units == the committed torch-recorded fixture units at
        # true hubert-base shapes
        feats2 = os.path.join(args.work, "features2.jsonl")
        if os.path.exists(feats2):
            os.remove(feats2)
        run_stage1(hubert, kmeans, layer, feats2, args.audio)
        assert by_file(feats) == by_file(feats2), "extraction not deterministic"
        assert not compare(feats, os.path.join(REF, "features.jsonl"),
                           "features(fabricated weights, mismatch expected)"), \
            "comparator failed to flag a mismatch"
        assert check_against_recorded_units(feats), \
            "stage-1 CLI diverges from the recorded torch semantics"
        print("harness OK (fabricated weights, full-size, torch-recorded "
              "unit gate passed). Run without --fabricate and with the real "
              "mhubert-25hz + km500 for the bit-parity proof.")
        return

    ok = compare(feats, os.path.join(REF, "features.jsonl"), "features.jsonl")
    ok &= compare(toks, os.path.join(REF, "tokens.jsonl"), "tokens.jsonl")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

"""SIMS-recipe rehearsal on the real chip (docs/SIMS.md, arXiv 2504.02398).

Drives the ACTUAL `config/train_inter_scale.yaml` composition — interleave
tokeniser (extended vocab: words + <Un0..499> + <speech>/<text>), 3-corpus
token-ratio mixing (text-only / interleaved / speech-only), context 2048,
packing — through cli/train.py on synthetic but structured data:

  * units follow the first-order Markov chain of rehearse_slam (floor ln 4);
  * words follow their own first-order chain over an 800-word vocab;
  * the interleaved corpus alternates word spans and unit spans.

Zero egress: the base model is a LOCAL dir holding a Qwen2.5-0.5B-shaped
config.json plus a fabricated whitespace WordLevel tokenizer, which serves
as both the decoder arch source and the interleave text tokeniser (the
train CLI forces text_tokeniser_path = base_model_name, reference
cli/train.py:18-22).

Usage: python scripts/rehearse_sims.py --steps 60
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

N_UNITS = 500
N_WORDS = 800


def build_base_dir(root, tiny=False):
    """Local dir = Qwen2.5-0.5B-shaped config.json + WordLevel tokenizer
    (tiny=True: a 4-layer/64-dim arch for CPU smokes of the same recipe)."""
    base = os.path.join(root, "base")
    if os.path.isdir(base) and os.path.isfile(os.path.join(base, "config.json")):
        return base
    os.makedirs(base, exist_ok=True)
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3}
    for i in range(N_WORDS):
        vocab[f"w{i}"] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(os.path.join(base, "tokenizer.json"))
    fast = PreTrainedTokenizerFast(
        tokenizer_file=os.path.join(base, "tokenizer.json"),
        pad_token="<pad>", bos_token="<s>", eos_token="</s>", unk_token="<unk>")
    fast.save_pretrained(base)
    arch = (dict(hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
                 num_key_value_heads=2, intermediate_size=128) if tiny else
            dict(hidden_size=896, num_hidden_layers=24, num_attention_heads=14,
                 num_key_value_heads=2, intermediate_size=4864))
    with open(os.path.join(base, "config.json"), "w") as f:
        json.dump({"model_type": "qwen2",
                   "max_position_embeddings": 32768, "rope_theta": 10000.0,
                   "rms_norm_eps": 1e-6, "tie_word_embeddings": True,
                   "vocab_size": len(vocab), **arch}, f)
    return base


def gen_corpora(root, total_tokens):
    rng = np.random.default_rng(0)
    usucc = np.random.default_rng(12345).integers(0, N_UNITS, (N_UNITS, 4),
                                                  dtype=np.int32)
    wsucc = np.random.default_rng(54321).integers(0, N_WORDS, (N_WORDS, 4),
                                                  dtype=np.int32)

    def chains(succ, lens, starts):
        """Vectorized column-wise Markov stepping (rehearse_slam.gen_corpus
        pattern): all sequences advance one position per iteration."""
        n_seq, max_len = len(lens), int(max(lens))
        cols = np.empty((max_len, n_seq), np.int32)
        states = np.asarray(starts, np.int32).copy()
        draws = rng.integers(0, 4, size=(max_len, n_seq), dtype=np.int8)
        for t in range(max_len):
            cols[t] = states
            states = succ[states, draws[t]]
        return [cols[:lens[i], i] for i in range(n_seq)]

    def unit_str(units):
        return "".join(f"<Un{u}>" for u in units)

    def word_str(words):
        return " ".join(f"w{w}" for w in words)

    # token-balanced thirds, ~500 tokens per row
    per = total_tokens // 3
    paths = {}
    for name in ("text", "inter", "speech"):
        path = os.path.join(root, f"{name}.jsonl")
        paths[name] = path
        if os.path.isfile(path):
            continue
        n_rows = max(per // 500, 1)
        lens = rng.integers(300, 700, n_rows)
        if name == "speech":
            seqs = chains(usucc, lens, rng.integers(0, N_UNITS, n_rows))
            reprs = ("<speech>" + unit_str(s) for s in seqs)
        elif name == "text":
            seqs = chains(wsucc, lens, rng.integers(0, N_WORDS, n_rows))
            reprs = ("<text>" + word_str(s) for s in seqs)
        else:  # alternating spans, SpiritLM-style
            # pre-generate span pools, then stitch alternating spans per row
            span = 50
            n_spans = int(lens.sum()) // span + n_rows + 2
            upool = chains(usucc, [span] * (n_spans // 2 + 1),
                           rng.integers(0, N_UNITS, n_spans // 2 + 1))
            wpool = chains(wsucc, [span] * (n_spans // 2 + 1),
                           rng.integers(0, N_WORDS, n_spans // 2 + 1))
            ui = wi = 0

            def make_row(n, mod):
                nonlocal ui, wi
                parts = []
                for _ in range(max(n // span, 1)):
                    if mod:
                        parts.append("<speech>" + unit_str(upool[ui]))
                        ui += 1
                    else:
                        parts.append("<text>" + word_str(wpool[wi]))
                        wi += 1
                    mod ^= 1
                return "".join(parts)

            reprs = (make_row(int(n), int(rng.integers(2))) for n in lens)
        with open(path, "w") as f:
            for i, s in enumerate(reprs):
                f.write(json.dumps({"file_name": f"{name}_{i}",
                                    "audio_repr": s}) + "\n")
    return [paths["text"], paths["inter"], paths["speech"]]


def fabricate_fe_fixture(root):
    """Tiny random HF HubertModel dir + 500-centroid k-means npy (zero
    egress: the cross-modal eval path needs a real FE, not a mock)."""
    hdir, km = os.path.join(root, "hubert"), os.path.join(root, "km500.npy")
    if not os.path.isfile(os.path.join(hdir, "config.json")):
        import torch
        from transformers import HubertConfig, HubertModel

        torch.manual_seed(0)
        HubertModel(HubertConfig(
            hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
            intermediate_size=128, conv_dim=[32] * 7,
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
            mask_time_prob=0.0, mask_feature_prob=0.0,
        )).save_pretrained(hdir)
    if not os.path.isfile(km):
        cents = np.random.default_rng(7).standard_normal((N_UNITS, 64))
        np.save(km, cents.astype(np.float32))
    return hdir, km


def fabricate_vocoder_fixture(root):
    """Textless-registry files for mhubert-base-25hz-kmeans-500-hifigan: a
    tiny fairseq-layout generator checkpoint ({'generator': sd} with
    weight_g/v) + config json, served by CHECKPOINT_MANAGER from
    TEXTLESS_CHECKPOINT_ROOT without egress."""
    troot = os.path.join(root, "textless")
    model_pt = os.path.join(troot, "hifigan_lj_mhubert_base_25hz.pt")
    cfg_js = os.path.join(troot, "hifigan_lj_mhubert_base_25hz_config.json")
    if os.path.isfile(model_pt) and os.path.isfile(cfg_js):
        return troot
    os.makedirs(troot, exist_ok=True)
    import torch

    cfg = {"model_in_dim": 8, "upsample_initial_channel": 16,
           "upsample_rates": [4, 2], "upsample_kernel_sizes": [8, 4],
           "resblock_kernel_sizes": [3, 5],
           "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
           "num_embeddings": N_UNITS, "embedding_dim": 8,
           "sampling_rate": 16000}
    rng = np.random.default_rng(11)
    sd = {}

    def wn_conv(prefix, cin, cout, k, transpose=False):
        shape = (cin, cout, k) if transpose else (cout, cin, k)
        v = 0.05 * rng.standard_normal(shape).astype(np.float32)
        sd[prefix + ".weight_v"] = torch.tensor(v)
        sd[prefix + ".weight_g"] = torch.tensor(
            np.ones((shape[0], 1, 1), np.float32))
        sd[prefix + ".bias"] = torch.tensor(
            0.01 * rng.standard_normal(cout).astype(np.float32))

    wn_conv("conv_pre", cfg["model_in_dim"], 16, 7)
    ch = cfg["upsample_initial_channel"]
    n_k = len(cfg["resblock_kernel_sizes"])
    for i, (u, k) in enumerate(zip(cfg["upsample_rates"],
                                   cfg["upsample_kernel_sizes"])):
        wn_conv(f"ups.{i}", ch // 2 ** i, ch // 2 ** (i + 1), k, transpose=True)
        c = ch // 2 ** (i + 1)
        for j, rk in enumerate(cfg["resblock_kernel_sizes"]):
            r = i * n_k + j
            for d in range(len(cfg["resblock_dilation_sizes"][j])):
                wn_conv(f"resblocks.{r}.convs1.{d}", c, c, rk)
                wn_conv(f"resblocks.{r}.convs2.{d}", c, c, rk)
    wn_conv("conv_post", ch // 2 ** len(cfg["upsample_rates"]), 1, 7)
    sd["dict.weight"] = torch.tensor(
        0.05 * np.random.default_rng(12).standard_normal(
            (N_UNITS, cfg["embedding_dim"])).astype(np.float32))
    torch.save({"generator": sd}, model_pt)
    with open(cfg_js, "w") as f:
        json.dump(cfg, f)
    return troot


def fabricate_cm_data(root, n_triples=6, n_prompts=4):
    """cm-storycloze triples (TEXT mutual + SPEECH correct/incorrect wavs)
    and single-line text prompts for cross-modal generation."""
    from slamkit_tpu.utils.audio import save_wav

    cm = os.path.join(root, "cm_data")
    prompts = os.path.join(root, "cm_prompts")
    if os.path.isdir(cm) and os.path.isdir(prompts):
        return cm, prompts
    os.makedirs(cm, exist_ok=True)
    os.makedirs(prompts, exist_ok=True)
    rng = np.random.default_rng(3)
    for i in range(n_triples):
        base = os.path.join(cm, f"s{i}")
        with open(base + "_mutual.txt", "w") as f:
            f.write(word_text(rng, 12))
        for side in ("correct", "incorrect"):
            wav = 0.3 * rng.standard_normal(
                int(16000 * rng.uniform(0.5, 1.0))).astype(np.float32)
            save_wav(f"{base}_{side}.wav", wav, 16000)
    for i in range(n_prompts):
        with open(os.path.join(prompts, f"p{i}.txt"), "w") as f:
            f.write(word_text(rng, 10))
    return cm, prompts


def word_text(rng, n):
    return " ".join(f"w{int(w)}" for w in rng.integers(0, N_WORDS, n))


def latest_checkpoint(out):
    # the trainer's discovery skips INCOMPLETE dirs (kill mid-save)
    from slamkit_tpu.trainer.checkpoint import latest_checkpoint as _latest

    ck = _latest(out)
    assert ck, f"no complete checkpoints under {out}"
    return ck


def run_cross_modal_eval(args, base, out):
    """VERDICT r3 item 6: the cross-modal stack (cm_storycloze TEXT->SPEECH
    scoring through the real FE, then TEXT->SPEECH generation + vocoder
    synthesis) end-to-end on hardware against the trained SIMS model."""
    hdir, km = fabricate_fe_fixture(args.root)
    troot = fabricate_vocoder_fixture(args.root)
    cm, prompts = fabricate_cm_data(args.root)
    ckpt = latest_checkpoint(out)
    env = dict(os.environ, TEXTLESS_CHECKPOINT_ROOT=troot)
    common = [sys.executable, os.path.join(REPO, "cli/eval.py"),
              f"model.pretrained_model={ckpt}",
              f"model.config_args.base_model_name={base}",
              "model.tlm_type=gslm", "model.config_args.twist_init=false",
              "tokeniser=interleaved_hubert_25",
              f"tokeniser.params.text_tokeniser_path={base}",
              f"tokeniser.feature_extractor.pretrained_model={hdir}",
              f"tokeniser.feature_extractor.kmeans_path={km}",
              "tokeniser.feature_extractor.layer=2",
              "logger=print", "batch_size=2"] + list(args.eval_extra or [])
    t0 = time.time()
    r1 = subprocess.run(common + [
        "metric=cm_ms_tsc", f"metric.data_path={cm}",
        "metric.subfolder=false", "metric.prompt_modality=TEXT",
        "metric.cont_modality=SPEECH", "vocoder=no_vocoder"], env=env)
    print(f"cm_storycloze rc={r1.returncode} wall={time.time() - t0:.0f}s",
          flush=True)
    t0 = time.time()
    r2 = subprocess.run(common + [
        "metric=cm_generate",
        "metric.data_path=" + os.path.join(prompts, "*.txt"),
        "metric.prompt_modality=TEXT", "metric.cont_modality=SPEECH",
        "metric.num_files=4", "metric.ext=wav",
        f"metric.out_path={os.path.join(args.root, 'generated')}",
        "metric.generate_kwargs.max_new_tokens=40",
        "vocoder=vocoder_hubert_25"], env=env)
    n_wavs = len([f for f in os.listdir(os.path.join(args.root, "generated"))
                  if f.endswith(".wav")]) \
        if os.path.isdir(os.path.join(args.root, "generated")) else 0
    print(f"cm_generate rc={r2.returncode} wall={time.time() - t0:.0f}s "
          f"({n_wavs} synthesized wavs)", flush=True)
    return r1.returncode or r2.returncode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--tokens", type=float, default=1.2e7)
    ap.add_argument("--root", default="/tmp/sims_rehearsal")
    ap.add_argument("--eval", action="store_true",
                    help="after training, run the cross-modal eval stack "
                         "(cm_storycloze + generation + vocoder synth)")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip training; eval against the existing --root out")
    ap.add_argument("--tiny", action="store_true",
                    help="4-layer/64-dim arch for CPU smokes")
    ap.add_argument("--extra", nargs="*", default=[])
    ap.add_argument("--eval-extra", nargs="*", default=[],
                    help="extra overrides for the two eval CLI calls "
                         "(e.g. device=cpu)")
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    base = build_base_dir(args.root, tiny=args.tiny)
    out = os.path.join(args.root, "out")
    if args.eval_only:
        sys.exit(run_cross_modal_eval(args, base, out))
    t0 = time.time()
    paths = gen_corpora(args.root, int(args.tokens))
    print(f"corpora ready in {time.time() - t0:.0f}s", flush=True)
    cmd = [sys.executable, os.path.join(REPO, "cli/train.py"),
           "--config-name", "train_inter_scale",
           f"model.config_args.base_model_name={base}",
           "model.config_args.attn_implementation="
           + ("null" if args.tiny else "flash_attention_2"),
           "model.tlm_type=gslm", "model.config_args.twist_init=false",
           "data.train_path=[" + ",".join(paths) + "]",
           "data.val_path=null",
           "logger=print",
           f"training_args.output_dir={out}",
           f"training_args.max_steps={args.steps}",
           "training_args.per_device_train_batch_size=4",
           "training_args.gradient_accumulation_steps=8",
           "training_args.logging_steps=10",
           "training_args.save_steps=0",
           "training_args.eval_steps=0",
           "training_args.optim_state_dtype=bfloat16",
           "training_args.remat=true",
           "ds_token_size=0",
           ] + args.extra
    print(" ".join(cmd), flush=True)
    t0 = time.time()
    r = subprocess.run(cmd)
    print(f"sims rc={r.returncode} wall={time.time() - t0:.0f}s")
    if args.eval and r.returncode == 0:
        sys.exit(run_cross_modal_eval(args, base, out))
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()

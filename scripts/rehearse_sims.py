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

N_UNITS = 500
N_WORDS = 800


def build_base_dir(root):
    """Local dir = Qwen2.5-0.5B-shaped config.json + WordLevel tokenizer."""
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
    with open(os.path.join(base, "config.json"), "w") as f:
        json.dump({"model_type": "qwen2", "hidden_size": 896,
                   "num_hidden_layers": 24, "num_attention_heads": 14,
                   "num_key_value_heads": 2, "intermediate_size": 4864,
                   "max_position_embeddings": 32768, "rope_theta": 10000.0,
                   "rms_norm_eps": 1e-6, "tie_word_embeddings": True,
                   "vocab_size": len(vocab)}, f)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--tokens", type=float, default=1.2e7)
    ap.add_argument("--root", default="/tmp/sims_rehearsal")
    ap.add_argument("--extra", nargs="*", default=[])
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    base = build_base_dir(args.root)
    t0 = time.time()
    paths = gen_corpora(args.root, int(args.tokens))
    print(f"corpora ready in {time.time() - t0:.0f}s", flush=True)

    out = os.path.join(args.root, "out")
    cmd = [sys.executable, os.path.join(REPO, "cli/train.py"),
           "--config-name", "train_inter_scale",
           f"model.config_args.base_model_name={base}",
           "model.config_args.attn_implementation=flash_attention_2",
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


if __name__ == "__main__":
    main()

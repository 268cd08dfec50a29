"""End-to-end SIMS path: features+meta jsonl -> interleaved tokens jsonl ->
interleaved training (reference docs/SIMS.md recipe, cli/prepare_tokens.py
requires_meta + cli/train.py interleave branch)."""
import json
import pathlib

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def text_tok_dir(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    d = tmp_path_factory.mktemp("tok2")
    tok = Tokenizer(models.WordLevel(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    corpus = d / "corpus.txt"
    corpus.write_text("the quick brown fox jumps over a lazy dog today\n" * 4)
    tok.train([str(corpus)], trainers.WordLevelTrainer(
        special_tokens=["<pad>", "<s>", "</s>", "<unk>"]))
    tok.save(str(d / "tokenizer.json"))
    PreTrainedTokenizerFast(
        tokenizer_file=str(d / "tokenizer.json"), pad_token="<pad>",
        bos_token="<s>", eos_token="</s>", unk_token="<unk>",
    ).save_pretrained(str(d / "hf"))
    return str(d / "hf")


def test_interleaved_prepare_and_train(tmp_path, text_tok_dir, monkeypatch):
    from slamkit_tpu.config import compose
    from slamkit_tpu.data.dataset import init_dataset
    from slamkit_tpu.data.prepare import prepare_tokens_file
    from slamkit_tpu.feature_extractor.hubert_feature_extractor import \
        HubertFeatureExtractor
    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig
    from slamkit_tpu.tokeniser.interleaving_tokeniser import InterleavingTokeniser
    from slamkit_tpu.trainer import SLAMTrainer

    # stage-1 output: features + aligned-text meta (requires_meta layout:
    # meta json next to the features, reference cli/prepare_tokens.py:24-31)
    rng = np.random.default_rng(0)
    feats = tmp_path / "features.jsonl"
    with open(feats, "w") as f:
        for i in range(12):
            n = int(rng.integers(20, 40))
            units = rng.integers(0, 30, n).tolist()
            name = str(tmp_path / f"a{i}.wav")
            f.write(json.dumps({"units": units, "duration": [1] * n,
                                "file_name": name}) + "\n")
            words = ["the", "quick", "brown", "fox"]
            # 0.2 s/unit in the FE below -> total n*0.2 seconds
            step = n * 0.2 / len(words)
            meta = {"aligned_text": [(w, j * step, (j + 1) * step)
                                     for j, w in enumerate(words)]}
            with open(str(tmp_path / f"a{i}.json"), "w") as mf:
                json.dump(meta, mf)

    class CfgFE(HubertFeatureExtractor):
        def __init__(self):
            self.config = None

        def get_unit_duration(self):
            return 0.2

        sample_rate = 16000

    tok = InterleavingTokeniser(CfgFE(), num_units=30,
                                text_tokeniser_path=text_tok_dir,
                                interleave_method="random")
    np.random.seed(0)
    n = prepare_tokens_file(str(feats), str(tmp_path / "tokens.jsonl"), tok,
                            requires_meta=True)
    assert n == 12
    rows = [json.loads(l) for l in open(tmp_path / "tokens.jsonl")]
    assert all("audio_repr" in r and "units" not in r for r in rows)
    # interleaved rows contain modality switches and unit tokens
    assert any("<speech>" in r["audio_repr"] for r in rows)
    assert any("<text>" in r["audio_repr"] for r in rows)

    # stage-3: train over the interleaved tokens
    cfg = compose(str(REPO_ROOT / "config"), "train", [
        f"data.train_path={tmp_path}/tokens.jsonl",
        f"data.val_path={tmp_path}/tokens.jsonl",
        "data.packing=true", "model=gslm", "model.context_len=64",
        "model.config_args.base_model_name=EleutherAI/pythia-14m",
        f"training_args.output_dir={tmp_path}/out",
        "training_args.max_steps=2", "training_args.per_device_train_batch_size=1",
        "training_args.logging_steps=1", "training_args.eval_strategy=no",
        "training_args.save_steps=0",
        # token budget counted over SPEECH ids only (SIMS accounting)
        f"training_args.min_token_id_count={len(tok.text_tokeniser) - 32}",
    ])
    ds = init_dataset(cfg, tok)
    model = UnitLM(UnitLMConfig(base_model_name="EleutherAI/pythia-14m",
                                vocab_size=len(tok.text_tokeniser),
                                twist_init=False))
    tr = SLAMTrainer(model, cfg.training_args, ds["train"],
                     packing=True, context_len=64)
    state = tr.train()
    assert state.global_step == 2
    assert 0 < state.num_input_tokens_seen  # speech-only count is non-zero

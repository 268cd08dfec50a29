"""JAX text-LM perplexity backend (metric_utils.get_llm backend='jax'):
per-sequence NLL parity with the torch branch on identical tiny-llama
weights — the GenPPL scoring stage without torch in the loop."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from slamkit_tpu.metric.metric_utils import get_llm_perplexity


class DummyTok:
    """Deterministic fake tokenizer: text 'a b c' -> ids [hash(word)...],
    right-padded with pad_token_id. Returns numpy or torch per
    return_tensors, BatchEncoding-style (.to works for the torch branch)."""

    pad_token_id = 0

    def __call__(self, texts, padding=True, return_tensors="np"):
        rows = [[1] + [2 + (hash(w) % 37) for w in t.split()] for t in texts]
        width = max(len(r) for r in rows)
        ids = np.full((len(rows), width), self.pad_token_id, np.int64)
        mask = np.zeros((len(rows), width), np.int64)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        if return_tensors == "np":
            return {"input_ids": ids, "attention_mask": mask}
        from transformers import BatchEncoding

        return BatchEncoding({"input_ids": torch.tensor(ids),
                              "attention_mask": torch.tensor(mask)},
                             tensor_type="pt")


def test_jax_llm_perplexity_matches_torch(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig

    hf_cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
        attn_implementation="eager", pad_token_id=0)
    torch.manual_seed(0)
    tm = LlamaForCausalLM(hf_cfg).eval()
    d = tmp_path / "llama_tiny"
    tm.save_pretrained(d)

    tok = DummyTok()
    texts = ["the quick brown fox", "jumps", "over the lazy dog tonight"]
    nll_torch = get_llm_perplexity(tm, tok, texts, device="cpu").numpy()

    jax_lm = UnitLM(UnitLMConfig(base_model_name=str(d), vocab_size=64,
                                 twist_init=True, pad_token_id=0,
                                 torch_dtype="float32"))
    nll_jax = np.asarray(get_llm_perplexity(jax_lm, tok, texts))
    np.testing.assert_allclose(nll_jax, nll_torch, atol=1e-4, rtol=1e-4)


def test_get_llm_jax_backend_builds_from_local_dir(tmp_path):
    """get_llm(backend='jax') end to end needs only a model dir; the
    tokenizer comes from the same dir in real use — here we check the
    model half (a fabricated dir without tokenizer raises on AutoTokenizer,
    so build the pieces the way get_llm does)."""
    from transformers import AutoConfig, LlamaConfig, LlamaForCausalLM

    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig

    hf_cfg = LlamaConfig(
        vocab_size=48, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, attn_implementation="eager")
    torch.manual_seed(1)
    tm = LlamaForCausalLM(hf_cfg).eval()
    d = tmp_path / "llm"
    tm.save_pretrained(d)
    vocab = AutoConfig.from_pretrained(d).vocab_size
    lm = UnitLM(UnitLMConfig(base_model_name=str(d), vocab_size=vocab,
                             twist_init=True, pad_token_id=0,
                             torch_dtype="float32"))
    ids = np.array([[1, 5, 9, 3]], np.int32)
    ll = np.asarray(lm.log_likelihood(ids, mean_nll=True))
    with torch.no_grad():
        lg = tm(torch.tensor(ids.astype(np.int64))).logits.numpy()
    # manual reference NLL over the shifted tokens (no pads present)
    tgt = ids[0, 1:]
    lp = lg[0, :-1] - np.log(np.exp(lg[0, :-1]).sum(-1, keepdims=True))
    want = lp[np.arange(3), tgt].mean()
    np.testing.assert_allclose(ll[0], want, atol=1e-4)


def test_jax_judge_generation(tmp_path):
    """judge_text dispatches a UnitLM-backed judge through the jitted
    sampling decode and still extracts \\boxed scores from the decoded
    strings (fake tokenizer: decode emits boxed(last token % 10))."""
    from transformers import LlamaConfig, LlamaForCausalLM

    from slamkit_tpu.metric.metric_utils import judge_text
    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig

    hf_cfg = LlamaConfig(
        vocab_size=48, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=1024, attn_implementation="eager")
    torch.manual_seed(2)
    d = tmp_path / "judge"
    LlamaForCausalLM(hf_cfg).save_pretrained(d)
    lm = UnitLM(UnitLMConfig(base_model_name=str(d), vocab_size=48,
                             twist_init=True, pad_token_id=0,
                             torch_dtype="float32"))
    lm.config.eos_token_id = 2

    class Tok:
        pad_token_id = 0
        padding_side = "right"

        def __call__(self, texts, padding=True, return_tensors="np"):
            rows = [[1] + [3 + (hash(w) % 37) for w in t.split()]
                    for t in texts]
            width = max(len(r) for r in rows)
            ids = np.zeros((len(rows), width), np.int64)
            mask = np.zeros((len(rows), width), np.int64)
            for i, r in enumerate(rows):  # LEFT pad, judge convention
                ids[i, width - len(r):] = r
                mask[i, width - len(r):] = 1
            return {"input_ids": ids, "attention_mask": mask}

        def batch_decode(self, seqs, skip_special_tokens=True):
            return [f"judged \\boxed{{{int(s[-1]) % 10}}}" for s in seqs]

    scores = judge_text(lm, Tok(), ["rate this please", "and this"])
    assert len(scores) == 2
    assert all(isinstance(s, int) and 0 <= s <= 9 for s in scores)

"""SpeechLM composition tests: tokenise->score, prompt->generate->decode->
vocode, and the cross-modal likelihood path (SURVEY.md §4)."""
import numpy as np
import pytest

from slamkit_tpu.models.speech_lm import SpeechLM
from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig
from slamkit_tpu.tokeniser.unit_tokeniser import UnitTokeniser

N_UNITS = 40


class FakeFE:
    """Deterministic FE: one unit per 3200 samples, id = (i*3)%N."""

    sample_rate = 16000

    def extract(self, wav, lens=None):
        wav = np.atleast_2d(np.asarray(wav))
        out = []
        for i in range(wav.shape[0]):
            n = max(int((lens[i] if lens is not None else wav.shape[1]) / 3200), 1)
            out.append((np.arange(n) * 3) % N_UNITS)
        return out

    def get_unit_duration(self):
        return 0.2


class FakeVocoder:
    def vocode(self, tokens, **kw):
        return np.repeat(np.asarray(tokens, dtype=np.float32) / N_UNITS, 160)


@pytest.fixture(scope="module")
def speech_lm():
    tok = UnitTokeniser(FakeFE(), num_units=N_UNITS)
    lm = UnitLM(UnitLMConfig(base_model_name="EleutherAI/pythia-14m",
                             vocab_size=N_UNITS + 2, twist_init=False))
    return SpeechLM(lm, tok, vocoder=FakeVocoder())


def test_log_likelihood_shapes(speech_lm):
    wavs = np.zeros((3, 16000), np.float32)
    lens = np.array([16000, 9600, 3200])
    ll = np.asarray(speech_lm.log_likelihood(wavs, lens))
    assert ll.shape == (3,)
    assert np.all(np.isfinite(ll))
    # sum-nll is |len|-scaled; mean removes the length bias
    ll_sum = np.asarray(speech_lm.log_likelihood(wavs, lens, mean_nll=False))
    assert ll_sum[0] < ll_sum[2]  # longer sequence -> lower total loglik


def test_generate_returns_vocoded_audio(speech_lm):
    wavs = np.zeros((2, 9600), np.float32)
    lens = np.array([9600, 6400])
    outs = speech_lm.generate(wavs, lens, max_new_tokens=8, do_sample=False)
    assert len(outs) == 2
    for o in outs:
        assert o.dtype == np.float32 and o.ndim == 1 and o.size > 0


def test_generate_remove_prompt(speech_lm):
    speech_lm.vocoder, voc = None, speech_lm.vocoder
    try:
        wavs = np.zeros((1, 9600), np.float32)
        full = speech_lm.generate(wavs, np.array([9600]), max_new_tokens=5,
                                  do_sample=False, seed=0)
        cont = speech_lm.generate(wavs, np.array([9600]), max_new_tokens=5,
                                  do_sample=False, seed=0, remove_prompt=True)
        # without the prompt the decoded unit stream is strictly shorter
        assert len(cont[0]) < len(full[0])
    finally:
        speech_lm.vocoder = voc


def test_cm_storycloze_layout(tmp_path):
    """Cross-modal triples with TEXT prompt + SPEECH continuations through an
    interleaving tokeniser (reference cross_modal_metric.py:96-103)."""
    transformers = pytest.importorskip("transformers")
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    from slamkit_tpu.metric.cross_modal_metric import cm_storycloze
    from slamkit_tpu.tokeniser.interleaving_tokeniser import InterleavingTokeniser
    from slamkit_tpu.utils.audio import save_wav

    tok_raw = Tokenizer(models.WordLevel(unk_token="<unk>"))
    tok_raw.pre_tokenizer = pre_tokenizers.Whitespace()
    corpus = tmp_path / "c.txt"
    corpus.write_text("the cat sat down here\n" * 3)
    tok_raw.train([str(corpus)], trainers.WordLevelTrainer(
        special_tokens=["<pad>", "<s>", "</s>", "<unk>"]))
    tok_raw.save(str(tmp_path / "tokenizer.json"))
    PreTrainedTokenizerFast(
        tokenizer_file=str(tmp_path / "tokenizer.json"), pad_token="<pad>",
        bos_token="<s>", eos_token="</s>", unk_token="<unk>",
    ).save_pretrained(str(tmp_path / "hf"))

    itok = InterleavingTokeniser(FakeFE(), num_units=N_UNITS,
                                 text_tokeniser_path=str(tmp_path / "hf"))
    lm = UnitLM(UnitLMConfig(base_model_name="EleutherAI/pythia-14m",
                             vocab_size=len(itok.text_tokeniser),
                             twist_init=False))
    model = SpeechLM(lm, itok)

    d = tmp_path / "cmsc"
    d.mkdir()
    for i in range(3):
        (d / f"{i}_mutual.txt").write_text("the cat sat")
        for kind, n in (("correct", 9600), ("incorrect", 14400)):
            t = np.arange(n) / 16000
            save_wav(str(d / f"{i}_{kind}.wav"), 0.05 * np.sin(2 * np.pi * 220 * t))
    res = cm_storycloze(model, str(d), "TEXT", "SPEECH", subfolder=False)
    assert 0.0 <= res["StoryCloze"] <= 1.0

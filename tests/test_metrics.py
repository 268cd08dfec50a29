"""Metric-stack tests: dataset layouts, the 1/0.5/0 tie rule, SpeechLM
composition, prompt cropping, auto-BLEU, boxed parsing (SURVEY.md §4)."""
import json

import numpy as np
import pytest

from slamkit_tpu.metric.generative_metric import PromptDataset, get_cut_location
from slamkit_tpu.metric.metric_utils import extract_digit_from_boxed
from slamkit_tpu.metric.modelling_metric import (ModellingMetricDataset,
                                                 SalmonDataset,
                                                 modelling_metric, sblimp)
from slamkit_tpu.models.speech_lm import SpeechLM
from slamkit_tpu.utils.audio import load_audio, save_wav
from slamkit_tpu.utils.calculation_utils import calc_auto_bleu


def write_tone(path, n_samples, freq=440.0, sr=16000):
    t = np.arange(n_samples) / sr
    save_wav(str(path), 0.1 * np.sin(2 * np.pi * freq * t), sr)


# --------------------------------------------------------------------------- #
# audio io
# --------------------------------------------------------------------------- #
def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    save_wav(str(tmp_path / "x.wav"), wav, 16000)
    back = load_audio(str(tmp_path / "x.wav"), 16000)
    assert back.shape == wav.shape
    np.testing.assert_allclose(back, wav, atol=1e-4)


def test_native_flac_decode():
    wav = load_audio("/root/reference/example_data/audio/audio1.flac", 16000)
    assert wav.shape == (225360,)
    assert wav.dtype == np.float32


# --------------------------------------------------------------------------- #
# modelling metric datasets + tie rule
# --------------------------------------------------------------------------- #
def test_modelling_dataset_pairing(tmp_path):
    for i in range(4):
        write_tone(tmp_path / f"{i}_x.wav", 1600 + 100 * i)
    ds = ModellingMetricDataset(str(tmp_path), sep="_", subfolder=False)
    assert len(ds) == 2
    pos, neg = ds[0]
    assert len(pos) == 1600 and len(neg) == 1700


def test_salmon_dataset_grouping(tmp_path):
    part = tmp_path / "gender_consistency"
    part.mkdir()
    for idx in range(3):
        write_tone(part / f"a_{idx}_pos.wav", 1600)
        write_tone(part / f"b_{idx}_neg.wav", 1600)
    ds = SalmonDataset(str(tmp_path), "gender_consistency")
    assert len(ds) == 3


class FixedLLModel:
    """SpeechLM stand-in scoring by audio length (longer = more likely)."""

    device = None

    def log_likelihood(self, wavs, lens=None, mean_nll=True, used_token_modality=None):
        return np.asarray(lens, dtype=np.float64)


def test_tie_rule(tmp_path):
    # pos longer / equal / shorter than neg -> 1 / 0.5 / 0
    for i, (lp, ln) in enumerate([(2000, 1600), (1600, 1600), (1200, 1600)]):
        write_tone(tmp_path / f"{2*i}_p.wav", lp)
        write_tone(tmp_path / f"{2*i+1}_n.wav", ln)
    ds = ModellingMetricDataset(str(tmp_path), sep="_", subfolder=False)
    res = modelling_metric(FixedLLModel(), ds, None, batch_size=2)
    assert res == pytest.approx((1 + 0.5 + 0) / 3)


# --------------------------------------------------------------------------- #
# end-to-end sblimp on a tiny trained-ish model
# --------------------------------------------------------------------------- #
def test_sblimp_end_to_end(tmp_path):
    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig
    from slamkit_tpu.tokeniser.unit_tokeniser import UnitTokeniser

    class FakeFE:
        sample_rate = 16000

        def extract(self, wav, lens=None):
            wav = np.atleast_2d(wav)
            out = []
            for i in range(wav.shape[0]):
                n = max(int((lens[i] if lens is not None else wav.shape[1]) / 3200), 1)
                out.append((np.arange(n) * 7) % 500)
            return out

    tok = UnitTokeniser(FakeFE(), num_units=500)
    lm = UnitLM(UnitLMConfig(base_model_name="EleutherAI/pythia-14m",
                             vocab_size=502, twist_init=False))
    model = SpeechLM(lm, tok)
    for i in range(4):
        write_tone(tmp_path / f"{2*i}+p.wav", 3200 * (i + 1))
        write_tone(tmp_path / f"{2*i+1}+n.wav", 3200 * (i + 2))
    res = sblimp(model, str(tmp_path), None, batch_size=2, subfolder=False)
    assert 0.0 <= res["sBLIMP"] <= 1.0

    # sharded eval (cli/eval.py eval_mesh): identical scores over the
    # 8-device data mesh — batch rows shard, likelihoods are per-row.
    # Non-divisible batches pad-and-mask (tail rows dropped), so ANY
    # batch_size works (VERDICT r4 weak #5).
    from slamkit_tpu.parallel.mesh import make_mesh

    for i in range(4, 8):  # 8 pairs total -> one full 8-row batch per side
        write_tone(tmp_path / f"{2*i}+p.wav", 3200 * (i + 1))
        write_tone(tmp_path / f"{2*i+1}+n.wav", 3200 * (i + 2))
    res8 = sblimp(model, str(tmp_path), None, batch_size=8, subfolder=False)
    lm.shard(make_mesh())
    res_mesh = sblimp(model, str(tmp_path), None, batch_size=8, subfolder=False)
    assert res_mesh["sBLIMP"] == res8["sBLIMP"]
    # batch 6 over 8 devices: 12-row LL batches pad to 16, tail dropped —
    # same decisions as the unsharded run
    res_odd = sblimp(model, str(tmp_path), None, batch_size=6, subfolder=False)
    assert res_odd["sBLIMP"] == res8["sBLIMP"]


# --------------------------------------------------------------------------- #
# prompt dataset
# --------------------------------------------------------------------------- #
def test_prompt_dataset_crop_and_filters(tmp_path):
    write_tone(tmp_path / "a.wav", 32000)  # 2s
    write_tone(tmp_path / "b.wav", 8000)   # 0.5s
    ds = PromptDataset(str(tmp_path / "*.wav"), prompt_length=1.0)
    assert len(ds) == 2
    assert max(len(ds[i]) for i in range(2)) == 16000
    ds2 = PromptDataset(str(tmp_path / "*.wav"), min_file_length=1.0)
    assert len(ds2) == 1
    ds3 = PromptDataset(str(tmp_path / "*.wav"), num_files=1)
    assert len(ds3) == 1


def test_prompt_dataset_alignment_snap(tmp_path):
    write_tone(tmp_path / "a.wav", 48000)  # 3s
    meta = {"aligned_text": [["hi", 0.0, 0.8], ["there", 0.8, 1.9], ["friend", 1.9, 2.8]]}
    (tmp_path / "a.json").write_text(json.dumps(meta))
    ds = PromptDataset(str(tmp_path / "*.wav"), prompt_length=2.0, use_alignment=True)
    # closest word end to 2.0s is 1.9 -> crop there
    assert len(ds[0]) == int(1.9 * 16000)
    assert get_cut_location(meta["aligned_text"], 2.5) == pytest.approx(2.8)


# --------------------------------------------------------------------------- #
# utils
# --------------------------------------------------------------------------- #
def test_auto_bleu():
    class WS:
        def tokenize(self, t):
            return t.split()

    assert calc_auto_bleu("a b a b a b", WS(), 2) == pytest.approx(1.0)
    assert calc_auto_bleu("a b c d e", WS(), 2) == 0
    assert calc_auto_bleu("", WS(), 2) == 0


def test_boxed_parser():
    assert extract_digit_from_boxed(r"the score is \boxed{7} ok") == 7
    assert extract_digit_from_boxed("no box here") is None


def test_transcribe_filters_empty_clips():
    """Empty continuations must never reach the ASR pipeline
    (Whisper fails/hallucinates on empty audio)."""
    from slamkit_tpu.metric.generative_metric import _transcribe

    seen, batch_sizes = [], []

    def fake_pipeline(wavs, batch_size):
        seen.extend(wavs)
        batch_sizes.append(batch_size)
        return [{"text": f"t{len(w)}"} for w in wavs]

    out = _transcribe(fake_pipeline,
                      [np.zeros(5, np.float32), np.zeros(0, np.float32),
                       np.zeros(3, np.float32)], batch_size=8)
    assert out == ["t5", "", "t3"]
    assert all(w.size > 0 for w in seen) and len(seen) == 2
    # the pipeline batch is capped at the CONFIGURED batch size, not len(keep)
    assert batch_sizes == [2]
    out = _transcribe(fake_pipeline, [np.zeros(4, np.float32)] * 5, batch_size=2)
    assert batch_sizes[-1] == 2
    # all-empty batch: the pipeline is never called
    seen.clear()
    assert _transcribe(fake_pipeline, [np.zeros(0, np.float32)],
                       batch_size=8) == [""]
    assert seen == []


def test_resolve_torch_device():
    from slamkit_tpu.metric.generative_metric import _resolve_torch_device

    assert _resolve_torch_device("cpu") == "cpu"
    assert _resolve_torch_device("cuda:1") == "cuda:1"
    # auto mode picks cuda only when torch reports one (cpu box here)
    assert _resolve_torch_device(None) in ("cpu", "cuda")


def test_cross_modal_generate_text_prompts(tmp_path):
    """cross_modal_generation.generate: glob collection honors num_files,
    prompts are one-element GenerationInput lists, batching preserves order,
    and results return alongside their prompts (reference
    cross_modal_generation.py:63-79 surface)."""
    from slamkit_tpu.metric.cross_modal_generation import generate

    for i in range(5):
        (tmp_path / f"p{i}.txt").write_text(f"prompt {i}\n")

    class StubModel:
        def generate(self, batch, output_modality=None, **kw):
            assert output_modality == "SPEECH"
            return [inp[0].content.upper() for inp in batch]

    res = generate(StubModel(), str(tmp_path / "*.txt"), batch_size=2,
                   prompt_modality="TEXT", output_modality="SPEECH",
                   num_files=3)
    assert len(res["generate"]) == len(res["prompts"]) == 3
    assert sorted(res["generate"]) == ["PROMPT 0", "PROMPT 1", "PROMPT 2"]
    for p, g in zip(res["prompts"], res["generate"]):
        assert p[0].content_type.name == "TEXT" and p[0].content.upper() == g

"""Unit tokeniser tests incl. golden bit-for-bit parity with the reference's
committed example data (reference example_data/{features,tokens}.jsonl)."""
import json

import numpy as np
import pytest

from slamkit_tpu.tokeniser import UnitTokeniser, unit_codec
from slamkit_tpu.data.prepare import process_feature_line


class FakeFE:
    """Deterministic extractor standing in for HuBERT (SURVEY.md §4: the
    reference's load_config_only flag plays the same role)."""

    sample_rate = 16000

    def __init__(self, frames):
        self.frames = frames

    def extract(self, wav, lens=None):
        return [np.asarray(f) for f in self.frames]

    def get_unit_duration(self):
        return 0.02


def test_rle_matches_groupby_semantics():
    t = np.array([7, 7, 3, 3, 3, 9, 7])
    units, durs = unit_codec.run_length_encode(t)
    assert units == [7, 3, 9, 7]
    assert durs == [2, 3, 1, 1]
    assert unit_codec.run_length_decode(units, durs).tolist() == t.tolist()


def test_rle_empty_and_singleton():
    assert unit_codec.run_length_encode(np.array([], dtype=int)) == ([], [])
    assert unit_codec.run_length_encode(np.array([5])) == ([5], [1])


def test_rle_fuzz_against_groupby():
    from itertools import groupby

    rng = np.random.default_rng(0)
    for _ in range(50):
        t = rng.integers(0, 5, size=rng.integers(1, 100))
        units, durs = unit_codec.run_length_encode(t)
        expect = [(k, len(list(g))) for k, g in groupby(t.tolist())]
        assert units == [k for k, _ in expect]
        assert durs == [n for _, n in expect]


def test_unit_string_roundtrip():
    units = [3, 49, 7, 254, 499, 0]
    s = unit_codec.units_to_string(units)
    assert s == "<Un3><Un49><Un7><Un254><Un499><Un0>"
    assert unit_codec.string_to_units(s).tolist() == units


def test_vocab_layout():
    tok = UnitTokeniser(None, load_fe=False, num_units=500)
    # <PAD>=0, <S>=1, units at 2..501 → vocab size 502 (unit_tokeniser.py:33-36)
    assert tok.offset == 2
    assert len(tok.text_tokeniser) == 502
    ids = tok.string_tokenise("<Un0><Un499>")["input_ids"][0]
    assert ids == [1, 2, 501, 1]


def test_prepare_sample_and_decode_roundtrip():
    tok = UnitTokeniser(None, load_fe=False)
    sample = {"audio_repr": "<Un3><Un49><Un7>"}
    enc = tok.prepare_sample(sample)
    assert enc["input_ids"][0] == [1, 5, 51, 9, 1]
    units = tok.decode_sample(np.array(enc["input_ids"][0]))
    assert units.tolist() == [3, 49, 7]


def test_padding_sides():
    tok = UnitTokeniser(None, load_fe=False)
    batch = tok.string_tokenise(["<Un1>", "<Un1><Un2><Un3>"], padding=True)
    assert batch["input_ids"].shape == (2, 5)
    assert batch["input_ids"][0].tolist() == [1, 3, 1, 0, 0]
    assert batch["attention_mask"][0].tolist() == [1, 1, 1, 0, 0]
    tok.text_tokeniser.padding_side = "left"
    batch = tok.string_tokenise(["<Un1>", "<Un1><Un2><Un3>"], padding=True)
    assert batch["input_ids"][0].tolist() == [0, 0, 1, 3, 1]
    assert batch["attention_mask"][0].tolist() == [0, 0, 1, 1, 1]


def test_build_prompt_drops_eos():
    frames = [[3, 3, 49]]
    tok = UnitTokeniser(FakeFE(frames))
    prompt = tok.build_prompt(np.zeros((1, 100)))
    # dedup → [3, 49] → bos + units, NO trailing eos (unit_tokeniser.py:75-80)
    assert prompt["input_ids"][0].tolist() == [1, 5, 51]


def test_audio_represent_dedup_flag():
    frames = [[3, 3, 49]]
    tok = UnitTokeniser(FakeFE(frames), dedup=False)
    reps = tok.audio_represent(np.zeros((1, 100)))
    assert reps[0]["units"] == [3, 3, 49]
    assert reps[0]["duration"] == [1, 1, 1]


def test_save_load_roundtrip(tmp_path):
    tok = UnitTokeniser(None, load_fe=False, dedup=False, num_units=100)
    tok.save_pretrained(str(tmp_path))
    tok2 = UnitTokeniser.from_pretrained(str(tmp_path))
    assert tok2.num_units == 100
    assert tok2.dedup is False
    assert tok2.model is None


def test_golden_tokens_jsonl_bit_for_bit(example_data_dir):
    """Stage 2 on the reference's committed features.jsonl must reproduce its
    committed tokens.jsonl byte-for-byte (README.md:65 golden check)."""
    tok = UnitTokeniser(None, load_fe=False)
    features = (example_data_dir / "features.jsonl").read_text().splitlines()
    expected = (example_data_dir / "tokens.jsonl").read_text().splitlines()
    produced = [process_feature_line(line, tok) for line in features]
    assert produced == expected


def test_process_feature_line_bad_json_skips():
    tok = UnitTokeniser(None, load_fe=False)
    assert process_feature_line("not json {", tok) is None


def test_ignore_tokens_none():
    tok = UnitTokeniser(None, load_fe=False)
    assert tok.get_ignore_tokens("SPEECH") is None


def test_native_codec_parity():
    """C++ bulk codec must agree with the Python path exactly."""
    import numpy as np

    from slamkit_tpu.native import codec as native

    assert native.available()
    units = list(np.random.default_rng(0).integers(0, 500, 200))
    s_native = native.units_to_string(units)
    s_py = "".join(f"<Un{int(u)}>" for u in units)
    assert s_native == s_py
    back = native.string_to_units(s_py + " garbage <Un5> <Unx> <Un12>")
    assert back.tolist() == [int(u) for u in units] + [5, 12]
    assert native.string_to_units("").tolist() == []
    assert native.units_to_string([]) == ""


def test_prepare_batch_matches_prepare_sample():
    import numpy as np

    from slamkit_tpu.tokeniser.unit_tokeniser import UnitTokeniser

    tok = UnitTokeniser(None, num_units=20, load_fe=False)
    rows = [{"audio_repr": "<Un3><Un17><Un3>"}, {"audio_repr": "<Un0>"}]
    batched = tok.prepare_batch(rows)
    for row, ids in zip(rows, batched):
        want = np.asarray(tok.prepare_sample(row)["input_ids"][0]).reshape(-1)
        assert np.array_equal(np.asarray(ids), want)

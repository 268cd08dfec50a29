"""data_prep offline helpers: LibriSpeech transcripts, aligned meta jsons,
Gopher rules, train/val splitters (reference slamkit/utils/data_prep.py)."""
import json

import numpy as np

from slamkit_tpu.utils.data_prep import (gopher_rules_pass, parse_ls_text,
                                         parse_transcriptions, split_repr_file,
                                         train_val_split)


def test_parse_ls_text(tmp_path):
    d = tmp_path / "LibriSpeech" / "1" / "2"
    d.mkdir(parents=True)
    (d / "1-2.trans.txt").write_text(
        "1-2-0001 HELLO WORLD\n1-2-0002 GOOD DAY FRIEND\n")
    out = parse_ls_text(str(tmp_path) + "/")
    assert out["1-2-0001"] == "hello world"
    assert out["1-2-0002"] == "good day friend"


def test_parse_transcriptions(tmp_path):
    data = {str(tmp_path / "a.wav"): [
        {"word": "hi", "start": 0.0, "end": 0.4},
        {"word": " there", "start": 0.4, "end": 0.9},
    ]}
    src = tmp_path / "alignments.json"
    src.write_text(json.dumps(data))
    parse_transcriptions(str(src))
    meta = json.loads((tmp_path / "a.json").read_text())
    assert meta["aligned_text"] == [["hi", 0.0, 0.4], [" there", 0.4, 0.9]]
    assert meta["text"] == "hi there"


def _signals(**over):
    base = {
        "rps_doc_word_count": [[0, 0, 500]],
        "rps_doc_mean_word_length": [[0, 0, 5.0]],
        "rps_doc_symbol_to_word_ratio": [[0, 0, 0.01]],
        "ccnet_nlines": [[0, 0, 10]],
        "rps_lines_start_with_bulletpoint": [[0, 0, 0]],
        "rps_doc_frac_chars_top_2gram": [[0, 0, 0.05]],
    }
    base.update(over)
    return {"quality_signals": json.dumps(base)}


def test_gopher_rules():
    assert gopher_rules_pass(_signals())
    assert not gopher_rules_pass(_signals(rps_doc_word_count=[[0, 0, 10]]))
    assert not gopher_rules_pass(_signals(rps_doc_mean_word_length=[[0, 0, 14.0]]))
    assert not gopher_rules_pass(_signals(rps_doc_symbol_to_word_ratio=[[0, 0, 0.5]]))
    assert not gopher_rules_pass(_signals(rps_doc_frac_chars_top_2gram=[[0, 0, 0.5]]))


def test_train_val_split(tmp_path):
    src = tmp_path / "d.json"
    with open(src, "w") as f:
        for i in range(200):
            f.write(json.dumps({"file_name": f"f{i}"}) + "\n")
    train_val_split(str(src), val_size=0.1, seed=3)
    n_val = sum(1 for _ in open(tmp_path / "d_val.json"))
    n_train = sum(1 for _ in open(tmp_path / "d_train.json"))
    assert n_val + n_train == 200
    assert 0 < n_val < 60


def test_split_repr_file(tmp_path):
    repr_path = tmp_path / "repr.json"
    val_path = tmp_path / "val_list.json"
    with open(repr_path, "w") as f:
        for i in range(6):
            f.write(json.dumps({"file_name": f"/x/librilight-vad/part{i}.flac"}) + "\n")
    with open(val_path, "w") as f:
        for i in (1, 4):
            f.write(json.dumps({"file_name": f"/y/librilight-vad/part{i}.flac"}) + "\n")
    split_repr_file(str(repr_path), str(val_path))
    val = [json.loads(l)["file_name"] for l in open(tmp_path / "repr_val.json")]
    train = [json.loads(l)["file_name"] for l in open(tmp_path / "repr_train.json")]
    assert len(val) == 2 and len(train) == 4
    assert all("part1" in v or "part4" in v for v in val)

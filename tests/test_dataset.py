"""Data pipeline tests: chunking keeps remainders, filters, interleaving,
packing/padding batch shapes and label masking (SURVEY.md §4)."""
import json

import numpy as np
import pathlib
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent

from slamkit_tpu.data.dataset import (
    IGNORE_INDEX,
    Batcher,
    TokenDataset,
    init_dataset,
    interleave,
    load_token_dataset,
    pack_into_rows,
    pad_into_rows,
)
from slamkit_tpu.tokeniser.unit_tokeniser import UnitTokeniser


def make_ds(seqs):
    return TokenDataset.from_lists(seqs)


def test_roundtrip_and_lengths():
    seqs = [[1, 2, 3], [4], [5, 6]]
    ds = make_ds(seqs)
    assert len(ds) == 3
    assert ds.num_tokens == 6
    for i, s in enumerate(seqs):
        assert ds[i].tolist() == s
    assert ds.lengths.tolist() == [3, 1, 2]


def test_chunk_keeps_remainder():
    # reference chunk_texts keeps the remainder chunk (hf_dataset.py:16-26)
    ds = make_ds([list(range(10)), list(range(3))]).chunk(4)
    chunks = [ds[i].tolist() for i in range(len(ds))]
    assert chunks == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9], [0, 1, 2]]


def test_filters():
    ds = make_ds([[1], [1, 2], [1, 2, 3], [1, 2, 3, 4]])
    assert len(ds.filter_by_length(min_len=2)) == 3
    assert len(ds.filter_by_length(max_len=2)) == 2
    assert len(ds.filter_by_length(min_len=2, max_len=3)) == 2


def test_concat_repeat():
    a, b = make_ds([[1, 2]]), make_ds([[3], [4, 5]])
    c = TokenDataset.concatenate([a, b])
    assert [c[i].tolist() for i in range(3)] == [[1, 2], [3], [4, 5]]
    r = a.repeat(3)
    assert len(r) == 3 and all(r[i].tolist() == [1, 2] for i in range(3))


def test_save_load(tmp_path):
    ds = make_ds([[1, 2, 3], [4, 5]])
    ds.save(str(tmp_path / "ds"))
    back = TokenDataset.load(str(tmp_path / "ds"))
    assert np.array_equal(back.tokens, ds.tokens)
    assert np.array_equal(back.offsets, ds.offsets)


def test_interleave_first_exhausted_deterministic():
    a = make_ds([[1]] * 100)
    b = make_ds([[2]] * 10)
    mixed = interleave([a, b], [0.5, 0.5], seed=0)
    mixed2 = interleave([a, b], [0.5, 0.5], seed=0)
    assert [mixed[i].tolist() for i in range(len(mixed))] == \
           [mixed2[i].tolist() for i in range(len(mixed2))]
    # first_exhausted: stops when b runs out -> roughly 2*10 rows, all of b used
    vals = np.concatenate([mixed[i] for i in range(len(mixed))])
    assert (vals == 2).sum() <= 10
    assert len(mixed) < 110


def test_interleave_ratio_skew():
    a = make_ds([[1]] * 1000)
    b = make_ds([[2]] * 1000)
    mixed = interleave([a, b], [0.9, 0.1], seed=0)
    vals = np.concatenate([mixed[i] for i in range(len(mixed))])
    frac_a = (vals == 1).mean()
    assert 0.85 < frac_a < 0.95


def test_pack_into_rows_segments_and_labels():
    ds = make_ds([[1, 2, 3], [4, 5], [6, 7, 8, 9], [10]])
    batches = list(pack_into_rows(ds, np.arange(4), context_len=6,
                                  batch_size=2, pad_id=0))
    assert len(batches) == 1
    b = batches[0]
    assert b["input_ids"].shape == (2, 6)
    # row 0: [1,2,3 | 4,5, pad]; row 1: [6,7,8,9 | 10, pad]
    assert b["input_ids"][0].tolist() == [1, 2, 3, 4, 5, 0]
    assert b["segment_ids"][0].tolist() == [0, 0, 0, 1, 1, -1]
    assert b["positions"][0].tolist() == [0, 1, 2, 0, 1, 0]
    # first token of each segment and padding are label-masked
    assert b["labels"][0].tolist() == [IGNORE_INDEX, 2, 3, IGNORE_INDEX, 5, IGNORE_INDEX]
    assert b["input_ids"][1].tolist() == [6, 7, 8, 9, 10, 0]
    assert b["segment_ids"][1].tolist() == [0, 0, 0, 0, 1, -1]
    assert int(b["num_items_in_batch"]) == (np.asarray(b["labels"]) != IGNORE_INDEX).sum()


def test_pad_into_rows_static_shape():
    ds = make_ds([[1, 2, 3], [4, 5], [6]])
    batches = list(pad_into_rows(ds, np.arange(3), context_len=4,
                                 batch_size=2, pad_id=0))
    assert len(batches) == 2
    assert all(b["input_ids"].shape == (2, 4) for b in batches)
    assert batches[0]["labels"][0].tolist() == [1, 2, 3, IGNORE_INDEX]
    assert batches[0]["segment_ids"][1].tolist() == [0, 0, -1, -1]
    # last batch has an all-pad row
    assert batches[1]["segment_ids"][1].tolist() == [-1, -1, -1, -1]


def test_batcher_process_sharding():
    ds = make_ds([[i] for i in range(40)])
    all_b = list(Batcher(ds, 2, 4, 0, shuffle=False).epoch(0))
    p0 = list(Batcher(ds, 2, 4, 0, shuffle=False, process_index=0, process_count=2).epoch(0))
    p1 = list(Batcher(ds, 2, 4, 0, shuffle=False, process_index=1, process_count=2).epoch(0))
    assert len(p0) + len(p1) == len(all_b)
    assert np.array_equal(p0[0]["input_ids"], all_b[0]["input_ids"])
    assert np.array_equal(p1[0]["input_ids"], all_b[1]["input_ids"])


def test_batcher_resume_skip():
    ds = make_ds([[i] for i in range(16)])
    full = list(Batcher(ds, 2, 4, 0, shuffle=True, seed=3).epoch(1))
    skipped = list(Batcher(ds, 2, 4, 0, shuffle=True, seed=3).epoch(1, skip_batches=2))
    assert len(skipped) == len(full) - 2
    assert np.array_equal(skipped[0]["input_ids"], full[2]["input_ids"])


def test_load_token_dataset_and_init(tmp_path, example_data_dir):
    # end-to-end: the reference's golden tokens.jsonl -> ids -> chunked batches
    tok = UnitTokeniser(load_fe=False, num_units=500)
    src = example_data_dir / "tokens.jsonl"
    ds = load_token_dataset(str(src), tok)
    assert len(ds) == sum(1 for _ in open(src))
    # every row starts with bos and ends with eos
    for i in range(len(ds)):
        assert ds[i][0] == tok.bos_token_id and ds[i][-1] == tok.eos_token_id

    from slamkit_tpu.config import compose
    cfg = compose(str(REPO_ROOT / "config"), "train", overrides=[
        f"data.train_path={src}", f"data.val_path={src}",
        "model.context_len=64",
    ])
    out = init_dataset(cfg, tok)
    assert set(out) == {"train", "validation"}
    assert all(l <= 64 for l in out["train"].lengths)


def test_init_dataset_multi_corpus(tmp_path):
    tok = UnitTokeniser(load_fe=False, num_units=500)
    for name, n in [("a", 30), ("b", 10)]:
        with open(tmp_path / f"{name}.jsonl", "w") as f:
            for i in range(n):
                f.write(json.dumps({"audio_repr": "<Un1><Un2><Un3>"}) + "\n")
    from slamkit_tpu.config import compose
    cfg = compose(str(REPO_ROOT / "config"), "train", overrides=[
        "data=pretrain_multi_ds",
        f"data.train_path=[{tmp_path}/a.jsonl,{tmp_path}/b.jsonl]",
        "data.train_ratios=[0.5,0.5]", "data.repetitions=[1,2]",
        f"data.val_path={tmp_path}/a.jsonl",
        "model.context_len=16",
    ])
    out = init_dataset(cfg, tok)
    assert len(out["train"]) > 0
    assert len(out["validation"]) == 30


def test_saved_ds_cache(tmp_path):
    tok = UnitTokeniser(load_fe=False, num_units=500)
    with open(tmp_path / "t.jsonl", "w") as f:
        f.write(json.dumps({"audio_repr": "<Un5><Un6>"}) + "\n")
    from slamkit_tpu.config import compose
    cache = tmp_path / "cache"
    cfg = compose(str(REPO_ROOT / "config"), "train", overrides=[
        f"data.train_path={tmp_path}/t.jsonl", f"data.val_path={tmp_path}/t.jsonl",
        f"data.saved_ds_path={cache}", "model.context_len=16",
    ])
    first = init_dataset(cfg, tok)
    assert cache.is_dir()
    second = init_dataset(cfg, tok)  # loads from disk this time
    assert np.array_equal(first["train"].tokens, second["train"].tokens)


def test_interleave_empty_and_zero_prob_sources():
    a = make_ds([[1]] * 20)
    empty = TokenDataset.from_lists([])
    # empty source, all_exhausted: terminates without IndexError
    mixed = interleave([a, empty], [0.5, 0.5], stopping_strategy="all_exhausted", seed=0)
    assert len(mixed) >= 20
    assert all(mixed[i].tolist() == [1] for i in range(len(mixed)))
    # zero-probability source, all_exhausted: terminates
    b = make_ds([[2]] * 5)
    mixed2 = interleave([a, b], [1.0, 0.0], stopping_strategy="all_exhausted", seed=0)
    assert len(mixed2) >= 20


def test_init_dataset_multi_corpus_no_val(tmp_path):
    tok = UnitTokeniser(load_fe=False, num_units=500)
    for name in ("a", "b"):
        with open(tmp_path / f"{name}.jsonl", "w") as f:
            for _ in range(5):
                f.write(json.dumps({"audio_repr": "<Un1><Un2>"}) + "\n")
    from slamkit_tpu.config import compose
    cfg = compose(str(REPO_ROOT / "config"), "train", [
        "data=pretrain_multi_ds",
        f"data.train_path=[{tmp_path}/a.jsonl,{tmp_path}/b.jsonl]",
        "data.train_ratios=[0.5,0.5]", "data.repetitions=[1,1]",
        "data.val_path=null", "model.context_len=16",
    ])
    out = init_dataset(cfg, tok)
    assert len(out["train"]) > 0
    assert len(out["validation"]) == 0

    # mis-sized repetitions raises a descriptive error, not IndexError
    import pytest as _pytest
    cfg2 = compose(str(REPO_ROOT / "config"), "train", [
        "data=pretrain_multi_ds",
        f"data.train_path=[{tmp_path}/a.jsonl,{tmp_path}/b.jsonl]",
        "data.train_ratios=[0.5,0.5]",
        "data.val_path=null", "model.context_len=16",
    ])  # repetitions left at the default [1]
    with _pytest.raises(ValueError, match="repetitions"):
        init_dataset(cfg2, tok)

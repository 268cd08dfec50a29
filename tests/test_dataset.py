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


def test_batcher_stream_is_global():
    # ONE multihost sharding mechanism: every process sees the identical
    # global stream; the trainer row-shards at device_put (VERDICT r1 item 9)
    ds = make_ds([[i] for i in range(40)])
    a = list(Batcher(ds, 2, 4, 0, shuffle=True, seed=7).epoch(0))
    b = list(Batcher(ds, 2, 4, 0, shuffle=True, seed=7).epoch(0))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert np.array_equal(x["input_ids"], y["input_ids"])


def _naive_pack(ds, order, T, B, pad_id):
    """Reference greedy packer (the round-1 per-sequence loop) used as the
    oracle for the vectorized/native implementation."""
    input_ids = np.full((B, T), pad_id, np.int32)
    labels = np.full((B, T), IGNORE_INDEX, np.int32)
    segment_ids = np.full((B, T), -1, np.int32)
    positions = np.zeros((B, T), np.int32)
    row, col, seg = 0, 0, 0
    out = []

    def flush():
        out.append({"input_ids": input_ids.copy(), "labels": labels.copy(),
                    "segment_ids": segment_ids.copy(),
                    "positions": positions.copy()})

    for i in order:
        seq = ds[int(i)]
        n = len(seq)
        if n == 0:
            continue
        if n > T:
            seq, n = seq[:T], T
        if col + n > T:
            row, col, seg = row + 1, 0, 0
            if row == B:
                flush()
                input_ids[:] = pad_id
                labels[:] = IGNORE_INDEX
                segment_ids[:] = -1
                positions[:] = 0
                row = 0
        input_ids[row, col:col + n] = seq
        labels[row, col:col + n] = seq
        labels[row, col] = IGNORE_INDEX
        segment_ids[row, col:col + n] = seg
        positions[row, col:col + n] = np.arange(n, dtype=np.int32)
        col += n
        seg += 1
    if row or col:
        flush()
    return out


@pytest.mark.parametrize("T,B", [(16, 2), (8, 3), (32, 1)])
def test_pack_vectorized_matches_naive(T, B):
    rng = np.random.default_rng(0)
    ds = make_ds([rng.integers(1, 100, size=rng.integers(1, 40)).tolist()
                  for _ in range(200)])
    order = rng.permutation(len(ds))
    got = list(pack_into_rows(ds, order, T, B, pad_id=0))
    want = _naive_pack(ds, order, T, B, pad_id=0)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for k in ("input_ids", "labels", "segment_ids", "positions"):
            assert np.array_equal(g[k], w[k]), k
        assert int(g["num_items_in_batch"]) == (w["labels"] != IGNORE_INDEX).sum()


def test_pack_slab_boundaries(monkeypatch):
    # rows and batches spanning slab boundaries must assemble identically
    import slamkit_tpu.data.dataset as dsmod
    rng = np.random.default_rng(1)
    ds = make_ds([rng.integers(1, 50, size=rng.integers(1, 7)).tolist()
                  for _ in range(300)])
    order = rng.permutation(len(ds))
    want = list(pack_into_rows(ds, order, 16, 4, pad_id=0))
    monkeypatch.setattr(dsmod, "_SLAB", 17)  # force many tiny slabs
    got = list(pack_into_rows(ds, order, 16, 4, pad_id=0))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for k in ("input_ids", "labels", "segment_ids", "positions"):
            assert np.array_equal(g[k], w[k]), k


def test_pack_skip_batches_matches_slicing():
    rng = np.random.default_rng(2)
    ds = make_ds([rng.integers(1, 9, size=rng.integers(1, 6)).tolist()
                  for _ in range(100)])
    order = np.arange(len(ds))
    full = list(pack_into_rows(ds, order, 8, 2, pad_id=0))
    skipped = list(pack_into_rows(ds, order, 8, 2, pad_id=0, skip_batches=3))
    assert len(skipped) == len(full) - 3
    for g, w in zip(skipped, full[3:]):
        assert np.array_equal(g["input_ids"], w["input_ids"])


def test_batches_per_epoch_no_dry_pass():
    rng = np.random.default_rng(3)
    ds = make_ds([rng.integers(1, 9, size=rng.integers(1, 6)).tolist()
                  for _ in range(64)])
    for packing in (True, False):
        b = Batcher(ds, 2, 8, 0, packing=packing, shuffle=True, seed=5)
        assert b.batches_per_epoch() == len(list(b.epoch(0)))


def test_views_share_buffer_and_memmap(tmp_path):
    ds = make_ds([list(range(10)), list(range(3)), [7] * 20])
    chunked = ds.chunk(4)
    assert chunked.tokens is ds.tokens  # zero-copy
    assert chunked.select([0, 2]).tokens is ds.tokens
    assert ds.repeat(3).tokens is ds.tokens
    ds.save(str(tmp_path / "ds"))
    back = TokenDataset.load(str(tmp_path / "ds"))
    assert isinstance(back.tokens, np.memmap)
    for i in range(len(ds)):
        assert back[i].tolist() == ds[i].tolist()
    # a view saved+loaded round-trips its logical content
    chunked.save(str(tmp_path / "ch"))
    back2 = TokenDataset.load(str(tmp_path / "ch"))
    assert [back2[i].tolist() for i in range(len(back2))] == \
           [chunked[i].tolist() for i in range(len(chunked))]


def test_token_writer_spill_path(tmp_path):
    from slamkit_tpu.data.dataset import TokenWriter
    rng = np.random.default_rng(4)
    seqs = [rng.integers(0, 100, size=rng.integers(1, 50)).tolist()
            for _ in range(200)]
    w = TokenWriter(spill_tokens=64, spill_dir=str(tmp_path))  # tiny: force spill
    for s in seqs:
        w.append(s)
    ds = w.finish()
    assert isinstance(ds.tokens, np.memmap)
    assert len(ds) == len(seqs)
    for i, s in enumerate(seqs):
        assert ds[i].tolist() == s
    # spill file was unlinked after mapping (space frees with the process)
    assert not any(f.endswith(".tokens.bin") for f in map(str, tmp_path.iterdir()))


def test_bounded_rss_big_corpus(tmp_path):
    # ~40M tokens streamed through the writer with a small spill threshold:
    # peak python-side allocation stays near the slab size, not the corpus
    from slamkit_tpu.data.dataset import TokenWriter
    rng = np.random.default_rng(5)
    w = TokenWriter(spill_tokens=1 << 20, spill_dir=str(tmp_path))
    n_rows, row_len = 40_000, 1000
    chunkbuf = rng.integers(0, 500, size=row_len * 64, dtype=np.int32)
    for i in range(n_rows):
        lo = (i * 37) % (len(chunkbuf) - row_len)
        w.append(chunkbuf[lo:lo + row_len])
    ds = w.finish()
    assert ds.num_tokens == n_rows * row_len
    assert isinstance(ds.tokens, np.memmap)
    # chunk + filter + shuffle-pack one epoch slab without materializing
    ch = ds.chunk(256)
    assert ch.tokens is ds.tokens
    batches = 0
    for b in Batcher(ch, 8, 256, 0, packing=True, shuffle=True).epoch(0):
        batches += 1
        if batches >= 5:
            break
    assert batches == 5


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


def _all_exhausted_loop_reference(sizes, probabilities, seed, block):
    """The per-draw loop the vectorized all_exhausted replaced — kept here as
    the behavioral reference for the parity test (VERDICT r2 weak item 3)."""
    rng = np.random.default_rng(seed)
    p = np.asarray(probabilities, dtype=np.float64)
    p = p / p.sum()
    sizes = np.asarray(sizes, dtype=np.int64)
    cursors = np.zeros(len(sizes), dtype=np.int64)
    exhausted = (p == 0) | (sizes == 0)
    picks = []
    done = False
    while not done:
        for src_i in rng.choice(len(sizes), size=block, p=p):
            if sizes[src_i] == 0:
                if exhausted.all():
                    done = True
                    break
                continue
            if cursors[src_i] == sizes[src_i]:
                exhausted[src_i] = True
                if exhausted.all():
                    done = True
                    break
                cursors[src_i] = 0
            picks.append((int(src_i), int(cursors[src_i])))
            cursors[src_i] += 1
        else:
            continue
        break
    return picks


@pytest.mark.parametrize("sizes,probs,seed", [
    ([20, 5], [0.5, 0.5], 0),
    ([20, 5], [0.5, 0.5], 3),
    ([7, 13, 40], [0.2, 0.3, 0.5], 1),
    ([1, 1], [0.9, 0.1], 2),
    ([20, 0, 5], [0.4, 0.3, 0.3], 0),     # empty source mid-list
    ([20, 5, 9], [1.0, 0.0, 0.5], 4),     # zero-probability source
])
def test_interleave_all_exhausted_matches_loop_reference(sizes, probs, seed):
    """The vectorized all_exhausted must reproduce the per-draw loop's pick
    sequence exactly (same rng stream, same cursor-wrap and stop point)."""
    datasets = [make_ds([[s * 100 + i] for i in range(n)])
                for s, n in enumerate(sizes)]
    mixed = interleave(datasets, probs, stopping_strategy="all_exhausted",
                       seed=seed)
    got = [int(mixed[i][0]) for i in range(len(mixed))]
    block = int(max(4096, sum(sizes)))
    want = [s * 100 + i
            for s, i in _all_exhausted_loop_reference(sizes, probs, seed, block)]
    assert got == want


def test_interleave_all_exhausted_scales():
    """1M-row mix completes in seconds (the loop took minutes) and every
    source appears >= its full size."""
    import time

    sizes = [700_000, 300_000, 50_000]
    datasets = [TokenDataset(np.zeros(n, np.int32),
                             np.arange(n, dtype=np.int64),
                             np.ones(n, dtype=np.int64))
                for n in sizes]
    t0 = time.time()
    mixed = interleave(datasets, [0.5, 0.3, 0.2],
                       stopping_strategy="all_exhausted", seed=0)
    dt = time.time() - t0
    assert len(mixed) >= max(s / p for s, p in zip(sizes, [0.5, 0.3, 0.2]) if p)
    assert dt < 30, f"vectorized all_exhausted took {dt:.1f}s"


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


def test_interleave_spills_to_memmap(tmp_path):
    """Past spill_tokens the interleaved corpus is disk-backed (bounded RSS
    at Libri-light scale) and bit-identical to the in-RAM result, including
    across the slab boundaries of the chunked gather/scatter."""
    rng = np.random.default_rng(0)
    a = make_ds([rng.integers(2, 90, rng.integers(1, 40)).tolist()
                 for _ in range(300)])
    b = make_ds([rng.integers(90, 180, rng.integers(1, 25)).tolist()
                 for _ in range(200)])
    in_ram = interleave([a, b], [0.6, 0.4], seed=3)
    from unittest import mock

    from slamkit_tpu.data import dataset as dsmod
    orig = dsmod._materialize_picks
    with mock.patch.object(
            dsmod, "_materialize_picks",
            lambda *a, **k: orig(*a, **{**k, "slab_tokens": 64})):
        spilled = interleave([a, b], [0.6, 0.4], seed=3, spill_tokens=100,
                             spill_dir=str(tmp_path))
    assert isinstance(spilled.tokens, np.memmap)
    assert np.array_equal(np.asarray(spilled.tokens), np.asarray(in_ram.tokens))
    assert np.array_equal(spilled.offsets, in_ram.offsets)


def test_bestfit_packing_occupancy_and_coverage():
    """bestfit packs the same epoch into far fewer rows than greedy (>=95%
    occupancy on utterance-like lengths), covers every sequence exactly
    once, and is deterministic."""
    from slamkit_tpu.data.dataset import pack_into_rows

    rng = np.random.default_rng(0)
    lens = np.clip(rng.lognormal(np.log(50), 0.4, 400), 8, 110).astype(int)
    seqs = [rng.integers(2, 500, n).tolist() for n in lens]
    ds = make_ds(seqs)
    order = rng.permutation(len(ds))
    T, B = 128, 4

    def run(strategy):
        return list(pack_into_rows(ds, order, T, B, pad_id=0,
                                   strategy=strategy, row_perm_seed=7))

    greedy = run("greedy")
    bf = run("bestfit")
    bf2 = run("bestfit")

    def real_tokens(batches):
        return np.concatenate([b["input_ids"][b["segment_ids"] >= 0]
                               for b in batches])

    # identical multiset of tokens, every sequence placed exactly once
    assert sorted(real_tokens(greedy).tolist()) == sorted(real_tokens(bf).tolist())
    assert sum(b["num_items_in_batch"] for b in bf) == \
           sum(b["num_items_in_batch"] for b in greedy)
    # determinism
    for a, b in zip(bf, bf2):
        for k in a:
            assert np.array_equal(a[k], b[k])
    # occupancy: count rows actually used
    used_rows = sum(int((b["segment_ids"] >= 0).any(axis=1).sum()) for b in bf)
    occ = float(sum(np.minimum(lens, T)) / (used_rows * T))
    used_rows_greedy = sum(int((b["segment_ids"] >= 0).any(axis=1).sum())
                           for b in greedy)
    assert occ >= 0.95
    assert used_rows < used_rows_greedy
    # segment isolation: within every row, positions restart per segment
    for b in bf:
        for row_sid, row_pos in zip(b["segment_ids"], b["positions"]):
            for s in np.unique(row_sid[row_sid >= 0]):
                pos = row_pos[row_sid == s]
                assert np.array_equal(pos, np.arange(len(pos)))


def test_bestfit_batches_per_epoch_matches_stream():
    rng = np.random.default_rng(1)
    seqs = [rng.integers(2, 500, rng.integers(5, 60)).tolist()
            for _ in range(300)]
    ds = make_ds(seqs)
    b = Batcher(ds, batch_size=4, context_len=64, pad_id=0, packing=True,
                seed=0, packing_strategy="bestfit")
    assert b.batches_per_epoch() == sum(1 for _ in b.epoch(0))


def test_bestfit_native_fallback_parity():
    """C++ multimap and Python bisect fallback must produce IDENTICAL row
    assignments (multihost processes may differ in native-lib availability;
    the global batch stream must not)."""
    import slamkit_tpu.native.pack as pk

    if pk._load() is None:
        pytest.skip("native packer unavailable")
    rng = np.random.default_rng(0)
    for _ in range(10):
        lens = rng.integers(5, 120, size=rng.integers(50, 400)).astype(np.int64)
        native = pk.bestfit_pack(lens, 128)
        lib, pk._lib, pk._failed = pk._lib, None, True
        try:
            fb = pk.bestfit_pack(lens, 128)
        finally:
            pk._lib, pk._failed = lib, False
        assert np.array_equal(native[0], fb[0])
        assert np.array_equal(native[1], fb[1])
        assert native[2] == fb[2]

"""Token dataset: jsonl -> flat id arrays -> fixed-shape packed batches.

Behavioral counterpart of the reference's HF-datasets pipeline
(reference slamkit/data/hf_dataset.py:16-125) rebuilt TPU-first:

  * storage is a single flat int32 buffer + offsets (no per-row Python
    objects) — chunking, filtering and stats are O(N) numpy, not .map calls;
  * batches have STATIC shapes [B, context_len] so XLA compiles once;
  * "packing" fills rows with whole sequences and emits segment_ids /
    positions for the segment-aware flash-attention kernel — the TPU
    equivalent of DataCollatorWithFlattening + FA2 varlen
    (reference hf_dataset.py:61-64, SURVEY.md §2.8);
  * multi-corpus mixing replicates interleave_datasets(probabilities,
    stopping_strategy, seed=0) semantics (reference hf_dataset.py:46-52);
  * multi-host sharding slices the batch stream by process index
    (SURVEY.md §5.8).
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
from glob import glob
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

IGNORE_INDEX = -100


# --------------------------------------------------------------------------- #
# storage
# --------------------------------------------------------------------------- #
@dataclasses.dataclass
class TokenDataset:
    """Ragged token-id sequences in one flat buffer.

    tokens: int32 [total_tokens]; offsets: int64 [num_sequences + 1].
    Sequence i is tokens[offsets[i]:offsets[i+1]].
    """

    tokens: np.ndarray
    offsets: np.ndarray

    def __post_init__(self):
        self.tokens = np.ascontiguousarray(self.tokens, dtype=np.int32)
        self.offsets = np.ascontiguousarray(self.offsets, dtype=np.int64)

    def __len__(self) -> int:
        return len(self.offsets) - 1

    def __getitem__(self, i: int) -> np.ndarray:
        return self.tokens[self.offsets[i]:self.offsets[i + 1]]

    @property
    def lengths(self) -> np.ndarray:
        return np.diff(self.offsets)

    @property
    def num_tokens(self) -> int:
        return int(self.tokens.size)

    @classmethod
    def from_lists(cls, seqs: Sequence[Sequence[int]]) -> "TokenDataset":
        lens = np.fromiter((len(s) for s in seqs), dtype=np.int64, count=len(seqs))
        offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        tokens = np.empty(int(offsets[-1]), dtype=np.int32)
        for i, s in enumerate(seqs):
            tokens[offsets[i]:offsets[i + 1]] = s
        return cls(tokens, offsets)

    def select(self, indices: np.ndarray) -> "TokenDataset":
        indices = np.asarray(indices, dtype=np.int64)
        lens = self.lengths[indices]
        offsets = np.zeros(len(indices) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        tokens = np.empty(int(offsets[-1]), dtype=np.int32)
        for j, i in enumerate(indices):
            tokens[offsets[j]:offsets[j + 1]] = self[int(i)]
        return TokenDataset(tokens, offsets)

    def filter_by_length(self, min_len: Optional[int] = None,
                         max_len: Optional[int] = None) -> "TokenDataset":
        """Length filters (reference hf_dataset.py:69-88)."""
        lens = self.lengths
        keep = np.ones(len(self), dtype=bool)
        if min_len is not None:
            keep &= lens >= min_len
        if max_len is not None:
            keep &= lens <= max_len
        return self.select(np.nonzero(keep)[0])

    def chunk(self, chunk_size: int) -> "TokenDataset":
        """Split every sequence into chunk_size pieces KEEPING the remainder
        (reference chunk_texts, hf_dataset.py:16-26). The flat buffer is
        unchanged — only offsets are recomputed (zero-copy)."""
        lens = self.lengths
        n_chunks = np.maximum((lens + chunk_size - 1) // chunk_size, 0)
        new_offsets = np.empty(int(n_chunks.sum()) + 1, dtype=np.int64)
        pos = 0
        for i in range(len(self)):
            start, end = self.offsets[i], self.offsets[i + 1]
            cuts = np.arange(start, end, chunk_size, dtype=np.int64)
            new_offsets[pos:pos + len(cuts)] = cuts
            pos += len(cuts)
        new_offsets[pos] = self.offsets[-1] if len(self) else 0
        return TokenDataset(self.tokens, new_offsets[:pos + 1])

    @staticmethod
    def concatenate(parts: Sequence["TokenDataset"]) -> "TokenDataset":
        tokens = np.concatenate([p.tokens for p in parts]) if parts else np.empty(0, np.int32)
        offsets = [np.zeros(1, np.int64)]
        base = 0
        for p in parts:
            offsets.append(p.offsets[1:] + base)
            base += p.num_tokens
        return TokenDataset(tokens, np.concatenate(offsets))

    def repeat(self, n: int) -> "TokenDataset":
        """n-fold concat (the reference's per-dataset `repetitions`,
        hf_dataset.py:46-48)."""
        return TokenDataset.concatenate([self] * n) if n > 1 else self

    # -- persistence (the reference's saved_ds_path cache, hf_dataset.py:30-32,57-59)
    def save(self, path: str):
        os.makedirs(path, exist_ok=True)
        np.savez(os.path.join(path, "token_dataset.npz"),
                 tokens=self.tokens, offsets=self.offsets)

    @classmethod
    def load(cls, path: str) -> "TokenDataset":
        z = np.load(os.path.join(path, "token_dataset.npz"))
        return cls(z["tokens"], z["offsets"])

    def token_stats(self) -> dict:
        """Reference get_token_stats (hf_dataset.py:121-125)."""
        lens = self.lengths
        return {"sum": int(lens.sum()), "len_ds": len(self),
                "mean": float(lens.mean()) if len(self) else 0.0,
                "var": float(lens.var()) if len(self) else 0.0}


# --------------------------------------------------------------------------- #
# jsonl loading
# --------------------------------------------------------------------------- #
def _expand_paths(path) -> List[str]:
    files = sorted(glob(path))
    if not files:
        raise FileNotFoundError(f"No files match {path!r}")
    return files


def load_jsonl_rows(path_glob: str) -> Iterator[dict]:
    for path in _expand_paths(path_glob):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    yield json.loads(line)


def load_token_dataset(path_glob: str, tokeniser) -> TokenDataset:
    """jsonl rows -> prepare_sample -> TokenDataset
    (reference parse_single_dataset, hf_dataset.py:93-97)."""
    seqs = [tokeniser.prepare_sample(row)["input_ids"]
            for row in load_jsonl_rows(path_glob)]
    # prepare_sample may return a [1, T] batch for a single string
    seqs = [s[0] if (len(s) and isinstance(s[0], (list, np.ndarray))) else s
            for s in seqs]
    return TokenDataset.from_lists(seqs)


# --------------------------------------------------------------------------- #
# multi-corpus interleaving
# --------------------------------------------------------------------------- #
def interleave(datasets: Sequence[TokenDataset], probabilities: Sequence[float],
               stopping_strategy: str = "first_exhausted", seed: int = 0) -> TokenDataset:
    """Sample-with-probabilities mixing of several corpora, matching HF
    interleave_datasets semantics (reference hf_dataset.py:49-50): draw a
    source per output row until the first (or last) source is exhausted."""
    if len(datasets) != len(probabilities):
        raise ValueError("Number of train paths should match number of train ratios")
    rng = np.random.default_rng(seed)
    p = np.asarray(probabilities, dtype=np.float64)
    p = p / p.sum()
    sizes = np.array([len(d) for d in datasets])
    # draw sources in blocks until the stopping condition triggers
    cursors = np.zeros(len(datasets), dtype=np.int64)
    # zero-probability sources can never exhaust by drawing — mark upfront
    # so all_exhausted terminates
    exhausted = (p == 0) | (sizes == 0)
    picks: List[tuple] = []
    block = int(max(4096, sizes.sum()))
    done = False
    while not done:
        for src in rng.choice(len(datasets), size=block, p=p):
            if sizes[src] == 0:  # empty corpus: exhausts instantly, never picks
                if stopping_strategy == "first_exhausted" or exhausted.all():
                    done = True
                    break
                continue
            if cursors[src] == sizes[src]:
                exhausted[src] = True
                if stopping_strategy == "first_exhausted":
                    done = True
                    break
                if exhausted.all():
                    done = True
                    break
                cursors[src] = 0  # all_exhausted: restart the short corpus
            picks.append((src, cursors[src]))
            cursors[src] += 1
        else:
            continue
        break
    lens = np.array([datasets[s].lengths[i] for s, i in picks], dtype=np.int64)
    offsets = np.zeros(len(picks) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    tokens = np.empty(int(offsets[-1]), dtype=np.int32)
    for j, (s, i) in enumerate(picks):
        tokens[offsets[j]:offsets[j + 1]] = datasets[s][int(i)]
    return TokenDataset(tokens, offsets)


# --------------------------------------------------------------------------- #
# pipeline entry (reference init_dataset, hf_dataset.py:29-66)
# --------------------------------------------------------------------------- #
def parse_single_dataset(cfg, tokeniser, train_path: str,
                         val_path: Optional[str] = None) -> Dict[str, TokenDataset]:
    ds = {"train": load_token_dataset(train_path, tokeniser)}
    if val_path is not None:
        ds["validation"] = load_token_dataset(val_path, tokeniser)

    if cfg.data.get("sample_units_max_length", None):
        ds["train"] = ds["train"].filter_by_length(max_len=cfg.data.sample_units_max_length)

    if cfg.model.context_len is not None:
        ds = {k: v.chunk(cfg.model.context_len) for k, v in ds.items()}

    if cfg.data.get("chunk_units_min_length", None):
        ds["train"] = ds["train"].filter_by_length(min_len=cfg.data.chunk_units_min_length)
    # reference get_token_stats logging (hf_dataset.py:121-125)
    logger.info("Statistics over tokens: %s", ds["train"].token_stats())
    return ds


def init_dataset(cfg, tokeniser) -> Dict[str, TokenDataset]:
    """Build {'train', 'validation'} TokenDatasets from the composed config
    (reference init_dataset, hf_dataset.py:29-66). Collation is not returned —
    batching is the PackedBatcher's job (fixed TPU shapes)."""
    saved = cfg.data.get("saved_ds_path", None)
    if saved and os.path.isdir(saved):
        logger.info("Loading dataset from %s", saved)
        return {name: TokenDataset.load(os.path.join(saved, name))
                for name in os.listdir(saved)
                if os.path.isdir(os.path.join(saved, name))}

    train_path = cfg.data.train_path
    if isinstance(train_path, (list, tuple)) or type(train_path).__name__ == "ConfigList":
        train_paths = list(train_path)
        ratios = list(cfg.data.train_ratios)
        if len(train_paths) != len(ratios):
            raise ValueError("Number of train paths should match number of train ratios")
        val_paths = cfg.data.get("val_path", None)
        if isinstance(val_paths, str):
            val_paths = [val_paths]
        val_paths = list(val_paths or []) + \
            [None] * (len(train_paths) - len(val_paths or []))
        reps = cfg.data.get("repetitions", None)
        if reps and len(reps) != len(train_paths):
            raise ValueError(
                f"Number of repetitions ({len(reps)}) should match number of "
                f"train paths ({len(train_paths)})")
        trains, vals = [], []
        for i, (tp, vp) in enumerate(zip(train_paths, val_paths)):
            logger.info("Parsing datasets %s and %s", tp, vp)
            ds = parse_single_dataset(cfg, tokeniser, tp, vp)
            trains.append(ds["train"].repeat(reps[i]) if reps else ds["train"])
            if "validation" in ds:
                vals.append(ds["validation"])
        dataset = {
            "train": interleave(trains, ratios,
                                stopping_strategy=cfg.data.get("stopping_strategy",
                                                               "first_exhausted"),
                                seed=0),
            "validation": TokenDataset.concatenate(vals),
        }
    else:
        dataset = parse_single_dataset(cfg, tokeniser, train_path,
                                       cfg.data.get("val_path", None))

    if saved and not os.path.isdir(saved):
        logger.info("Saving dataset to %s", saved)
        for name, ds in dataset.items():
            ds.save(os.path.join(saved, name))
    return dataset


# --------------------------------------------------------------------------- #
# batching
# --------------------------------------------------------------------------- #
def pack_into_rows(ds: TokenDataset, order: np.ndarray, context_len: int,
                   batch_size: int, pad_id: int) -> Iterator[Dict[str, np.ndarray]]:
    """Greedy sequential packing of whole sequences into [B, context_len] rows.

    The TPU replacement for DataCollatorWithFlattening (reference
    hf_dataset.py:61-62): instead of one variable-length row per minibatch,
    fixed rows with segment_ids (-1 = pad) and per-segment positions. Labels
    mask the first token of every segment with -100 (no cross-document
    prediction) and all padding.
    """
    B, T = batch_size, context_len
    input_ids = np.full((B, T), pad_id, np.int32)
    labels = np.full((B, T), IGNORE_INDEX, np.int32)
    segment_ids = np.full((B, T), -1, np.int32)
    positions = np.zeros((B, T), np.int32)
    row, col, seg = 0, 0, 0

    def flush():
        return {"input_ids": input_ids.copy(), "labels": labels.copy(),
                "segment_ids": segment_ids.copy(), "positions": positions.copy(),
                "num_items_in_batch": np.int32((labels != IGNORE_INDEX).sum())}

    for i in order:
        seq = ds[int(i)]
        n = len(seq)
        if n > T:
            seq, n = seq[:T], T  # over-long sequences are pre-chunked upstream
        if col + n > T:
            row, col, seg = row + 1, 0, 0
            if row == B:
                yield flush()
                input_ids[:] = pad_id
                labels[:] = IGNORE_INDEX
                segment_ids[:] = -1
                positions[:] = 0
                row = 0
        input_ids[row, col:col + n] = seq
        labels[row, col:col + n] = seq
        labels[row, col] = IGNORE_INDEX  # segment boundary: no cross-doc label
        segment_ids[row, col:col + n] = seg
        positions[row, col:col + n] = np.arange(n, dtype=np.int32)
        col += n
        seg += 1
    if row or col:
        yield flush()


def pad_into_rows(ds: TokenDataset, order: np.ndarray, context_len: int,
                  batch_size: int, pad_id: int,
                  drop_last: bool = False) -> Iterator[Dict[str, np.ndarray]]:
    """One sequence per row, padded to the static context_len
    (the reference's DataCollatorForLanguageModeling(mlm=False) path,
    hf_dataset.py:63-64 — pads get label -100)."""
    B, T = batch_size, context_len
    for start in range(0, len(order), B):
        idx = order[start:start + B]
        if len(idx) < B and drop_last:
            return
        input_ids = np.full((B, T), pad_id, np.int32)
        labels = np.full((B, T), IGNORE_INDEX, np.int32)
        segment_ids = np.full((B, T), -1, np.int32)
        positions = np.zeros((B, T), np.int32)
        for r, i in enumerate(idx):
            seq = ds[int(i)][:T]
            n = len(seq)
            input_ids[r, :n] = seq
            labels[r, :n] = seq
            segment_ids[r, :n] = 0
            positions[r, :n] = np.arange(n, dtype=np.int32)
        yield {"input_ids": input_ids, "labels": labels,
               "segment_ids": segment_ids, "positions": positions,
               "num_items_in_batch": np.int32((labels != IGNORE_INDEX).sum())}


class Batcher:
    """Epoch-shuffled batch stream with multi-host sharding.

    Each process sees batches b with b % process_count == process_index
    (host-side data sharding, SURVEY.md §5.8). Deterministic given (seed,
    epoch) so resume can fast-forward by batch index.
    """

    def __init__(self, ds: TokenDataset, batch_size: int, context_len: int,
                 pad_id: int, packing: bool = False, shuffle: bool = True,
                 seed: int = 0, process_index: int = 0, process_count: int = 1):
        self.ds = ds
        self.batch_size = batch_size
        self.context_len = context_len
        self.pad_id = pad_id
        self.packing = packing
        self.shuffle = shuffle
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count

    def epoch(self, epoch: int = 0, skip_batches: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        gen = (pack_into_rows if self.packing else pad_into_rows)(
            self.ds, order, self.context_len, self.batch_size, self.pad_id)
        for b, batch in enumerate(gen):
            if b % self.process_count != self.process_index:
                continue
            if b // self.process_count < skip_batches:
                continue
            yield batch

    def batches_per_epoch(self) -> int:
        if self.packing:
            return sum(1 for _ in self.epoch(0))  # exact count via a dry pass
        n = (len(self.ds) + self.batch_size - 1) // self.batch_size
        return (n + self.process_count - 1 - self.process_index) // self.process_count

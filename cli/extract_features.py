"""Stage 1: audio files -> features jsonl {units, duration, file_name}.

Surface/behavior parity with reference cli/extract_features.py:22-103:
recursive glob by extension, duration-descending sort (minimise padding,
fail-fast OOM), optional file-list pickle cache, skip/take subsetting,
resample to 16 kHz + stereo downmix, batched audio_represent, append jsonl.
I/O runs through the native libav decoder on a thread pool; the device
pipeline overlaps decode with the fused HuBERT+k-means jit.
"""
import json
import logging
import os
import pickle
import sys
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from glob import iglob
from typing import Optional

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slamkit_tpu.config import main
from slamkit_tpu.tokeniser import tokeniser_factory
from slamkit_tpu.utils.audio import audio_info, load_audio

logger = logging.getLogger(__name__)


class WavDataset:
    """File list with duration-desc ordering (reference :22-63)."""

    def __init__(self, data_path: str, ext: str = "flac",
                 cache_path: Optional[str] = None, sample_rate: int = 16000,
                 n_workers: int = 16):
        self.sample_rate = sample_rate
        save_path = None
        if cache_path is not None:
            os.makedirs(cache_path + "/data/", exist_ok=True)
            save_path = f"{cache_path}/data/{data_path.rstrip('/').split('/')[-1]}.pkl"
            if os.path.exists(save_path):
                with open(save_path, "rb") as f:
                    self.files = pickle.load(f)
                return
        files = list(iglob(os.path.join(data_path, f"**/*.{ext}"), recursive=True))
        with ThreadPoolExecutor(n_workers) as pool:
            metas = list(pool.map(lambda p: (p, audio_info(p)[0]), files))
        # sort by duration desc: biggest batch first -> OOM fails fast
        self.files = sorted(metas, key=lambda x: x[1], reverse=True)
        if save_path:
            with open(save_path, "wb") as f:
                pickle.dump(self.files, f)

    def __len__(self):
        return len(self.files)

    def skip(self, n: int):
        self.files = self.files[n:]

    def take(self, n: int):
        self.files = self.files[:n]

    def load(self, idx: int):
        f_name, _ = self.files[idx]
        return f_name, load_audio(f_name, self.sample_rate)

    def batches(self, batch_size: int, n_workers: int = 4):
        """Yield (file_names, padded wav [B, Tmax], lens) with BOUNDED decode
        prefetch (window of ~2 batches) overlapping the device compute —
        Executor.map has no backpressure and would buffer the whole corpus."""
        from collections import deque

        window = max(2 * batch_size, n_workers)
        with ThreadPoolExecutor(n_workers) as pool:
            futures = deque()
            idx = 0
            batch = []
            while idx < len(self) or futures:
                while idx < len(self) and len(futures) < window:
                    futures.append(pool.submit(self.load, idx))
                    idx += 1
                batch.append(futures.popleft().result())
                if len(batch) == batch_size:
                    yield self._collate(batch)
                    batch = []
            if batch:
                yield self._collate(batch)

    @staticmethod
    def _collate(batch):
        names = [b[0] for b in batch]
        lens = np.array([len(b[1]) for b in batch])
        wav = np.zeros((len(batch), int(lens.max())), dtype=np.float32)
        for i, (_, w) in enumerate(batch):
            wav[i, :len(w)] = w
        return names, wav, lens


@main(config_name="extract_features", config_path="../config")
def extract_features(cfg):
    tokeniser = tokeniser_factory(cfg.tokeniser)
    ds = WavDataset(cfg.data_path, cfg.ext, cfg.cache_path, cfg.sample_rate)
    if cfg.get("data_skip", None) is not None:
        ds.skip(cfg.data_skip)
    if cfg.get("data_take", None) is not None:
        ds.take(cfg.data_take)
    if os.path.exists(cfg.out_path):
        logger.warning("%s already exists. Appending to it.", cfg.out_path)
    os.makedirs(os.path.dirname(os.path.abspath(cfg.out_path)), exist_ok=True)
    with open(cfg.out_path, "a+") as out_file:
        for names, wav, lens in ds.batches(cfg.batch_size, cfg.num_workers):
            reprs = tokeniser.audio_represent(wav, lens)
            for cur_f, cur_repr in zip(names, reprs):
                cur_repr["file_name"] = cur_f
                out_file.write(json.dumps(cur_repr) + "\n")


if __name__ == "__main__":
    extract_features()

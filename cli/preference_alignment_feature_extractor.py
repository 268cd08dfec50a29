"""Preference stage 1: {prompt,chosen,rejected} wav triples -> features jsonl.

Surface parity with reference cli/preference_alignment_feature_extractor.py:
18-85: one batched FE pass over concat [prompts; chosens; rejecteds] then
split thirds; skip/take subsetting."""
import json
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slamkit_tpu.config import main
from slamkit_tpu.tokeniser import tokeniser_factory
from slamkit_tpu.utils.audio import load_audio

logger = logging.getLogger(__name__)


class PreferenceAlignmentDataset:
    def __init__(self, data_path: str, sample_rate: int = 16000):
        self.sample_rate = sample_rate
        with open(data_path) as f:
            self.preference_data = [json.loads(line) for line in f if line.strip()]

    def __len__(self):
        return len(self.preference_data)

    def subsample_data(self, skip, take):
        if skip is not None:
            self.preference_data = self.preference_data[skip:]
        if take is not None:
            self.preference_data = self.preference_data[:take]

    def batches(self, batch_size: int):
        for start in range(0, len(self), batch_size):
            rows = self.preference_data[start:start + batch_size]
            wavs = []
            for key in ("prompt_path", "chosen_path", "rejected_path"):
                wavs += [load_audio(r[key], self.sample_rate) for r in rows]
            lens = np.array([len(w) for w in wavs])
            batch = np.zeros((len(wavs), int(lens.max())), dtype=np.float32)
            for i, w in enumerate(wavs):
                batch[i, :len(w)] = w
            yield rows, batch, lens


@main(config_name="preference_alignment_feature_extractor", config_path="../config")
def extract_features(cfg):
    tokeniser = tokeniser_factory(cfg.tokeniser)
    dataset = PreferenceAlignmentDataset(cfg.data_path, cfg.sample_rate)
    dataset.subsample_data(cfg.get("skip", None), cfg.get("take", None))
    os.makedirs(os.path.dirname(os.path.abspath(cfg.out_path)), exist_ok=True)
    with open(cfg.out_path, "w") as f:
        for rows, wavs, lens in dataset.batches(cfg.batch_size):
            n = len(rows)
            tokenised = tokeniser.audio_represent(wavs, lens)
            for i, row in enumerate(rows):
                row["prompt"] = tokenised[i]
                row["chosen"] = tokenised[n + i]
                row["rejected"] = tokenised[2 * n + i]
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    extract_features()

"""Speech-only unit tokeniser.

Reproduces the reference's vocab layout and jsonl formats exactly
(reference slamkit/tokeniser/unit_tokeniser.py:17-121):

  * vocab: <PAD>=pad_token_id (0), <S>=bos_eos_token_id (1),
    <UnN> = N + offset with offset = max(bos, eos, pad) + 1  → 502 ids for 500 units
  * every encode wraps with <S> ... <S> (TemplateProcessing "<S> $0 <S>")
  * build_prompt drops the trailing eos
  * decode strips pad/bos/eos and maps ids back to unit indices

Unlike the reference (HF-tokenizers WordLevel vocab in Rust), encoding here is
direct integer arithmetic via unit_codec — no vocab table, no string machinery
in the hot path.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Union

import numpy as np

from . import unit_codec
from .audio_tokeniser import AudioTokeniser


class UnitVocab:
    """Minimal stand-in for the HF text tokeniser the reference builds
    (unit_tokeniser.py:33-47): exposes len(), pad id and padding side for the
    data/trainer layers."""

    def __init__(self, num_units: int, offset: int, pad_token_id: int, bos_token_id: int, eos_token_id: int):
        self.num_units = num_units
        self.offset = offset
        self.pad_token_id = pad_token_id
        self.bos_token_id = bos_token_id
        self.eos_token_id = eos_token_id
        self.padding_side = "right"

    def __len__(self) -> int:
        return self.num_units + self.offset

    def convert_ids_to_tokens(self, ids) -> List[str]:
        out = []
        for i in np.atleast_1d(np.asarray(ids)):
            i = int(i)
            if i == self.pad_token_id:
                out.append("<PAD>")
            elif i in (self.bos_token_id, self.eos_token_id):
                out.append("<S>")
            else:
                out.append(f"<Un{i - self.offset}>")
        return out

    def decode(self, ids) -> str:
        return " ".join(self.convert_ids_to_tokens(ids))


def pad_token_batch(seqs: List[List[int]], pad_id: int, padding_side: str = "right") -> dict:
    """Pad ragged id lists to a dense [B, L] batch with an attention mask."""
    max_len = max((len(s) for s in seqs), default=0)
    batch = np.full((len(seqs), max_len), pad_id, dtype=np.int32)
    mask = np.zeros((len(seqs), max_len), dtype=np.int32)
    for i, s in enumerate(seqs):
        n = len(s)
        if padding_side == "right":
            batch[i, :n] = s
            mask[i, :n] = 1
        else:
            batch[i, max_len - n:] = s
            mask[i, max_len - n:] = 1
    return {"input_ids": batch, "attention_mask": mask}


class UnitTokeniser(AudioTokeniser):
    def __init__(self, speech_tokeniser=None,
                 dedup: bool = True,
                 bos_eos_token_id: int = 1,
                 pad_token_id: int = 0,
                 num_units: int = 500,
                 load_fe: bool = True):
        self.model = speech_tokeniser if load_fe else None
        self.dedup = dedup
        self.bos_token_id = bos_eos_token_id
        self.eos_token_id = bos_eos_token_id
        self.pad_token_id = pad_token_id
        self.num_units = num_units
        # units sit immediately after the special ids (unit_tokeniser.py:34)
        self.offset = max(self.eos_token_id, self.bos_token_id, self.pad_token_id) + 1
        self.text_tokeniser = UnitVocab(num_units, self.offset, pad_token_id,
                                        self.bos_token_id, self.eos_token_id)

    # -- audio -> representation ---------------------------------------------
    def audio_represent(self, wav, lens=None) -> List[Dict]:
        return self._represent(self.model, wav, lens, self.dedup)

    # -- representation -> string ----------------------------------------------
    def stringify_representation(self, reps: List[Dict], mode: str = "test") -> List[str]:
        return [unit_codec.units_to_string(cur["units"]) for cur in reps]

    # -- string -> ids -----------------------------------------------------------
    def _encode_one(self, audio_repr: str) -> List[int]:
        ids = unit_codec.tokenise_unit_string(audio_repr, self.offset)
        return [self.bos_token_id] + ids + [self.eos_token_id]

    def string_tokenise(self, audio_repr: Union[str, List[str]], padding: bool = False,
                        add_special_tokens: bool = True, **kwargs) -> dict:
        if isinstance(audio_repr, str):
            audio_repr = [audio_repr]
        if add_special_tokens:
            seqs = [self._encode_one(s) for s in audio_repr]
        else:  # bare unit ids, no <S> wrap (the DPO tokenize_row contract,
            # reference slam_dpo_trainer.py:40-43)
            seqs = [unit_codec.tokenise_unit_string(s, self.offset)
                    for s in audio_repr]
        if padding:
            return pad_token_batch(seqs, self.pad_token_id, self.text_tokeniser.padding_side)
        return {"input_ids": seqs, "attention_mask": [[1] * len(s) for s in seqs]}

    def __call__(self, sample: Union[Dict, str, List[str]], **kwargs) -> dict:
        if isinstance(sample, dict):
            sample = self.stringify_representation([sample])[0]
        return self.string_tokenise(sample, **kwargs)

    def tokenise(self, wav, lens=None) -> dict:
        return self.string_tokenise(self.audio_stringify(wav, lens), padding=True)

    def build_prompt(self, wav, lens=None, output_modality: Optional[str] = None) -> dict:
        strs = self.audio_stringify(wav, lens)
        seqs = [self._encode_one(s)[:-1] for s in strs]  # drop trailing eos
        return pad_token_batch(seqs, self.pad_token_id, self.text_tokeniser.padding_side)

    def prepare_sample(self, sample: dict, **kwargs) -> dict:
        return self.string_tokenise(sample["audio_repr"], **kwargs)

    def prepare_batch(self, samples: list) -> list:
        # straight to the codec: no per-chunk attention_mask allocation
        return [self._encode_one(s["audio_repr"]) for s in samples]

    def decode_sample(self, tokens, output_modality: str = "SPEECH") -> np.ndarray:
        tokens = np.asarray(tokens).ravel()
        keep = (tokens != self.pad_token_id) & (tokens != self.bos_token_id) & (tokens != self.eos_token_id)
        return unit_codec.decode_ids_to_units(tokens[keep], self.offset, self.num_units)

    def get_ignore_tokens(self, _: Optional[str]) -> Optional[List[int]]:
        return None

    # -- persistence -------------------------------------------------------------
    @property
    def fe_sample_rate(self) -> int:
        if self.model is None:
            raise RuntimeError("This tokeniser was built without a feature extractor (load_fe=False)")
        return self.model.sample_rate

    def save_pretrained(self, save_directory: str, **kwargs):
        os.makedirs(save_directory, exist_ok=True)
        cfg = {
            "dedup": self.dedup,
            "bos_eos_token_id": self.bos_token_id,
            "pad_token_id": self.pad_token_id,
            "num_units": self.num_units,
            "load_fe": False,
        }
        with open(os.path.join(save_directory, "tokeniser_config.json"), "w") as f:
            json.dump(cfg, f)

    @classmethod
    def from_pretrained(cls, path: str, **kwargs) -> "UnitTokeniser":
        with open(os.path.join(path, "tokeniser_config.json"), "r") as f:
            cfg = json.load(f)
        return cls(speech_tokeniser=None, **cfg, **kwargs)

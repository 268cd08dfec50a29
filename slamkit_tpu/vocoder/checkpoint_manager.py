"""Textless checkpoint registry: name -> {url, fname, sha256}.

Counterpart of the reference's vendored textlesslib manager
(reference slamkit/vocoder/textless_checkpoint_manager/manager.py:17-61,
__init__.py:17-353): resolves public checkpoint names to files under
$TEXTLESS_CHECKPOINT_ROOT (default ~/.textless/), downloading with sha256
verification when the environment has egress. The registry below carries the
entries the reference's configs actually reach (the mhubert-25 / hubert-L9
dense models, 500-unit quantizers, and their HiFi-GAN vocoders); other names
raise KeyError with a pointer to the upstream registry.
"""
from __future__ import annotations

import hashlib
import os
import pathlib
import urllib.request
from dataclasses import dataclass
from typing import Union

FB_TWIST = "https://dl.fbaipublicfiles.com/textless_nlp/twist/speech_tokenizer"
FB_EXPRESSO = "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints"
FB_GSLM = "https://dl.fbaipublicfiles.com/textless_nlp/gslm/hubert"


@dataclass
class Checkpoint:
    name: str
    remote_path: str
    fname: str
    sha256: str


CHECKPOINTS = [
    # dense models
    Checkpoint("mhubert-base-25hz",
               f"{FB_TWIST}/mhubert_base_25hz_cp_mls_cv_sp_fisher.pt",
               "mhubert_base_25hz_cp_mls_cv_sp_fisher.pt",
               "edf0f5be2581a568a236aeb2781a5607c5af25806e12f40f7f2391e861fe3cf0"),
    # quantizers
    Checkpoint("mhubert-base-25hz-kmeans-500",
               f"{FB_TWIST}/mhubert_base_25hz_cp_mls_cv_sp_fisher_L11_km500.bin",
               "mhubert_base_25hz_cp_mls_cv_sp_fisher_L11_km500.bin",
               "03cc04a9c24fec4285e73e709c485756d8f116aa8e724eac555de6a7cf8d28ad"),
    Checkpoint("hubert-base-ls960-layer-9-kmeans-500",
               f"{FB_GSLM}/km500/km.bin", "hubert_base_ls960_L9_km500.bin", ""),
    # hifigan vocoders + configs
    Checkpoint("mhubert-base-25hz-kmeans-500-hifigan",
               f"{FB_TWIST}/hifigan_lj_mhubert_base_25hz.pt",
               "hifigan_lj_mhubert_base_25hz.pt",
               "d88224e95c501e2cd59a6e4014753169cfe060fb7ade3cc0da03c809fef73b79"),
    Checkpoint("mhubert-base-25hz-kmeans-500-hifigan-config",
               f"{FB_TWIST}/hifigan_lj_mhubert_base_25hz_config.json",
               "hifigan_lj_mhubert_base_25hz_config.json",
               "116dc39be4970cd393e562acd0a0ec70a86aaba7e9ca469b8b836cb3fe46afc7"),
    Checkpoint("hubert-base-ls960-layer-9-kmeans-500-hifigan",
               f"{FB_EXPRESSO}/hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km500/generator.pt",
               "hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km500_generator.pt",
               "d50f4704e961c29cb386924ef32cd0c3a4d1089a3f9be856f8a3b6dcfdd6147a"),
    Checkpoint("hubert-base-ls960-layer-9-kmeans-500-hifigan-config",
               f"{FB_EXPRESSO}/hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km500/config.json",
               "hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km500_config.json",
               "31e65ef5e100cb43de08f2c8d225496ace1ed87a49fcb8ee44bd6805f079b1f0"),
]


class CheckpointManager:
    def __init__(self, disk_root: Union[str, pathlib.Path] = None):
        if disk_root is None:
            disk_root = os.environ.get("TEXTLESS_CHECKPOINT_ROOT", "~/.textless/")
        self.disk_root = pathlib.Path(disk_root).expanduser().resolve()
        self.storage = {c.name: c for c in CHECKPOINTS}

    def set_root(self, new_root):
        self.disk_root = pathlib.Path(new_root).expanduser().resolve()

    def add_checkpoint(self, checkpoint: Checkpoint):
        self.storage[checkpoint.name] = checkpoint

    def download_by_name(self, name: str):
        ckpt = self.storage[name]
        self.disk_root.mkdir(parents=True, exist_ok=True)
        dst = self.disk_root / ckpt.fname
        urllib.request.urlretrieve(ckpt.remote_path, dst)
        if ckpt.sha256:
            h = hashlib.sha256(dst.read_bytes()).hexdigest()
            if h != ckpt.sha256:
                dst.unlink()
                raise IOError(f"sha256 mismatch for {name}: {h} != {ckpt.sha256}")

    def get_by_name(self, name: str, download_if_needed: bool = True) -> pathlib.Path:
        if name not in self.storage:
            raise KeyError(
                f"Unknown checkpoint {name!r}; add it via add_checkpoint "
                f"(full registry: textlesslib checkpoint manager)")
        ckpt = self.storage[name]
        disk_name = self.disk_root / ckpt.fname
        if not disk_name.exists():
            if not download_if_needed:
                raise FileNotFoundError(
                    f"Checkpoint {name} not found locally at {disk_name}")
            self.download_by_name(name)
        return disk_name


CHECKPOINT_MANAGER = CheckpointManager()

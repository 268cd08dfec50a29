"""HuBERT feature extractor: wav batch -> discrete unit ids, fully on-device.

Semantics match the reference (reference
slamkit/feature_extractor/hubert_feature_extractor.py:16-81):

  * wav padded with 40 samples on each side before the forward;
  * hidden_states[layer] tap (layer 9 for hubert-base L9 / 11 for mhubert-25);
  * k-means assignment over the tapped features;
  * per-sample frame trim by relative length ceil(lens / wav_len · T);
  * `load_config_only` builds a config-only extractor (unit duration math)
    without touching weights (reference :28-30);
  * `$SLAMKIT_CACHE` k-means cache dir honored; URLs are resolved against the
    cache only (zero-egress environments must pre-seed the file).

TPU-first: HuBERT forward + k-means fuse into ONE jit per padded wav length;
wav lengths are bucketed to multiples of `bucket_samples` so XLA compiles a
handful of shapes, not one per batch.
"""
from __future__ import annotations

import logging
import math
import os
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .audio_feature_extractor import AudioFeatureExtractor
from .hubert_jax import HubertConfig, forward
from .kmeans import assign_clusters, load_kmeans_centroids

logger = logging.getLogger(__name__)

# Bucketing pads wavs up to a multiple of bucket_samples so XLA compiles a
# handful of shapes. OFF by default: attention has no padding mask (parity
# with the reference, which never passes one — hubert_feature_extractor.py:42),
# so extra padding perturbs every frame; golden-file parity needs batch-max
# padding exactly. Enable via tokeniser.feature_extractor.bucket_samples for
# throughput when bit-exactness doesn't matter.
DEFAULT_BUCKET = None

# Offline-first architecture facts for the checkpoints the reference's configs
# name (config/tokeniser/feature_extractor/*.yaml). hubert-base-ls960 is the
# HF default arch; mhubert-base-25hz (TWIST) adds one stride-2 conv so the
# frame rate halves to 25 Hz (total stride 640 -> 0.04 s/unit).
HUBERT_CONFIG_PRESETS = {
    "facebook/hubert-base-ls960": {},
    "slprl/mhubert-base-25hz": {
        "conv_dim": (512,) * 8,
        "conv_kernel": (10, 3, 3, 3, 3, 2, 2, 2),
        "conv_stride": (5, 2, 2, 2, 2, 2, 2, 2),
    },
}


def _cache_dir(cache_path: Optional[str]) -> str:
    if cache_path is None:
        cache_path = os.environ.get("SLAMKIT_CACHE",
                                    os.path.expanduser("~/.cache/slamkit"))
    os.makedirs(cache_path, exist_ok=True)
    return cache_path


class HubertFeatureExtractor(AudioFeatureExtractor):
    def __init__(self, pretrained_model: str = "facebook/hubert-base-ls960",
                 kmeans_path: str = "https://dl.fbaipublicfiles.com/hubert/hubert_base_ls960_L9_km500.bin",
                 layer: int = 9, num_units: int = 500, compile: bool = False,
                 cache_path: Optional[str] = None, load_config_only: bool = False,
                 bucket_samples: Optional[int] = DEFAULT_BUCKET):
        cache_path = _cache_dir(cache_path)
        self.layer = layer
        self.num_units = num_units
        self.bucket_samples = bucket_samples
        self.params = None
        self.centroids = None

        if load_config_only:
            self.config = self._load_config(pretrained_model)
            return

        from .hubert_jax import load_hf_hubert

        self.params, self.config = load_hf_hubert(pretrained_model)
        self.centroids = jnp.asarray(self._resolve_kmeans(kmeans_path, cache_path))
        if self.centroids.shape[0] != num_units:
            logger.warning("kmeans has %d centroids but num_units=%d",
                           self.centroids.shape[0], num_units)
        self.params = jax.device_put(self.params)
        # compile flag kept for surface parity; jit happens regardless.
        # params/centroids are ARGUMENTS, not closure captures — captured
        # weights get baked into the program as constants (huge compiles).
        self._extract_jit = jax.jit(self._extract_fn)

    @staticmethod
    def _load_config(pretrained_model: str) -> HubertConfig:
        import json

        if str(pretrained_model).endswith(".pt"):
            import torch

            from .hubert_jax import config_from_fairseq, fairseq_model_cfg

            state = torch.load(pretrained_model, map_location="cpu",
                               weights_only=False)
            return config_from_fairseq(fairseq_model_cfg(state))
        local = os.path.join(pretrained_model, "config.json")
        if os.path.isfile(local):
            with open(local) as f:
                return HubertConfig.from_hf_dict(json.load(f))
        if pretrained_model in HUBERT_CONFIG_PRESETS:
            return HubertConfig(**HUBERT_CONFIG_PRESETS[pretrained_model])
        from transformers import HubertConfig as HFConfig

        return HubertConfig.from_hf_dict(
            HFConfig.from_pretrained(pretrained_model).to_dict())

    @staticmethod
    def _resolve_kmeans(kmeans_path: str, cache_path: str) -> np.ndarray:
        # cache key includes the URL basename + a hash: the reference caches
        # every quantizer to one fixed 'kmeans_model.bin'
        # (hubert_feature_extractor.py:31-38), which silently serves the WRONG
        # centroids after switching tokenisers with equal num_units
        import hashlib

        tag = hashlib.sha256(kmeans_path.encode()).hexdigest()[:12]
        base = os.path.basename(kmeans_path.rstrip("/")) or "kmeans_model.bin"
        cached = os.path.join(cache_path, f"{tag}-{base}")
        legacy = os.path.join(cache_path, "kmeans_model.bin")
        if kmeans_path.startswith(("http://", "https://")):
            for cand in (cached, cached + ".npy", legacy, legacy + ".npy"):
                if os.path.exists(cand):
                    if cand.startswith(legacy):
                        logger.warning(
                            "using legacy cache %s — delete it if you switched "
                            "quantizers (it is not keyed by URL)", cand)
                    return load_kmeans_centroids(cand)
            try:  # zero-egress environments raise here with a clear message
                from torch.hub import download_url_to_file

                download_url_to_file(kmeans_path, cached)
                return load_kmeans_centroids(cached)
            except Exception as e:
                raise FileNotFoundError(
                    f"k-means checkpoint not cached at {cached} and download "
                    f"failed ({e}); pre-seed $SLAMKIT_CACHE") from e
        return load_kmeans_centroids(kmeans_path)

    # -- fused on-device path -------------------------------------------------
    def _extract_fn(self, params, centroids, wav: jax.Array) -> jax.Array:
        """[B, T] padded wav -> [B, T'] unit ids. One jit: conv frontend +
        transformer tap + k-means argmin (no host round-trip)."""
        padded = jnp.pad(wav, ((0, 0), (40, 40)))
        hidden = forward(params, self.config, padded, tap_layer=self.layer)
        return assign_clusters(hidden, centroids)

    def _extract(self, wav: jax.Array) -> jax.Array:
        return self._extract_jit(self.params, self.centroids, wav)

    def _bucket(self, t: int) -> int:
        b = self.bucket_samples
        if not b:
            return t
        return max(((t + b - 1) // b) * b, b)

    def extract(self, wav, lens=None) -> List[np.ndarray]:
        wav = np.asarray(wav, dtype=np.float32)
        if wav.ndim == 1:
            wav = wav[None]
        t = wav.shape[1]
        bucketed = self._bucket(t)
        if bucketed != t:  # pad batch up to the bucket boundary (static shapes)
            wav = np.pad(wav, ((0, 0), (0, bucketed - t)))
        toks = np.asarray(self._extract(jnp.asarray(wav)))
        n_frames = toks.shape[1]
        if lens is not None:
            lens = np.asarray(lens, dtype=np.float64)
            # relative trim against the ORIGINAL (pre-bucket) wav length,
            # scaled to the frames that length would have produced
            orig_frames = self._n_frames(t)
            rel_l = np.ceil(lens / t * orig_frames).astype(int)
        else:
            rel_l = [self._n_frames(t)] * len(toks)
        return [tk[:l] for tk, l in zip(toks, rel_l)]

    def _n_frames(self, wav_len: int) -> int:
        """Conv-stack output length for a wav of wav_len (+80 pad) samples."""
        t = wav_len + 80
        for k, s in zip(self.config.conv_kernel, self.config.conv_stride):
            t = (t - k) // s + 1
        return t

    def get_unit_duration(self) -> float:
        return math.prod(self.config.conv_stride) / self.sample_rate

    @property
    def sample_rate(self) -> int:
        return 16_000

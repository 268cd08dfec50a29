"""K-means unit assignment, on-device.

The reference runs sklearn's KMeans.predict on CPU over features copied off
the GPU (reference hubert_feature_extractor.py:42-43,73-81) — a deliberate
bottleneck. Here assignment is one matmul + argmin fused into the extractor's
jit: argmin_k ||x - c_k||² = argmin_k (||c_k||² - 2 x·c_k), so only the
centroid dot products are computed (SURVEY.md §2.9).
"""
from __future__ import annotations

import logging
import pickle

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def assign_clusters(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """x: [..., C] f32; centroids: [K, C] f32 -> unit ids [...] int32."""
    c_sq = jnp.sum(centroids * centroids, axis=-1)  # [K]
    dots = jnp.einsum("...c,kc->...k", x, centroids,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    return jnp.argmin(c_sq - 2.0 * dots, axis=-1).astype(jnp.int32)


def load_kmeans_centroids(path: str) -> np.ndarray:
    """Load centroids [K, C] from a k-means checkpoint.

    Supports the formats the ecosystem uses: .npy/.npz arrays, and
    sklearn/joblib pickles (the GSLM `*.bin` files the reference downloads,
    hubert_feature_extractor.py:62-76) — read via joblib when available,
    else plain pickle."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    if path.endswith(".npz"):
        z = np.load(path)
        key = "centroids" if "centroids" in z.files else z.files[0]
        return z[key].astype(np.float32)
    obj = None
    try:
        import joblib

        obj = joblib.load(path)
    except ImportError:
        with open(path, "rb") as f:
            obj = pickle.load(f)
    if hasattr(obj, "cluster_centers_"):
        return np.asarray(obj.cluster_centers_, dtype=np.float32)
    if isinstance(obj, np.ndarray):
        return obj.astype(np.float32)
    raise ValueError(f"Unrecognized k-means checkpoint format: {path} ({type(obj)})")


def save_kmeans_centroids(path: str, centroids: np.ndarray):
    np.save(path if path.endswith(".npy") else path + ".npy",
            np.asarray(centroids, dtype=np.float32))


def kmeans_fit(x: np.ndarray, num_clusters: int, iters: int = 25,
               seed: int = 0, batch: int = 1 << 16) -> np.ndarray:
    """Lloyd's k-means on device — replaces the sklearn/Cython fit for
    training new quantizers. x: [N, C] streams through the device in `batch`
    chunks, so datasets far larger than HBM fit (and x is a jit ARGUMENT,
    never a baked-in program constant)."""
    rng = np.random.default_rng(seed)
    centroids = jnp.asarray(np.asarray(
        x[rng.choice(len(x), num_clusters, replace=False)], dtype=np.float32))

    @jax.jit
    def partial_sums(c, xb):
        ids = assign_clusters(xb, c)
        one_hot = jax.nn.one_hot(ids, num_clusters, dtype=jnp.float32)
        return one_hot.sum(0), one_hot.T @ xb

    n = len(x)
    for _ in range(iters):
        counts = jnp.zeros((num_clusters,), jnp.float32)
        sums = jnp.zeros((num_clusters, x.shape[1]), jnp.float32)
        for lo in range(0, n, batch):
            xb = jnp.asarray(np.asarray(x[lo:lo + batch], dtype=np.float32))
            cb, sb = partial_sums(centroids, xb)
            counts = counts + cb
            sums = sums + sb
        new_c = sums / jnp.maximum(counts[:, None], 1.0)
        centroids = jnp.where(counts[:, None] > 0, new_c, centroids)
    return np.asarray(centroids)

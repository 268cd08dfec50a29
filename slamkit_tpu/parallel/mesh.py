"""Device mesh + sharding helpers.

The reference's only parallelism is DDP via HF accelerate/NCCL
(reference slamkit/trainer/slam_trainer.py:70, SURVEY.md §2.8/§5.8). Here the
TPU-native equivalent: a `jax.sharding.Mesh` with a 'data' axis (and an
optional second 'model' axis for tensor sharding at larger scales); batches
are sharded over 'data', params replicated or — with fsdp — sharded over
'data' along each array's largest divisible axis (ZeRO-3 style), letting XLA
insert the all-gathers/reduce-scatters over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Optional[Sequence[str]] = None) -> Mesh:
    """Build a mesh over the available devices.

    shape=None -> all devices on a 1-D 'data' axis (the reference's DDP
    world). shape=[d, m] -> ('data', 'model') for 2-D layouts.
    """
    devices = np.asarray(jax.devices())
    if shape is None:
        shape = (len(devices),)
    shape = tuple(int(s) for s in shape)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != device count {len(devices)}")
    if axis_names is None:
        axis_names = ("data", "model")[:len(shape)]
    return Mesh(devices.reshape(shape), tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_spec(shape: Sequence[int], mesh: Mesh, axis: str = "data") -> P:
    """PartitionSpec sharding the largest dim divisible by the axis size
    (param-sharding rule for ZeRO-3-style fsdp). Scalars/indivisible arrays
    stay replicated."""
    n = mesh.shape[axis]
    dims = list(shape)
    order = sorted(range(len(dims)), key=lambda i: -dims[i])
    for i in order:
        if dims[i] % n == 0 and dims[i] >= n:
            spec = [None] * len(dims)
            spec[i] = axis
            return P(*spec)
    return P()


def param_shardings(params, mesh: Mesh, fsdp: bool = False):
    """Sharding pytree for a params pytree: replicated, or fsdp over 'data'."""
    if not fsdp:
        rep = replicated(mesh)
        return jax.tree_util.tree_map(lambda _: rep, params)
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, fsdp_spec(x.shape, mesh)), params)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch on the mesh: arrays with a batch dim go over 'data',
    scalars replicated."""
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return {k: jax.device_put(v, bs if np.ndim(v) >= 2 else rep)
            for k, v in batch.items()}

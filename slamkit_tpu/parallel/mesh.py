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


#: Mesh axes the trainers understand: 'data' (DP/fsdp batch axis, always
#: present), 'model' (Megatron TP), 'seq' (context/sequence parallel — the
#: time dim of batches is sharded and XLA inserts the attention k/v
#: all-gathers; SURVEY.md §2.8 lists SP as the one stretch goal beyond the
#: reference's DDP-only world).
KNOWN_AXES = ("data", "model", "seq")


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Optional[Sequence[str]] = None) -> Mesh:
    """Build a mesh over the available devices.

    shape=None -> all devices on a 1-D 'data' axis (the reference's DDP
    world). shape=[d, m] -> ('data', 'model') for 2-D layouts; pass
    axis_names=('data', 'seq') for context parallelism instead.
    """
    devices = np.asarray(jax.devices())
    if shape is None:
        shape = (len(devices),)
    shape = tuple(int(s) for s in shape)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != device count {len(devices)}")
    if axis_names is None:
        axis_names = ("data", "model")[:len(shape)]
    axis_names = tuple(axis_names)
    if len(axis_names) != len(shape):
        raise ValueError(f"mesh_axes {axis_names} rank != mesh shape {shape}")
    unknown = [a for a in axis_names if a not in KNOWN_AXES]
    if unknown or "data" not in axis_names:
        raise ValueError(
            f"mesh axes must be drawn from {KNOWN_AXES} and include 'data'; "
            f"got {axis_names}")
    return Mesh(devices.reshape(shape), axis_names)


def seq_axis_size(mesh: Mesh) -> int:
    """Size of the 'seq' (context-parallel) axis; 1 when absent."""
    return int(mesh.shape.get("seq", 1)) if "seq" in mesh.axis_names else 1


def batch_sharding(mesh: Mesh, time_dim: Optional[int] = None,
                   ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; rest replicated. With a
    'seq' mesh axis, a 2-D [B, T] array whose divisible time_dim is passed
    gets its time dim sharded over 'seq' as well (context parallelism).
    time_dim must be the size of dim 1 — only rank-2 batches qualify, so
    higher-rank arrays never get a feature dim context-sharded by accident."""
    n_seq = seq_axis_size(mesh)
    if (n_seq > 1 and ndim == 2 and time_dim is not None
            and time_dim % n_seq == 0):
        return NamedSharding(mesh, P("data", "seq"))
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


def tp_specs_for_decoder(mesh: Mesh, axis: str = "model") -> dict:
    """Megatron-style tensor-parallel PartitionSpecs for the stacked-layer
    decoder params (models/transformer.py): column-parallel q/k/v/up/gate
    (shard the output feature dim), row-parallel o/down (shard the input dim),
    embeddings sharded over vocab. XLA inserts the all-reduces over ICI.

    The reference has no TP at all (SURVEY.md §2.8) — this is the cheap 2-D
    extension its 9B-scale SIMS models would want."""
    layer_specs = {
        "attn_norm_scale": P(None, None),
        "mlp_norm_scale": P(None, None),
        "attn_norm_bias": P(None, None),
        "mlp_norm_bias": P(None, None),
        "q_w": P(None, None, axis), "k_w": P(None, None, axis),
        "v_w": P(None, None, axis),
        "q_b": P(None, axis), "k_b": P(None, axis), "v_b": P(None, axis),
        "o_w": P(None, axis, None), "o_b": P(None, None),
        "up_w": P(None, None, axis), "gate_w": P(None, None, axis),
        "up_b": P(None, axis), "gate_b": P(None, axis),
        "down_w": P(None, axis, None), "down_b": P(None, None),
    }
    return {
        "embed": P(axis, None),
        "layers": layer_specs,
        "final_norm_scale": P(None),
        "final_norm_bias": P(None),
        "pos_embed": P(None, None),
        "lm_head": P(None, axis),
    }


def tp_shardings(params, mesh: Mesh, axis: str = "model",
                 data_axis: str = "data", fsdp: bool = False):
    """NamedSharding pytree for tensor parallelism, optionally combined with
    ZeRO-3 fsdp: after the Megatron spec claims its dim, the largest
    remaining divisible dim is sharded over the data axis."""
    specs = tp_specs_for_decoder(mesh, axis)

    def resolve(path, leaf):
        node = specs
        for p in path:
            key = getattr(p, "key", None)
            if key is not None and isinstance(node, dict) and key in node:
                node = node[key]
        spec = node if isinstance(node, P) else P()
        dims = list(spec) + [None] * (leaf.ndim - len(spec))
        dims = dims[:leaf.ndim]
        # drop axes that don't divide evenly
        for i, d in enumerate(dims):
            if d is not None and leaf.shape[i] % mesh.shape[d] != 0:
                dims[i] = None
        if fsdp:
            n = mesh.shape[data_axis]
            free = [i for i, d in enumerate(dims) if d is None]
            for i in sorted(free, key=lambda i: -leaf.shape[i]):
                if leaf.shape[i] % n == 0 and leaf.shape[i] >= n:
                    dims[i] = data_axis
                    break
        return NamedSharding(mesh, P(*dims))

    return jax.tree_util.tree_map_with_path(resolve, params)


def _path_keys(path) -> tuple:
    keys = []
    for p in path:
        k = getattr(p, "key", None)
        if k is None:
            k = getattr(p, "idx", None)
        keys.append(str(k))
    return tuple(keys)


def opt_state_shardings(opt_state, params, param_shardings_tree, mesh: Mesh):
    """Sharding pytree for an optax state: moment pytrees mirror the params
    tree, so each array leaf is matched to its param by PATH SUFFIX (a shape
    map would collapse same-shape params that carry different TP specs, e.g.
    column-parallel q_w vs row-parallel o_w). Unmatched leaves (counts,
    scalars) are replicated."""
    by_path = {}
    for (path, _), (_, sh) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0][0:],
            jax.tree_util.tree_flatten_with_path(param_shardings_tree)[0]):
        by_path[_path_keys(path)] = sh
    rep = replicated(mesh)

    def compatible(sh, leaf):
        # factored states (adafactor v_row/v_col, (1,) placeholders) have a
        # DIFFERENT shape than their param — the param's spec would be
        # rank-mismatched or indivisible; those leaves stay replicated
        spec = sh.spec
        if len(spec) > leaf.ndim:
            return False
        for i, ax in enumerate(spec):
            if ax is None:
                continue
            names = (ax,) if isinstance(ax, str) else tuple(ax)
            n = int(np.prod([mesh.shape[a] for a in names]))
            if leaf.shape[i] % n != 0:
                return False
        return True

    def resolve(path, leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return rep
        keys = _path_keys(path)
        for start in range(len(keys)):
            sh = by_path.get(keys[start:])
            if sh is not None:
                return sh if compatible(sh, leaf) else rep
        return rep

    return jax.tree_util.tree_map_with_path(resolve, opt_state)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch on the mesh: arrays with a batch dim go over 'data',
    scalars replicated. A [B, T] array whose time dim divides a 'seq' axis is
    additionally context-sharded over it. Multihost: every process passes the
    identical global batch; each device slices its own tile."""
    rep = replicated(mesh)

    def put(v, sh):
        if jax.process_count() > 1:
            arr = np.asarray(v)
            return jax.make_array_from_callback(arr.shape, sh,
                                                lambda idx: arr[idx])
        return jax.device_put(v, sh)

    return {k: put(v, batch_sharding(mesh,
                                     np.shape(v)[1] if np.ndim(v) == 2
                                     else None,
                                     ndim=np.ndim(v)) if np.ndim(v) >= 2
                   else rep)
            for k, v in batch.items()}

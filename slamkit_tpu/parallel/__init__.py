from .mesh import (batch_sharding, fsdp_spec, make_mesh, param_shardings,
                   replicated, shard_batch)

__all__ = ["make_mesh", "batch_sharding", "replicated", "fsdp_spec",
           "param_shardings", "shard_batch"]

from .mesh import (
    batch_sharding,
    batch_spec,
    fsdp_param_spec,
    make_mesh,
    param_shardings,
    replicated,
    shard_params,
)

__all__ = [
    "batch_sharding",
    "batch_spec",
    "fsdp_param_spec",
    "make_mesh",
    "param_shardings",
    "replicated",
    "shard_params",
]

from .distributed import initialize_distributed, is_main_process
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
    "initialize_distributed",
    "is_main_process",
    "batch_sharding",
    "batch_spec",
    "fsdp_param_spec",
    "make_mesh",
    "param_shardings",
    "replicated",
    "shard_params",
]

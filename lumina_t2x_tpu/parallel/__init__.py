from .mesh import (
    AXIS_DATA,
    AXIS_MODEL,
    batch_sharding,
    create_mesh,
    distributed_init,
    replicated_sharding,
)
from .pipeline import gpipe_spmd, merge_stages, split_stages, stage_shardings
from .sharding import (
    model_parallel_dim_dict,
    param_shardings,
    shard_params,
    spec_for_param,
)

__all__ = [
    "AXIS_DATA", "AXIS_MODEL", "create_mesh", "distributed_init",
    "batch_sharding", "replicated_sharding",
    "param_shardings", "shard_params", "spec_for_param", "model_parallel_dim_dict",
    "gpipe_spmd", "split_stages", "merge_stages", "stage_shardings",
]

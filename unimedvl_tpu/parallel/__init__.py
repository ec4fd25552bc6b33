from unimedvl_tpu.parallel.mesh import (
    create_mesh,
    bagel_param_specs,
    kv_cache_spec,
    shard_params,
    shard_cache,
)

__all__ = [
    "create_mesh",
    "bagel_param_specs",
    "kv_cache_spec",
    "shard_params",
    "shard_cache",
]

from unimedvl_tpu.parallel.mesh import (
    create_mesh,
    bagel_param_specs,
    kv_cache_spec,
    shard_params,
    shard_cache,
)

from unimedvl_tpu.parallel.pp_train import (  # noqa: F401
    pipeline_train_loss,
    pipe_layer_specs,
    place_params_pp,
)

__all__ = [
    "create_mesh",
    "bagel_param_specs",
    "kv_cache_spec",
    "shard_params",
    "shard_cache",
    "pipeline_train_loss",
    "pipe_layer_specs",
    "place_params_pp",
]

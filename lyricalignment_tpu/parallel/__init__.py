from lyricalignment_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    shard_align_params,
    align_param_specs,
)

__all__ = ["make_mesh", "batch_sharding", "shard_align_params", "align_param_specs"]

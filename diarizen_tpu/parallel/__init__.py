from diarizen_tpu.parallel.mesh import (
    data_sharding,
    eend_param_shardings,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = ["data_sharding", "eend_param_shardings", "make_mesh", "replicated", "shard_batch"]

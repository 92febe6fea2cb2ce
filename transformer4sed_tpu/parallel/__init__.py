from transformer4sed_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    ensure_virtual_devices,
    replicated_sharding,
    require_devices,
    shard_train_step,
    put_batch,
    device_prefetch,
)
from transformer4sed_tpu.parallel.partition import (
    TP_RULES,
    make_2d_mesh,
    partition_specs,
    shard_params,
)
from transformer4sed_tpu.parallel.multihost import (
    ProcessShardedBatchSampler,
    gather_clip_scores,
    gather_objects,
    is_primary,
    make_global_batch,
    maybe_initialize,
    shard_batch_indices,
    shard_eval_items,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "ensure_virtual_devices",
    "require_devices",
    "replicated_sharding",
    "shard_train_step",
    "put_batch",
    "device_prefetch",
    "TP_RULES",
    "make_2d_mesh",
    "partition_specs",
    "shard_params",
    "ProcessShardedBatchSampler",
    "gather_clip_scores",
    "gather_objects",
    "is_primary",
    "make_global_batch",
    "maybe_initialize",
    "shard_batch_indices",
    "shard_eval_items",
]

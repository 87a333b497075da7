from floodseg_tpu.parallel.mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_batch_local,
    sharded_jit,
    make_sharded_train_step,
    make_dp_predict_fn,
)
from floodseg_tpu.parallel.dist import maybe_initialize_multihost

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_batch_local",
    "sharded_jit",
    "make_sharded_train_step",
    "make_dp_predict_fn",
    "maybe_initialize_multihost",
]

from floodseg_tpu.parallel.mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    sharded_jit,
    make_sharded_train_step,
    make_dp_predict_fn,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "sharded_jit",
    "make_sharded_train_step",
    "make_dp_predict_fn",
]

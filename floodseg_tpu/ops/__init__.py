from floodseg_tpu.ops.resize import resize_bilinear
from floodseg_tpu.ops.pool import adaptive_avg_pool, max_pool
from floodseg_tpu.ops.grid_sample import grid_sample
from floodseg_tpu.ops.losses import (
    cross_entropy_loss,
    ohem_cross_entropy,
    binary_cross_entropy,
)
from floodseg_tpu.ops.metrics import intersection_and_union

__all__ = [
    "resize_bilinear",
    "adaptive_avg_pool",
    "max_pool",
    "grid_sample",
    "cross_entropy_loss",
    "ohem_cross_entropy",
    "binary_cross_entropy",
    "intersection_and_union",
]

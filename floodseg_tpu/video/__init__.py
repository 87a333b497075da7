from floodseg_tpu.video.grid import (
    default_grid,
    grids_from_motion_vectors,
    crop_motion_vectors_np,
)
from floodseg_tpu.video.flow_model import FlowInterpolator

__all__ = [
    "default_grid",
    "grids_from_motion_vectors",
    "crop_motion_vectors_np",
    "FlowInterpolator",
]

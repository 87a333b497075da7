from floodseg_tpu.data.transforms import (
    MEAN,
    STD,
    Compose,
    IgnoreClasses,
    Resize,
    RandScale,
    RandRotate,
    RandomGaussianBlur,
    RandomHorizontalFlip,
    Crop,
    Normalize,
    build_train_transform,
    build_val_transform,
    build_test_transform,
)
from floodseg_tpu.data.dataset import (
    parse_list,
    SemDataset,
    FlowDataset,
    collate,
)
from floodseg_tpu.data.loader import DataLoader

__all__ = [
    "MEAN", "STD", "Compose", "IgnoreClasses", "Resize", "RandScale",
    "RandRotate", "RandomGaussianBlur", "RandomHorizontalFlip", "Crop",
    "Normalize", "build_train_transform", "build_val_transform",
    "build_test_transform", "parse_list", "SemDataset", "FlowDataset",
    "collate", "DataLoader",
]

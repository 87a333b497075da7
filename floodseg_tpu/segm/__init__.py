"""Standalone Segmenter (ViT) pipeline — TPU-native equivalent of the
reference's vendored ``segm/`` stack (train CLI, folder datasets,
sliding-window inference, attention-map extraction, metric logging).

The reference main project imports only the segm MODEL subset (already in
``floodseg_tpu.models.vit``); this subpackage covers the standalone side:
``segm/train.py``, ``segm/engine.py``, ``segm/data/``, ``segm/metrics.py``,
``segm/model/utils.py:110-181`` (window inference) and
``segm/scripts/show_attn_map.py``.
"""

from floodseg_tpu.segm.inference import sliding_inference
from floodseg_tpu.segm.data import SegFolderDataset
from floodseg_tpu.segm.attn import attention_maps

__all__ = ["sliding_inference", "SegFolderDataset", "attention_maps"]

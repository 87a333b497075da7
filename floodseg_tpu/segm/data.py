"""Folder-layout segmentation datasets for the standalone Segmenter.

The reference wraps mmseg datasets (ADE20k / Cityscapes / Pascal-Context,
segm/data/*.py) behind mmcv pipelines. TPU redesign: one generic
``SegFolderDataset`` over the common on-disk convention — an image directory
plus an annotation directory with matching stems — driven by the SAME
host-side transform pipeline the main project uses (dict Samples,
explicit np.random.Generator). The mmseg train pipeline (resize by ratio
0.5-2.0, crop, hflip, normalize, pad-with-ignore) maps 1:1 onto
RandScale/Crop/RandomHorizontalFlip/Normalize.

ADE20k's layout (images/training + annotations/training, labels 1..150 with
0=unlabeled) is an instance: pass ``reduce_zero_label=True`` and the labels
shift to 0..149 with 255 ignore (segm/data/ade20k.py semantics).
"""

import os
from typing import Callable, List, Optional

import numpy as np
from PIL import Image

from floodseg_tpu.data.transforms import (
    Compose, RandScale, Crop, RandomHorizontalFlip, Normalize, Resize,
    MEAN, STD,
)

IGNORE_LABEL = 255


def build_train_pipeline(im_size: int, crop_size: int,
                         scale_range=(0.5, 2.0)) -> Compose:
    """mmseg-style train pipeline at Segmenter defaults
    (segm/data/base.py: ratio 0.5-2.0 resize, crop, hflip, normalize)."""
    return Compose([
        Resize((im_size, im_size)),
        RandScale(scale_range),
        Crop((crop_size, crop_size), crop_type="rand", padding=MEAN,
             ignore_label=IGNORE_LABEL),
        RandomHorizontalFlip(),
        Normalize(MEAN, STD),
    ])


class ResizeShortSide:
    """Resize frames so the short side equals ``size`` (aspect preserved),
    leaving the label untouched at its original annotation resolution — the
    mmseg eval protocol (reference segm/data/base.py test pipeline +
    segm/eval/miou.py): mIoU is computed at ori_shape by resizing the
    predicted probability map back, never by resampling the label."""

    def __init__(self, size: int):
        self.size = int(size)

    def __call__(self, sample, rng):
        import cv2
        im = sample["frame_current"]
        h, w = im.shape[:2]
        s = self.size / min(h, w)
        nh, nw = max(1, int(round(h * s))), max(1, int(round(w * s)))
        sample["frame_current"] = cv2.resize(
            im, (nw, nh), interpolation=cv2.INTER_LINEAR)
        return sample


def build_eval_pipeline(im_size: int) -> Compose:
    """Short-side resize (aspect preserved, label kept at ori resolution) +
    normalize; evaluation slides windows and scores at the label's shape."""
    return Compose([
        ResizeShortSide(im_size),
        Normalize(MEAN, STD),
    ])


class SegFolderDataset:
    """(image, mask) pairs from parallel directories.

    img_dir/stem<img_suffix> + ann_dir/stem<ann_suffix>; every image with a
    matching annotation is an item (sorted by stem for determinism).
    """

    def __init__(self, img_dir: str, ann_dir: str,
                 img_suffix: str = ".jpg", ann_suffix: str = ".png",
                 transform: Optional[Callable] = None,
                 reduce_zero_label: bool = False):
        self.img_dir = img_dir
        self.ann_dir = ann_dir
        self.img_suffix = img_suffix
        self.ann_suffix = ann_suffix
        self.transform = transform
        self.reduce_zero_label = reduce_zero_label
        stems = sorted(
            f[: -len(img_suffix)] for f in os.listdir(img_dir)
            if f.endswith(img_suffix)
        )
        self.items: List[str] = [
            s for s in stems
            if os.path.exists(os.path.join(ann_dir, s + ann_suffix))
        ]
        if not self.items:
            raise FileNotFoundError(
                f"no (image, annotation) pairs under {img_dir} / {ann_dir}")

    def __len__(self):
        return len(self.items)

    def get(self, index: int, rng: np.random.Generator):
        stem = self.items[index]
        image = np.asarray(
            Image.open(os.path.join(self.img_dir, stem + self.img_suffix))
            .convert("RGB")).astype(np.float32)
        label = np.asarray(
            Image.open(os.path.join(self.ann_dir, stem + self.ann_suffix)))
        label = label.astype(np.int32)
        if self.reduce_zero_label:
            # ADE20k: 0 = unlabeled -> ignore; classes shift to 0-based
            label = np.where(label == 0, IGNORE_LABEL + 1, label) - 1
        sample = {"frame_current": image, "label": label}
        if self.transform is not None:
            sample = self.transform(sample, rng)
        sample["label"] = np.asarray(sample["label"], dtype=np.int32)
        return sample

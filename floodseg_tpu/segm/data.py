"""Folder-layout segmentation datasets for the standalone Segmenter.

The reference wraps mmseg datasets (ADE20k / Cityscapes / Pascal-Context,
segm/data/*.py) behind mmcv pipelines. TPU redesign: one generic
``SegFolderDataset`` over the common on-disk convention — an image directory
plus an annotation directory with matching stems — driven by the SAME
host-side transform pipeline style the main project uses (dict Samples,
explicit np.random.Generator). ``segm_dataset`` is the named registry
(segm/data/factory.py parity): each preset wires its standard layout,
n_cls / names / palette metadata (segm/catalog.py), and the FAITHFUL mmseg
train/eval pipeline (segm/pipeline.py — ratio-range keep-ratio resize,
cat_max_ratio crop, PhotoMetricDistortion, pad-with-ignore).
``build_train_pipeline`` below is the simpler flood-style approximation
kept for ad-hoc --img-dir/--ann-dir folder runs.

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


# reference segm/data/utils.py STATS: the [0,1]-range normalization pairs
# used by the vendored Segmenter's classification pipeline
CLS_STATS = {
    "vit": {"mean": (0.5, 0.5, 0.5), "std": (0.5, 0.5, 0.5)},
    "deit": {"mean": (0.485, 0.456, 0.406), "std": (0.229, 0.224, 0.225)},
}


class ImageFolderClsDataset:
    """Classification dataset over the torchvision ImageFolder convention
    (root/<class_name>/*.jpg, classes sorted by name), as used by the
    reference's ImagenetDataset (segm/data/imagenet.py).

    val: short-side resize to im_size+32 (bicubic) + center crop + [0,1]
    normalize; train: RandomResizedCrop + hflip (imagenet.py:33-48).
    Items: {"im": (crop, crop, 3) float32 normalized, "target": int}.
    """

    def __init__(self, root: str, image_size: int = 224,
                 crop_size: int = 224, split: str = "val",
                 normalization: str = "vit"):
        self.root = root
        self.image_size = image_size
        self.crop_size = crop_size
        self.split = split
        stats = CLS_STATS[normalization]
        self.mean = np.asarray(stats["mean"], np.float32)
        self.std = np.asarray(stats["std"], np.float32)
        classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d)))
        if not classes:
            raise FileNotFoundError(f"no class directories under {root}")
        self.classes = classes
        self.items = []
        exts = (".jpg", ".jpeg", ".png", ".bmp")
        for ci, c in enumerate(classes):
            cdir = os.path.join(root, c)
            for f in sorted(os.listdir(cdir)):
                if f.lower().endswith(exts):
                    self.items.append((os.path.join(cdir, f), ci))
        self.n_cls = len(classes)

    def __len__(self):
        return len(self.items)

    def get(self, index: int, rng: np.random.Generator):
        import cv2
        path, target = self.items[index]
        im = np.asarray(Image.open(path).convert("RGB"))
        h, w = im.shape[:2]
        cs = self.crop_size
        if self.split == "train":
            # RandomResizedCrop(scale 0.08-1, ratio 3/4-4/3) + hflip
            cropped = False
            for _ in range(10):
                area = h * w * rng.uniform(0.08, 1.0)
                ratio = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
                cw = int(round(np.sqrt(area * ratio)))
                ch = int(round(np.sqrt(area / ratio)))
                if cw <= w and ch <= h:
                    y0 = rng.integers(0, h - ch + 1)
                    x0 = rng.integers(0, w - cw + 1)
                    im = im[y0:y0 + ch, x0:x0 + cw]
                    cropped = True
                    break
            if not cropped:
                # torchvision fallback: center crop with the aspect ratio
                # clamped to [3/4, 4/3] (never the raw distorted image)
                in_ratio = w / h
                if in_ratio < 3 / 4:
                    cw, ch = w, min(h, int(round(w / (3 / 4))))
                elif in_ratio > 4 / 3:
                    cw, ch = min(w, int(round(h * (4 / 3)))), h
                else:
                    cw, ch = w, h
                y0 = (h - ch) // 2
                x0 = (w - cw) // 2
                im = im[y0:y0 + ch, x0:x0 + cw]
            im = cv2.resize(im, (cs, cs), interpolation=cv2.INTER_CUBIC)
            if rng.random() < 0.5:
                im = im[:, ::-1]
        else:
            # Resize(image_size + 32, bicubic) short side + CenterCrop
            s = (self.image_size + 32) / min(h, w)
            nh, nw = int(round(h * s)), int(round(w * s))
            im = cv2.resize(im, (nw, nh), interpolation=cv2.INTER_CUBIC)
            y0 = max(0, (nh - cs) // 2)
            x0 = max(0, (nw - cs) // 2)
            im = im[y0:y0 + cs, x0:x0 + cs]
        im = (im.astype(np.float32) / 255.0 - self.mean) / self.std
        return {"im": np.ascontiguousarray(im), "target": np.int32(target)}


class SegFolderDataset:
    """(image, mask) pairs from parallel directories.

    img_dir/stem<img_suffix> + ann_dir/stem<ann_suffix>; every image with a
    matching annotation is an item (sorted by stem for determinism).
    """

    def __init__(self, img_dir: str, ann_dir: str,
                 img_suffix: str = ".jpg", ann_suffix: str = ".png",
                 transform: Optional[Callable] = None,
                 reduce_zero_label: bool = False,
                 recursive: bool = False):
        self.img_dir = img_dir
        self.ann_dir = ann_dir
        self.img_suffix = img_suffix
        self.ann_suffix = ann_suffix
        self.transform = transform
        self.reduce_zero_label = reduce_zero_label
        if recursive:
            # nested layouts (Cityscapes' per-city subdirectories,
            # leftImg8bit/<split>/<city>/*_leftImg8bit.png mirrored under
            # gtFine): stems carry the relative subpath
            stems = sorted(
                os.path.relpath(os.path.join(d, f), img_dir)[:-len(img_suffix)]
                for d, _, fs in os.walk(img_dir)
                for f in fs if f.endswith(img_suffix))
        else:
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


class SegListDataset(SegFolderDataset):
    """(image, mask) pairs named by a split file of stems — the VOC-style
    layout PascalContext uses (mmseg PascalContextDataset semantics).
    Loading/transform behavior is SegFolderDataset's; only item discovery
    differs."""

    def __init__(self, img_dir: str, ann_dir: str, split_file: str,
                 img_suffix: str = ".jpg", ann_suffix: str = ".png",
                 transform: Optional[Callable] = None,
                 reduce_zero_label: bool = False):
        self.img_dir = img_dir
        self.ann_dir = ann_dir
        self.img_suffix = img_suffix
        self.ann_suffix = ann_suffix
        self.transform = transform
        self.reduce_zero_label = reduce_zero_label
        with open(split_file) as f:
            stems = [ln.strip() for ln in f if ln.strip()]
        self.items = [
            s for s in stems
            if os.path.exists(os.path.join(ann_dir, s + ann_suffix))
        ]
        if not self.items:
            raise FileNotFoundError(
                f"no annotated stems from {split_file} under {ann_dir}")


def segm_presets():
    """Per-dataset constants mirroring the reference's config files
    (segm/data/config/{ade20k,cityscapes,pascal_context}.py): class count,
    the file's ``max_ratio`` literal (ade20k.py:10 -> 4, cityscapes.py:8 ->
    2, pascal_context.py:10 -> 8), zero-label reduction, names + palette."""
    from floodseg_tpu.segm import catalog

    return {
        "ade20k": dict(n_cls=150, max_ratio=4, reduce_zero_label=True,
                       names=catalog.ADE20K_NAMES,
                       palette=catalog.ADE20K_PALETTE),
        "cityscapes": dict(n_cls=19, max_ratio=2, reduce_zero_label=False,
                           names=catalog.CITYSCAPES_NAMES,
                           palette=catalog.CITYSCAPES_PALETTE),
        "pascal_context": dict(n_cls=60, max_ratio=8,
                               reduce_zero_label=False,
                               names=catalog.PASCAL_CONTEXT_NAMES,
                               palette=catalog.PASCAL_CONTEXT_PALETTE),
    }


def segm_dataset(name: str, root: str, split: str = "train",
                 image_size: int = 512, crop_size: int = 512,
                 normalization: str = "vit"):
    """Named-dataset factory mirroring the reference's registry
    (segm/data/factory.py + segm/data/{ade20k,cityscapes,pascal_context}.py):
    returns a dataset wired with the faithful mmseg train/eval pipeline and
    carrying n_cls / names / palette / max_ratio metadata.

    Layouts (the standard public ones the reference's configs point at):
      ade20k:         root/images/{training,validation} +
                      root/annotations/{...}; labels 1..150, 0=unlabeled ->
                      reduce_zero_label; max_ratio 4
      cityscapes:     root/leftImg8bit/<split>/<city>/*_leftImg8bit.png +
                      root/gtFine/<split>/<city>/*_gtFine_labelTrainIds.png;
                      19 train classes; max_ratio 2 (2048x1024 frames)
      pascal_context: root/VOCdevkit/VOC2010 (VOC-style split lists);
                      60 classes; max_ratio 8 (config/pascal_context.py:10;
                      at ~1.6 image aspect the keep-ratio factor is bound
                      by the short side, so ratios 3..8 behave identically
                      on real VOC frames — the binding still follows the
                      reference file)
    """
    from floodseg_tpu.segm.pipeline import (
        build_mmseg_train_pipeline, build_mmseg_eval_pipeline,
    )

    presets = segm_presets()
    if name not in presets:
        raise ValueError(f"unknown dataset {name!r}; have {sorted(presets)}")
    meta = presets[name]
    if split == "train":
        tf = build_mmseg_train_pipeline(image_size, crop_size,
                                        max_ratio=meta["max_ratio"],
                                        normalization=normalization)
    else:
        tf = build_mmseg_eval_pipeline(image_size,
                                       max_ratio=meta["max_ratio"],
                                       normalization=normalization)

    if name == "ade20k":
        sub = {"train": "training", "val": "validation"}.get(split, split)
        ds = SegFolderDataset(
            os.path.join(root, "images", sub),
            os.path.join(root, "annotations", sub),
            img_suffix=".jpg", ann_suffix=".png", transform=tf,
            reduce_zero_label=True)
    elif name == "cityscapes":
        ds = SegFolderDataset(
            os.path.join(root, "leftImg8bit", split),
            os.path.join(root, "gtFine", split),
            img_suffix="_leftImg8bit.png",
            ann_suffix="_gtFine_labelTrainIds.png",
            transform=tf, recursive=True)
    else:
        ds = pascal_context_dataset(root, split=split, transform=tf)
    ds.n_cls = meta["n_cls"]
    ds.ignore_label = IGNORE_LABEL
    ds.names = meta["names"]
    ds.palette = meta["palette"]
    ds.max_ratio = meta["max_ratio"]
    return ds


def pascal_context_dataset(root: str, split: str = "train",
                           transform: Optional[Callable] = None):
    """PascalContext (60 classes, ignore 255) over the VOC2010 layout the
    reference targets (segm/data/pascal_context.py): root/VOCdevkit/VOC2010
    with JPEGImages, SegmentationClassContext and
    ImageSets/SegmentationContext/{train,val}.txt. The test split is invalid
    for Pascal Context, exactly like the reference raises."""
    if split == "test":
        raise ValueError("Test split is not valid for Pascal Context dataset")
    voc = os.path.join(root, "VOCdevkit", "VOC2010")
    ds = SegListDataset(
        os.path.join(voc, "JPEGImages"),
        os.path.join(voc, "SegmentationClassContext"),
        os.path.join(voc, "ImageSets", "SegmentationContext", f"{split}.txt"),
        transform=transform,
    )
    ds.n_cls = 60
    ds.ignore_label = IGNORE_LABEL
    return ds

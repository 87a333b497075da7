"""Lay out a downloaded segmentation dataset for SegFolderDataset.

python scripts/prepare_seg_dataset.py {ade20k,cityscapes} SRC DST

TPU-repo equivalent of the reference's segm/scripts/prepare_{ade20k,
cityscapes}.py CONVERSION steps (the download halves need network access;
this image has none — fetch the archives elsewhere and point SRC at them):

- ade20k: SRC = ADEChallengeData2016/ — already images/<split> +
  annotations/<split> with matching stems; verified and symlinked through.
  Train with --reduce-zero-label (labels are 1..150, 0 = unlabeled).
- cityscapes: SRC holds leftImg8bit/<split>/<city>/*_leftImg8bit.png and
  gtFine/<split>/<city>/*_gtFine_labelIds.png; labelIds are converted to
  the standard 19 trainIds (everything else -> 255 ignore) and both sides
  are flattened into DST/images/<split> + DST/annotations/<split> with
  matching stems.
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

# Cityscapes labelId -> trainId (the public 19-class evaluation mapping;
# all other ids are ignore=255)
CITYSCAPES_ID_TO_TRAIN = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}


def _link_or_copy(src: str, dst: str):
    if os.path.exists(dst):
        return
    try:
        os.symlink(os.path.abspath(src), dst)
    except OSError:
        import shutil
        shutil.copy2(src, dst)


def prepare_ade20k(src: str, dst: str):
    n = 0
    for split in ("training", "validation"):
        img_src = os.path.join(src, "images", split)
        ann_src = os.path.join(src, "annotations", split)
        if not os.path.isdir(img_src):
            raise SystemExit(f"missing {img_src} — SRC should be "
                             f"ADEChallengeData2016/")
        img_dst = os.path.join(dst, "images", split)
        ann_dst = os.path.join(dst, "annotations", split)
        os.makedirs(img_dst, exist_ok=True)
        os.makedirs(ann_dst, exist_ok=True)
        for f in sorted(os.listdir(img_src)):
            if not f.endswith(".jpg"):
                continue
            stem = f[:-4]
            ann = os.path.join(ann_src, stem + ".png")
            if not os.path.exists(ann):
                continue
            _link_or_copy(os.path.join(img_src, f),
                          os.path.join(img_dst, f))
            _link_or_copy(ann, os.path.join(ann_dst, stem + ".png"))
            n += 1
    print(f"ade20k: {n} pairs; train SegFolderDataset with "
          f"reduce_zero_label=True (--n-cls 150)")


def prepare_cityscapes(src: str, dst: str):
    lut = np.full(256, 255, np.uint8)
    for k, v in CITYSCAPES_ID_TO_TRAIN.items():
        lut[k] = v
    n = 0
    for split in ("train", "val"):
        img_root = os.path.join(src, "leftImg8bit", split)
        ann_root = os.path.join(src, "gtFine", split)
        if not os.path.isdir(img_root):
            raise SystemExit(f"missing {img_root}")
        img_dst = os.path.join(dst, "images", split)
        ann_dst = os.path.join(dst, "annotations", split)
        os.makedirs(img_dst, exist_ok=True)
        os.makedirs(ann_dst, exist_ok=True)
        for city in sorted(os.listdir(img_root)):
            cdir = os.path.join(img_root, city)
            for f in sorted(os.listdir(cdir)):
                if not f.endswith("_leftImg8bit.png"):
                    continue
                stem = f[: -len("_leftImg8bit.png")]
                ann = os.path.join(ann_root, city,
                                   stem + "_gtFine_labelIds.png")
                if not os.path.exists(ann):
                    continue
                _link_or_copy(os.path.join(cdir, f),
                              os.path.join(img_dst, stem + ".png"))
                ids = np.asarray(Image.open(ann))
                Image.fromarray(lut[ids]).save(
                    os.path.join(ann_dst, stem + ".png"))
                n += 1
    print(f"cityscapes: {n} pairs converted to 19 trainIds "
          f"(--n-cls 19, img suffix .png)")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=["ade20k", "cityscapes"])
    p.add_argument("src")
    p.add_argument("dst")
    args = p.parse_args(argv)
    {"ade20k": prepare_ade20k, "cityscapes": prepare_cityscapes}[
        args.dataset](args.src, args.dst)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

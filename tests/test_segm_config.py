"""ade20k config golden test: ties the restated mmseg pipelines to the
CONCRETE reference config — /root/reference/segm/data/config/ade20k.py as
patched by BaseMMSeg.update_default_config (segm/data/base.py:46-80) — not
just op-by-op semantics (those live in tests/test_segm.py).

Pins, against the reference file's literals:
- the exact op sequence and every parameter the patched train pipeline
  carries (img_scale=(4*S, S), ratio_range=(0.5, 2.0), crop cat_max_ratio
  0.75, flip 0.5, PhotoMetricDistortion defaults, Pad 0/255);
- the normalization quirk: base.py:35 ROUNDS 255*stat to 2 decimals, so
  deit std is 58.4/57.12/57.38 — not the imagenet 58.395/57.12/57.375;
- a golden end-to-end eval transform computed INDEPENDENTLY in-test with
  direct cv2/np math (mmcv imrescale sizing + imnormalize);
- a frozen composite-train-pipeline checksum on a fixture (drift alarm).
"""

import numpy as np
import cv2

from floodseg_tpu.segm.pipeline import (
    IGNORE_LABEL,
    PadToSize,
    PhotoMetricDistortion,
    RandomCropCatMax,
    RatioRangeResize,
    build_mmseg_eval_pipeline,
    build_mmseg_train_pipeline,
    _stats255,
)
from floodseg_tpu.data.transforms import Normalize, RandomHorizontalFlip


def _fixture(h=64, w=96, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        (xx * 255 / w), (yy * 255 / h), ((xx + yy) * 255 / (h + w))
    ], axis=-1).astype(np.uint8)
    img = np.clip(img + rng.integers(0, 20, img.shape), 0, 255).astype(np.uint8)
    label = ((xx // 16 + yy // 16) % 5).astype(np.uint8)
    label[:4] = 255
    return img, label


def test_ade20k_train_pipeline_matches_reference_config():
    """The patched ade20k train_pipeline, op for op, parameter for
    parameter (config/ade20k.py:9-21 + base.py:46-80 overrides)."""
    S = 512
    pipe = build_mmseg_train_pipeline(image_size=S, crop_size=S,
                                      max_ratio=4, normalization="vit")
    ops = pipe.transforms
    assert [type(o).__name__ for o in ops] == [
        "RatioRangeResize",       # Resize(img_scale=(2048, 512),
                                  #        ratio_range=(0.5, 2.0))
        "RandomCropCatMax",       # RandomCrop(crop, cat_max_ratio=0.75)
        "RandomHorizontalFlip",   # RandomFlip(prob=0.5)
        "PhotoMetricDistortion",
        "Normalize",
        "PadToSize",              # Pad(size=crop, pad_val=0, seg_pad_val=255)
    ]
    rr, crop, flip, pmd, norm, pad = ops
    assert rr.img_scale == (4 * S, S) and rr.ratio_range == (0.5, 2.0)
    assert crop.crop_size == (S, S) and crop.cat_max_ratio == 0.75
    assert flip.p == 0.5
    # mmseg PhotoMetricDistortion defaults (the config passes none)
    assert pmd.brightness_delta == 32
    assert tuple(pmd.contrast_range) == (0.5, 1.5)
    assert tuple(pmd.saturation_range) == (0.5, 1.5)
    assert pmd.hue_delta == 18
    np.testing.assert_array_equal(norm.mean, [127.5, 127.5, 127.5])
    np.testing.assert_array_equal(norm.std, [127.5, 127.5, 127.5])
    assert pad.size == (S, S) and pad.pad_val == 0
    assert pad.seg_pad_val == IGNORE_LABEL == 255


def test_normalization_rounding_quirk():
    """segm/data/base.py:35 rounds 255*stat to TWO decimals; deit's values
    therefore differ from the canonical imagenet constants."""
    mean, std = _stats255("deit")
    # np.round(123.675, 2) -> 123.68 (float repr 123.67500...01 rounds up);
    # imagenet's canonical constant is 123.675
    assert mean == [123.68, 116.28, 103.53]
    assert std == [58.4, 57.12, 57.38]        # ... and 58.395 / 57.375
    mean_v, std_v = _stats255("vit")
    assert mean_v == std_v == [127.5, 127.5, 127.5]


def test_ade20k_eval_golden_independent_math():
    """Eval transform vs direct cv2/np: keep-ratio imrescale sizing
    (factor = min(max(scale)/long, min(scale)/short), new size =
    int(dim * factor + 0.5)) then (x - 127.5) / 127.5; the label must pass
    through untouched at annotation resolution."""
    img, label = _fixture()
    pipe = build_mmseg_eval_pipeline(image_size=128, max_ratio=4,
                                     normalization="vit")
    out = pipe({"frame_current": img.copy(), "label": label.copy()},
               np.random.default_rng(0))

    h, w = img.shape[:2]                      # (64, 96)
    factor = min(4 * 128 / max(h, w), 128 / min(h, w))   # -> 2.0
    nh, nw = int(h * factor + 0.5), int(w * factor + 0.5)  # (128, 192)
    exp = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    exp = (exp.astype(np.float32) - 127.5) / 127.5
    assert out["frame_current"].shape == (128, 192, 3)
    np.testing.assert_array_equal(out["frame_current"], exp)
    np.testing.assert_array_equal(out["label"], label)


def test_ade20k_train_golden_frozen():
    """Composite train pipeline on a fixture with a fixed rng: frozen
    output statistics catch ANY behavioral drift in the composition (op
    order, rng draw order, interpolation, padding). Scaled-down sizes;
    the parameter binding at the real 512 sizes is pinned above."""
    img, label = _fixture()
    pipe = build_mmseg_train_pipeline(image_size=64, crop_size=64,
                                      max_ratio=4, normalization="vit")
    s1 = pipe({"frame_current": img.copy(), "label": label.copy()},
              np.random.default_rng(42))
    s2 = pipe({"frame_current": img.copy(), "label": label.copy()},
              np.random.default_rng(42))
    assert s1["frame_current"].shape == (64, 64, 3)
    assert s1["label"].shape == (64, 64)
    # determinism under the explicit-rng discipline
    np.testing.assert_array_equal(s1["frame_current"], s2["frame_current"])
    np.testing.assert_array_equal(s1["label"], s2["label"])
    # frozen checksums (computed at freeze time; any drift trips them)
    got = (round(float(s1["frame_current"].mean()), 6),
           round(float(s1["frame_current"].std()), 6),
           int(s1["label"][s1["label"] != 255].sum()),
           int((s1["label"] == 255).sum()))
    assert got == GOLDEN_TRAIN_STATS, got


GOLDEN_TRAIN_STATS = (0.113764, 0.322735, 9822, 0)  # frozen 2026-08-20


def test_cityscapes_train_pipeline_matches_reference_config():
    """cityscapes config binding (config/cityscapes.py:7-20 + base.py
    overrides): max_ratio=2 -> img_scale=(2048, 1024), crop 768 != S (the
    one reference dataset where crop and image size differ), Pad to the
    CROP size, deit/imagenet normalization with the base.py:35 two-decimal
    rounding. Op sequence identical to ade20k (the configs share it)."""
    S, C = 1024, 768
    pipe = build_mmseg_train_pipeline(image_size=S, crop_size=C,
                                      max_ratio=2, normalization="deit")
    ops = pipe.transforms
    assert [type(o).__name__ for o in ops] == [
        "RatioRangeResize", "RandomCropCatMax", "RandomHorizontalFlip",
        "PhotoMetricDistortion", "Normalize", "PadToSize",
    ]
    rr, crop, flip, pmd, norm, pad = ops
    # config literal img_scale=(2048, 1024) == (max_ratio*S, S)
    assert rr.img_scale == (2048, 1024) and rr.ratio_range == (0.5, 2.0)
    assert crop.crop_size == (C, C) and crop.cat_max_ratio == 0.75
    assert flip.p == 0.5
    np.testing.assert_allclose(norm.mean, [123.68, 116.28, 103.53],
                               rtol=1e-6)  # stored as float32
    np.testing.assert_allclose(norm.std, [58.4, 57.12, 57.38], rtol=1e-6)
    # Pad(size=crop_size): the padded canvas is the crop, not the image size
    assert pad.size == (C, C) and pad.pad_val == 0
    assert pad.seg_pad_val == IGNORE_LABEL == 255


def test_pascal_context_eval_img_scale_binding():
    """pascal_context config: max_ratio=8 (config/pascal_context.py:10), so
    the eval MultiScaleFlipAug img_scale becomes (512*8, 512)
    (config/pascal_context.py:27); the registry must carry the file's
    literal, and the eval resize must bind it."""
    from floodseg_tpu.segm.data import segm_presets

    presets = segm_presets()
    assert presets["pascal_context"]["max_ratio"] == 8
    assert presets["ade20k"]["max_ratio"] == 4
    assert presets["cityscapes"]["max_ratio"] == 2
    pipe = build_mmseg_eval_pipeline(
        image_size=512, max_ratio=presets["pascal_context"]["max_ratio"],
        normalization="vit")
    assert pipe.transforms[0].img_scale == (4096, 512)
    # keep-ratio sizing: a 1.6-aspect frame is short-side-bound, so ratios
    # 3..8 coincide on real VOC shapes (the binding, not behavior, differs)
    img = np.zeros((375, 500, 3), np.uint8)
    out = pipe({"frame_current": img}, np.random.default_rng(0))
    f = min(4096 / 500, 512 / 375)
    assert out["frame_current"].shape[:2] == (
        int(375 * f + 0.5), int(500 * f + 0.5))


def test_cityscapes_train_golden_frozen_crop_ne_image():
    """Composite train pipeline with crop != image_size (the cityscapes
    shape regime, scaled down) under a fixed rng: frozen output statistics
    catch drift in the crop/pad interaction that the ade20k golden (crop ==
    S) cannot see."""
    img, label = _fixture()
    pipe = build_mmseg_train_pipeline(image_size=64, crop_size=48,
                                      max_ratio=2, normalization="deit")
    s1 = pipe({"frame_current": img.copy(), "label": label.copy()},
              np.random.default_rng(7))
    s2 = pipe({"frame_current": img.copy(), "label": label.copy()},
              np.random.default_rng(7))
    assert s1["frame_current"].shape == (48, 48, 3)
    assert s1["label"].shape == (48, 48)
    np.testing.assert_array_equal(s1["frame_current"], s2["frame_current"])
    np.testing.assert_array_equal(s1["label"], s2["label"])
    got = (round(float(s1["frame_current"].mean()), 6),
           round(float(s1["frame_current"].std()), 6),
           int(s1["label"][s1["label"] != 255].sum()),
           int((s1["label"] == 255).sum()))
    assert got == GOLDEN_CITYSCAPES_TRAIN_STATS, got


GOLDEN_CITYSCAPES_TRAIN_STATS = (0.795162, 0.634381, 2992, 0)  # frozen 2026-08-20

"""Host-side augmentation pipeline (numpy + cv2).

One unified implementation of the reference's two transform modules
(/root/reference/util/transform.py and /root/reference/flow/transform.py):
transforms operate on a ``Sample`` dict carrying any subset of
{frame_current, frame_prev, frame_next, mvs_left, mvs_right, label} so the
single-frame pipeline is just the flow pipeline with only frame_current set.

Differences from the reference (deliberate):
- Explicit ``np.random.Generator`` instead of the global ``random`` module —
  reproducible per-item augmentation under parallel loading (SURVEY §7 hard
  part: PRNG discipline).
- Images stay HWC float32 numpy (NHWC is the device layout); no CHW tensors.
"""

from typing import Dict, List, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from floodseg_tpu.video.grid import crop_motion_vectors_np, flip_grid_np

# ImageNet mean/std scaled by 255 (reference base/foundation.py:27-31)
MEAN = [0.485 * 255, 0.456 * 255, 0.406 * 255]
STD = [0.229 * 255, 0.224 * 255, 0.225 * 255]

Sample = Dict[str, object]
_FRAMES = ("frame_current", "frame_prev", "frame_next")
_GRIDS = ("mvs_left", "mvs_right")


def _map_frames(sample: Sample, fn) -> Sample:
    for k in _FRAMES:
        if sample.get(k) is not None:
            sample[k] = fn(sample[k])
    return sample


def _map_grids(sample: Sample, fn) -> Sample:
    for k in _GRIDS:
        if sample.get(k) is not None:
            sample[k] = [fn(m) for m in sample[k]]
    return sample


class Compose:
    def __init__(self, transforms):
        self.transforms = [t for t in transforms if t is not None]

    def __call__(self, sample: Sample, rng: np.random.Generator) -> Sample:
        for t in self.transforms:
            sample = t(sample, rng)
        return sample


class IgnoreClasses:
    """Project a set of classes to Background (class 0)."""

    def __init__(self, classes_to_ignore=None):
        self.classes = list(classes_to_ignore or [])

    def __call__(self, sample, rng):
        label = sample.get("label")
        if label is not None:
            for c in self.classes:
                label = np.where(label == c, 0, label)
            sample["label"] = label
        return sample


class Resize:
    """Resize to fixed (h, w): frames INTER_LINEAR, label INTER_NEAREST.
    Grids are untouched (normalized coords are resolution independent)."""

    def __init__(self, size):
        self.size = tuple(size)  # (h, w)

    def __call__(self, sample, rng):
        h, w = self.size
        _map_frames(sample, lambda im: cv2.resize(im, (w, h), interpolation=cv2.INTER_LINEAR))
        if sample.get("label") is not None:
            sample["label"] = cv2.resize(
                sample["label"], (w, h), interpolation=cv2.INTER_NEAREST
            )
        return sample


class RandScale:
    def __init__(self, scale, aspect_ratio=None):
        assert 0 < scale[0] <= scale[1]
        self.scale = scale
        self.aspect_ratio = aspect_ratio

    def __call__(self, sample, rng):
        s = self.scale[0] + (self.scale[1] - self.scale[0]) * rng.random()
        ar = 1.0
        if self.aspect_ratio is not None:
            ar = self.aspect_ratio[0] + (
                self.aspect_ratio[1] - self.aspect_ratio[0]
            ) * rng.random()
            ar = float(np.sqrt(ar))
        fx, fy = s * ar, s / ar
        _map_frames(
            sample,
            lambda im: cv2.resize(im, None, fx=fx, fy=fy, interpolation=cv2.INTER_LINEAR),
        )
        if sample.get("label") is not None:
            sample["label"] = cv2.resize(
                sample["label"], None, fx=fx, fy=fy, interpolation=cv2.INTER_NEAREST
            )
        return sample


class RandRotate:
    """Random rotation. NOT grid-safe: the reference only enables it in the
    single-frame pipeline or with no_warp (flow/base.py:384-385)."""

    def __init__(self, rotate, padding, ignore_label=255, p=0.5):
        self.rotate = rotate
        self.padding = padding
        self.ignore_label = ignore_label
        self.p = p

    def __call__(self, sample, rng):
        if rng.random() >= self.p:
            return sample
        angle = self.rotate[0] + (self.rotate[1] - self.rotate[0]) * rng.random()
        ref = sample.get("label")
        if ref is None:
            ref = sample["frame_current"]
        h, w = ref.shape[:2]
        m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1)
        _map_frames(
            sample,
            lambda im: cv2.warpAffine(
                im, m, (w, h), flags=cv2.INTER_LINEAR,
                borderMode=cv2.BORDER_CONSTANT, borderValue=self.padding,
            ),
        )
        if sample.get("label") is not None:
            sample["label"] = cv2.warpAffine(
                sample["label"], m, (w, h), flags=cv2.INTER_NEAREST,
                borderMode=cv2.BORDER_CONSTANT, borderValue=self.ignore_label,
            )
        return sample


class RandomGaussianBlur:
    def __init__(self, radius=5):
        self.radius = radius

    def __call__(self, sample, rng):
        if rng.random() < 0.5:
            _map_frames(
                sample, lambda im: cv2.GaussianBlur(im, (self.radius, self.radius), 0)
            )
        return sample


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, sample, rng):
        if rng.random() >= self.p:
            return sample
        _map_frames(sample, lambda im: cv2.flip(im, 1))
        _map_grids(sample, flip_grid_np)
        if sample.get("label") is not None:
            sample["label"] = cv2.flip(sample["label"], 1)
        return sample


class Crop:
    """rand/center crop with mean/ignore padding when smaller than the crop.

    Grids are renormalized to the crop window (flow/transform.py:209-210).
    """

    def __init__(self, size, crop_type="center", padding=None, ignore_label=255):
        self.crop_h, self.crop_w = (size, size) if isinstance(size, int) else size
        assert crop_type in ("rand", "center")
        self.crop_type = crop_type
        self.padding = padding
        self.ignore_label = ignore_label

    def __call__(self, sample, rng):
        ref = sample.get("label")
        if ref is None:
            for k in _FRAMES:
                if sample.get(k) is not None:
                    ref = sample[k]
                    break
        h, w = ref.shape[:2]
        pad_h = max(self.crop_h - h, 0)
        pad_w = max(self.crop_w - w, 0)
        if pad_h > 0 or pad_w > 0:
            if self.padding is None:
                raise RuntimeError(
                    f"Crop to {self.crop_h}x{self.crop_w} requires padding a "
                    f"{h}x{w} input, but no padding value was configured")
            t, b_ = pad_h // 2, pad_h - pad_h // 2
            l, r = pad_w // 2, pad_w - pad_w // 2

            def pad_img(im):
                return cv2.copyMakeBorder(
                    im, t, b_, l, r, cv2.BORDER_CONSTANT, value=self.padding
                )

            _map_frames(sample, pad_img)
            if sample.get("label") is not None:
                sample["label"] = cv2.copyMakeBorder(
                    sample["label"], t, b_, l, r, cv2.BORDER_CONSTANT,
                    value=self.ignore_label,
                )
            ref = sample.get("label")
            if ref is None:
                ref = next(sample[k] for k in _FRAMES if sample.get(k) is not None)
            h, w = ref.shape[:2]

        if self.crop_type == "rand":
            h_off = int(rng.integers(0, h - self.crop_h + 1))
            w_off = int(rng.integers(0, w - self.crop_w + 1))
        else:
            h_off = (h - self.crop_h) // 2
            w_off = (w - self.crop_w) // 2

        def crop_img(im):
            return im[h_off:h_off + self.crop_h, w_off:w_off + self.crop_w]

        _map_frames(sample, crop_img)
        if sample.get("label") is not None:
            sample["label"] = crop_img(sample["label"])
        for k in _GRIDS:
            if sample.get(k) is not None:
                sample[k] = crop_motion_vectors_np(
                    sample[k], h, w, self.crop_h, self.crop_w, h_off, w_off
                )
        return sample


class Normalize:
    """float32 conversion + (x - mean) / std on frames (std optional)."""

    def __init__(self, mean=MEAN, std=STD):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = None if std is None else np.asarray(std, dtype=np.float32)

    def __call__(self, sample, rng):
        def norm(im):
            im = im.astype(np.float32) - self.mean
            if self.std is not None:
                im = im / self.std
            return im

        return _map_frames(sample, norm)


class ToFloat:
    """float32 conversion without normalization (the reference's test
    pipeline normalizes inside net_process instead, foundation.py:299-330)."""

    def __call__(self, sample, rng):
        return _map_frames(sample, lambda im: im.astype(np.float32))


# ---- pipeline builders mirroring BaseDataModule / FlowBaseDataModule ----


def build_train_transform(
    train_h: int,
    train_w: int,
    classes_ignore=None,
    scale_min: float = 0.5,
    scale_max: float = 2.0,
    resize=(1072, 1920),
    with_rotate: bool = True,
    crop_padding=MEAN,
    ignore_index: int = 255,
    normalize: bool = True,
) -> Compose:
    """foundation.py:401-413 (single-frame; with_rotate=False mirrors the
    flow pipeline where grids can't rotate, flow/base.py:375-394).

    ``normalize=False`` leaves raw-pixel floats for fused on-device
    normalization (data.normalize_on_device): frames then cross the
    host->device link at half the bytes as float16."""
    return Compose([
        IgnoreClasses(classes_ignore),
        Resize(resize),
        RandScale([scale_min, scale_max]),
        RandRotate([-10, 10], padding=MEAN, ignore_label=ignore_index) if with_rotate else None,
        RandomGaussianBlur(),
        RandomHorizontalFlip(),
        Crop([train_h, train_w], crop_type="rand", padding=crop_padding,
             ignore_label=ignore_index),
        Normalize() if normalize else ToFloat(),
    ])


def build_val_transform(
    train_h: int,
    train_w: int,
    classes_ignore=None,
    resize=(1072, 1920),
    crop: bool = True,
    crop_padding=MEAN,
    ignore_index: int = 255,
) -> Compose:
    return Compose([
        IgnoreClasses(classes_ignore),
        Resize(resize),
        Crop([train_h, train_w], crop_type="center", padding=crop_padding,
             ignore_label=ignore_index) if crop else None,
        Normalize(),
    ])


def build_test_transform(
    classes_ignore=None,
    resize=(1072, 1920),
    normalize: bool = False,
) -> Compose:
    """Single-frame test pipeline is resize-only, NO normalization
    (normalization happens per-crop in the sliding window, foundation.py
    :417-434); the flow test pipeline normalizes (flow/base.py:412-425)."""
    return Compose([
        IgnoreClasses(classes_ignore),
        Resize(resize),
        Normalize() if normalize else ToFloat(),
    ])

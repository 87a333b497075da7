"""Streaming segmentation metrics.

``intersection_and_union`` matches the reference's
intersectionAndUnion[GPU] (/root/reference/util/util.py:36-64): pixels whose
target is ignore_index are excluded from all three histograms; intersection
counts pixels where pred == target per class. Epoch aggregation (mIoU, mAcc,
allAcc) mirrors /root/reference/base/foundation.py:135-172.
"""

import jax
import jax.numpy as jnp
import numpy as np


def intersection_and_union(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    num_classes: int,
    ignore_index: int = 255,
):
    """Per-class (intersection, union, target-area) counts.

    pred/target: int arrays of identical shape. Returns three (num_classes,)
    float32 vectors. jit-safe (fixed shapes, bincount with static length).
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    target = target.reshape(-1).astype(jnp.int32)
    valid = target != ignore_index
    # route ignored pixels to an overflow bin that we drop
    pred_v = jnp.where(valid, pred, num_classes)
    target_v = jnp.where(valid, target, num_classes)
    inter_v = jnp.where(valid & (pred == target), pred, num_classes)

    area_inter = jnp.bincount(inter_v, length=num_classes + 1)[:num_classes]
    area_pred = jnp.bincount(pred_v, length=num_classes + 1)[:num_classes]
    area_target = jnp.bincount(target_v, length=num_classes + 1)[:num_classes]
    area_union = area_pred + area_target - area_inter
    return (
        area_inter.astype(jnp.float32),
        area_union.astype(jnp.float32),
        area_target.astype(jnp.float32),
    )


def topk_accuracy(logits: jnp.ndarray, targets: jnp.ndarray, topk=(1,)):
    """Top-k classification accuracy percentages (reference
    segm/metrics.py:18-36, the torch/examples imagenet recipe).

    logits: (B, C); targets: (B,). Returns one float per k in ``topk``,
    each in [0, 100].
    """
    maxk = max(topk)
    # indices of the top maxk classes, best first
    _, pred = jax.lax.top_k(logits, maxk)            # (B, maxk)
    correct = pred == targets[:, None].astype(pred.dtype)
    out = []
    for k in topk:
        out.append(jnp.sum(correct[:, :k]).astype(jnp.float32)
                   * (100.0 / targets.shape[0]))
    return out


class MetricMeter:
    """Host-side accumulator of intersection/union/target sums.

    Equivalent of the reference's per-epoch AverageMeter triple
    (/root/reference/base/foundation.py:100-106,135-172).
    """

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        self.intersection = np.zeros(self.num_classes, dtype=np.float64)
        self.union = np.zeros(self.num_classes, dtype=np.float64)
        self.target = np.zeros(self.num_classes, dtype=np.float64)
        self.count = 0

    def update(self, intersection, union, target):
        self.intersection += np.asarray(intersection, dtype=np.float64)
        self.union += np.asarray(union, dtype=np.float64)
        self.target += np.asarray(target, dtype=np.float64)
        self.count += 1

    def iou_per_class(self):
        return self.intersection / np.maximum(self.union, 1e-10)

    def accuracy_per_class(self):
        return self.intersection / np.maximum(self.target, 1e-10)

    def summary(self):
        return {
            "miou": float(np.mean(self.iou_per_class())),
            "macc": float(np.mean(self.accuracy_per_class())),
            "allacc": float(self.intersection.sum() / max(self.target.sum(), 1e-10)),
            "iou_class": self.iou_per_class().tolist(),
            "acc_class": self.accuracy_per_class().tolist(),
        }

    def summary_mmseg(self):
        """mmseg ``mean_iou`` semantics (the vendored Segmenter's protocol:
        reference segm/metrics.py:101-121 wrapping mmseg.core.mean_iou, then
        np.nanmean): per-class IoU = intersect/union and Acc =
        intersect/target are NaN where the denominator is zero, and the
        means EXCLUDE those absent classes. The flood protocol above
        (foundation.py:135-172) instead averages absent classes in as 0 —
        the two disagree whenever the eval split misses a class, so the
        segm side stack must report THIS one to be comparable with
        published mmseg numbers."""
        with np.errstate(invalid="ignore", divide="ignore"):
            iou = np.where(self.union > 0,
                           self.intersection / np.where(self.union > 0,
                                                        self.union, 1.0),
                           np.nan)
            acc = np.where(self.target > 0,
                           self.intersection / np.where(self.target > 0,
                                                        self.target, 1.0),
                           np.nan)
        return {
            "miou": float(np.nanmean(iou)) if np.any(self.union > 0) else 0.0,
            "macc": float(np.nanmean(acc)) if np.any(self.target > 0) else 0.0,
            "allacc": float(self.intersection.sum()
                            / max(self.target.sum(), 1e-10)),
            "iou_class": iou.tolist(),
            "acc_class": acc.tolist(),
        }


class AverageMeter:
    """Scalar running average (reference util/util.py:10-24)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count

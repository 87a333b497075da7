"""Sliding-window inference for the standalone Segmenter.

Reference: segm/model/utils.py:110-181 (sliding_window / merge_windows /
inference). TPU redesign: all windows of an image are stacked into ONE
batched forward (the reference loops with batch_size=1), anchors are
computed on host (static shapes per image size), and the merge runs as a
scatter-add on device.
"""

from typing import Callable, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from floodseg_tpu.ops.resize import resize_bilinear


def window_anchors(length: int, window: int, stride: int) -> List[int]:
    """Anchor offsets covering [0, length) with a final flush window
    (segm/model/utils.py:111-115)."""
    if length <= window:
        return [0]
    anchors = [a for a in range(0, length, stride) if a < length - window]
    return anchors + [length - window]


def sliding_inference(
    forward: Callable,
    variables,
    image: np.ndarray,
    num_classes: int,
    window_size: int,
    window_stride: int,
    ori_shape: Optional[Tuple[int, int]] = None,
    flip: bool = False,
) -> np.ndarray:
    """Softmax probability map (H_ori, W_ori, C) for one image.

    forward(variables, crops) -> (B, ws, ws, C) logits for a batch of
    window crops (jit it once; window shapes are static per config).
    image: (H, W, 3) normalized pixels. When ``flip``, the horizontally
    flipped image's probabilities are averaged in (segm/engine.py uses
    im_metas flip variants).
    """
    h, w = image.shape[:2]
    ori_shape = ori_shape or (h, w)
    ws = min(window_size, h, w)
    # a stride beyond the (possibly shrunken) window would leave uncovered
    # pixels with count 0 -> NaN probabilities; clamp so windows always tile
    window_stride = min(window_stride, ws)

    variants = [image]
    if flip:
        variants.append(image[:, ::-1])

    prob_sum = None
    for im in variants:
        ha = window_anchors(h, ws, window_stride)
        wa = window_anchors(w, ws, window_stride)
        crops = np.stack([im[a:a + ws, b:b + ws] for a in ha for b in wa])
        # Bucket the window count to the next power of two: with aspect-
        # preserving eval resizes n_windows varies per image, and an exact
        # batch shape would recompile the jitted forward for every distinct
        # count. Zero-padded windows are discarded after the forward.
        n = crops.shape[0]
        n_pad = 1 << (n - 1).bit_length()
        if n_pad != n:
            crops = np.concatenate(
                [crops, np.zeros((n_pad - n,) + crops.shape[1:],
                                 crops.dtype)])
        logits = np.asarray(
            forward(variables, jnp.asarray(crops)), np.float32
        )[:n]  # (n_windows, ws, ws, C)

        acc = np.zeros((h, w, num_classes), np.float32)
        cnt = np.zeros((h, w, 1), np.float32)
        i = 0
        for a in ha:
            for b in wa:
                acc[a:a + ws, b:b + ws] += logits[i]
                cnt[a:a + ws, b:b + ws] += 1.0
                i += 1
        logit = jnp.asarray(acc / cnt)[None]
        # per-variant: merge -> resize -> flip-undo -> softmax, THEN average
        # probabilities across variants (segm/model/utils.py:125-147,176-177)
        if ori_shape != (h, w):
            logit = resize_bilinear(logit, ori_shape, align_corners=False)
        prob = np.asarray(jax.nn.softmax(logit[0], axis=-1))
        if im is not variants[0]:
            prob = prob[:, ::-1]
        prob_sum = prob if prob_sum is None else prob_sum + prob

    return prob_sum / len(variants)


def evaluate_dataset(
    forward: Callable,
    variables,
    dataset,
    num_classes: int,
    window_size: int,
    window_stride: int,
    ignore_index: int = 255,
    flip: bool = False,
) -> dict:
    """mmseg-protocol folder evaluation (reference segm/eval/miou.py +
    segm/metrics.py:84-123): slide windows over each eval image, resize the
    merged probability map back to the label's original resolution, score
    with nanmean-over-present-classes IoU/Acc semantics.

    ``dataset`` yields Samples with ``frame_current`` (resized, normalized)
    and ``label`` (kept at original annotation resolution, e.g. via
    ``build_eval_pipeline``). Returns ``MetricMeter.summary_mmseg()``.
    """
    from floodseg_tpu.ops.metrics import MetricMeter, intersection_and_union

    meter = MetricMeter(num_classes)
    erng = np.random.default_rng(0)
    for i in range(len(dataset)):
        s = dataset.get(i, erng)
        prob = sliding_inference(
            forward, variables, s["frame_current"], num_classes,
            window_size, window_stride, ori_shape=tuple(s["label"].shape),
            flip=flip)
        pred = prob.argmax(-1)
        inter, union, tgt = intersection_and_union(
            jnp.asarray(pred), jnp.asarray(s["label"]), num_classes,
            ignore_index)
        meter.update(inter, union, tgt)
    return meter.summary_mmseg()

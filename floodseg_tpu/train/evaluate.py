"""Test-time inference: multi-scale sliding-window with flip averaging.

Reference: BaseModel.test_step / compute_test_output_for_scales / net_process
(/root/reference/base/foundation.py:177-330). Same math, different schedule:
the reference runs one forward PER CROP with host<->device ping-pong per
crop; here all crops of a scale are sliced on the host, normalized and
flip-augmented ON DEVICE, and run as ONE batched jitted forward — the canvas
scatter-add and the final resize stay on the host (they're cheap and
variable-shaped).
"""

import math
from typing import Callable, Dict, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from floodseg_tpu.ops.resize import resize_bilinear

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from floodseg_tpu.data.transforms import MEAN, STD
from floodseg_tpu.ops.resize import resize_bilinear


def crop_offsets(new_h: int, new_w: int, crop_h: int, crop_w: int,
                 stride_rate: float = 2 / 3) -> List[tuple]:
    """Sliding-window start offsets (foundation.py:287-295 grid walk)."""
    stride_h = int(math.ceil(crop_h * stride_rate))
    stride_w = int(math.ceil(crop_w * stride_rate))
    grid_h = int(math.ceil(float(new_h - crop_h) / stride_h) + 1)
    grid_w = int(math.ceil(float(new_w - crop_w) / stride_w) + 1)
    offs = []
    for ih in range(grid_h):
        for iw in range(grid_w):
            e_h = min(ih * stride_h + crop_h, new_h)
            e_w = min(iw * stride_w + crop_w, new_w)
            offs.append((e_h - crop_h, e_w - crop_w))
    return offs


def make_crop_forward(model, num_classes: int, flip: bool = True,
                      mesh=None) -> Callable:
    """Jitted batched net_process: raw uint8-range crops -> softmax probs.

    Normalization (mean/std), optional horizontal flip averaging, bilinear
    up to crop size (align_corners=True) and softmax all run on device
    (foundation.py:299-330).

    With ``mesh`` the crop batch is sharded over the mesh's leading ("data")
    axis and the variables replicated, so sliding-window test inference
    scales over chips (the reference evaluates on one GPU; this is TPU-side
    headroom). Ragged crop batches are padded to a mesh multiple and the
    padding rows dropped — numerically identical to the single-device path
    (per-crop math has no cross-crop coupling in eval mode).
    """
    mean = jnp.asarray(MEAN, dtype=jnp.float32)
    std = jnp.asarray(STD, dtype=jnp.float32)

    def crop_forward(variables, crops):
        x = (crops.astype(jnp.float32) - mean) / std
        if flip:
            x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
        out = model.apply(variables, x, train=False)["pred"]
        out = out[..., :num_classes]
        if out.shape[1] != crops.shape[1] or out.shape[2] != crops.shape[2]:
            out = resize_bilinear(out, crops.shape[1:3], align_corners=True)
        prob = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
        if flip:
            n = crops.shape[0]
            prob = (prob[:n] + prob[n:, :, ::-1, :]) / 2
        return prob

    if mesh is None:
        return jax.jit(crop_forward)

    from floodseg_tpu.parallel.mesh import batch_sharding, replicated_sharding

    jitted = jax.jit(
        crop_forward,
        in_shardings=(replicated_sharding(mesh), batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )
    n_dev = mesh.devices.size

    def dp_crop_forward(variables, crops):
        crops = jnp.asarray(crops)
        n = crops.shape[0]
        rem = (-n) % n_dev
        if rem:
            pad = jnp.broadcast_to(crops[-1:], (rem,) + crops.shape[1:])
            crops = jnp.concatenate([crops, pad], axis=0)
        return jitted(variables, crops)[:n]

    return dp_crop_forward


def sliding_window_predict(
    crop_forward: Callable,
    variables,
    image: np.ndarray,
    num_classes: int,
    crop_h: int,
    crop_w: int,
    out_h: int,
    out_w: int,
    stride_rate: float = 2 / 3,
    max_batch: int = 8,
) -> np.ndarray:
    """Probability map (out_h, out_w, classes) for one pre-scaled image."""
    ori_h, ori_w = image.shape[:2]
    pad_h = max(crop_h - ori_h, 0)
    pad_w = max(crop_w - ori_w, 0)
    ph, pw = pad_h // 2, pad_w // 2
    if pad_h or pad_w:
        image = cv2.copyMakeBorder(
            image, ph, pad_h - ph, pw, pad_w - pw, cv2.BORDER_CONSTANT, value=MEAN
        )
    new_h, new_w = image.shape[:2]
    offs = crop_offsets(new_h, new_w, crop_h, crop_w, stride_rate)

    crops = np.stack(
        [image[sh:sh + crop_h, sw:sw + crop_w] for sh, sw in offs]
    ).astype(np.float32)
    probs = []
    for s in range(0, len(crops), max_batch):
        probs.append(np.asarray(crop_forward(variables, jnp.asarray(crops[s:s + max_batch]))))
    probs = np.concatenate(probs, axis=0)

    canvas = np.zeros((new_h, new_w, num_classes), dtype=np.float64)
    count = np.zeros((new_h, new_w, 1), dtype=np.float64)
    for (sh, sw), p in zip(offs, probs):
        canvas[sh:sh + crop_h, sw:sw + crop_w] += p
        count[sh:sh + crop_h, sw:sw + crop_w] += 1
    canvas /= count
    canvas = canvas[ph:ph + ori_h, pw:pw + ori_w]
    return cv2.resize(canvas.astype(np.float32), (out_w, out_h),
                      interpolation=cv2.INTER_LINEAR)


def multi_scale_test(
    crop_forward: Callable,
    variables,
    image: np.ndarray,
    num_classes: int,
    crop_h: int,
    crop_w: int,
    scales: Sequence[float] = (1.0,),
    base_size: int = 2048,
    stride_rate: float = 2 / 3,
) -> np.ndarray:
    """Full test_step inference for one un-normalized image -> class map.

    image: (H, W, 3) float32 in [0, 255] (the test pipeline is resize-only,
    foundation.py:417-434). Returns (H, W) int predictions.
    """
    h, w = image.shape[:2]
    acc = np.zeros((h, w, num_classes), dtype=np.float64)
    for scale in scales:
        long_size = round(scale * base_size)
        if h > w:
            new_h, new_w = long_size, round(long_size / float(h) * w)
        else:
            new_h, new_w = round(long_size / float(w) * h), long_size
        scaled = cv2.resize(image, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
        acc += sliding_window_predict(
            crop_forward, variables, scaled, num_classes,
            crop_h, crop_w, h, w, stride_rate,
        )
    acc /= len(scales)
    return np.argmax(acc, axis=2)


def flow_sliding_window_test(
    crop_fn: Callable,
    variables,
    batch: Dict,
    num_classes: int,
    crop_h: int,
    crop_w: int,
    stride_rate: float = 2 / 3,
) -> np.ndarray:
    """Flow test inference with crop-wise grid renormalization
    (/root/reference/flow/base.py:182-223).

    ``batch``: single-sample numpy batch with frame_prev/frame_next
    (1, H, W, 3) ALREADY normalized (the flow test pipeline normalizes,
    flow/base.py:412-425), time-major grids (T, 1, gh, gw, 2) and
    left/right_index (1,). All crops run as one device batch. Returns the
    (H, W) argmax class map.
    """
    from floodseg_tpu.video.grid import crop_motion_vectors_stack_np

    fp = np.asarray(batch["frame_prev"])[0]
    fn = np.asarray(batch["frame_next"])[0]
    h, w = fp.shape[:2]
    offs = crop_offsets(h, w, crop_h, crop_w, stride_rate)
    ml_all = np.asarray(batch["mvs_left"])[:, 0]    # (T, bh, bw, 2)
    mr_all = np.asarray(batch["mvs_right"])[:, 0]

    fp_crops, fn_crops, ml_crops, mr_crops = [], [], [], []
    for sh, sw in offs:
        fp_crops.append(fp[sh:sh + crop_h, sw:sw + crop_w])
        fn_crops.append(fn[sh:sh + crop_h, sw:sw + crop_w])
        ml_crops.append(crop_motion_vectors_stack_np(
            ml_all, h, w, crop_h, crop_w, sh, sw))
        mr_crops.append(crop_motion_vectors_stack_np(
            mr_all, h, w, crop_h, crop_w, sh, sw))

    n_crops = len(offs)
    li = np.repeat(np.asarray(batch["left_index"])[:1], n_crops)
    ri = np.repeat(np.asarray(batch["right_index"])[:1], n_crops)
    probs = np.asarray(crop_fn(
        variables,
        jnp.asarray(np.stack(fp_crops)),
        jnp.asarray(np.stack(fn_crops)),
        jnp.asarray(np.stack(ml_crops, axis=1)),   # (T, N, bh, bw, 2)
        jnp.asarray(np.stack(mr_crops, axis=1)),
        jnp.asarray(li), jnp.asarray(ri),
    ))

    canvas = np.zeros((h, w, num_classes), dtype=np.float64)
    count = np.zeros((h, w, 1), dtype=np.float64)
    for (sh, sw), p in zip(offs, probs):
        canvas[sh:sh + crop_h, sw:sw + crop_w] += p
        count[sh:sh + crop_h, sw:sw + crop_w] += 1
    canvas /= count
    return np.argmax(canvas, axis=-1)


def flow_sliding_window_predict(
    crop_fn: Callable,
    variables,
    batch: Dict,
    num_classes: int,
    crop_h: int,
    crop_w: int,
    out_size,
    stride_rate: float = 2 / 3,
) -> np.ndarray:
    """Crop-based clip prediction — the reference's DEFAULT predict path
    (flow/base.py:270-274: no_cropping=False routes predict_step through
    compute_output + compute_predict_crop).

    Every sliding-window crop runs the full n-frame interpolation chain with
    crop-renormalized grids; softmax probabilities are averaged on the
    overlap, resized to ``out_size`` (align_corners=True, flow/base.py:275)
    and argmaxed. ``batch``: single-clip numpy batch like
    ``flow_sliding_window_test``'s. Returns (n, out_h, out_w) int32 maps.
    """
    from floodseg_tpu.video.grid import crop_motion_vectors_stack_np

    fp = np.asarray(batch["frame_prev"])[0]
    fn = np.asarray(batch["frame_next"])[0]
    h, w = fp.shape[:2]
    ch, cw = min(crop_h, h), min(crop_w, w)
    offs = crop_offsets(h, w, ch, cw, stride_rate)
    ml_all = np.asarray(batch["mvs_left"])[:, 0]    # (T, bh, bw, 2)
    mr_all = np.asarray(batch["mvs_right"])[:, 0]

    fp_crops, fn_crops, ml_crops, mr_crops = [], [], [], []
    for sh, sw in offs:
        fp_crops.append(fp[sh:sh + ch, sw:sw + cw])
        fn_crops.append(fn[sh:sh + ch, sw:sw + cw])
        ml_crops.append(crop_motion_vectors_stack_np(
            ml_all, h, w, ch, cw, sh, sw))
        mr_crops.append(crop_motion_vectors_stack_np(
            mr_all, h, w, ch, cw, sh, sw))

    probs = np.asarray(crop_fn(
        variables,
        jnp.asarray(np.stack(fp_crops)),
        jnp.asarray(np.stack(fn_crops)),
        jnp.asarray(np.stack(ml_crops, axis=1)),   # (T, N, bh, bw, 2)
        jnp.asarray(np.stack(mr_crops, axis=1)),
    ), np.float32)                                  # (N, n, ch, cw, C)

    n = probs.shape[1]
    # f64 accumulation like the reference's prediction_crop (dtype=float);
    # the final resize runs f32 on device
    canvas = np.zeros((n, h, w, num_classes), dtype=np.float64)
    count = np.zeros((1, h, w, 1), dtype=np.float64)
    for (sh, sw), p in zip(offs, probs):
        canvas[:, sh:sh + ch, sw:sw + cw] += p
        count[:, sh:sh + ch, sw:sw + cw] += 1
    canvas /= count
    out = resize_bilinear(jnp.asarray(canvas, jnp.float32), tuple(out_size),
                          align_corners=True)
    return np.asarray(jnp.argmax(out, axis=-1).astype(jnp.int32))

"""U2PL building blocks: masked percentiles, entropy-filtered unsupervised
loss, device-side unsupervised mixing augs, one-hot helpers, masked sampling.

Reference: /root/reference/u2pl/utils/loss_helper.py (compute_unsupervised_
loss :30-63), u2pl/dataset/augmentation.py:1-74, u2pl/utils/utils.py:51-60
(label_onehot). All data-dependent machinery (np.percentile over a ragged
valid subset, boolean-mask gathers, per-sample random boxes) is reformulated
with static shapes: percentiles by sort + interpolated gather, selections by
masked categorical/top-k sampling, boxes by iota comparisons.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from floodseg_tpu.ops.losses import _log_softmax


def masked_percentile(values: jnp.ndarray, mask: jnp.ndarray,
                      percent: jnp.ndarray) -> jnp.ndarray:
    """np.percentile(values[mask], percent) with linear interpolation.

    values/mask: same shape (flattened internally); percent in [0, 100]
    (may be traced). Invalid entries sort to +inf. Assumes mask has at least
    one true entry (guaranteed upstream by the valid-target checks).
    """
    dt = jnp.promote_types(values.dtype, jnp.float32)  # keep f64 under x64
    v = jnp.where(mask, values, jnp.inf).reshape(-1).astype(dt)
    v = jnp.sort(v)
    n_valid = jnp.sum(mask).astype(dt)
    rank = jnp.clip(percent, 0.0, 100.0) / 100.0 * jnp.maximum(n_valid - 1.0, 0.0)
    lo = jnp.floor(rank).astype(jnp.int32)
    hi = jnp.ceil(rank).astype(jnp.int32)
    frac = rank - lo.astype(dt)
    v_lo = v[lo]
    v_hi = v[hi]
    return v_lo * (1.0 - frac) + v_hi * frac


def softmax_entropy(logits: jnp.ndarray) -> jnp.ndarray:
    """-sum p log(p + 1e-10) over the last axis (loss_helper.py:35-37)."""
    p = jax.nn.softmax(
        logits.astype(jnp.promote_types(logits.dtype, jnp.float32)), axis=-1)
    return -jnp.sum(p * jnp.log(p + 1e-10), axis=-1)


def compute_unsupervised_loss(pred: jnp.ndarray, target: jnp.ndarray,
                              percent: jnp.ndarray,
                              pred_teacher: jnp.ndarray,
                              ignore_index: int = 255) -> jnp.ndarray:
    """Entropy-percentile-filtered weighted CE (loss_helper.py:30-63).

    Pixels whose teacher entropy is >= the ``percent``-th percentile (over
    currently-valid pixels) are dropped; the CE over survivors is scaled by
    B*H*W / kept.
    """
    b, h, w, c = pred.shape
    entropy = softmax_entropy(jax.lax.stop_gradient(pred_teacher))
    valid = target != ignore_index
    thresh = masked_percentile(entropy, valid, percent)
    drop = (entropy >= thresh) & valid
    kept = valid & ~drop
    dt = jnp.promote_types(pred.dtype, jnp.float32)
    n_kept = jnp.sum(kept).astype(dt)
    weight = (b * h * w) / (n_kept + 1e-10)

    safe_t = jnp.where(kept, target, 0).astype(jnp.int32)
    logp = _log_softmax(pred)
    nll = -jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
    ce = jnp.sum(nll * kept.astype(dt)) / jnp.maximum(n_kept, 1.0)
    # reference returns 0 when nothing survives (sum_target == 0)
    return jnp.where(n_kept > 0, weight * ce, 0.0)


def label_onehot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(B, H, W) -> (B, H, W, C); ignore pixels get all-zero rows
    (u2pl/utils/utils.py:51-60)."""
    return jax.nn.one_hot(jnp.where(labels == 255, -1, labels), num_classes,
                          dtype=jnp.float32)


def nearest_resize_mask(x: jnp.ndarray, size) -> jnp.ndarray:
    """F.interpolate(mode='nearest') on (B, H, W, C) float masks."""
    b, h, w, c = x.shape
    oh, ow = size
    if (h, w) == (oh, ow):
        return x
    iy = (jnp.arange(oh) * h // oh).astype(jnp.int32)
    ix = (jnp.arange(ow) * w // ow).astype(jnp.int32)
    return x[:, iy][:, :, ix]


def masked_choice(rng, mask_flat: jnp.ndarray, n: int) -> jnp.ndarray:
    """n indices sampled uniformly WITH replacement from {i : mask[i]}.

    Equivalent to the reference's randint into the boolean-gathered candidate
    list (loss_helper.py:195-201). Undefined (still in-range) when the mask
    is empty — callers gate on count > 0.
    """
    logits = jnp.where(mask_flat, 0.0, -jnp.inf)
    return jax.random.categorical(rng, logits, shape=(n,))


def masked_subset(rng, mask_flat: jnp.ndarray, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Up to n DISTINCT indices from {i : mask[i]}: (indices (n,), valid (n,)).

    Random subset when the mask has more than n entries, all of them (plus
    invalid padding) otherwise.
    """
    scores = jnp.where(mask_flat,
                       jax.random.uniform(rng, mask_flat.shape), -jnp.inf)
    top, idx = jax.lax.top_k(scores, n)
    return idx, top > -jnp.inf


# ---------------- unsupervised mixing augmentations ----------------


def _box_mask(rng, h: int, w: int, ratio: float = 2.0) -> jnp.ndarray:
    """Cutout box mask (1 outside box, 0 inside) — augmentation.py:4-18."""
    r_w, r_x, r_y = jax.random.split(rng, 3)
    area = h * w / ratio
    bw = jax.random.randint(r_w, (), int(w / ratio) + 1, w)
    bh = jnp.round(area / bw).astype(jnp.int32)
    x0 = jax.random.randint(r_x, (), 0, jnp.maximum(w - bw + 1, 1))
    y0 = jax.random.randint(r_y, (), 0, jnp.maximum(h - bh + 1, 1))
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (yy >= y0) & (yy < y0 + bh) & (xx >= x0) & (xx < x0 + bw)
    return 1.0 - inside.astype(jnp.float32)


def _class_mask(rng, pseudo: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """ClassMix mask: 1 where the pixel's class is among a random half of
    the classes PRESENT in the sample (augmentation.py:21-28)."""
    present = jnp.zeros(num_classes, bool).at[jnp.clip(pseudo.reshape(-1), 0, num_classes - 1)].set(True)
    n_present = jnp.sum(present)
    scores = jnp.where(present, jax.random.uniform(rng, (num_classes,)), -jnp.inf)
    order = jnp.argsort(-scores)
    k = n_present // 2
    rank = jnp.zeros(num_classes, jnp.int32).at[order].set(jnp.arange(num_classes))
    selected = present & (rank < k)
    return selected[jnp.clip(pseudo, 0, num_classes - 1)].astype(jnp.float32)


def generate_unsup_data(rng, images: jnp.ndarray, target: jnp.ndarray,
                        logits: jnp.ndarray, mode: str = "cutmix",
                        num_classes: int = 5):
    """Per-sample cutout / cutmix / classmix (augmentation.py:31-74).

    images (B, H, W, 3) / target (B, H, W) int / logits (B, H, W) float.
    cutout zeroes the box and marks the target 255 there; cutmix/classmix
    paste the NEXT sample in the batch where the mask is 0.
    """
    b, h, w, _ = images.shape
    rngs = jax.random.split(rng, b)

    def per_sample(i):
        if mode == "cutout":
            m = _box_mask(rngs[i], h, w, ratio=2.0)
            img = images[i] * m[..., None]
            tgt = jnp.where(m == 0, 255, target[i])
            lg = logits[i] * m
            return img, tgt, lg
        if mode == "cutmix":
            m = _box_mask(rngs[i], h, w, ratio=2.0)
        elif mode == "classmix":
            m = _class_mask(rngs[i], target[i], num_classes)
        else:
            raise ValueError(mode)
        j = (i + 1) % b
        img = images[i] * m[..., None] + images[j] * (1 - m[..., None])
        tgt = (target[i] * m + target[j] * (1 - m)).astype(target.dtype)
        lg = logits[i] * m + logits[j] * (1 - m)
        return img, tgt, lg

    outs = [per_sample(i) for i in range(b)]
    return (jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),
            jnp.stack([o[2] for o in outs]))

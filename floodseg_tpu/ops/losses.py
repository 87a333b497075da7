"""Segmentation losses (static-shape XLA reformulations).

- ``cross_entropy_loss``: CE with ignore_index, mean over valid pixels
  (torch ``nn.CrossEntropyLoss(ignore_index=...)`` semantics).
- ``ohem_cross_entropy``: online hard example mining CE matching the
  reference's OhemCrossEntropy2dTensor (/root/reference/u2pl/utils/
  loss_helper.py:466-547): keep pixels whose softmax prob at the target
  class is <= max(thresh, k-th smallest prob) where k = min_kept. The
  reference's data-dependent masking becomes a sort + arithmetic threshold
  so every shape stays static under jit.
- ``binary_cross_entropy``: BCE from logits for the s4GAN discriminator
  (/root/reference/gan.py:135-240 uses BCELoss on sigmoid outputs).

All losses compute at >= float32 (f64 inputs stay f64).
"""

import jax
import jax.numpy as jnp


def _log_softmax(logits):
    # >= f32 (bf16 stability; true f64 under x64 for the parity oracles)
    dt = jnp.promote_types(logits.dtype, jnp.float32)
    return jax.nn.log_softmax(logits.astype(dt), axis=-1)


def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 255,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean CE over non-ignored pixels. logits (..., C), labels (...)."""
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = _log_softmax(logits)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    del num_classes
    w = valid.astype(jnp.float32)
    if weights is not None:
        w = w * weights.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(nll * w) / denom


def ohem_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 255,
    thresh: float = 0.7,
    min_kept: int = 100000,
) -> jnp.ndarray:
    """OHEM CE. logits (B, H, W, C), labels (B, H, W) int."""
    b, h, w, c = logits.shape
    n = b * h * w
    flat_logits = logits.reshape(n, c)
    flat_labels = labels.reshape(n)

    valid = flat_labels != ignore_index
    safe_labels = jnp.where(valid, flat_labels, 0).astype(jnp.int32)
    num_valid = jnp.sum(valid)

    # >= f32; true f64 under x64 so the selection threshold is computed at
    # the same precision as the torch oracle's
    prob = jax.nn.softmax(flat_logits.astype(
        jnp.promote_types(flat_logits.dtype, jnp.float32)), axis=-1)
    target_prob = jnp.take_along_axis(prob, safe_labels[:, None], axis=-1)[:, 0]
    # invalid pixels get prob 1 so they sort to the end (reference masked_fill_)
    target_prob = jnp.where(valid, target_prob, 1.0)

    k = min(n, int(min_kept))
    kth = jnp.sort(target_prob)[k - 1]
    threshold = jnp.where(kth > thresh, kth, thresh)
    # reference skips mining entirely when min_kept > num_valid
    threshold = jnp.where(min_kept > num_valid, 1.0, threshold)

    kept = valid & (target_prob <= threshold)

    logp = _log_softmax(flat_logits)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    w_kept = kept.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w_kept), 1.0)
    return jnp.sum(nll * w_kept) / denom


def ohem_with_aux(
    pred: jnp.ndarray,
    aux: jnp.ndarray | None,
    labels: jnp.ndarray,
    aux_weight: float = 0.4,
    ignore_index: int = 255,
    thresh: float = 0.7,
    min_kept: int = 100000,
) -> jnp.ndarray:
    """CriterionOhem equivalent (loss_helper.py:339-376): main + aux OHEM CE."""
    loss = ohem_cross_entropy(pred, labels, ignore_index, thresh, min_kept)
    if aux is not None and aux_weight > 0:
        loss = loss + aux_weight * ohem_cross_entropy(
            aux, labels, ignore_index, thresh, min_kept
        )
    return loss


def binary_cross_entropy(
    logits: jnp.ndarray, targets: jnp.ndarray
) -> jnp.ndarray:
    """Mean BCE from logits (numerically stable; equals BCELoss∘sigmoid)."""
    dt = jnp.promote_types(logits.dtype, jnp.float32)
    logits = logits.astype(dt)
    targets = targets.astype(dt)
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def feature_matching_loss(d_feat_fake: jnp.ndarray, d_feat_real: jnp.ndarray) -> jnp.ndarray:
    """s4GAN feature-matching: |mean(D_feat_real) - mean(D_feat_fake)| averaged.

    Reference: torch.mean(torch.abs(torch.mean(f_gt,0) - torch.mean(f_pred,0)))
    (/root/reference/gan.py:~205).
    """
    dt = jnp.promote_types(d_feat_fake.dtype, jnp.float32)
    mf = jnp.mean(d_feat_fake.astype(dt), axis=0)
    mr = jnp.mean(d_feat_real.astype(dt), axis=0)
    return jnp.mean(jnp.abs(mr - mf))

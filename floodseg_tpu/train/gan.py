"""s4GAN semi-supervised trainer (single-frame and flow variants).

Reference: /root/reference/gan.py:135-251 and /root/reference/flow/gan.py:
47-170 — the same 4-phase step with a different generator forward:

  1. CE on labeled predictions.
  2. D scores softmax(pred_u) ⊕ min-max-normalized image; samples whose
     confidence exceeds threshold_st contribute a self-training CE against
     their own argmax pseudo-labels (find_good_maps, util/gan.py:55-77 —
     here a per-sample mask instead of a ragged gather).
  3. D scores one-hot GT ⊕ normalized image; feature-matching loss between
     the pooled D features of fake and real inputs.
  4. D trained with BCE on (detached fake, real).

torch's requires_grad freezing is unnecessary here: G's loss is
differentiated w.r.t. G params only (D params enter as constants), and the
fake input is stop_gradient'ed for the D loss.

Gate semantics: self-training only contributes when at least one sample
passes the threshold AND global step > 0 (gan.py:178-204) — expressed
arithmetically so shapes stay static.
"""

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from floodseg_tpu.ops.losses import (binary_cross_entropy, cross_entropy_loss,
                                     feature_matching_loss)
from floodseg_tpu.ops.metrics import intersection_and_union
from floodseg_tpu.train.flow import flow_train_forward


def one_hot_masks(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(B, H, W) -> (B, H, W, C) one-hot (ignore pixels -> all-zero rows),
    matching util/gan.py:79-86 (label==i per class; 255 matches none)."""
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def _minmax(x):
    return (x - jnp.min(x)) / (jnp.max(x) - jnp.min(x))


def single_frame_g_forward(model):
    """G forward for the single-frame GAN (gan.py:155): full model pred."""

    def fwd(params, batch_stats, batch, rng):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["frame_current"], train=True, rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        return out["pred"], mut["batch_stats"]

    return fwd


def flow_g_forward(model, feature_based: bool = True, no_warp: bool = False):
    """G forward for the flow GAN (flow/gan.py:71): interpolated pred."""

    def fwd(params, batch_stats, batch, rng):
        return flow_train_forward(model, params, batch_stats, batch, rng,
                                  train=True, feature_based=feature_based,
                                  no_warp=no_warp)

    return fwd


def make_gan_train_step(
    g_forward: Callable,
    model_d,
    num_classes: int,
    ignore_index: int = 255,
    threshold_st: float = 0.6,
    lambda_fm: float = 0.1,
    lambda_st: float = 1.0,
    gt_norm_by_labeled_max: bool = False,
) -> Callable:
    """Returns train_step(state_g, state_d, batch, rng) ->
    (state_g, state_d, metrics). ``batch`` = {"l": ..., "u": ..., "gt": ...}.

    gt_norm_by_labeled_max replicates the reference's single-frame quirk of
    normalizing image_gt by max(image_l) (gan.py:186); the flow variant
    normalizes by the gt image's own max (flow/gan.py:102).
    """

    def train_step(state_g, state_d, batch, rng):
        batch_l, batch_u, batch_gt = batch["l"], batch["u"], batch["gt"]
        label_l = batch_l["label"]
        label_gt = batch_gt["label"]
        image_l = batch_l["frame_current"]
        image_u = batch_u["frame_current"]
        image_gt = batch_gt["frame_current"]
        r_l, r_u, r_d1, r_d2, r_d3, r_d4 = jax.random.split(rng, 6)

        # real-branch D input (independent of G params)
        if gt_norm_by_labeled_max:
            gt_img = (image_gt - jnp.min(image_gt)) / (jnp.max(image_l) - jnp.min(image_l))
        else:
            gt_img = _minmax(image_gt)
        d_cat_gt = jnp.concatenate(
            [one_hot_masks(label_gt, num_classes), gt_img], axis=-1
        )

        def loss_G(params_g):
            pred_l, bs = g_forward(params_g, state_g.batch_stats, batch_l, r_l)
            loss_ce = cross_entropy_loss(pred_l, label_l, ignore_index)

            pred_u, bs = g_forward(params_g, bs, batch_u, r_u)
            u_img = _minmax(image_u)
            pred_cat = jnp.concatenate(
                [jax.nn.softmax(pred_u.astype(
                    jnp.promote_types(pred_u.dtype, jnp.float32)), axis=-1),
                 u_img],
                axis=-1,
            )
            d_vars = {"params": state_d.params, "batch_stats": state_d.batch_stats}
            d_z, d_feat_pred = model_d.apply(d_vars, pred_cat, train=True,
                                             rngs={"dropout": r_d1})

            # find_good_maps as a per-sample mask
            sel = jax.nn.sigmoid(d_z) > threshold_st
            count = jnp.sum(sel)
            pseudo = jax.lax.stop_gradient(jnp.argmax(pred_u, axis=-1))
            st_weights = sel.astype(jnp.float32)[:, None, None] * jnp.ones_like(
                pseudo, dtype=jnp.float32
            )
            loss_st = cross_entropy_loss(pred_u, pseudo, ignore_index=-1,
                                         weights=st_weights)

            d_z_gt, d_feat_gt = model_d.apply(d_vars, d_cat_gt, train=True,
                                              rngs={"dropout": r_d2})
            loss_fm = feature_matching_loss(d_feat_pred, d_feat_gt)

            gate = ((count > 0) & (state_g.step > 0)).astype(jnp.float32)
            loss_s = loss_ce + lambda_fm * loss_fm + gate * lambda_st * loss_st
            aux = {"pred_l": pred_l, "pred_cat": pred_cat, "bs": bs,
                   "loss_ce": loss_ce, "loss_fm": loss_fm,
                   "loss_st": gate * loss_st, "st_count": count}
            return loss_s, aux

        (loss_s, aux), grads_g = jax.value_and_grad(loss_G, has_aux=True)(
            state_g.params
        )
        new_state_g = state_g.apply_gradients(grads=grads_g, batch_stats=aux["bs"])

        def loss_D(params_d):
            d_vars = {"params": params_d, "batch_stats": state_d.batch_stats}
            fake = jax.lax.stop_gradient(aux["pred_cat"])
            d_z_fake, _ = model_d.apply(d_vars, fake, train=True,
                                        rngs={"dropout": r_d3})
            d_z_real, _ = model_d.apply(d_vars, d_cat_gt, train=True,
                                        rngs={"dropout": r_d4})
            loss_fake = binary_cross_entropy(d_z_fake, jnp.zeros_like(d_z_fake))
            loss_real = binary_cross_entropy(d_z_real, jnp.ones_like(d_z_real))
            return (loss_fake + loss_real) / 2.0

        loss_d, grads_d = jax.value_and_grad(loss_D)(state_d.params)
        new_state_d = state_d.apply_gradients(grads=grads_d)

        pred_cls = jnp.argmax(aux["pred_l"], axis=-1)
        inter, union, target = intersection_and_union(
            pred_cls, label_l, num_classes, ignore_index
        )
        metrics = {
            "loss": loss_s + loss_d,
            "loss_s": loss_s,
            "loss_ce": aux["loss_ce"],
            "loss_fm": aux["loss_fm"],
            "loss_st": aux["loss_st"],
            "loss_d": loss_d,
            "st_count": aux["st_count"],
            "intersection": inter,
            "union": union,
            "target": target,
        }
        return new_state_g, new_state_d, metrics

    return train_step

"""Supervised training/eval steps (reference supervised.py:122-183).

Steps are pure functions over (TrainState, batch) built once per config and
jit/pjit-compiled by the caller. Loss: OHEM CE (+0.4 aux) or plain CE, per
the loss hyperparameters (supervised.py:62-77).
"""

from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from floodseg_tpu.ops.losses import cross_entropy_loss, ohem_cross_entropy
from floodseg_tpu.ops.metrics import intersection_and_union


def make_loss_fn(loss: str = "ohem", aux_weight: float = 0.4,
                 ignore_index: int = 255, ohem_thresh: float = 0.7,
                 ohem_min_kept: int = 100000) -> Callable:
    def loss_fn(out: Dict, labels) -> jnp.ndarray:
        if loss == "ohem":
            main = ohem_cross_entropy(out["pred"], labels, ignore_index,
                                      ohem_thresh, ohem_min_kept)
            if aux_weight > 0 and out.get("aux") is not None:
                main = main + aux_weight * ohem_cross_entropy(
                    out["aux"], labels, ignore_index, ohem_thresh, ohem_min_kept
                )
            return main
        main = cross_entropy_loss(out["pred"], labels, ignore_index)
        if aux_weight > 0 and out.get("aux") is not None:
            main = main + aux_weight * cross_entropy_loss(
                out["aux"], labels, ignore_index
            )
        return main
    return loss_fn


def make_train_step(model, loss_fn: Callable, num_classes: int,
                    ignore_index: int = 255,
                    lr_schedule: Optional[Callable] = None) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics)."""

    def train_step(state, batch, rng):
        images, labels = batch["frame_current"], batch["label"]

        def compute_loss(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            return loss_fn(out, labels), (out, mut)

        (loss, (out, mut)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(
            grads=grads, batch_stats=mut["batch_stats"]
        )
        pred = jnp.argmax(out["pred"], axis=-1)
        inter, union, target = intersection_and_union(
            pred, labels, num_classes, ignore_index
        )
        metrics = {"loss": loss, "intersection": inter, "union": union,
                   "target": target}
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        return new_state, metrics

    return train_step


def make_eval_step(model, num_classes: int, ignore_index: int = 255) -> Callable:
    """Returns eval_step(state, batch) -> metrics (validation crops)."""

    def eval_step(state, batch):
        images, labels = batch["frame_current"], batch["label"]
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False,
        )
        pred = jnp.argmax(out["pred"], axis=-1)
        inter, union, target = intersection_and_union(
            pred, labels, num_classes, ignore_index
        )
        return {"intersection": inter, "union": union, "target": target}

    return eval_step

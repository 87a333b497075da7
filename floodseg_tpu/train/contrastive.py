"""U2PL contrastive semi-supervised trainer.

Reference: /root/reference/contrastive.py + u2pl/utils/loss_helper.py:66-251.
Teacher/student with EMA, entropy-ranked pseudo-label filtering, class-wise
memory bank of high-entropy negatives, InfoNCE against class prototypes.

Structure:
- ``U2PLState``: student TrainState + teacher (params, batch_stats) +
  MemoryBank. The teacher's BN stats evolve through its OWN train-mode
  forwards (the reference copies parameters, never buffers).
- warmup epochs (< sup_only_epoch): supervised-only step that still runs a
  teacher train-mode forward to warm its BN stats (contrastive.py:207-210).
- ``sync_teacher``: copy student params -> teacher at the warmup boundary
  (contrastive.py:214-219).
- semi step: pseudo-labels from the EVAL-mode teacher, 50% chance of
  cutout/cutmix/classmix (lax.cond), joint student forward, OHEM sup loss,
  entropy-percentile unsupervised CE, memory-bank InfoNCE, post-step EMA.

All ragged reference constructs (percentiles over valid subsets, boolean
gathers, per-class ragged anchors/negatives, growing queues) are fixed-shape
reformulations — see ops/u2pl.py and memory_bank.py.
"""

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from floodseg_tpu.ops.losses import ohem_with_aux
from floodseg_tpu.ops.metrics import intersection_and_union
from floodseg_tpu.ops.u2pl import (
    compute_unsupervised_loss,
    generate_unsup_data,
    label_onehot,
    masked_choice,
    masked_percentile,
    masked_subset,
    nearest_resize_mask,
    softmax_entropy,
)
from floodseg_tpu.train.memory_bank import (
    MemoryBank, create_memory_bank, enqueue, sample_negatives,
)
from floodseg_tpu.train.state import TrainState


@dataclass(frozen=True)
class ContrastiveConfig:
    """ContrastiveKWArgs (contrastive.py:31-43) + step-level knobs."""
    enabled: bool = True
    negative_high_entropy: bool = True
    low_rank: int = 3
    high_rank: int = 20
    current_class_threshold: float = 0.3
    current_class_negative_threshold: float = 1.0
    low_entropy_threshold: float = 20.0
    num_negatives: int = 50
    num_queries: int = 256
    temperature: float = 0.5
    loss_weight: float = 1.0
    max_enqueue: int = 1024          # per-class keys enqueued per step
    num_devices: int = 1             # contra loss / device_count (:379-382)


class U2PLState(NamedTuple):
    student: TrainState
    teacher_params: Any
    teacher_batch_stats: Any
    bank: MemoryBank
    # flips True at the sup_only_epoch boundary sync; eval serves the
    # teacher only after (reference contrastive.py:177-180 forward())
    teacher_synced: Any = None


def create_u2pl_state(model, rng, sample_input, tx,
                      bank_capacity: int = 30000,
                      bank_class0_capacity: int = 50000,
                      num_classes: int = 5) -> U2PLState:
    from floodseg_tpu.train.state import create_train_state
    student = create_train_state(model, rng, sample_input, tx)
    teacher = jax.jit(
        lambda: model.init({"params": jax.random.fold_in(rng, 1),
                            "dropout": rng}, sample_input, train=True)
    )()
    return U2PLState(
        student=student,
        teacher_params=teacher["params"],
        teacher_batch_stats=teacher.get("batch_stats", {}),
        bank=create_memory_bank(num_classes, 256, bank_capacity,
                                bank_class0_capacity),
        teacher_synced=jnp.asarray(False),
    )


def sync_teacher(state: U2PLState) -> U2PLState:
    """Copy student params to the teacher (boundary epoch); buffers stay."""
    return state._replace(teacher_params=jax.tree.map(
        jnp.array, state.student.params
    ), teacher_synced=jnp.asarray(True))


def _rank_of_class(prob: jnp.ndarray, c: int) -> jnp.ndarray:
    """Descending-sort rank of class c per pixel (stable, ties by index)."""
    order = jnp.argsort(-prob, axis=-1)  # jnp.argsort is stable
    return jnp.argmax((order == c).astype(jnp.int32), axis=-1)


def contra_memobank_loss(
    rng,
    rep_all: jnp.ndarray,          # (B, H, W, D) student reps (grad)
    rep_teacher: jnp.ndarray,      # (B, H, W, D) teacher reps (stopped)
    label_l_oh: jnp.ndarray,       # (Bl, H, W, C) one-hot labeled
    label_u_oh: jnp.ndarray,       # (Bu, H, W, C) one-hot pseudo
    prob_l: jnp.ndarray,           # (Bl, H, W, C) teacher softmax
    prob_u: jnp.ndarray,           # (Bu, H, W, C)
    low_mask: jnp.ndarray,         # (B, H, W, 1)
    high_mask: jnp.ndarray,        # (B, H, W, 1)
    raw_label_l: jnp.ndarray,      # (Bl, H, W) int (for label_l[:, i] == 0)
    bank: MemoryBank,
    cfg: ContrastiveConfig,
    prototype: Optional[jnp.ndarray] = None,  # (C, D) momentum prototypes
    i_iter: Optional[jnp.ndarray] = None,
):
    """Fixed-shape compute_contra_memobank_loss (loss_helper.py:66-251).

    With ``prototype`` (the momentum_prototype variant, loss_helper.py:79,
    225-234 — present in the reference API but never passed by its trainer),
    the positive feature is EMA-blended with the per-class prototype at
    ``min(1 - 1/i_iter, 0.999)`` decay and the updated prototypes are
    returned first: (new_prototype, bank, loss). The reference stores
    (num_queries, 1, D) identical rows per class; a (C, D) vector is the
    same information. Like the reference, the returned tensor is rebuilt
    from zeros each call — only classes with anchors this step carry values.
    Returns (bank, loss) when ``prototype`` is None."""
    num_classes = prob_l.shape[-1]
    d = rep_all.shape[-1]
    label_oh = jnp.concatenate([label_l_oh, label_u_oh], axis=0)
    prob = jnp.concatenate([prob_l, prob_u], axis=0)
    low_valid = label_oh * low_mask     # (B, H, W, C)
    high_valid = label_oh * high_mask
    rep_flat = rep_all.reshape(-1, d)
    rep_t_flat = jax.lax.stop_gradient(rep_teacher).reshape(-1, d)
    n_labeled = label_l_oh.shape[0]

    loss_terms = []
    class_valid = []
    anchor_gates = []
    new_protos = []
    rngs = jax.random.split(rng, num_classes * 3).reshape(num_classes, 3, -1)

    for c in range(num_classes):
        lv = low_valid[..., c]
        hv = high_valid[..., c]
        prob_seg = prob[..., c]
        anchor_mask = (prob_seg > cfg.current_class_threshold) & (lv > 0)
        neg_base = (prob_seg < cfg.current_class_negative_threshold) & (hv > 0)

        # rank-window class masks (loss_helper.py:141-155): labeled pixels
        # where c ranks in the top low_rank but is NOT the label; unlabeled
        # pixels where c ranks in [low_rank, high_rank)
        rank_l = _rank_of_class(prob_l, c)
        rank_u = _rank_of_class(prob_u, c)
        cm_l = (rank_l < cfg.low_rank) & (label_l_oh[..., c] == 0)
        cm_u = (rank_u >= cfg.low_rank) & (rank_u < cfg.high_rank)
        class_mask = jnp.concatenate([cm_l, cm_u], axis=0)
        neg_mask = neg_base & class_mask

        # prototype: teacher mean over low-valid pixels
        lv_flat = (lv > 0).reshape(-1)
        n_lv = jnp.sum(lv_flat)
        proto = jnp.sum(rep_t_flat * lv_flat[:, None], axis=0) / jnp.maximum(
            n_lv.astype(jnp.float32), 1.0
        )

        # enqueue a random subset of negative keys
        neg_idx, neg_ok = masked_subset(rngs[c, 0], neg_mask.reshape(-1),
                                        cfg.max_enqueue)
        new_bank = enqueue(bank, c, rep_t_flat[neg_idx], neg_ok)
        bank = new_bank

        # anchors: random low-entropy confident pixels (student rep, grads on)
        a_idx = masked_choice(rngs[c, 1], anchor_mask.reshape(-1),
                              cfg.num_queries)
        anchors = rep_flat[a_idx]  # (Q, D)

        negs = sample_negatives(rngs[c, 2], bank, c,
                                cfg.num_queries * cfg.num_negatives)
        negs = negs.reshape(cfg.num_queries, cfg.num_negatives, d)
        pos = proto
        if prototype is not None:
            # EMA blend with the momentum prototype unless it is still the
            # all-zero init (loss_helper.py:225-233)
            ema = jnp.minimum(1.0 - 1.0 / jnp.maximum(
                i_iter.astype(jnp.float32), 1.0), 0.999)
            blended = (1.0 - ema) * proto + ema * prototype[c]
            pos = jnp.where(jnp.all(prototype == 0), proto, blended)
            new_protos.append(pos)
        proto_rep = jnp.broadcast_to(pos, (cfg.num_queries, 1, d))
        allf = jnp.concatenate([proto_rep, negs], axis=1)  # (Q, 1+N, D)

        def cos(a, b):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-8)
            return jnp.sum(a * b, axis=-1)

        logits = cos(anchors[:, None, :].astype(jnp.float32),
                     allf.astype(jnp.float32)) / cfg.temperature  # (Q, 1+N)
        ce = -jax.nn.log_softmax(logits, axis=-1)[:, 0]
        loss_c = jnp.mean(ce)

        has_anchor = jnp.sum(anchor_mask) > 0
        has_negs = bank.counts[c] > 0
        loss_terms.append(jnp.where(has_anchor & has_negs, loss_c, 0.0))
        class_valid.append((n_lv > 0).astype(jnp.float32))
        anchor_gates.append(has_anchor & has_negs)

    valid_seg = jnp.sum(jnp.stack(class_valid))
    gated = jnp.stack(loss_terms) * jnp.stack(class_valid)
    loss = jnp.sum(gated) / jnp.maximum(valid_seg, 1.0)
    # rare-minibatch bail-out: <= 1 valid class -> zero loss (:173-178)
    loss = jnp.where(valid_seg <= 1, 0.0, loss)
    if prototype is not None:
        # rows update only for anchor-bearing classes; zeros elsewhere
        # (the reference rebuilds `prototype` from zeros, :185-186, 234)
        gates = jnp.stack(anchor_gates)[:, None].astype(jnp.float32)
        new_prototype = jnp.stack(new_protos) * gates
        return new_prototype, bank, loss
    return bank, loss


def make_u2pl_steps(
    model,
    num_classes: int,
    cfg: ContrastiveConfig = ContrastiveConfig(),
    ignore_index: int = 255,
    aux_weight: float = 0.4,
    ohem_thresh: float = 0.7,
    ohem_min_kept: int = 100000,
    unsupervised_apply_aug: str = "cutmix",
    unsupervised_drop_percent: float = 80.0,
    unsupervised_loss_weight: float = 1.0,
    ema_decay: float = 0.99,
    true_ema: bool = False,
) -> Tuple[Callable, Callable]:
    """Returns (sup_step, semi_step).

    sup_step(state, batch, rng)                        — warmup epochs
    semi_step(state, batch, rng, epoch_frac, rel_step) — after warmup;
      epoch_frac = current_epoch / max_epochs (drives the drop-percent and
      alpha_t anneals), rel_step = global step since the warmup boundary
      (drives the EMA warmup, contrastive.py:404-414).

    true_ema: the reference's boundary copy ``t_params.data = s_params.data``
      (contrastive.py:214-219) ALIASES teacher and student storage — the
      in-place SGD step then moves the teacher identically, and the
      ``copy_``-based EMA (contrastive.py:417-421) computes
      ``ema*t + (1-ema)*s`` with ``t is s``, a no-op (verified empirically
      under torch 2.x). De facto reference semantics after warmup: the
      teacher's PARAMS are the student's; only its BN buffers evolve
      separately (through its own train-mode forwards). The default
      replicates that. ``true_ema=True`` opts into the real exponential
      moving average the reference code *appears* to implement
      (``model.contrastive.true_ema`` in the config).
    """

    def student_forward(params, batch_stats, images, rng):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        return out, mut["batch_stats"]

    def teacher_forward(state, images, rng, train):
        kwargs = dict(train=train)
        if train:
            kwargs["rngs"] = {"dropout": rng}
            out, mut = model.apply(
                {"params": state.teacher_params,
                 "batch_stats": state.teacher_batch_stats},
                images, mutable=["batch_stats"], **kwargs,
            )
            return out, mut["batch_stats"]
        out = model.apply(
            {"params": state.teacher_params,
             "batch_stats": state.teacher_batch_stats},
            images, **kwargs,
        )
        return out, state.teacher_batch_stats

    def sup_step(state: U2PLState, batch, rng):
        image_l, label_l = batch["l"]["frame_current"], batch["l"]["label"]
        r_s, r_t = jax.random.split(rng)

        def loss_fn(params):
            out, bs = student_forward(params, state.student.batch_stats,
                                      image_l, r_s)
            loss = ohem_with_aux(out["pred"], out.get("aux"), label_l,
                                 aux_weight, ignore_index, ohem_thresh,
                                 ohem_min_kept)
            return loss, (out, bs)

        (loss, (out, bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.student.params
        )
        student = state.student.apply_gradients(grads=grads, batch_stats=bs)
        # teacher BN warmup forward (contrastive.py:207-210)
        _, t_bs = teacher_forward(state, image_l, r_t, train=True)

        pred_cls = jnp.argmax(out["pred"], axis=-1)
        inter, union, target = intersection_and_union(
            pred_cls, label_l, num_classes, ignore_index)
        return state._replace(student=student, teacher_batch_stats=t_bs), {
            "loss": loss, "sup_loss": loss,
            "unsup_loss": jnp.zeros(()), "contra_loss": jnp.zeros(()),
            "intersection": inter, "union": union, "target": target,
        }

    def semi_step(state: U2PLState, batch, rng, epoch_frac, rel_step):
        image_l, label_l = batch["l"]["frame_current"], batch["l"]["label"]
        image_u = batch["u"]["frame_current"]
        n_labeled = image_l.shape[0]
        (r_aug, r_coin, r_s, r_t, r_contra) = jax.random.split(rng, 5)

        # teacher pseudo-labels (eval mode, contrastive.py:221-226)
        out_t_u, _ = teacher_forward(state, image_u, r_t, train=False)
        prob_u_teacher = jax.nn.softmax(out_t_u["pred"].astype(
            jnp.promote_types(out_t_u["pred"].dtype, jnp.float32)), -1)
        logits_u_aug = jnp.max(prob_u_teacher, axis=-1)
        label_u_aug = jnp.argmax(prob_u_teacher, axis=-1).astype(jnp.int32)

        # 50% heavy mixing aug (contrastive.py:228-236)
        if unsupervised_apply_aug:
            def do_aug(ops):
                return generate_unsup_data(r_aug, *ops,
                                           mode=unsupervised_apply_aug,
                                           num_classes=num_classes)

            image_u_aug, label_u_aug, logits_u_aug = jax.lax.cond(
                jax.random.uniform(r_coin) < 0.5,
                do_aug,
                lambda ops: ops,
                (image_u, label_u_aug, logits_u_aug),
            )
        else:
            image_u_aug = image_u

        image_all = jnp.concatenate([image_l, image_u_aug], axis=0)

        # teacher joint forward, TRAIN mode under stop-grad (:257-271)
        out_t_all, t_bs = teacher_forward(state, image_all, r_t, train=True)
        pred_all_teacher = jax.lax.stop_gradient(out_t_all["pred"])
        rep_all_teacher = jax.lax.stop_gradient(out_t_all["rep"])
        prob_all_teacher = jax.nn.softmax(pred_all_teacher.astype(
            jnp.promote_types(pred_all_teacher.dtype, jnp.float32)), -1)
        prob_l_teacher = prob_all_teacher[:n_labeled]
        prob_u_teacher2 = prob_all_teacher[n_labeled:]
        pred_u_teacher_large = pred_all_teacher[n_labeled:]

        drop_percent = 100.0 - (100.0 - unsupervised_drop_percent) * (1.0 - epoch_frac)
        alpha_t = cfg.low_entropy_threshold * (1.0 - epoch_frac)

        def loss_fn(params):
            out, bs = student_forward(params, state.student.batch_stats,
                                      image_all, r_s)
            pred_all, rep_all = out["pred"], out["rep"]
            pred_l = pred_all[:n_labeled]
            pred_u = pred_all[n_labeled:]
            aux_l = out["aux"][:n_labeled] if out.get("aux") is not None else None

            sup_loss = ohem_with_aux(pred_l, aux_l, label_l, aux_weight,
                                     ignore_index, ohem_thresh, ohem_min_kept)
            unsup_loss = compute_unsupervised_loss(
                pred_u, label_u_aug, drop_percent, pred_u_teacher_large,
                ignore_index,
            ) * unsupervised_loss_weight

            contra_loss = jnp.zeros(())
            new_bank = state.bank
            if cfg.enabled:
                entropy = softmax_entropy(pred_u_teacher_large)
                u_valid = label_u_aug != ignore_index
                low_thresh = masked_percentile(entropy, u_valid, alpha_t)
                high_thresh = masked_percentile(entropy, u_valid, 100.0 - alpha_t)
                low_entropy_mask = (entropy <= low_thresh) & u_valid
                if cfg.negative_high_entropy:
                    high_entropy_mask = (entropy >= high_thresh) & u_valid
                else:
                    high_entropy_mask = jnp.ones_like(u_valid)
                low_mask_all = jnp.concatenate([
                    (label_l != ignore_index).astype(jnp.float32),
                    low_entropy_mask.astype(jnp.float32),
                ], axis=0)[..., None]
                high_mask_all = jnp.concatenate([
                    (label_l != ignore_index).astype(jnp.float32),
                    high_entropy_mask.astype(jnp.float32),
                ], axis=0)[..., None]
                size = pred_all.shape[1:3]
                low_mask_all = nearest_resize_mask(low_mask_all, size)
                high_mask_all = nearest_resize_mask(high_mask_all, size)
                label_l_oh = nearest_resize_mask(
                    label_onehot(label_l, num_classes), size)
                label_u_oh = nearest_resize_mask(
                    label_onehot(label_u_aug, num_classes), size)

                new_bank, contra_loss = contra_memobank_loss(
                    r_contra, rep_all, rep_all_teacher,
                    label_l_oh, label_u_oh,
                    prob_l_teacher, prob_u_teacher2,
                    low_mask_all, high_mask_all, label_l,
                    state.bank, cfg,
                )
                contra_loss = contra_loss / cfg.num_devices * cfg.loss_weight

            total = sup_loss + unsup_loss + contra_loss
            return total, (out, bs, new_bank, sup_loss, unsup_loss, contra_loss)

        (loss, (out, bs, new_bank, sup_loss, unsup_loss, contra_loss)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.student.params)
        )
        student = state.student.apply_gradients(grads=grads, batch_stats=bs)

        # Teacher param update (contrastive.py:404-421). Default: the
        # reference's de facto aliased-storage semantics — teacher params
        # track the student EXACTLY after the warmup boundary (see the
        # make_u2pl_steps docstring for the mechanism).
        if true_ema:
            decay = jnp.minimum(
                1.0 - 1.0 / (rel_step.astype(jnp.float32) + 1.0), ema_decay
            )
            teacher_params = jax.tree.map(
                lambda t, s: decay * t + (1.0 - decay) * s,
                state.teacher_params, student.params,
            )
        else:
            teacher_params = student.params

        pred_cls = jnp.argmax(out["pred"][:n_labeled], axis=-1)
        inter, union, target = intersection_and_union(
            pred_cls, label_l, num_classes, ignore_index)
        new_state = U2PLState(
            student=student,
            teacher_params=teacher_params,
            teacher_batch_stats=t_bs,
            bank=new_bank,
        )
        return new_state, {
            "loss": loss, "sup_loss": sup_loss, "unsup_loss": unsup_loss,
            "contra_loss": contra_loss,
            "intersection": inter, "union": union, "target": target,
        }

    return sup_step, semi_step

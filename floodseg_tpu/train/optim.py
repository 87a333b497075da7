"""Optimizers and LR schedules.

Reference semantics reproduced:
- poly LR: lr = base * (1 - it/max_iter)^0.9 stepped every batch
  (/root/reference/util/util.py:28, base/foundation.py:124-132)
- backbone params at lr, head params at 10x lr (supervised.py:96-110;
  head = everything that is not the pretrained backbone/encoder)
- torch.optim.SGD(momentum=0.9, weight_decay=1e-4): wd added to the raw
  gradient BEFORE the momentum buffer, update = -lr * buffer
- torch.optim.Adam(betas, eps) for the vit arch / discriminator
"""

from typing import Any, Callable, Optional

import jax
import optax

# top-level param-tree keys that belong to the pretrained backbone (lr x1);
# everything else is a head (lr x10)
BACKBONE_KEYS = ("backbone", "encoder")


def poly_schedule(base_lr: float, max_iter: int, power: float = 0.9) -> Callable:
    """lr at optimizer step k (0-indexed) = base * (1 - k/max)^power.

    Matches the reference exactly: param groups START at base_lr
    (supervised.py:104-106) and learning_rate_step runs AFTER opt.step()
    with curr_iter = global_step + 1 (foundation.py:124-132) — so step k
    uses poly(base, k, max), and step 0 uses the unscaled base LR."""
    def schedule(step):
        frac = 1.0 - jax.numpy.minimum(step, max_iter) / max_iter
        return base_lr * frac ** power
    return schedule


def head_mask(params) -> Any:
    """Pytree of bools: True for head (10x LR) params."""
    def top(key):
        return key not in BACKBONE_KEYS

    return {k: jax.tree.map(lambda _: top(k), v) for k, v in params.items()}


def exclude_subtrees(tx: optax.GradientTransformation,
                     keys=("aux",)) -> optax.GradientTransformation:
    """Freeze top-level param subtrees entirely (no update, no decay).

    torch optimizers SKIP params whose ``.grad`` is None — the gan method's
    loss never touches the aux head (gan.py:155-205 reads out["pred"]
    only), so the reference's aux params receive no update, not even weight
    decay. optax would still weight-decay a zero-grad param; masking
    replicates the torch semantics. No-op for trees without the keys.

    ``optax.masked`` passes masked-out updates through UNCHANGED (raw
    +gradient = ascent), so the excluded subtrees are additionally zeroed —
    the subtree stays frozen even if a future loss gives it nonzero
    grads."""
    def mask(params):
        return {k: jax.tree.map(lambda _: k not in keys, v)
                for k, v in params.items()}

    def inv_mask(params):
        return {k: jax.tree.map(lambda _: k in keys, v)
                for k, v in params.items()}

    return optax.chain(optax.masked(tx, mask),
                       optax.masked(optax.set_to_zero(), inv_mask))


def make_optimizer(
    base_lr: float,
    max_iter: int,
    optimizer: str = "sgd",
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    power: float = 0.9,
    head_lr_scale: float = 10.0,
    betas=(0.9, 0.999),
    constant_lr: bool = False,
) -> optax.GradientTransformation:
    lr = base_lr if constant_lr else poly_schedule(base_lr, max_iter, power)
    parts = []
    if optimizer == "sgd":
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=False))
    elif optimizer == "adam":
        # torch.optim.Adam semantics (supervised.py:161-163, the vit arch):
        # CLASSIC L2 — wd folds into the gradient BEFORE the moment
        # estimates. Decay after scale_by_adam would be AdamW, which the
        # reference does not use.
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1]))
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    if head_lr_scale != 1.0:
        # optax.masked accepts a callable, evaluated lazily against params
        parts.append(optax.masked(optax.scale(head_lr_scale), head_mask))
    parts.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*parts)

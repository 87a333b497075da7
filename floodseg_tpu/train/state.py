"""Train state: params + BN stats + optimizer state as one pytree."""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=self.batch_stats if batch_stats is None else batch_stats,
            opt_state=new_opt_state,
        )


def create_train_state(model, rng, sample_input, tx, train: bool = True,
                       pretrained_variables: Optional[dict] = None) -> TrainState:
    variables = jax.jit(
        lambda: model.init({"params": rng, "dropout": rng}, sample_input, train=train)
    )()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if pretrained_variables is not None:
        params = _merge(params, pretrained_variables.get("params", {}))
        batch_stats = _merge(batch_stats, pretrained_variables.get("batch_stats", {}))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def _merge(tree, overrides):
    """Recursively overlay ``overrides`` onto ``tree`` (shape-checked)."""
    if not isinstance(tree, (dict, FrozenDict)):
        assert tree.shape == overrides.shape, (
            f"pretrained shape {overrides.shape} != model shape {tree.shape}"
        )
        return jnp.asarray(overrides, dtype=tree.dtype)
    out = dict(tree)
    for k, v in overrides.items():
        if k in out:
            out[k] = _merge(out[k], v)
    return out

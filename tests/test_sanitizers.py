"""Sanitizer wiring (SURVEY §5.2): the train step runs clean under
``jax_enable_checks`` (internal jaxpr/type invariants), and ``debug_nans`` —
the TPU-native analogue of the reference's detect_anomaly flag
(configs/train_base.yaml:33) wired to ``trainer.debug_nans``
(cli/main.py) — actually traps an injected NaN."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from floodseg_tpu.models import build_model
from floodseg_tpu.train.optim import make_optimizer
from floodseg_tpu.train.state import create_train_state
from floodseg_tpu.train.supervised import make_loss_fn, make_train_step


def _setup():
    model = build_model("pspnet", classes=5, layers=50)
    tx = make_optimizer(base_lr=0.001, max_iter=10)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((2, 17, 17, 3)), tx=tx)
    loss_fn = make_loss_fn("ohem", aux_weight=0.4, ohem_min_kept=50)
    step = make_train_step(model, loss_fn, num_classes=5)
    rng = np.random.default_rng(0)
    batch = {
        "frame_current": rng.standard_normal((2, 17, 17, 3)).astype(np.float32),
        "label": rng.integers(0, 5, size=(2, 17, 17)).astype(np.int32),
    }
    return state, step, batch


@pytest.mark.slow
def test_train_step_under_jax_enable_checks():
    old = jax.config.jax_enable_checks
    jax.config.update("jax_enable_checks", True)
    try:
        state, step, batch = _setup()
        _, metrics = jax.jit(step)(
            state, {k: jnp.asarray(v) for k, v in batch.items()},
            jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
    finally:
        jax.config.update("jax_enable_checks", old)


@pytest.mark.slow
def test_debug_nans_traps_poisoned_batch():
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        state, step, batch = _setup()
        batch["frame_current"][0, 0, 0, 0] = np.nan
        with pytest.raises((FloatingPointError, ZeroDivisionError)):
            _, metrics = jax.jit(step)(
                state, {k: jnp.asarray(v) for k, v in batch.items()},
                jax.random.PRNGKey(1))
            jax.block_until_ready(metrics["loss"])
    finally:
        jax.config.update("jax_debug_nans", old)

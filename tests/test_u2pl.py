"""U2PL tests: unit parity for percentile/unsup-loss/one-hot vs reference
oracles, memory-bank FIFO behavior, and a full semi-step smoke."""

import sys

import numpy as np
import pytest

from oracle_shims import shim_skimage
import torch
import jax
import jax.numpy as jnp

from floodseg_tpu.ops.u2pl import (
    masked_percentile,
    compute_unsupervised_loss,
    label_onehot,
    generate_unsup_data,
    masked_subset,
)
from floodseg_tpu.train.memory_bank import (
    create_memory_bank, enqueue, sample_negatives,
)


def test_masked_percentile_matches_numpy():
    rng = np.random.default_rng(0)
    vals = rng.standard_normal((4, 9, 9)).astype(np.float32)
    mask = rng.random((4, 9, 9)) > 0.3
    for pct in [0.0, 17.3, 50.0, 80.0, 100.0]:
        ref = np.percentile(vals[mask].flatten(), pct)
        ours = float(masked_percentile(jnp.asarray(vals), jnp.asarray(mask),
                                       jnp.float32(pct)))
        assert abs(ours - ref) < 1e-5, (pct, ours, ref)


def test_unsupervised_loss_matches_reference():
    sys.path.insert(0, "/root/reference")
    shim_skimage()
    from u2pl.utils.loss_helper import compute_unsupervised_loss as ref_loss

    rng = np.random.default_rng(1)
    b, h, w, c = 2, 8, 8, 5
    pred = rng.standard_normal((b, h, w, c)).astype(np.float32) * 2
    teacher = rng.standard_normal((b, h, w, c)).astype(np.float32) * 2
    target = rng.integers(0, c, size=(b, h, w)).astype(np.int64)
    target[0, :2] = 255

    ref = float(ref_loss(
        torch.from_numpy(pred.transpose(0, 3, 1, 2)),
        torch.from_numpy(target.copy()),
        80.0,
        torch.from_numpy(teacher.transpose(0, 3, 1, 2)),
    ))
    ours = float(compute_unsupervised_loss(
        jnp.asarray(pred), jnp.asarray(target.astype(np.int32)),
        jnp.float32(80.0), jnp.asarray(teacher),
    ))
    assert abs(ours - ref) < 1e-3, (ours, ref)


def test_label_onehot_matches_reference():
    sys.path.insert(0, "/root/reference")
    shim_skimage()
    from u2pl.utils.utils import label_onehot as ref_onehot

    labels = np.array([[[0, 1, 255], [4, 2, 255]]], dtype=np.int64)
    ref = ref_onehot(torch.from_numpy(labels), 5).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(label_onehot(jnp.asarray(labels), 5))
    np.testing.assert_array_equal(ours, ref)


def test_memory_bank_fifo():
    bank = create_memory_bank(3, dim=4, capacity=8, class0_capacity=10)
    keys = jnp.arange(6 * 4, dtype=jnp.float32).reshape(6, 4)
    valid = jnp.ones(6, bool)
    bank = enqueue(bank, 1, keys, valid)
    assert int(bank.counts[1]) == 6 and int(bank.ptrs[1]) == 6
    # wrap around
    bank = enqueue(bank, 1, keys + 100, valid)
    assert int(bank.counts[1]) == 8          # capped at capacity
    assert int(bank.ptrs[1]) == 4            # (6 + 6) % 8
    # newest keys overwrote the oldest slots
    np.testing.assert_array_equal(np.asarray(bank.keys[1][0]), np.asarray(keys[2] + 100))
    # partial validity
    bank2 = enqueue(bank, 2, keys, jnp.asarray([True, True, False, False, False, False]))
    assert int(bank2.counts[2]) == 2
    # sampling returns rows from the valid range
    s = sample_negatives(jax.random.PRNGKey(0), bank2, 2, 16)
    assert s.shape == (16, 4)


def test_masked_subset():
    mask = jnp.asarray([False, True, False, True, True, False])
    idx, valid = masked_subset(jax.random.PRNGKey(0), mask, 4)
    chosen = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert chosen == {1, 3, 4}
    assert int(valid.sum()) == 3


@pytest.mark.parametrize("mode", ["cutout", "cutmix", "classmix"])
def test_generate_unsup_data(mode):
    rng = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                       dtype=jnp.float32)
    target = jnp.asarray(np.random.default_rng(1).integers(0, 5, (2, 32, 32)),
                         dtype=jnp.int32)
    logits = jnp.asarray(np.random.default_rng(2).random((2, 32, 32)),
                         dtype=jnp.float32)
    ni, nt, nl = generate_unsup_data(rng, imgs, target, logits, mode=mode)
    assert ni.shape == imgs.shape and nt.shape == target.shape
    if mode == "cutout":
        assert bool(jnp.any(nt == 255))  # the box is marked ignore
    else:
        assert bool(jnp.all(nt != 255))


@pytest.mark.slow
def test_u2pl_semi_step_smoke():
    from floodseg_tpu.models import build_model
    from floodseg_tpu.train.optim import make_optimizer
    from floodseg_tpu.train.contrastive import (
        ContrastiveConfig, create_u2pl_state, sync_teacher, make_u2pl_steps,
    )

    model = build_model("pspnet", classes=5, layers=50, semisupervised=True)
    tx = make_optimizer(base_lr=1e-4, max_iter=20)
    key = jax.random.PRNGKey(0)
    state = create_u2pl_state(model, key, jnp.zeros((2, 33, 33, 3)), tx,
                              bank_capacity=512, bank_class0_capacity=1024)

    cfg = ContrastiveConfig(num_queries=32, num_negatives=8, max_enqueue=64)
    sup_step, semi_step = make_u2pl_steps(model, 5, cfg, ohem_min_kept=200)
    sup_step = jax.jit(sup_step)
    semi_step = jax.jit(semi_step)

    rng = np.random.default_rng(0)
    batch = {
        "l": {"frame_current": jnp.asarray(rng.standard_normal((2, 33, 33, 3)), dtype=jnp.float32),
              "label": jnp.asarray(rng.integers(0, 5, (2, 33, 33)), dtype=jnp.int32)},
        "u": {"frame_current": jnp.asarray(rng.standard_normal((2, 33, 33, 3)), dtype=jnp.float32)},
    }

    state, m = sup_step(state, batch, jax.random.fold_in(key, 0))
    assert np.isfinite(float(m["loss"]))
    state = sync_teacher(state)
    # teacher now equals student
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state.teacher_params)[0]),
        np.asarray(jax.tree.leaves(state.student.params)[0]),
    )

    for i in range(2):
        state, m = semi_step(state, batch, jax.random.fold_in(key, i + 1),
                             jnp.float32(0.1), jnp.int32(i))
        assert np.isfinite(float(m["loss"])), m
        assert np.isfinite(float(m["unsup_loss"]))
        assert np.isfinite(float(m["contra_loss"]))
    # bank received keys
    assert int(np.asarray(state.bank.counts).sum()) > 0
    # DEFAULT (reference-parity) teacher semantics: the reference's boundary
    # t.data = s.data aliases storage, so after warmup teacher params track
    # the student EXACTLY (contrastive.py:214-219 + 417-421; the copy_-EMA
    # is a no-op on aliased tensors) — assert bit-identity
    t0 = np.asarray(jax.tree.leaves(state.teacher_params)[0])
    s0 = np.asarray(jax.tree.leaves(state.student.params)[0])
    np.testing.assert_array_equal(t0, s0)


@pytest.mark.slow
def test_u2pl_true_ema_opt_in():
    """true_ema=True restores the real EMA the reference code appears to
    implement: after the boundary sync the teacher lags the student by the
    warmup-scheduled decay min(1 - 1/(rel+1), ema_decay)."""
    from floodseg_tpu.models import build_model
    from floodseg_tpu.train.optim import make_optimizer
    from floodseg_tpu.train.contrastive import (
        ContrastiveConfig, create_u2pl_state, sync_teacher, make_u2pl_steps,
    )

    model = build_model("pspnet", classes=5, layers=50, semisupervised=True)
    tx = make_optimizer(base_lr=1e-2, max_iter=20)
    key = jax.random.PRNGKey(0)
    state = create_u2pl_state(model, key, jnp.zeros((2, 33, 33, 3)), tx,
                              bank_capacity=512, bank_class0_capacity=1024)
    cfg = ContrastiveConfig(enabled=False)
    _, semi_step = make_u2pl_steps(model, 5, cfg, ohem_min_kept=200,
                                   unsupervised_apply_aug="",
                                   ema_decay=0.99, true_ema=True)
    semi_step = jax.jit(semi_step)
    rng = np.random.default_rng(0)
    batch = {
        "l": {"frame_current": jnp.asarray(
                  rng.standard_normal((2, 33, 33, 3)), dtype=jnp.float32),
              "label": jnp.asarray(rng.integers(0, 5, (2, 33, 33)),
                                   dtype=jnp.int32)},
        "u": {"frame_current": jnp.asarray(
                  rng.standard_normal((2, 33, 33, 3)), dtype=jnp.float32)},
    }
    state = sync_teacher(state)
    state, _ = semi_step(state, batch, jax.random.fold_in(key, 1),
                         jnp.float32(0.1), jnp.int32(0))
    t1 = np.asarray(jax.tree.leaves(state.teacher_params)[0])
    s1 = np.asarray(jax.tree.leaves(state.student.params)[0])
    # rel_step=0 -> decay = min(1 - 1/1, 0.99) = 0 -> teacher jumps to the
    # student (EMA warmup start, contrastive.py:405-414)
    np.testing.assert_allclose(t1, s1, rtol=1e-6)
    state, _ = semi_step(state, batch, jax.random.fold_in(key, 2),
                         jnp.float32(0.1), jnp.int32(1))
    t2 = np.asarray(jax.tree.leaves(state.teacher_params)[0])
    s2 = np.asarray(jax.tree.leaves(state.student.params)[0])
    # rel_step=1 -> decay = 0.5: teacher is the midpoint, NOT the student
    assert not np.allclose(t2, s2)
    np.testing.assert_allclose(t2, 0.5 * t1 + 0.5 * s2, rtol=1e-5,
                               atol=1e-7)


def test_contra_momentum_prototype_variant():
    """momentum_prototype codepath (loss_helper.py:79,225-234): zero-init
    prototypes leave the loss unchanged; non-zero prototypes EMA-blend the
    positives and change it; returned rows are zero for anchor-less classes."""
    from floodseg_tpu.train.contrastive import (
        ContrastiveConfig, contra_memobank_loss,
    )
    from floodseg_tpu.train.memory_bank import create_memory_bank, enqueue

    C, D, H, W = 4, 16, 8, 8
    cfg = ContrastiveConfig(num_queries=8, num_negatives=4, max_enqueue=16,
                            low_rank=3, high_rank=4,
                            current_class_threshold=0.0,
                            current_class_negative_threshold=1.0)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    rep = jnp.asarray(rng.standard_normal((2, H, W, D)), jnp.float32)
    rep_t = jnp.asarray(rng.standard_normal((2, H, W, D)), jnp.float32)
    lab_l = jnp.asarray(rng.integers(0, C, (1, H, W)), jnp.int32)
    lab_u = jnp.asarray(rng.integers(0, C, (1, H, W)), jnp.int32)
    oh = lambda l: jax.nn.one_hot(l, C)
    prob = jnp.asarray(jax.nn.softmax(
        jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32), -1))
    ones = jnp.ones((2, H, W, 1), jnp.float32)

    bank = create_memory_bank(C, dim=D, capacity=64, class0_capacity=64)
    for c in range(C):
        bank = enqueue(bank, c,
                       jnp.asarray(rng.standard_normal((8, D)), jnp.float32),
                       jnp.ones((8,), bool))

    args = (rep, rep_t, oh(lab_l), oh(lab_u), prob[:1], prob[1:],
            ones, ones, lab_l, bank, cfg)
    _, loss_plain = contra_memobank_loss(key, *args)

    proto0 = jnp.zeros((C, D), jnp.float32)
    new_proto, _, loss_zero = contra_memobank_loss(
        key, *args, prototype=proto0, i_iter=jnp.int32(5))
    # all-zero prototype: no blending, identical loss
    np.testing.assert_allclose(float(loss_zero), float(loss_plain), rtol=1e-6)
    assert new_proto.shape == (C, D)
    assert float(jnp.abs(new_proto).sum()) > 0

    # a non-zero prototype shifts the positives -> different loss
    _, _, loss_ema = contra_memobank_loss(
        key, *args, prototype=new_proto + 1.0, i_iter=jnp.int32(5))
    assert abs(float(loss_ema) - float(loss_plain)) > 1e-6

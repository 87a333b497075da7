"""Supervised training: optimizer parity vs torch SGD, end-to-end smoke on
the synthetic dataset (loss decreases, metrics aggregate)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from floodseg_tpu.train.optim import make_optimizer, poly_schedule
from floodseg_tpu.train.state import TrainState, create_train_state
from floodseg_tpu.train.supervised import make_loss_fn, make_train_step, make_eval_step
from floodseg_tpu.ops.metrics import MetricMeter


def test_sgd_poly_head10_matches_torch():
    """3 steps of SGD(momentum .9, wd 1e-4) + poly LR + head x10 vs torch."""
    rng = np.random.default_rng(0)
    w_back = rng.standard_normal((4, 3)).astype(np.float32)
    w_head = rng.standard_normal((3, 2)).astype(np.float32)
    grads = [
        {"backbone": {"k": rng.standard_normal((4, 3)).astype(np.float32)},
         "cls": {"k": rng.standard_normal((3, 2)).astype(np.float32)}}
        for _ in range(3)
    ]

    base_lr, max_iter, wd, mom = 0.01, 10, 1e-4, 0.9

    # torch: two param groups, manual poly lr each step (foundation.py:124-132)
    tp_back = torch.nn.Parameter(torch.from_numpy(w_back.copy()))
    tp_head = torch.nn.Parameter(torch.from_numpy(w_head.copy()))
    opt = torch.optim.SGD(
        [{"params": [tp_back], "lr": base_lr},
         {"params": [tp_head], "lr": base_lr * 10}],
        lr=base_lr, momentum=mom, weight_decay=wd,
    )
    for it, g in enumerate(grads):
        opt.zero_grad()
        tp_back.grad = torch.from_numpy(g["backbone"]["k"])
        tp_head.grad = torch.from_numpy(g["cls"]["k"])
        opt.step()
        # the reference updates the LR AFTER the step (foundation.py:124-132
        # with curr_iter = global_step + 1): step 0 ran at the base LR
        lr = base_lr * (1 - (it + 1) / max_iter) ** 0.9
        opt.param_groups[0]["lr"] = lr
        opt.param_groups[1]["lr"] = lr * 10

    # ours
    params = {"backbone": {"k": jnp.asarray(w_back)}, "cls": {"k": jnp.asarray(w_head)}}
    tx = make_optimizer(base_lr, max_iter, "sgd", mom, wd)
    import optax
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update(jax.tree.map(jnp.asarray, g), opt_state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["backbone"]["k"]),
                               tp_back.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["cls"]["k"]),
                               tp_head.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_adam_poly_head10_matches_torch():
    """3 steps of torch.optim.Adam(wd 1e-4 as CLASSIC L2 into the gradient,
    supervised.py:161-163 — the vit arch's optimizer) + poly LR + head x10
    vs make_optimizer("adam"). An AdamW-style decoupled decay diverges from
    this at the first step."""
    rng = np.random.default_rng(1)
    w_back = rng.standard_normal((4, 3)).astype(np.float32)
    w_head = rng.standard_normal((3, 2)).astype(np.float32)
    grads = [
        {"backbone": {"k": rng.standard_normal((4, 3)).astype(np.float32)},
         "cls": {"k": rng.standard_normal((3, 2)).astype(np.float32)}}
        for _ in range(3)
    ]
    base_lr, max_iter, wd = 0.001, 10, 1e-4

    tp_back = torch.nn.Parameter(torch.from_numpy(w_back.copy()))
    tp_head = torch.nn.Parameter(torch.from_numpy(w_head.copy()))
    opt = torch.optim.Adam(
        [{"params": [tp_back], "lr": base_lr},
         {"params": [tp_head], "lr": base_lr * 10}],
        lr=base_lr, weight_decay=wd,
    )
    for it, g in enumerate(grads):
        opt.zero_grad()
        tp_back.grad = torch.from_numpy(g["backbone"]["k"])
        tp_head.grad = torch.from_numpy(g["cls"]["k"])
        opt.step()
        lr = base_lr * (1 - (it + 1) / max_iter) ** 0.9
        opt.param_groups[0]["lr"] = lr
        opt.param_groups[1]["lr"] = lr * 10

    params = {"backbone": {"k": jnp.asarray(w_back)},
              "cls": {"k": jnp.asarray(w_head)}}
    tx = make_optimizer(base_lr, max_iter, "adam", weight_decay=wd)
    import optax
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update(jax.tree.map(jnp.asarray, g),
                                       opt_state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["backbone"]["k"]),
                               tp_back.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["cls"]["k"]),
                               tp_head.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_poly_schedule_matches_reference():
    from floodseg_tpu.train.optim import poly_schedule
    sched = poly_schedule(0.01, 100, 0.9)
    # reference sequence: step k runs at poly(base, k, max) — groups start
    # at base (supervised.py:104-106) and the update happens post-step
    for step in [0, 10, 50, 98]:
        ref = 0.01 * (1 - step / 100) ** 0.9
        assert abs(float(sched(step)) - ref) < 1e-6  # f32 schedule eval
    # first step at the unscaled base LR (up to f32 representation)
    assert abs(float(sched(0)) - 0.01) < 1e-8


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from floodseg_tpu.data.synthetic import generate_synthetic_dataset
    root = tmp_path_factory.mktemp("synth")
    return generate_synthetic_dataset(str(root), num_frames=30, frame_delta=5,
                                      size=(96, 128), num_labeled=6)


@pytest.mark.slow
def test_supervised_end_to_end_smoke(synth_root):
    """PSPNet-50 supervised fit on synthetic data: loss drops, mIoU computes."""
    from floodseg_tpu.data import SemDataset, DataLoader, build_train_transform
    from floodseg_tpu.models import build_model

    model = build_model("pspnet", classes=5, layers=50)
    tf = build_train_transform(33, 33, resize=(96, 128), scale_min=0.8, scale_max=1.2)
    ds = SemDataset("train", synth_root, f"{synth_root}/list/all/train.txt", tf)
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=0,
                        drop_last=True, infinite=True)

    key = jax.random.PRNGKey(0)
    steps = 8
    tx = make_optimizer(base_lr=0.002, max_iter=steps)
    state = create_train_state(model, key, jnp.zeros((2, 33, 33, 3)), tx=tx)

    loss_fn = make_loss_fn("ohem", aux_weight=0.4, ohem_min_kept=200)
    train_step = jax.jit(make_train_step(model, loss_fn, num_classes=5,
                                         lr_schedule=poly_schedule(0.002, steps)))
    eval_step = jax.jit(make_eval_step(model, num_classes=5))

    losses = []
    it = iter(loader)
    for i in range(steps):
        batch = next(it)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = train_step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all()
    assert min(losses[-3:]) < losses[0], f"loss did not decrease: {losses}"

    meter = MetricMeter(5)
    m = eval_step(state, batch)
    meter.update(m["intersection"], m["union"], m["target"])
    s = meter.summary()
    assert 0.0 <= s["miou"] <= 1.0

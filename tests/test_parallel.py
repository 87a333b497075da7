"""Multi-device tests on the 8-virtual-CPU mesh: sharded train step,
SyncBN-equivalence, metric reduction."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from floodseg_tpu.parallel import (
    create_mesh, shard_batch, make_sharded_train_step, replicated_sharding,
)
from floodseg_tpu.train.optim import make_optimizer
from floodseg_tpu.train.state import create_train_state
from floodseg_tpu.train.supervised import make_loss_fn, make_train_step


def _tiny_setup(n_dev):
    from floodseg_tpu.models import build_model
    model = build_model("pspnet", classes=5, layers=50)
    tx = make_optimizer(base_lr=0.001, max_iter=10)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((n_dev, 33, 33, 3)), tx=tx)
    loss_fn = make_loss_fn("ohem", aux_weight=0.4, ohem_min_kept=100)
    step = make_train_step(model, loss_fn, num_classes=5)
    return model, state, step


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    """The DP-sharded step must produce the same loss/update as one device
    on the same global batch (SyncBN + grad allreduce are implicit)."""
    n = 8
    devices = jax.devices()
    assert len(devices) >= n, "conftest should expose 8 virtual CPU devices"
    mesh = create_mesh(("data",), devices=devices[:n])
    model, state, step = _tiny_setup(n)

    rng = np.random.default_rng(0)
    batch_np = {
        "frame_current": rng.standard_normal((n, 33, 33, 3)).astype(np.float32),
        "label": rng.integers(0, 5, size=(n, 33, 33)).astype(np.int32),
    }
    key = jax.random.PRNGKey(7)

    # single-device reference
    step1 = jax.jit(step)
    s1, m1 = step1(state, {k: jnp.asarray(v) for k, v in batch_np.items()}, key)

    # sharded
    sharded = make_sharded_train_step(step, mesh)
    state_r = jax.device_put(state, replicated_sharding(mesh))
    batch = shard_batch(batch_np, mesh)
    s8, m8 = sharded(state_r, batch, key)

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-4
    np.testing.assert_array_equal(np.asarray(m1["intersection"]),
                                  np.asarray(m8["intersection"]))
    # parameters after the step agree
    p1 = jax.tree.leaves(s1.params)[0]
    p8 = jax.tree.leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8),
                               rtol=1e-4, atol=1e-5)


def test_shard_batch_layouts():
    mesh = create_mesh(("data",), devices=jax.devices()[:4])
    batch = shard_batch(
        {"frame_prev": np.zeros((4, 8, 8, 3), np.float32),
         "mvs_left": np.zeros((3, 4, 2, 2, 2), np.float32),
         "left_index": np.zeros((4,), np.int32)},
        mesh,
    )
    assert batch["frame_prev"].sharding.spec == jax.sharding.PartitionSpec("data")
    assert batch["mvs_left"].sharding.spec == jax.sharding.PartitionSpec(None, "data")


@pytest.mark.slow
def test_dp_predict_matches_single_chip():
    """Clip-parallel flow inference: each device's output equals the
    single-device predict for its clip."""
    from floodseg_tpu.parallel.mesh import make_dp_predict_fn
    from floodseg_tpu.models import build_model
    from floodseg_tpu.train.flow import make_flow_predict_fn
    from floodseg_tpu.video.grid import default_grid

    n_dev, n, size = 8, 3, 64
    mesh = create_mesh(("data",), devices=jax.devices()[:n_dev])
    model = build_model("pspnet", classes=5, layers=50, with_aux=False)
    vs = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, size + 1, size + 1, 3)),
        train=False))()
    pf = make_flow_predict_fn(model, n=n, out_size=(size, size),
                              default_grid=default_grid(size, size))
    dp = make_dp_predict_fn(pf, mesh)

    rng = np.random.default_rng(0)
    fp = jnp.asarray(rng.standard_normal((n_dev, size, size, 3)), jnp.float32)
    fn_ = jnp.asarray(rng.standard_normal((n_dev, size, size, 3)), jnp.float32)
    ml = jnp.asarray(rng.uniform(-1, 1, (n - 1, n_dev, 4, 4, 2)), jnp.float32)
    mr = jnp.asarray(rng.uniform(-1, 1, (n - 1, n_dev, 4, 4, 2)), jnp.float32)
    out = dp(vs, fp, fn_, ml, mr)
    assert out.shape == (n_dev, n, size, size)
    for i in (0, 3, 7):
        ref = pf(vs, fp[i][None], fn_[i][None], ml[:, i][:, None], mr[:, i][:, None])
        np.testing.assert_array_equal(np.asarray(out[i]), np.asarray(ref))


@pytest.mark.slow
def test_sharded_u2pl_semi_step_matches_single_device():
    """The full U2PL semi step — teacher forwards, pseudo-labels, cutmix,
    CONTRASTIVE loss and memory-bank enqueue — is identical under batch
    sharding (the sharded-jit form of the reference's DDP + all_gather
    memory-bank keys, u2pl/utils/utils.py:16-33)."""
    from floodseg_tpu.models import build_model
    from floodseg_tpu.train.contrastive import (
        ContrastiveConfig, create_u2pl_state, sync_teacher, make_u2pl_steps,
    )
    from floodseg_tpu.parallel.mesh import sharded_jit, shard_batch

    n = 4
    mesh = create_mesh(("data",), devices=jax.devices()[:n])
    model = build_model("pspnet", classes=5, layers=50, semisupervised=True)
    from floodseg_tpu.train.optim import make_optimizer
    tx = make_optimizer(base_lr=1e-4, max_iter=20)
    key = jax.random.PRNGKey(0)
    state = create_u2pl_state(model, key, jnp.zeros((n, 33, 33, 3)), tx,
                              bank_capacity=256, bank_class0_capacity=512)
    state = sync_teacher(state)

    # num_devices=1 in BOTH runs: isolates sharding effects from the
    # intentional /world_size loss scale (tested elsewhere)
    cfg = ContrastiveConfig(num_queries=16, num_negatives=4, max_enqueue=32,
                            num_devices=1)
    _, semi_step = make_u2pl_steps(model, 5, cfg, ohem_min_kept=200)

    rng = np.random.default_rng(0)
    batch_np = {
        "l": {"frame_current": rng.standard_normal((n, 33, 33, 3)).astype(np.float32),
              "label": rng.integers(0, 5, (n, 33, 33)).astype(np.int32)},
        "u": {"frame_current": rng.standard_normal((n, 33, 33, 3)).astype(np.float32)},
    }
    k = jax.random.fold_in(key, 1)
    args = (jnp.float32(0.1), jnp.int32(3))

    jb = {kk: {k2: jnp.asarray(v2) for k2, v2 in vv.items()}
          for kk, vv in batch_np.items()}
    s1, m1 = jax.jit(semi_step)(state, jb, k, *args)

    sb = {kk: shard_batch(vv, mesh) for kk, vv in batch_np.items()}
    state_r = jax.device_put(state, replicated_sharding(mesh))
    s8, m8 = sharded_jit(semi_step, mesh)(state_r, sb, k, *args)

    for name in ("loss", "sup_loss", "unsup_loss", "contra_loss"):
        assert abs(float(m1[name]) - float(m8[name])) < 2e-4, (
            name, float(m1[name]), float(m8[name]))
    np.testing.assert_array_equal(np.asarray(s1.bank.counts),
                                  np.asarray(s8.bank.counts))
    p1 = jax.tree.leaves(s1.student.params)[0]
    p8 = jax.tree.leaves(s8.student.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8),
                               rtol=1e-4, atol=1e-5)
    t1 = jax.tree.leaves(s1.teacher_params)[0]
    t8 = jax.tree.leaves(s8.teacher_params)[0]
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t8),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dp_crop_forward_matches_single_device():
    """Sliding-window test inference with the crop batch sharded over the
    mesh (padding the ragged tail) is numerically identical to the
    single-device crop forward through the full multi_scale_test path."""
    from floodseg_tpu.models import build_model
    from floodseg_tpu.train.evaluate import make_crop_forward, multi_scale_test

    n = 8
    mesh = create_mesh(("data",), devices=jax.devices()[:n])
    model = build_model("pspnet", classes=5, layers=50, with_aux=False)
    key = jax.random.PRNGKey(0)
    vs = jax.jit(lambda: model.init(
        {"params": key, "dropout": key}, jnp.zeros((1, 33, 33, 3)),
        train=False))()
    eval_vars = {"params": vs["params"], "batch_stats": vs["batch_stats"]}

    rng = np.random.default_rng(3)
    image = rng.uniform(0, 255, (41, 41, 3)).astype(np.float32)
    kw = dict(num_classes=5, crop_h=33, crop_w=33, scales=(1.0, 0.75),
              base_size=41)
    pred_1 = multi_scale_test(make_crop_forward(model, 5), eval_vars,
                              image, **kw)
    pred_dp = multi_scale_test(make_crop_forward(model, 5, mesh=mesh),
                               eval_vars, image, **kw)
    np.testing.assert_array_equal(pred_1, pred_dp)

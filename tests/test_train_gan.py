"""s4GAN trainer: shapes/finiteness on synthetic data (single-frame + flow)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from floodseg_tpu.data import SemDataset, FlowDataset, DataLoader, build_train_transform
from floodseg_tpu.data.synthetic import generate_synthetic_dataset
from floodseg_tpu.models import build_model, S4GANDiscriminator
from floodseg_tpu.train.optim import make_optimizer
from floodseg_tpu.train.state import create_train_state
from floodseg_tpu.train.gan import (
    make_gan_train_step, single_frame_g_forward, flow_g_forward, one_hot_masks,
)

DELTA = 5


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthgan")
    return generate_synthetic_dataset(str(root), num_frames=30, frame_delta=DELTA,
                                      size=(96, 128), num_labeled=6)


def test_one_hot_matches_reference_semantics():
    labels = jnp.asarray([[[0, 1], [4, 255]]])
    oh = np.asarray(one_hot_masks(labels, 5))
    assert oh.shape == (1, 2, 2, 5)
    assert oh[0, 0, 0, 0] == 1 and oh[0, 0, 1, 1] == 1 and oh[0, 1, 0, 4] == 1
    assert oh[0, 1, 1].sum() == 0  # ignore pixel matches no class


def _states(model_g, model_d, sample_g, key):
    tx_g = make_optimizer(base_lr=2.5e-4, max_iter=10)
    tx_d = make_optimizer(base_lr=1e-4, max_iter=10, optimizer="adam",
                          betas=(0.9, 0.99), weight_decay=0.0, head_lr_scale=1.0)
    sg = create_train_state(model_g, key, sample_g, tx=tx_g)
    sd = create_train_state(model_d, key, jnp.zeros((2, 32, 32, 8)), tx=tx_d)
    return sg, sd


@pytest.mark.slow
def test_single_frame_gan_step(synth_root):
    model_g = build_model("pspnet", classes=5, layers=50)
    model_d = S4GANDiscriminator(num_classes=5)
    key = jax.random.PRNGKey(0)
    sg, sd = _states(model_g, model_d, jnp.zeros((2, 33, 33, 3)), key)

    tf = build_train_transform(33, 33, resize=(96, 128), scale_min=0.9, scale_max=1.1)
    ds_l = SemDataset("train", synth_root, f"{synth_root}/list/all/train.txt", tf)
    ds_u = SemDataset("test", synth_root, f"{synth_root}/list/all/train_u.txt", tf)
    l_iter = iter(DataLoader(ds_l, batch_size=2, shuffle=True, drop_last=True, infinite=True))
    u_iter = iter(DataLoader(ds_u, batch_size=2, shuffle=True, drop_last=True, infinite=True))

    step = jax.jit(make_gan_train_step(
        single_frame_g_forward(model_g), model_d, num_classes=5,
        gt_norm_by_labeled_max=True,
    ))
    for i in range(2):
        batch = {
            "l": {k: jnp.asarray(v) for k, v in next(l_iter).items()},
            "u": {k: jnp.asarray(v) for k, v in next(u_iter).items()},
            "gt": {k: jnp.asarray(v) for k, v in next(l_iter).items()},
        }
        sg, sd, m = step(sg, sd, batch, jax.random.fold_in(key, i))
        assert np.isfinite(float(m["loss"])), m
    assert int(sg.step) == 2 and int(sd.step) == 2
    # discriminator params actually moved
    assert float(m["loss_d"]) > 0


@pytest.mark.slow
def test_flow_gan_step(synth_root):
    model_g = build_model("pspnet", classes=5, layers=50, with_aux=False)
    model_d = S4GANDiscriminator(num_classes=5)
    key = jax.random.PRNGKey(0)
    sg, sd = _states(model_g, model_d, jnp.zeros((2, 33, 33, 3)), key)

    tf = build_train_transform(33, 33, resize=(96, 128), with_rotate=False,
                               scale_min=0.9, scale_max=1.1)
    ds_l = FlowDataset("train", synth_root, f"{synth_root}/list/all/train.txt",
                       type="l", transform=tf, frame_delta=DELTA)
    ds_u = FlowDataset("train", synth_root, f"{synth_root}/list/all/train_u.txt",
                       type="u", transform=tf, frame_delta=DELTA)
    ds_gt = FlowDataset("train", synth_root, f"{synth_root}/list/all/train.txt",
                        type="gt", transform=tf, frame_delta=DELTA)
    l_iter = iter(DataLoader(ds_l, batch_size=2, shuffle=True, drop_last=True, infinite=True))
    u_iter = iter(DataLoader(ds_u, batch_size=2, shuffle=True, drop_last=True, infinite=True))
    gt_iter = iter(DataLoader(ds_gt, batch_size=2, shuffle=True, drop_last=True, infinite=True))

    step = jax.jit(make_gan_train_step(
        flow_g_forward(model_g), model_d, num_classes=5,
    ))
    batch = {
        "l": {k: jnp.asarray(v) for k, v in next(l_iter).items()},
        "u": {k: jnp.asarray(v) for k, v in next(u_iter).items()},
        "gt": {k: jnp.asarray(v) for k, v in next(gt_iter).items()},
    }
    sg, sd, m = step(sg, sd, batch, key)
    assert np.isfinite(float(m["loss"]))
    assert m["intersection"].shape == (5,)

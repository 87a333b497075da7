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


def test_discriminator_forward_matches_reference():
    """S4GANDiscriminator vs the imported reference s4GAN_discriminator
    (util/gan.py:10-43): converted weights, eval mode (dropout off) —
    sigmoid(our logit) must equal the reference's sigmoid output and the
    pooled conv4 features must match."""
    import sys
    import torch
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from util.gan import s4GAN_discriminator  # noqa: E402
    from floodseg_tpu.models.torch_import import convert_s4gan_discriminator

    torch.manual_seed(3)
    ref = s4GAN_discriminator(num_classes=5).eval()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 64, 64, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_maps = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_out = ref_out.numpy()[:, 0]
    ref_feat = ref_maps.numpy().reshape(2, -1)

    d = S4GANDiscriminator(num_classes=5)
    params = convert_s4gan_discriminator(ref.state_dict())
    logit, feat = jax.jit(lambda p, y: d.apply({"params": p}, y, train=False))(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(logit)), ref_out,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(feat), ref_feat,
                               rtol=1e-4, atol=1e-5)


def test_self_training_loss_matches_reference_selection():
    """Our mask-form self-training loss == the reference's
    find_good_maps selection + CE on the selected samples
    (util/gan.py:55-77, gan.py:173-180). The reference materializes a
    smaller selected batch; we weight a full-batch CE by the selection
    mask — identical arithmetic (mean over selected pixels), XLA-friendly
    static shapes."""
    import sys
    import torch
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from util.gan import find_good_maps  # noqa: E402
    from floodseg_tpu.ops.losses import cross_entropy_loss

    rng = np.random.default_rng(5)
    b, h, w, c = 4, 8, 8, 5
    pred_u = rng.standard_normal((b, c, h, w)).astype(np.float32)
    d_outs = np.array([0.9, 0.1, 0.7, 0.3], np.float32)  # 2 selected @0.6

    pred_sel, label_sel, count = find_good_maps(
        torch.from_numpy(d_outs), torch.from_numpy(pred_u), 0.6)
    assert count == 2
    ref_loss = torch.nn.CrossEntropyLoss(ignore_index=255)(
        pred_sel, label_sel).item()

    pred_nhwc = jnp.asarray(pred_u.transpose(0, 2, 3, 1))
    sel = jnp.asarray(d_outs) > 0.6
    pseudo = jnp.argmax(pred_nhwc, axis=-1)
    st_weights = sel.astype(jnp.float32)[:, None, None] * jnp.ones(
        (b, h, w), jnp.float32)
    ours = float(cross_entropy_loss(pred_nhwc, pseudo, ignore_index=-1,
                                    weights=st_weights))
    np.testing.assert_allclose(ours, ref_loss, rtol=1e-6)


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

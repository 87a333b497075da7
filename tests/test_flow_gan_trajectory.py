"""Composed FLOW s4GAN 4-phase train-trajectory oracle vs torch.

Upgrades PARITY row 24 from orthogonal-oracle coverage to a DIRECT
composition: the reference's flow_gan step (/root/reference/flow/gan.py:
47-154) — G = FlowModel over FlowPSPNet (interpolated prediction for both
the labeled CE and the unlabeled D input), D scored on softmax(pred_u) ⊕
min-max-normalized frame_current_u, self-training gate, one-hot GT ⊕
frame_current_gt normalized by its OWN max (flow/gan.py:102 — unlike the
single-frame max(image_l) quirk), feature matching, BCE D loss, SGD
(layers@lr / {decoder,ppm}@10lr) + Adam(0.9, 0.99) stepped together, poly
after — against our make_gan_train_step(flow_g_forward(...)).

Composes the fm/st gradients THROUGH the frozen discriminator INTO the
warp chains and both key-frame encoder passes. Tolerances follow
test_gan_trajectory.py (f64, measured, space-aware).
"""

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

from floodseg_tpu.models.discriminator import S4GANDiscriminator
from floodseg_tpu.models.pspnet import PSPNet
from floodseg_tpu.models.torch_import import (
    convert_pspnet_state_dict, convert_s4gan_discriminator,
)
from floodseg_tpu.train.flow import flow_train_forward
from floodseg_tpu.train.gan import make_gan_train_step, flow_g_forward
from floodseg_tpu.train.optim import make_optimizer
from floodseg_tpu.train.state import TrainState

STEPS = 3
BASE_LR = 2.5e-4
LR_D = 1e-4
WD_G = 5e-4
MAX_ITER = 50
SIZE = 33
BATCH = 2
CLASSES = 5
T = 2
GH = GW = 4
THRESHOLD_ST = 0.45
LAMBDA_FM = 0.1
LAMBDA_ST = 1.0


def _grids(rng, t, b):
    """f32-quantized near-identity grids (see test_flow_trajectory.py)."""
    base = np.stack(
        np.meshgrid(np.linspace(-1, 1, GW), np.linspace(-1, 1, GH)), axis=-1
    )[None]
    g = base + rng.uniform(-0.08, 0.08, size=(t, b, GH, GW, 2))
    return g.astype(np.float32).astype(np.float64)


def _flow_fields(rng, with_label):
    b = {
        "frame_current": rng.standard_normal((BATCH, 3, SIZE, SIZE)),
        "frame_prev": rng.standard_normal((BATCH, 3, SIZE, SIZE)),
        "frame_next": rng.standard_normal((BATCH, 3, SIZE, SIZE)),
        "mvs_left": _grids(rng, T, BATCH),
        "mvs_right": _grids(rng, T, BATCH),
        "left_index": np.array([1, 2], np.int64),
        "right_index": np.array([2, 1], np.int64),
    }
    if with_label:
        ys = rng.integers(0, CLASSES, (BATCH, SIZE, SIZE))
        b["label"] = np.where(rng.random(ys.shape) < 0.05, 255,
                              ys).astype(np.int64)
    return b


def _batches(rng):
    return [{
        "l": _flow_fields(rng, True),
        "u": _flow_fields(rng, False),
        "gt": {"frame_current": rng.standard_normal((BATCH, 3, SIZE, SIZE)),
               "label": rng.integers(
                   0, CLASSES, (BATCH, SIZE, SIZE)).astype(np.int64)},
    } for _ in range(STEPS)]


def _plain_state_dict(flow_psp):
    sd = {}
    for name in ("layer0", "layer1", "layer2", "layer3", "layer4", "ppm"):
        for k, v in getattr(flow_psp, name).state_dict().items():
            sd[f"{name}.{k}"] = v.clone()
    for k, v in flow_psp.decoder.state_dict().items():
        sd[f"cls.{k}"] = v.clone()
    return sd


def _t(a):
    return torch.from_numpy(a)


def _g_fwd(net, b):
    return net(_t(b["frame_current"]), _t(b["frame_prev"]),
               _t(b["frame_next"]), _t(b["mvs_left"]), _t(b["mvs_right"]),
               list(b["left_index"]), list(b["right_index"]))["pred"]


def _run_torch(batches, eval_batch):
    """flow/gan.py:47-154 verbatim semantics."""
    from model.pspnet import FlowPSPNet                   # noqa: E402
    from flow.model import FlowModel                      # noqa: E402
    from util.gan import find_good_maps, one_hot          # noqa: E402
    from util.gan import s4GAN_discriminator              # noqa: E402
    import torch.nn.functional as F

    torch.manual_seed(0)
    inner = FlowPSPNet(SimpleNamespace(layers=50, classes=CLASSES,
                                       pretrained=False)).double()
    torch.manual_seed(1)
    net_d = s4GAN_discriminator(num_classes=CLASSES).double()
    for net in (inner, net_d):
        for m in net.modules():
            if isinstance(m, (torch.nn.Dropout2d, torch.nn.Dropout)):
                m.p = 0.0
    net_g = FlowModel(inner, feature_based=True, no_warp=False,
                      no_interpolation_percentage=0.0).double()

    def _warp_double(self, frame, motion_vectors):
        return torch.nn.functional.grid_sample(
            frame, motion_vectors, mode="bilinear", padding_mode="border",
            align_corners=False)

    net_g.warp = types.MethodType(_warp_double, net_g)
    net_g.train(); net_d.train()

    init_g = _plain_state_dict(inner)
    init_d = {k: v.clone() for k, v in net_d.state_dict().items()}

    crit = torch.nn.CrossEntropyLoss(ignore_index=255)
    crit_d = torch.nn.BCELoss()
    groups = [{"params": inner.layers.parameters(), "lr": BASE_LR}]
    groups += [{"params": m.parameters(), "lr": BASE_LR * 10}
               for m in (inner.decoder, inner.ppm)]
    opt_g = torch.optim.SGD(groups, lr=BASE_LR, momentum=0.9,
                            weight_decay=WD_G)
    opt_d = torch.optim.Adam(net_d.parameters(), lr=LR_D, betas=(0.9, 0.99))

    losses = {"ce": [], "fm": [], "st": [], "d": [], "count": []}
    step1 = None
    for it, b in enumerate(batches):
        opt_g.zero_grad(); opt_d.zero_grad()
        for p in net_d.parameters():
            p.requires_grad = False

        pred = _g_fwd(net_g, b["l"])
        loss_ce = crit(pred, _t(b["l"]["label"]))

        pred_u = _g_fwd(net_g, b["u"])
        image_u = _t(b["u"]["frame_current"])
        image_u = (image_u - torch.min(image_u)) / (
            torch.max(image_u) - torch.min(image_u))
        pred_cat = torch.cat((F.softmax(pred_u, dim=1), image_u), dim=1)
        d_out_z, d_out_y_pred = net_d(pred_cat)

        pred_sel, labels_sel, count = find_good_maps(
            d_out_z, pred_u, THRESHOLD_ST)
        loss_st = crit(pred_sel, labels_sel) if (count > 0 and it > 0) else 0.0

        d_gt_v = one_hot(_t(b["gt"]["label"]), CLASSES).double()
        image_gt = _t(b["gt"]["frame_current"])
        image_gt = (image_gt - torch.min(image_gt)) / (
            torch.max(image_gt) - torch.min(image_gt))  # OWN max (flow/gan.py:102)
        d_gt_v_cat = torch.cat((d_gt_v, image_gt), dim=1)
        d_out_z_gt, d_out_y_gt = net_d(d_gt_v_cat)
        loss_fm = torch.mean(torch.abs(torch.mean(d_out_y_gt, 0)
                                       - torch.mean(d_out_y_pred, 0)))

        loss_s = loss_ce + LAMBDA_FM * loss_fm
        if count > 0 and it > 0:
            loss_s = loss_s + LAMBDA_ST * loss_st
        loss_s.backward()

        for p in net_d.parameters():
            p.requires_grad = True
        pred_cat = pred_cat.detach()
        d_out_z, _ = net_d(pred_cat)
        loss_d_fake = crit_d(d_out_z, torch.zeros(d_out_z.size(0), 1,
                                                  dtype=torch.double))
        d_out_z_gt, _ = net_d(d_gt_v_cat.detach())
        loss_d_real = crit_d(d_out_z_gt, torch.ones(d_out_z_gt.size(0), 1,
                                                    dtype=torch.double))
        loss_d = (loss_d_fake + loss_d_real) / 2.0
        loss_d.backward()

        opt_g.step(); opt_d.step()
        lr = BASE_LR * (1 - (it + 1) / MAX_ITER) ** 0.9
        for i, g in enumerate(opt_g.param_groups):
            g["lr"] = lr * (10 if i >= 1 else 1)
        lr_d = LR_D * (1 - (it + 1) / MAX_ITER) ** 0.9
        for g in opt_d.param_groups:
            g["lr"] = lr_d

        losses["ce"].append(float(loss_ce.detach()))
        losses["fm"].append(float(loss_fm.detach()))
        losses["st"].append(float(loss_st.detach())
                            if torch.is_tensor(loss_st) else loss_st)
        losses["d"].append(float(loss_d.detach()))
        losses["count"].append(int(count))
        if it == 0:
            step1 = (_plain_state_dict(inner),
                     {k: v.clone() for k, v in net_d.state_dict().items()})

    net_g.eval()
    with torch.no_grad():
        ev = _g_fwd(net_g, eval_batch).numpy()
    return init_g, init_d, losses, step1, ev


def _jnp_flow(b):
    out = {
        "frame_current": jnp.asarray(b["frame_current"].transpose(0, 2, 3, 1)),
        "frame_prev": jnp.asarray(b["frame_prev"].transpose(0, 2, 3, 1)),
        "frame_next": jnp.asarray(b["frame_next"].transpose(0, 2, 3, 1)),
        "mvs_left": jnp.asarray(b["mvs_left"]),
        "mvs_right": jnp.asarray(b["mvs_right"]),
        "left_index": jnp.asarray(b["left_index"].astype(np.int32)),
        "right_index": jnp.asarray(b["right_index"].astype(np.int32)),
    }
    if "label" in b:
        out["label"] = jnp.asarray(b["label"].astype(np.int32))
    return out


@pytest.mark.slow
def test_flow_gan_trajectory_matches_torch_reference(x64):
    rng = np.random.default_rng(11)
    batches = _batches(rng)
    eval_batch = _flow_fields(rng, False)
    init_g, init_d, ref, step1, ref_eval = _run_torch(batches, eval_batch)
    assert any(c > 0 for c in ref["count"][1:]), ref["count"]

    model_g = PSPNet(classes=CLASSES, layers=50, dropout=0.0, with_aux=False,
                     dtype=jnp.float64)
    model_d = S4GANDiscriminator(num_classes=CLASSES, dropout=0.0,
                                 dtype=jnp.float64)
    tx_g = make_optimizer(BASE_LR, MAX_ITER, "sgd", momentum=0.9,
                          weight_decay=WD_G)
    tx_d = make_optimizer(LR_D, MAX_ITER, "adam", betas=(0.9, 0.99),
                          weight_decay=0.0, head_lr_scale=1.0)

    pre_g = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                         convert_pspnet_state_dict(init_g))
    pre_d = {"params": jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                                    convert_s4gan_discriminator(init_d))}
    variables0 = jax.jit(lambda: model_g.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((BATCH, SIZE, SIZE, 3)), train=True))()
    assert (jax.tree.structure(variables0["params"])
            == jax.tree.structure(pre_g["params"]))

    state_g = TrainState(step=jnp.zeros((), jnp.int32),
                         params=pre_g["params"],
                         batch_stats=pre_g["batch_stats"],
                         opt_state=tx_g.init(pre_g["params"]), tx=tx_g)
    state_d = TrainState(step=jnp.zeros((), jnp.int32),
                         params=pre_d["params"], batch_stats={},
                         opt_state=tx_d.init(pre_d["params"]), tx=tx_d)

    step = jax.jit(make_gan_train_step(
        flow_g_forward(model_g), model_d, CLASSES, 255,
        threshold_st=THRESHOLD_ST, lambda_fm=LAMBDA_FM, lambda_st=LAMBDA_ST,
        gt_norm_by_labeled_max=False))

    ours = {"ce": [], "fm": [], "st": [], "d": [], "count": []}
    states = []
    for it, b in enumerate(batches):
        batch = {"l": _jnp_flow(b["l"]), "u": _jnp_flow(b["u"]),
                 "gt": {"frame_current": jnp.asarray(
                            b["gt"]["frame_current"].transpose(0, 2, 3, 1)),
                        "label": jnp.asarray(
                            b["gt"]["label"].astype(np.int32))}}
        state_g, state_d, m = step(state_g, state_d, batch,
                                   jax.random.PRNGKey(it))
        ours["ce"].append(float(m["loss_ce"]))
        ours["fm"].append(float(m["loss_fm"]))
        ours["st"].append(float(m["loss_st"]))
        ours["d"].append(float(m["loss_d"]))
        ours["count"].append(int(m["st_count"]))
        states.append((state_g, state_d))

    assert ours["count"] == ref["count"], (ours["count"], ref["count"])

    for k in ("ce", "fm", "d"):
        np.testing.assert_allclose(ours[k][:1], ref[k][:1], rtol=1e-7,
                                   err_msg=k)
        np.testing.assert_allclose(ours[k][:2], ref[k][:2], rtol=5e-6,
                                   err_msg=k)
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-2, err_msg=k)
    np.testing.assert_allclose(ours["st"], ref["st"], rtol=1e-2, atol=1e-12)

    # params after exactly ONE composed step (G has no aux head here:
    # FlowPSPNet never registers model.aux, so the exclude mask is moot)
    want_g1 = convert_pspnet_state_dict(step1[0])
    want_d1 = {"params": convert_s4gan_discriminator(step1[1])}
    sg1, sd1 = states[0]
    for name, want_tree, got_tree, rtol, atol in (
            ("g/params", want_g1["params"], sg1.params, 1e-5, 1e-7),
            ("g/stats", want_g1["batch_stats"], sg1.batch_stats, 1e-3, 1e-7),
            ("d/params", want_d1["params"], sd1.params, 1e-5, 1e-7)):
        flat_w = jax.tree_util.tree_flatten_with_path(want_tree)[0]
        assert len(flat_w) > (100 if name.startswith("g") else 8), name
        for kp, v in flat_w:
            node = got_tree
            for k in kp:
                node = node[k.key]
            np.testing.assert_allclose(
                np.asarray(node, np.float64), np.asarray(v, np.float64),
                rtol=rtol, atol=atol,
                err_msg=name + "/" + "/".join(str(k.key) for k in kp))

    # function space: final EVAL-mode interpolated G forward on a fresh clip
    sgf = states[-1][0]
    our_eval, _ = flow_train_forward(
        model_g, sgf.params, sgf.batch_stats, _jnp_flow(eval_batch),
        rng=None, train=False)
    np.testing.assert_allclose(np.asarray(our_eval),
                               ref_eval.transpose(0, 2, 3, 1), atol=5e-2)

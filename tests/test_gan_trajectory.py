"""Composed s4GAN 4-phase train-trajectory oracle vs the torch reference.

Both sides start from ONE pair of converted state dicts (reference PSPNet
generator + s4GAN discriminator), then run the reference's exact 4-phase
step (gan.py:134-240) for several steps on identical batches:

  1. CE on labeled predictions (aux computed but UNUSED — its torch grads
     stay None, so SGD skips those params entirely; our optimizer masks the
     aux subtree to match, train/optim.py::exclude_subtrees).
  2. D scores softmax(pred_u) ⊕ min-max-normalized unlabeled image; samples
     above threshold_st contribute a self-training CE against their own
     argmax pseudo-labels, gated by count>0 AND global_step>0
     (gan.py:178-204).
  3. D scores one-hot GT ⊕ gt image normalized by the max(image_l) QUIRK
     (gan.py:186); feature-matching L1 between pooled D features.
  4. D trained with BCE on (detached fake, real); BOTH backward passes run
     before BOTH optimizer steps (G: SGD poly+head x10 at lr 2.5e-4
     wd 5e-4; D: Adam(0.9, 0.99) at lr_D 1e-4, poly, no decay —
     gan.py:242-251), poly LR stepped AFTER each step.

This composes what the per-piece oracles (discriminator forward parity,
selection-loss equivalence, Adam mechanics, SGD/poly mechanics) pin only
separately: gradients THROUGH the frozen discriminator into the generator
(fm + st terms), the detach boundary of the D loss, the two optimizers
advancing in lockstep, and the st gate arithmetic over a real trajectory.

Tolerance methodology follows test_train_trajectory.py (f64, measured,
space-aware): step-0 losses at numerics precision, step-1 at the measured
one-step drift, later steps through ReLU-mask chaos at 1e-2; params tight
after exactly ONE step; final EVAL-mode G forward in function space.
"""

import sys
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
from floodseg_tpu.train.gan import make_gan_train_step, single_frame_g_forward
from floodseg_tpu.train.optim import exclude_subtrees, make_optimizer
from floodseg_tpu.train.state import TrainState

STEPS = 3
BASE_LR = 2.5e-4
LR_D = 1e-4
WD_G = 5e-4
MAX_ITER = 50
SIZE = 33
BATCH = 2
CLASSES = 5
# low enough that the randomly initialized D's ~0.5 confidences pass and
# the self-training gate actually engages after step 0
THRESHOLD_ST = 0.45
LAMBDA_FM = 0.1
LAMBDA_ST = 1.0


def _batches(rng):
    xl = rng.standard_normal((STEPS, BATCH, 3, SIZE, SIZE))
    yl = rng.integers(0, CLASSES, (STEPS, BATCH, SIZE, SIZE))
    yl = np.where(rng.random(yl.shape) < 0.05, 255, yl).astype(np.int64)
    xu = rng.standard_normal((STEPS, BATCH, 3, SIZE, SIZE))
    xgt = rng.standard_normal((STEPS, BATCH, 3, SIZE, SIZE))
    ygt = rng.integers(0, CLASSES, (STEPS, BATCH, SIZE, SIZE)).astype(np.int64)
    return xl, yl, xu, xgt, ygt


def _run_torch(xl, yl, xu, xgt, ygt, x_eval):
    """gan.py:134-240 verbatim semantics."""
    from model.pspnet import PSPNet as RefPSPNet          # noqa: E402
    from util.gan import (                                # noqa: E402
        s4GAN_discriminator, find_good_maps, one_hot,
    )
    import torch.nn.functional as F

    torch.manual_seed(0)
    net_g = RefPSPNet(SimpleNamespace(layers=50, classes=CLASSES,
                                      pretrained=False)).double()
    torch.manual_seed(1)
    net_d = s4GAN_discriminator(num_classes=CLASSES).double()
    for net in (net_g, net_d):
        net.train()
        for m in net.modules():
            if isinstance(m, (torch.nn.Dropout2d, torch.nn.Dropout)):
                m.p = 0.0

    init_g = {k: v.clone() for k, v in net_g.state_dict().items()}
    init_d = {k: v.clone() for k, v in net_d.state_dict().items()}

    crit = torch.nn.CrossEntropyLoss(ignore_index=255)
    crit_d = torch.nn.BCELoss()
    modules_back = [net_g.layer0, net_g.layer1, net_g.layer2, net_g.layer3,
                    net_g.layer4]
    modules_head = [net_g.ppm, net_g.cls, net_g.aux]
    groups = [{"params": m.parameters(), "lr": BASE_LR} for m in modules_back]
    groups += [{"params": m.parameters(), "lr": BASE_LR * 10}
               for m in modules_head]
    opt_g = torch.optim.SGD(groups, lr=BASE_LR, momentum=0.9,
                            weight_decay=WD_G)
    opt_d = torch.optim.Adam(net_d.parameters(), lr=LR_D, betas=(0.9, 0.99))

    losses = {"ce": [], "fm": [], "st": [], "d": [], "count": []}
    step1 = None
    for it in range(STEPS):
        image_l = torch.from_numpy(xl[it])
        label_l = torch.from_numpy(yl[it])
        image_u = torch.from_numpy(xu[it])
        image_gt = torch.from_numpy(xgt[it])
        label_gt = torch.from_numpy(ygt[it])

        opt_g.zero_grad(); opt_d.zero_grad()
        for p in net_d.parameters():
            p.requires_grad = False

        pred = net_g(image_l)["pred"]
        loss_ce = crit(pred, label_l)

        pred_u = net_g(image_u)["pred"]
        image_u = (image_u - torch.min(image_u)) / (
            torch.max(image_u) - torch.min(image_u))
        pred_cat = torch.cat((F.softmax(pred_u, dim=1), image_u), dim=1)
        d_out_z, d_out_y_pred = net_d(pred_cat)

        pred_sel, labels_sel, count = find_good_maps(
            d_out_z, pred_u, THRESHOLD_ST)
        if count > 0 and it > 0:
            loss_st = crit(pred_sel, labels_sel)
        else:
            loss_st = 0.0

        d_gt_v = one_hot(label_gt, CLASSES).double()
        image_gt = (image_gt - torch.min(image_gt)) / (
            torch.max(image_l) - torch.min(image_l))       # the quirk
        d_gt_v_cat = torch.cat((d_gt_v, image_gt), dim=1)
        d_out_z_gt, d_out_y_gt = net_d(d_gt_v_cat)
        loss_fm = torch.mean(torch.abs(torch.mean(d_out_y_gt, 0)
                                       - torch.mean(d_out_y_pred, 0)))

        if count > 0 and it > 0:
            loss_s = loss_ce + LAMBDA_FM * loss_fm + LAMBDA_ST * loss_st
        else:
            loss_s = loss_ce + LAMBDA_FM * loss_fm
        loss_s.backward()

        for p in net_d.parameters():
            p.requires_grad = True
        pred_cat = pred_cat.detach()
        d_out_z, _ = net_d(pred_cat)
        y_fake = torch.zeros(d_out_z.size(0), 1, dtype=torch.double)
        loss_d_fake = crit_d(d_out_z, y_fake)
        d_out_z_gt, _ = net_d(d_gt_v_cat.detach())
        y_real = torch.ones(d_out_z_gt.size(0), 1, dtype=torch.double)
        loss_d_real = crit_d(d_out_z_gt, y_real)
        loss_d = (loss_d_fake + loss_d_real) / 2.0
        loss_d.backward()

        opt_g.step(); opt_d.step()
        # learning_rate_step AFTER the steps (foundation.py:123-131)
        lr = BASE_LR * (1 - (it + 1) / MAX_ITER) ** 0.9
        for i, g in enumerate(opt_g.param_groups):
            g["lr"] = lr * (10 if i >= len(modules_back) else 1)
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
            step1 = ({k: v.clone() for k, v in net_g.state_dict().items()},
                     {k: v.clone() for k, v in net_d.state_dict().items()})

    final_g = net_g.state_dict()
    net_g.eval()
    with torch.no_grad():
        eval_logits = net_g(torch.from_numpy(x_eval))["pred"].numpy()
    return init_g, init_d, losses, step1, final_g, eval_logits


@pytest.mark.slow
def test_gan_trajectory_matches_torch_reference(x64):
    rng = np.random.default_rng(11)
    xl, yl, xu, xgt, ygt = _batches(rng)
    x_eval = rng.standard_normal((BATCH, 3, SIZE, SIZE))
    init_g, init_d, ref, step1, final_g, ref_eval = _run_torch(
        xl, yl, xu, xgt, ygt, x_eval)

    # the reference MUST have engaged the self-training gate at least once,
    # otherwise the st path is untested — calibrated via THRESHOLD_ST
    assert any(c > 0 for c in ref["count"][1:]), ref["count"]

    model_g = PSPNet(classes=CLASSES, layers=50, dropout=0.0, with_aux=True,
                     dtype=jnp.float64)
    model_d = S4GANDiscriminator(num_classes=CLASSES, dropout=0.0,
                                 dtype=jnp.float64)
    tx_g = exclude_subtrees(
        make_optimizer(BASE_LR, MAX_ITER, "sgd", momentum=0.9,
                       weight_decay=WD_G), ("aux",))
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
        single_frame_g_forward(model_g), model_d, CLASSES, 255,
        threshold_st=THRESHOLD_ST, lambda_fm=LAMBDA_FM, lambda_st=LAMBDA_ST,
        gt_norm_by_labeled_max=True))

    ours = {"ce": [], "fm": [], "st": [], "d": [], "count": []}
    states = []
    for it in range(STEPS):
        batch = {
            "l": {"frame_current": jnp.asarray(xl[it].transpose(0, 2, 3, 1)),
                  "label": jnp.asarray(yl[it].astype(np.int32))},
            "u": {"frame_current": jnp.asarray(xu[it].transpose(0, 2, 3, 1))},
            "gt": {"frame_current":
                   jnp.asarray(xgt[it].transpose(0, 2, 3, 1)),
                   "label": jnp.asarray(ygt[it].astype(np.int32))},
        }
        state_g, state_d, m = step(state_g, state_d, batch,
                                   jax.random.PRNGKey(it))
        ours["ce"].append(float(m["loss_ce"]))
        ours["fm"].append(float(m["loss_fm"]))
        ours["st"].append(float(m["loss_st"]))
        ours["d"].append(float(m["loss_d"]))
        ours["count"].append(int(m["st_count"]))
        states.append((state_g, state_d))

    # ---- the st gate fired identically ----
    assert ours["count"] == ref["count"], (ours["count"], ref["count"])

    # ---- losses ----
    # step 0 at numerics precision (pure composed forwards through G and D,
    # including the fm term's gradient-through-frozen-D); step 1 at the
    # measured one-step drift; step 2 through ReLU/LeakyReLU chaos at 1e-2
    for k in ("ce", "fm", "d"):
        np.testing.assert_allclose(ours[k][:1], ref[k][:1], rtol=1e-7,
                                   err_msg=k)
        np.testing.assert_allclose(ours[k][:2], ref[k][:2], rtol=5e-6,
                                   err_msg=k)
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-2, err_msg=k)
    # st is 0-gated at step 0 on both sides and live afterwards
    np.testing.assert_allclose(ours["st"], ref["st"], rtol=1e-2, atol=1e-12)

    # ---- params after exactly ONE composed step ----
    want_g1 = convert_pspnet_state_dict(step1[0])
    want_d1 = {"params": convert_s4gan_discriminator(step1[1])}
    sg1, sd1 = states[0]
    for name, want_tree, got_tree, rtol, atol in (
            ("g/params", want_g1["params"], sg1.params, 1e-5, 1e-7),
            # stats: TorchBatchNorm matches torch's unbiased running_var
            # update exactly; the residual (measured 1.4e-8 abs on deep
            # cls-head running means) is cross-framework conv
            # summation-order rounding amplified by BN's 1/sqrt(var)
            # rescaling through 50 layers — same as test_u2pl_trajectory
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

    # ---- the aux head NEVER moves (torch None-grad skip semantics) ----
    final_g_conv = convert_pspnet_state_dict(
        {k: v for k, v in final_g.items()})
    init_g_conv = convert_pspnet_state_dict(init_g)
    for kp, v in jax.tree_util.tree_flatten_with_path(
            init_g_conv["params"]["aux"])[0]:
        node_ref = final_g_conv["params"]["aux"]
        node_ours = states[-1][0].params["aux"]
        for k in kp:
            node_ref = node_ref[k.key]
            node_ours = node_ours[k.key]
        np.testing.assert_array_equal(np.asarray(node_ref), np.asarray(v))
        np.testing.assert_array_equal(np.asarray(node_ours), np.asarray(v))

    # ---- function space: final EVAL-mode G forward ----
    sgf = states[-1][0]
    our_eval = np.asarray(jax.jit(
        lambda v, x: model_g.apply(v, x, train=False)["pred"]
    )({"params": sgf.params, "batch_stats": sgf.batch_stats},
      jnp.asarray(x_eval.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(our_eval, ref_eval.transpose(0, 2, 3, 1),
                               atol=5e-2)

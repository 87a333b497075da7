"""Composed multi-step train-trajectory oracle vs the torch reference.

The strongest available stand-in for the unverifiable real-data mIoU clause:
both sides start from ONE state dict (the reference's randomly initialized
PSPNet, converted), then run the reference's exact supervised recipe —
forward, main + 0.4*aux CE loss (u2pl/utils/loss_helper.py Criterion),
backward, SGD(momentum 0.9, wd 1e-4) with backbone@lr / heads@10lr param
groups (supervised.py:96-110), poly LR stepped AFTER each optimizer step
(base/foundation.py:124-132) — for several steps on identical batches.

This composes everything the per-piece oracles pin separately: gradients
through BatchNorm, BN running-stat updates (torch momentum 0.1), the aux
weighting, the head x10 grouping, and the poly schedule's exact step
indexing. A BN-update or gradient-scaling bug passes every forward-parity
test and silently breaks mIoU parity — it fails here.

Both sides run in FLOAT64, and each assertion lives in the space where
agreement is provable (every tolerance below was measured, round 3):

- f32 is unusable: step-0 gradients already differ ~2.4% in norm between
  torch-CPU and XLA-CPU (conditioning noise through 50 BN layers; the
  losses agree to 1e-6). In f64 step-0 gradients agree to 5.8e-6.
- Exact multi-step agreement is impossible in ANY precision: ReLU/maxpool
  gradients are discontinuous, so once params differ by ~1e-9 a
  pre-activation within that distance of zero flips its gradient mask on
  one side only; the blips compound ~10-100x per step.
- Parameter space decays fastest along BN-INVARIANT directions (the loss
  cannot restore them): by step 3 the stem has drifted ~30% of its own
  movement while losses still agree to 1e-4. Hence params are compared
  tightly after exactly ONE step, and the multi-step trajectory is
  asserted on losses and on the final EVAL-mode forward — function space,
  where mIoU lives.
- The biased-vs-unbiased running_var residue that round 3 originally
  tolerated here is GONE: models/layers.py::TorchBatchNorm now mirrors
  torch's unbiased running_var update exactly (unit-pinned in
  test_models.py::test_torch_batch_norm_parity). The remaining stats
  residual is cross-framework conv summation-order rounding amplified by
  BN's 1/sqrt(var) rescaling through 50 layers (~1e-4 rel measured).
"""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

from oracle_shims import shim_skimage
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

from floodseg_tpu.models.pspnet import PSPNet
from floodseg_tpu.models.torch_import import convert_pspnet_state_dict
from floodseg_tpu.train.optim import make_optimizer
from floodseg_tpu.train.state import create_train_state
from floodseg_tpu.train.supervised import make_loss_fn, make_train_step

STEPS = 3
# 3 steps at lr 1e-3: every composed mechanism has engaged by step 2
# (momentum buffer + a non-base poly LR first act in update 1; their effect
# lands in loss 2 and the final state), while the chaotic gradient-mask
# amplification (see below) stays ~2 decades under the tolerances. At
# lr 0.01 or 5 steps the amplification alone reaches 3e-3 on stem BN
# biases — measured, and why this is not longer/hotter.
BASE_LR = 0.001
MAX_ITER = 50
SIZE = 33          # PSPNet wants 8k+1
BATCH = 2
CLASSES = 5


def _batches(rng):
    xs = rng.standard_normal((STEPS, BATCH, 3, SIZE, SIZE))
    ys = rng.integers(0, CLASSES, (STEPS, BATCH, SIZE, SIZE))
    # a sprinkle of ignore pixels exercises the masked-CE normalization
    ys = np.where(rng.random(ys.shape) < 0.05, 255, ys).astype(np.int64)
    return xs, ys


def _run_torch(xs, ys, x_eval):
    """The reference's manual-optimization loop, verbatim semantics
    (supervised.py:122-151 + foundation.py:124-132). Returns the init
    state dict, per-step losses, the state dict after step 1 and after the
    last step, and the final model's EVAL-mode logits on x_eval."""
    shim_skimage()
    from model.pspnet import PSPNet as RefPSPNet          # noqa: E402
    from u2pl.utils.loss_helper import Criterion          # noqa: E402

    torch.manual_seed(0)
    net = RefPSPNet(SimpleNamespace(layers=50, classes=CLASSES,
                                    pretrained=False)).double()
    net.train()
    for m in net.modules():
        if isinstance(m, torch.nn.Dropout2d):
            m.p = 0.0  # determinism: torch/jax dropout masks never match

    init_sd = {k: v.clone() for k, v in net.state_dict().items()}

    crit = Criterion(0.4, ignore_index=255)
    modules_back = [net.layer0, net.layer1, net.layer2, net.layer3, net.layer4]
    modules_head = [net.ppm, net.cls, net.aux]
    groups = [{"params": m.parameters(), "lr": BASE_LR} for m in modules_back]
    groups += [{"params": m.parameters(), "lr": BASE_LR * 10}
               for m in modules_head]
    opt = torch.optim.SGD(groups, lr=BASE_LR, momentum=0.9, weight_decay=1e-4)

    losses = []
    step1_sd = None
    for it in range(STEPS):
        out = net(torch.from_numpy(xs[it]))
        loss = crit([out["pred"], out["aux"]], torch.from_numpy(ys[it]))
        opt.zero_grad()
        loss.backward()
        opt.step()
        # learning_rate_step AFTER the step, curr_iter = global_step + 1
        lr = BASE_LR * (1 - (it + 1) / MAX_ITER) ** 0.9
        for i, g in enumerate(opt.param_groups):
            g["lr"] = lr * (10 if i >= len(modules_back) else 1)
        losses.append(float(loss.detach()))
        if it == 0:
            step1_sd = {k: v.clone() for k, v in net.state_dict().items()}
    net.eval()
    with torch.no_grad():
        eval_logits = net(torch.from_numpy(x_eval))["pred"].numpy()
    return init_sd, losses, step1_sd, net.state_dict(), eval_logits


@pytest.mark.slow
def test_train_trajectory_matches_torch_reference(x64):
    rng = np.random.default_rng(42)
    xs, ys = _batches(rng)
    x_eval = rng.standard_normal((BATCH, 3, SIZE, SIZE))
    init_sd, ref_losses, step1_sd, final_sd, ref_eval = _run_torch(
        xs, ys, x_eval)

    model = PSPNet(classes=CLASSES, layers=50, dropout=0.0, with_aux=True,
                   dtype=jnp.float64)
    tx = make_optimizer(BASE_LR, MAX_ITER, "sgd", momentum=0.9,
                        weight_decay=1e-4)
    pre = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                       convert_pspnet_state_dict(init_sd))
    # the converted torch init must cover the model's ENTIRE variable tree —
    # a silently unmatched key would train from random init and still
    # "pass" loosely (create_train_state's merge would hide it AND cast to
    # the f32 init dtype, so the state is built directly from `pre`)
    variables0 = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((BATCH, SIZE, SIZE, 3)), train=True))()
    for ref_tree, got_tree in ((variables0["params"], pre["params"]),
                               (variables0["batch_stats"], pre["batch_stats"])):
        assert jax.tree.structure(ref_tree) == jax.tree.structure(got_tree)
    from floodseg_tpu.train.state import TrainState
    state = TrainState(step=jnp.zeros((), jnp.int32), params=pre["params"],
                       batch_stats=pre["batch_stats"],
                       opt_state=tx.init(pre["params"]), tx=tx)
    assert jax.tree.leaves(state.params)[0].dtype == jnp.float64

    loss_fn = make_loss_fn("cross_entropy", aux_weight=0.4, ignore_index=255)
    step = jax.jit(make_train_step(model, loss_fn, CLASSES, 255))

    our_losses = []
    states = [state]
    for it in range(STEPS):
        batch = {"frame_current": jnp.asarray(xs[it].transpose(0, 2, 3, 1)),
                 "label": jnp.asarray(ys[it].astype(np.int32))}
        state, metrics = step(state, batch, jax.random.PRNGKey(it))
        our_losses.append(float(metrics["loss"]))
        states.append(state)

    # Per-step losses. Steps 0-1 pin the composed forward+backward+update-0
    # at numerics level; later steps are asserted at 1e-2 because exact
    # agreement across frameworks is IMPOSSIBLE: ReLU/maxpool gradients are
    # discontinuous, so once params differ by ~1e-9, pre-activations within
    # that distance of zero flip their gradient mask on one side only, and
    # the blips compound. (A missing momentum / wrong grouping moves these
    # by >= 1e-2; optax-vs-torch SGD mechanics are separately pinned
    # bit-tight by test_sgd_poly_head10_matches_torch.)
    np.testing.assert_allclose(our_losses[:2], ref_losses[:2], rtol=1e-6)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-2)

    # Param space is only meaningful where chaos has not acted: after ONE
    # composed step. (Measured: by step 3 the stem diverges by ~30% of its
    # movement along BN-invariant directions while the losses still agree
    # to 1e-4 — parameter space is the wrong late-step comparison.)
    want1 = convert_pspnet_state_dict(step1_sd)
    for sub, got_tree, rtol, atol in (
            ("params", states[1].params, 1e-5, 1e-7),
            # batch_stats: TorchBatchNorm matches torch's unbiased
            # running_var update exactly; what remains is conv rounding
            # amplified by BN rescaling on deep layers (see module
            # docstring) — measured ~1e-4 rel.
            ("batch_stats", states[1].batch_stats, 1e-3, 1e-7)):
        flat_w = jax.tree_util.tree_flatten_with_path(want1[sub])[0]
        assert len(flat_w) > 100  # the full network, not a stub
        for kp, v in flat_w:
            node = got_tree
            for k in kp:
                node = node[k.key]
            path = sub + "/" + "/".join(str(k.key) for k in kp)
            np.testing.assert_allclose(
                np.asarray(node, np.float64), np.asarray(v, np.float64),
                rtol=rtol, atol=atol, err_msg=path)

    # FUNCTION-space final check: eval-mode logits of the trained models on
    # a fresh batch. This composes the full trajectory WITH the updated BN
    # running statistics (eval mode consumes them) — the quantity that
    # actually determines mIoU parity. Calibrated atol 5e-2: the measured
    # residual is ~1.1e-2 (chaotic trajectory drift + the unbiased-var
    # residue, both documented above); a BN-momentum or running-stat bug
    # shifts these logits at O(1).
    final_vars = {"params": states[-1].params,
                  "batch_stats": states[-1].batch_stats}
    our_eval = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False)["pred"]
    )(final_vars, jnp.asarray(x_eval.transpose(0, 2, 3, 1))))
    ref_eval_nhwc = ref_eval.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(our_eval, ref_eval_nhwc, atol=5e-2)

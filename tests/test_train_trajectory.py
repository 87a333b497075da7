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

Known benign numerics gap: torch updates running_var with the UNBIASED
batch variance (n/(n-1)); flax uses the biased one. At these pixel counts
(2x33x33 per channel) the factor is 1+1/2177 ~ 5e-4, inside tolerance.
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

from floodseg_tpu.models.pspnet import PSPNet
from floodseg_tpu.models.torch_import import convert_pspnet_state_dict
from floodseg_tpu.train.optim import make_optimizer
from floodseg_tpu.train.state import create_train_state
from floodseg_tpu.train.supervised import make_loss_fn, make_train_step

STEPS = 5
BASE_LR = 0.01
MAX_ITER = 50
SIZE = 33          # PSPNet wants 8k+1
BATCH = 2
CLASSES = 5


def _batches(rng):
    xs = rng.standard_normal((STEPS, BATCH, 3, SIZE, SIZE)).astype(np.float32)
    ys = rng.integers(0, CLASSES, (STEPS, BATCH, SIZE, SIZE))
    # a sprinkle of ignore pixels exercises the masked-CE normalization
    ys = np.where(rng.random(ys.shape) < 0.05, 255, ys).astype(np.int64)
    return xs, ys


def _shim_skimage():
    """The reference's u2pl.utils imports skimage (absent here) for cutmix
    bank machinery we don't exercise — stub it for the oracle import."""
    import types
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        m = types.ModuleType("skimage.measure")
        m.label = lambda *a, **k: None
        m.regionprops = lambda *a, **k: []
        sk.measure = m
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = m


def _run_torch(xs, ys):
    """The reference's manual-optimization loop, verbatim semantics
    (supervised.py:122-151 + foundation.py:124-132)."""
    _shim_skimage()
    from model.pspnet import PSPNet as RefPSPNet          # noqa: E402
    from u2pl.utils.loss_helper import Criterion          # noqa: E402

    torch.manual_seed(0)
    torch.use_deterministic_algorithms(True)
    net = RefPSPNet(SimpleNamespace(layers=50, classes=CLASSES,
                                    pretrained=False))
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
    return init_sd, losses, net.state_dict()


@pytest.mark.slow
def test_train_trajectory_matches_torch_reference():
    rng = np.random.default_rng(42)
    xs, ys = _batches(rng)
    init_sd, ref_losses, final_sd = _run_torch(xs, ys)

    model = PSPNet(classes=CLASSES, layers=50, dropout=0.0, with_aux=True)
    tx = make_optimizer(BASE_LR, MAX_ITER, "sgd", momentum=0.9,
                        weight_decay=1e-4)
    pre = jax.tree.map(jnp.asarray, convert_pspnet_state_dict(init_sd))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((BATCH, SIZE, SIZE, 3)), tx,
                               pretrained_variables=pre)
    # every param/stat must come from the converted torch init — a silently
    # unmatched key would train from random init and still "pass" loosely
    for got, want in ((state.params, pre["params"]),
                      (state.batch_stats, pre["batch_stats"])):
        assert jax.tree.structure(got) == jax.tree.structure(want)

    loss_fn = make_loss_fn("cross_entropy", aux_weight=0.4, ignore_index=255)
    step = jax.jit(make_train_step(model, loss_fn, CLASSES, 255))

    our_losses = []
    for it in range(STEPS):
        batch = {"frame_current": jnp.asarray(xs[it].transpose(0, 2, 3, 1)),
                 "label": jnp.asarray(ys[it].astype(np.int32))}
        state, metrics = step(state, batch, jax.random.PRNGKey(it))
        our_losses.append(float(metrics["loss"]))

    # per-step loss trajectory
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-4)

    # post-trajectory params AND BN running stats
    want = convert_pspnet_state_dict(final_sd)
    for sub, got_tree in (("params", state.params),
                          ("batch_stats", state.batch_stats)):
        flat_w = jax.tree_util.tree_flatten_with_path(want[sub])[0]
        assert len(flat_w) > 100  # the full network, not a stub
        for kp, v in flat_w:
            node = got_tree
            for k in kp:
                node = node[k.key]
            path = sub + "/" + "/".join(str(k.key) for k in kp)
            np.testing.assert_allclose(
                np.asarray(node, np.float64), np.asarray(v, np.float64),
                rtol=5e-3, atol=5e-4, err_msg=path)

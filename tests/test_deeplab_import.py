"""DeepLabV3 numeric oracle: a plain-torch re-implementation of torchvision's
``deeplabv3_resnet50`` forward (the reference loads it via torch.hub,
/root/reference/model/deeplabv3.py:15-19) with random weights, run against my
flax model with converted weights. Pins the ASPP rates, the torchvision
dilation pattern (first block of a dilated stage keeps the PREVIOUS
dilation), align_corners=False upsampling, and the converter's naming —
torchvision itself is absent in this image, so the oracle rebuilds its exact
module tree (torchvision/models/segmentation/deeplabv3.py + resnet.py)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from floodseg_tpu.models.deeplabv3 import DeepLabV3
from floodseg_tpu.models.torch_import import convert_deeplabv3_state_dict

CLASSES = 7


class Bottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, dilation=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                padding=dilation, dilation=dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idn)


class ResNetDilated(tnn.Module):
    """torchvision ResNet(replace_stride_with_dilation=[False, True, True])."""

    def __init__(self, blocks=(3, 4, 6, 3)):
        super().__init__()
        self.inplanes, self.dilation = 64, 1
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, blocks[0])
        self.layer2 = self._make_layer(128, blocks[1], stride=2)
        self.layer3 = self._make_layer(256, blocks[2], stride=2, dilate=True)
        self.layer4 = self._make_layer(512, blocks[3], stride=2, dilate=True)

    def _make_layer(self, planes, n, stride=1, dilate=False):
        downsample = None
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
        layers = [Bottleneck(self.inplanes, planes, stride, downsample,
                             previous_dilation)]
        self.inplanes = planes * 4
        layers += [Bottleneck(self.inplanes, planes, dilation=self.dilation)
                   for _ in range(1, n)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        c3 = self.layer3(x)
        c4 = self.layer4(c3)
        return c3, c4


class ASPPPooling(tnn.Sequential):
    def __init__(self, in_ch, out_ch):
        super().__init__(tnn.AdaptiveAvgPool2d(1),
                         tnn.Conv2d(in_ch, out_ch, 1, bias=False),
                         tnn.BatchNorm2d(out_ch), tnn.ReLU())

    def forward(self, x):
        size = x.shape[-2:]
        for mod in self:
            x = mod(x)
        return F.interpolate(x, size=size, mode="bilinear", align_corners=False)


class ASPP(tnn.Module):
    def __init__(self, in_ch, rates=(12, 24, 36), out_ch=256):
        super().__init__()
        mods = [tnn.Sequential(tnn.Conv2d(in_ch, out_ch, 1, bias=False),
                               tnn.BatchNorm2d(out_ch), tnn.ReLU())]
        mods += [tnn.Sequential(
            tnn.Conv2d(in_ch, out_ch, 3, padding=r, dilation=r, bias=False),
            tnn.BatchNorm2d(out_ch), tnn.ReLU()) for r in rates]
        mods.append(ASPPPooling(in_ch, out_ch))
        self.convs = tnn.ModuleList(mods)
        self.project = tnn.Sequential(
            tnn.Conv2d(len(mods) * out_ch, out_ch, 1, bias=False),
            tnn.BatchNorm2d(out_ch), tnn.ReLU(), tnn.Dropout(0.5))

    def forward(self, x):
        return self.project(torch.cat([m(x) for m in self.convs], dim=1))


def deeplab_head(in_ch, classes):
    return tnn.Sequential(ASPP(in_ch), tnn.Conv2d(256, 256, 3, padding=1, bias=False),
                          tnn.BatchNorm2d(256), tnn.ReLU(),
                          tnn.Conv2d(256, classes, 1))


def fcn_head(in_ch, classes):
    mid = in_ch // 4
    return tnn.Sequential(tnn.Conv2d(in_ch, mid, 3, padding=1, bias=False),
                          tnn.BatchNorm2d(mid), tnn.ReLU(), tnn.Dropout(0.1),
                          tnn.Conv2d(mid, classes, 1))


class TorchDeepLabV3(tnn.Module):
    def __init__(self, classes):
        super().__init__()
        self.backbone = ResNetDilated()
        self.classifier = deeplab_head(2048, classes)
        self.aux_classifier = fcn_head(1024, classes)

    def forward(self, x):
        size = x.shape[-2:]
        c3, c4 = self.backbone(x)
        out = F.interpolate(self.classifier(c4), size=size, mode="bilinear",
                            align_corners=False)
        aux = F.interpolate(self.aux_classifier(c3), size=size, mode="bilinear",
                            align_corners=False)
        return out, aux


def _randomize(model, gen):
    """Non-trivial weights AND BN affine/running stats so the conversion of
    every tensor is actually pinned."""
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.copy_(torch.randn(m.weight.shape, generator=gen) * 0.05)
                if m.bias is not None:
                    m.bias.copy_(torch.randn(m.bias.shape, generator=gen) * 0.05)
            elif isinstance(m, tnn.BatchNorm2d):
                m.weight.copy_(1 + 0.2 * torch.randn(m.weight.shape, generator=gen))
                m.bias.copy_(0.2 * torch.randn(m.bias.shape, generator=gen))
                m.running_mean.copy_(0.2 * torch.randn(m.running_mean.shape,
                                                       generator=gen))
                m.running_var.copy_(
                    (1 + 0.2 * torch.randn(m.running_var.shape, generator=gen)).abs())


def test_deeplabv3_matches_torch_oracle():
    gen = torch.Generator().manual_seed(0)
    oracle = TorchDeepLabV3(CLASSES).eval()
    _randomize(oracle, gen)

    x = torch.randn(1, 3, 65, 65, generator=gen)
    with torch.no_grad():
        ref_out, ref_aux = oracle(x)

    variables = jax.tree.map(
        jnp.asarray, convert_deeplabv3_state_dict(oracle.state_dict(), layers=50))
    model = DeepLabV3(classes=CLASSES, layers=50, with_aux=True)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = model.apply(variables, xj, train=False)["pred"]
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(),
        rtol=1e-3, atol=1e-2)

    # aux head (train-only in the flax wrapper): apply it directly on c3
    aux = model.apply(
        variables, xj,
        method=lambda m, im: m.aux_classifier(m.backbone(im, False)["c3"], False))
    from floodseg_tpu.ops.resize import resize_bilinear
    aux = resize_bilinear(aux, (65, 65), align_corners=False)
    np.testing.assert_allclose(
        np.asarray(aux).transpose(0, 3, 1, 2), ref_aux.numpy(),
        rtol=1e-3, atol=1e-2)


@pytest.mark.slow
def test_deeplabv3_backward_matches_torch(x64):
    """f64 GRADIENT parity of one composed DeepLabV3 train step's backward:
    d(linear loss over pred + 0.4*aux)/d(all params) through the dilated
    backbone, ASPP (incl. the image-pooling broadcast-resize branch) and
    FCN aux head — the backward every deeplabv3 fit differentiates.
    Dropout zeroed on both sides (masks never match across frameworks);
    tolerances at ReLU-flip level (the same discontinuity mechanism
    documented in test_train_trajectory.py — a single backward keeps it at
    ~1e-7)."""
    gen = torch.Generator().manual_seed(4)
    oracle = TorchDeepLabV3(CLASSES).double().train()
    _randomize(oracle, gen)
    for m in oracle.modules():
        if isinstance(m, tnn.Dropout):
            m.p = 0.0

    x = torch.randn(2, 3, 33, 33, generator=gen, dtype=torch.float64)
    w_pred = torch.randn(2, CLASSES, 33, 33, generator=gen,
                         dtype=torch.float64)
    w_aux = torch.randn(2, CLASSES, 33, 33, generator=gen,
                        dtype=torch.float64)
    out, aux = oracle(x)
    ((out * w_pred).sum() + 0.4 * (aux * w_aux).sum()).backward()
    grad_sd = {name: p.grad.detach().clone()
               for name, p in oracle.named_parameters()}
    for k, v in oracle.state_dict().items():
        if k not in grad_sd:
            grad_sd[k] = torch.zeros_like(v)

    variables = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float64),
        convert_deeplabv3_state_dict(oracle.state_dict(), layers=50))
    model = DeepLabV3(classes=CLASSES, layers=50, with_aux=True,
                      dropout_scale=0.0, dtype=jnp.float64)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    wp = jnp.asarray(w_pred.numpy().transpose(0, 2, 3, 1))
    wa = jnp.asarray(w_aux.numpy().transpose(0, 2, 3, 1))

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xj, train=True, rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        return jnp.sum(o["pred"] * wp) + 0.4 * jnp.sum(o["aux"] * wa)

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])

    want = convert_deeplabv3_state_dict(grad_sd, layers=50)["params"]
    flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
    assert len(flat_w) > 150  # full network
    for kp, v in flat_w:
        node = grads
        for k in kp:
            node = node[k.key]
        path = "/".join(str(k.key) for k in kp)
        # rtol headroom over the typical <1e-6 agreement: torch CPU conv
        # reduction order varies with thread availability, which under a
        # loaded machine perturbs near-zero gradient elements by ~1e-5 rel
        np.testing.assert_allclose(
            np.asarray(node, np.float64), np.asarray(v, np.float64),
            rtol=2e-4, atol=1e-6, err_msg=path)

"""DeepLabV3 (ResNet + ASPP) in flax/NHWC.

Equivalent of the reference's torchvision-based DeepLabv3
(/root/reference/model/deeplabv3.py): torchvision stem (7x7),
replace_stride_with_dilation=[False, True, True], DeepLabHead(2048, classes)
with ASPP rates (12, 24, 36) + global-pooling branch, FCNHead(1024, classes)
aux. Output upsampled to input size with align_corners=False (torchvision
semantics). Flow path (FlowDeepLabv3, deeplabv3.py:47-54): encoder = backbone
"out" (2048ch), decoder = DeepLabHead. U2PL rep head (DeepLabv3Semi,
deeplabv3.py:57-73): 2048->256 conv stack on backbone output -> ``with_rep``.
"""

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from floodseg_tpu.models.layers import conv, batch_norm
from floodseg_tpu.models.resnet import ResNetFeatures
from floodseg_tpu.models.pspnet import SegHead
from floodseg_tpu.ops.pool import global_avg_pool
from floodseg_tpu.ops.resize import resize_bilinear


class ASPP(nn.Module):
    rates: Sequence[int] = (12, 24, 36)
    out_channels: int = 256
    dropout: float = 0.5   # torchvision ASPP project dropout
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        h, w = x.shape[1], x.shape[2]
        dt, ax = self.dtype, self.axis_name

        branches = []
        y = conv(self.out_channels, 1, use_bias=False, dtype=dt, name="b0_conv")(x)
        y = nn.relu(batch_norm(train, dt, ax, name="b0_bn")(y))
        branches.append(y)
        for i, r in enumerate(self.rates):
            y = conv(self.out_channels, 3, padding=r, dilation=r, use_bias=False,
                     dtype=dt, name=f"b{i + 1}_conv")(x)
            y = nn.relu(batch_norm(train, dt, ax, name=f"b{i + 1}_bn")(y))
            branches.append(y)
        # image pooling branch
        y = global_avg_pool(x)
        y = conv(self.out_channels, 1, use_bias=False, dtype=dt, name="pool_conv")(y)
        y = nn.relu(batch_norm(train, dt, ax, name="pool_bn")(y))
        y = resize_bilinear(y, (h, w), align_corners=False)
        branches.append(y)

        y = jnp.concatenate(branches, axis=-1)
        y = conv(self.out_channels, 1, use_bias=False, dtype=dt, name="project_conv")(y)
        y = nn.relu(batch_norm(train, dt, ax, name="project_bn")(y))
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class DeepLabHead(nn.Module):
    classes: int
    dropout: float = 0.5
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = ASPP(dropout=self.dropout, dtype=self.dtype,
                 axis_name=self.axis_name, name="aspp")(x, train)
        x = conv(256, 3, padding=1, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.relu(batch_norm(train, self.dtype, self.axis_name, name="bn")(x))
        return conv(self.classes, 1, dtype=self.dtype, name="classifier")(x)


class FCNHead(nn.Module):
    classes: int
    dropout: float = 0.1   # torchvision FCNHead dropout
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        mid = x.shape[-1] // 4
        x = conv(mid, 3, padding=1, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.relu(batch_norm(train, self.dtype, self.axis_name, name="bn")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return conv(self.classes, 1, dtype=self.dtype, name="classifier")(x)


class DeepLabV3(nn.Module):
    classes: int = 5
    layers: int = 101
    dropout_scale: float = 1.0   # 0 disables head dropout (parity oracles)
    with_aux: bool = True
    with_rep: bool = False
    remat: bool = False
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    def setup(self):
        self.backbone = ResNetFeatures(
            depth=self.layers, deep_base=False, dilated=True, semseg_dilation=False,
            remat=self.remat, dtype=self.dtype, axis_name=self.axis_name,
            name="backbone",
        )
        self.classifier = DeepLabHead(
            self.classes, 0.5 * self.dropout_scale, self.dtype,
            self.axis_name, name="classifier")
        if self.with_aux:
            self.aux_classifier = FCNHead(
                self.classes, 0.1 * self.dropout_scale, self.dtype,
                self.axis_name, name="aux_classifier")
        if self.with_rep:
            self.rep_head = SegHead(256, 256, 0.1, self.dtype, self.axis_name,
                                    name="rep")

    def encode(self, x, train: bool = False):
        feats = self.backbone(x, train)
        return feats["c4"], feats

    def decode(self, f, train: bool = False):
        return self.classifier(f, train)

    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        f, feats = self.encode(x, train)
        pred = resize_bilinear(self.classifier(f, train), (h, w), align_corners=False)
        out = {"pred": pred}
        if train and self.with_aux:
            aux = self.aux_classifier(feats["c3"], train)
            out["aux"] = resize_bilinear(aux, (h, w), align_corners=False)
        if train and self.with_rep:
            rep = self.rep_head(f, train)
            out["rep"] = resize_bilinear(rep, (h, w), align_corners=True)
        return out

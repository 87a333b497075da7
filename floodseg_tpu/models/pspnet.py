"""PSPNet (deep-base ResNet + pyramid pooling) in flax/NHWC.

Mirrors /root/reference/model/pspnet.py: PPM bins (1,2,3,6) with 2048->512
1x1 conv branches upsampled align_corners=True; cls head 4096->512->classes;
aux head off layer3 (1024->256->classes); zoom_factor 8 (output upsampled
back to the (8k+1)-sized input with align_corners=True).

The encoder/decoder split used by the flow path (FlowPSPNet,
pspnet.py:113-141: encoder = layers+ppm, decoder = cls) is exposed as
``encode``/``decode`` methods instead of module surgery. The U2PL rep head
(PSPNetSemi, pspnet.py:145-161: 4096->256 conv stack on the PPM output) is
the ``with_rep`` flag instead of a forward hook.
"""

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from floodseg_tpu.models.layers import conv, batch_norm
from floodseg_tpu.models.resnet import ResNetFeatures
from floodseg_tpu.ops.pool import adaptive_avg_pool
from floodseg_tpu.ops.resize import resize_bilinear


class PPM(nn.Module):
    reduction_dim: int = 512
    bins: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        h, w = x.shape[1], x.shape[2]
        out = [x]
        for i, b in enumerate(self.bins):
            y = adaptive_avg_pool(x, b)
            y = conv(self.reduction_dim, 1, use_bias=False, dtype=self.dtype,
                     name=f"bin{i}_conv")(y)
            y = batch_norm(train, self.dtype, self.axis_name, name=f"bin{i}_bn")(y)
            y = nn.relu(y)
            out.append(resize_bilinear(y, (h, w), align_corners=True))
        return jnp.concatenate(out, axis=-1)


class SegHead(nn.Module):
    """conv3x3 -> BN -> ReLU -> Dropout -> conv1x1 (cls/aux/rep head shape)."""

    mid: int
    out: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv(self.mid, 3, padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = batch_norm(train, self.dtype, self.axis_name, name="bn")(x)
        x = nn.relu(x)
        # reference heads use nn.Dropout2d (pspnet.py:74,83,155): CHANNEL
        # dropout — whole feature maps zeroed. NHWC ⇒ broadcast over H, W
        x = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                       deterministic=not train)(x)
        return conv(self.out, 1, dtype=self.dtype, name="conv2")(x)


class PSPNet(nn.Module):
    classes: int = 5
    layers: int = 50
    bins: Sequence[int] = (1, 2, 3, 6)
    dropout: float = 0.1
    zoom_factor: int = 8
    with_aux: bool = True
    with_rep: bool = False
    remat: bool = False
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    def setup(self):
        self.backbone = ResNetFeatures(
            depth=self.layers, deep_base=True, dilated=True, semseg_dilation=True,
            remat=self.remat, dtype=self.dtype, axis_name=self.axis_name,
            name="backbone",
        )
        self.ppm = PPM(reduction_dim=2048 // len(self.bins), bins=self.bins,
                       dtype=self.dtype, axis_name=self.axis_name, name="ppm")
        self.cls_head = SegHead(512, self.classes, self.dropout,
                                self.dtype, self.axis_name, name="cls")
        if self.with_aux:
            self.aux_head = SegHead(256, self.classes, self.dropout,
                                    self.dtype, self.axis_name, name="aux")
        if self.with_rep:
            self.rep_head = SegHead(256, 256, self.dropout,
                                    self.dtype, self.axis_name, name="rep")

    def encode(self, x, train: bool = False):
        """Backbone + PPM: the flow-path encoder (4096ch at stride 8)."""
        feats = self.backbone(x, train)
        f = self.ppm(feats["c4"], train)
        return f, feats

    def decode(self, f, train: bool = False):
        """cls head only (the flow-path decoder); no upsampling."""
        return self.cls_head(f, train)

    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        assert (h - 1) % 8 == 0 and (w - 1) % 8 == 0, (
            f"PSPNet input must be 8k+1, got {(h, w)}"  # pspnet.py:89
        )
        f, feats = self.encode(x, train)
        pred = self.cls_head(f, train)
        if self.zoom_factor != 1:
            pred = resize_bilinear(pred, (h, w), align_corners=True)
        out = {"pred": pred}
        if train and self.with_aux:
            aux = self.aux_head(feats["c3"], train)
            if self.zoom_factor != 1:
                aux = resize_bilinear(aux, (h, w), align_corners=True)
            out["aux"] = aux
        if train and self.with_rep:
            rep = self.rep_head(f, train)
            if rep.shape[1] != h or rep.shape[2] != w:
                rep = resize_bilinear(rep, (h, w), align_corners=True)
            out["rep"] = rep
        return out

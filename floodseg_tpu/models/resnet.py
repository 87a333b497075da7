"""ResNet backbones (NHWC, flax.linen).

Two stem/dilation styles, matching the reference's two consumers:

- ``deep_base=True`` + semseg-style dilation: the PSPNet backbone
  (/root/reference/model/resnet.py:108-115 stem; PSPNet mutates EVERY
  bottleneck's conv2 in layer3 to dilation 2 and layer4 to dilation 4 with
  stride 1, /root/reference/model/pspnet.py:55-64).
- ``deep_base=False`` + torchvision-style dilation: the DeepLabV3 backbone
  (torchvision ``replace_stride_with_dilation=[False, True, True]``: the
  first block of a dilated stage keeps the PREVIOUS dilation, subsequent
  blocks use the new one).

Returns a feature pytree {"c2", "c3", "c4"} (layer2/3/4 outputs) so heads
can tap aux (c3) and rep features without forward hooks.
"""

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from floodseg_tpu.models.layers import conv, batch_norm
from floodseg_tpu.ops.pool import max_pool

DEPTH_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = conv(self.planes, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(train, self.dtype, self.axis_name, name="bn1")(y)
        y = nn.relu(y)
        y = conv(
            self.planes, 3, stride=self.stride, padding=self.dilation,
            dilation=self.dilation, use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = batch_norm(train, self.dtype, self.axis_name, name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.planes * 4, 1, use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = batch_norm(train, self.dtype, self.axis_name, name="bn3")(y)
        if self.has_downsample:
            residual = conv(
                self.planes * 4, 1, stride=self.stride, use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = batch_norm(
                train, self.dtype, self.axis_name, name="downsample_bn"
            )(residual)
        return nn.relu(y + residual)


class ResNetFeatures(nn.Module):
    """Feature extractor: stem + layer1..4 -> {"c2","c3","c4"}."""

    depth: int = 50
    deep_base: bool = True
    dilated: bool = True           # dilate layer3 (x2) and layer4 (x4), stride 1
    semseg_dilation: bool = True   # True: all blocks dilated; False: torchvision style
    remat: bool = False            # jax.checkpoint each bottleneck: trades
    #                                ~30% step time for O(depth) less live
    #                                activation memory (needed for U2PL at
    #                                the reference's 873px crops on 16GB HBM)
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        blocks = DEPTH_BLOCKS[self.depth]
        dt, ax = self.dtype, self.axis_name
        block_cls = nn.remat(Bottleneck, static_argnums=(2,)) if self.remat else Bottleneck

        if self.deep_base:
            x = conv(64, 3, stride=2, padding=1, use_bias=False, dtype=dt, name="conv1")(x)
            x = nn.relu(batch_norm(train, dt, ax, name="bn1")(x))
            x = conv(64, 3, padding=1, use_bias=False, dtype=dt, name="conv2")(x)
            x = nn.relu(batch_norm(train, dt, ax, name="bn2")(x))
            x = conv(128, 3, padding=1, use_bias=False, dtype=dt, name="conv3")(x)
            x = nn.relu(batch_norm(train, dt, ax, name="bn3")(x))
        else:
            x = conv(64, 7, stride=2, padding=3, use_bias=False, dtype=dt, name="conv1")(x)
            x = nn.relu(batch_norm(train, dt, ax, name="bn1")(x))
        x = max_pool(x, 3, 2, 1)

        def stage(x, planes, n_blocks, stride, dilations, name):
            in_feats = x.shape[-1]
            for i in range(n_blocks):
                x = block_cls(
                    planes=planes,
                    stride=stride if i == 0 else 1,
                    dilation=dilations[i],
                    has_downsample=(i == 0 and (stride != 1 or in_feats != planes * 4)),
                    dtype=dt,
                    axis_name=ax,
                    name=f"{name}_block{i}",
                )(x, train)
            return x

        def stage_dilations(n_blocks, new_dilation, prev_dilation):
            if not self.dilated or new_dilation == 1:
                return [1] * n_blocks
            if self.semseg_dilation:
                return [new_dilation] * n_blocks
            return [prev_dilation] + [new_dilation] * (n_blocks - 1)

        x = stage(x, 64, blocks[0], 1, [1] * blocks[0], "layer1")
        x = stage(x, 128, blocks[1], 2, [1] * blocks[1], "layer2")
        c2 = x
        s3 = 1 if self.dilated else 2
        x = stage(x, 256, blocks[2], s3, stage_dilations(blocks[2], 2 if self.dilated else 1, 1), "layer3")
        c3 = x
        s4 = 1 if self.dilated else 2
        x = stage(x, 512, blocks[3], s4, stage_dilations(blocks[3], 4 if self.dilated else 1, 2), "layer4")
        return {"c2": c2, "c3": c3, "c4": x}

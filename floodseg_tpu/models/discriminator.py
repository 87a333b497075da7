"""s4GAN discriminator (reference /root/reference/util/gan.py:10-43).

Four stride-2 4x4 convs (ndf 64->512) with LeakyReLU(0.2) + Dropout(0.5),
global average pool, linear head. Returns (confidence LOGIT, pooled feature
map): unlike the reference we keep the head pre-sigmoid and pair it with a
from-logits BCE for numerical stability; callers needing the probability
apply sigmoid (e.g. the self-training threshold test).
"""

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from floodseg_tpu.models.layers import conv
from floodseg_tpu.ops.pool import global_avg_pool


class S4GANDiscriminator(nn.Module):
    num_classes: int = 5
    ndf: int = 64
    dropout: float = 0.5        # reference Dropout2d(0.5); 0 for oracles
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None  # no BN; uniform API

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, classes+3) softmax-pred ⊕ normalized image."""
        # Reference uses nn.Dropout2d (util/gan.py:14): CHANNEL dropout —
        # whole feature maps zeroed per sample. NHWC ⇒ broadcast over H, W.
        drop = lambda y: nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                                    deterministic=not train)(y)
        y = conv(self.ndf, 4, stride=2, padding=1, dtype=self.dtype, name="conv1")(x)
        y = drop(nn.leaky_relu(y, 0.2))
        y = conv(self.ndf * 2, 4, stride=2, padding=1, dtype=self.dtype, name="conv2")(y)
        y = drop(nn.leaky_relu(y, 0.2))
        y = conv(self.ndf * 4, 4, stride=2, padding=1, dtype=self.dtype, name="conv3")(y)
        y = drop(nn.leaky_relu(y, 0.2))
        y = conv(self.ndf * 8, 4, stride=2, padding=1, dtype=self.dtype, name="conv4")(y)
        y = nn.leaky_relu(y, 0.2)
        feat = global_avg_pool(y, keepdims=False)  # (B, ndf*8)
        logit = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32, precision="highest", name="final")(feat)
        return logit[:, 0], feat

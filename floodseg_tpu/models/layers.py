"""Shared flax building blocks with torch-matching semantics (NHWC)."""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def conv(
    features: int,
    kernel_size: int,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    use_bias: bool = True,
    dtype: Any = jnp.float32,
    name: Optional[str] = None,
) -> nn.Conv:
    """torch nn.Conv2d-semantics conv (explicit symmetric padding)."""
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        # f32 means f32: XLA backends may otherwise pick reduced-precision
        # conv algorithms (CPU oneDNN/AMX, TPU bf16 passes). bf16 compute
        # (the perf path) is unaffected by this flag.
        precision="highest",
        name=name,
    )


def batch_norm(
    train: bool,
    dtype: Any = jnp.float32,
    axis_name: Optional[str] = None,
    name: Optional[str] = None,
) -> nn.BatchNorm:
    """torch nn.BatchNorm2d semantics (eps 1e-5, torch momentum 0.1).

    Under pjit the batch axis is a global logical axis, so batch statistics
    are computed over the full cross-device batch — this IS SyncBatchNorm
    (the reference converts every model with convert_sync_batchnorm, e.g.
    /root/reference/supervised.py:113-117). ``axis_name`` additionally syncs
    stats inside shard_map/pmap contexts.
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        axis_name=axis_name,
        name=name,
    )


class DropPath(nn.Module):
    """Stochastic depth (timm DropPath). No-op when rate == 0 or eval."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if self.rate == 0.0 or det:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x / keep * mask

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


class TorchBatchNorm(nn.Module):
    """BatchNorm with EXACT torch nn.BatchNorm2d running-stat semantics.

    flax's nn.BatchNorm updates running_var with the BIASED batch variance;
    torch uses the UNBIASED one (factor n/(n-1), n = elements per channel,
    summed across devices under SyncBatchNorm). That residue is ~1/n
    relative — invisible at production resolutions (~4e-5 at 873^2 crops)
    but it is the one systematic divergence the composed train-trajectory
    oracles kept having to tolerate, and it becomes DISCRETE when an
    eval-mode teacher's argmax pseudo-labels consume the running stats
    (U2PL, contrastive.py:221-226). Normalization itself uses the biased
    variance on both sides, exactly like torch.

    Variable/param names match nn.BatchNorm ("mean"/"var", "scale"/"bias")
    so converters and checkpoints are unaffected.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((features,), self.param_dtype))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((features,), self.param_dtype))
        scale = self.param("scale", nn.initializers.ones, (features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          self.param_dtype)

        dt = jnp.promote_types(self.dtype, jnp.float32)
        initializing = self.is_mutable_collection("params")

        if self.use_running_average:
            mean = ra_mean.value.astype(dt)
            var = ra_var.value.astype(dt)
        else:
            red = tuple(range(x.ndim - 1))
            xc = x.astype(dt)
            mean = jnp.mean(xc, red)
            mean2 = jnp.mean(jnp.square(xc), red)
            n = x.size / features
            if self.axis_name is not None and not initializing:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not initializing:
                m = self.momentum
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (m * ra_mean.value
                                 + (1.0 - m) * mean.astype(ra_mean.value.dtype))
                ra_var.value = (m * ra_var.value
                                + (1.0 - m) * unbiased.astype(ra_var.value.dtype))

        y = (x.astype(dt) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(dt) + bias.astype(dt)
        return y.astype(self.dtype)


def batch_norm(
    train: bool,
    dtype: Any = jnp.float32,
    axis_name: Optional[str] = None,
    name: Optional[str] = None,
) -> TorchBatchNorm:
    """torch nn.BatchNorm2d semantics (eps 1e-5, torch momentum 0.1, and
    torch's unbiased running_var update — see TorchBatchNorm).

    Under pjit the batch axis is a global logical axis, so batch statistics
    are computed over the full cross-device batch — this IS SyncBatchNorm
    (the reference converts every model with convert_sync_batchnorm, e.g.
    /root/reference/supervised.py:113-117). ``axis_name`` additionally syncs
    stats inside shard_map/pmap contexts.
    """
    return TorchBatchNorm(
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

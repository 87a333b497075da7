"""Pooling ops in NHWC.

- ``adaptive_avg_pool`` reproduces ``nn.AdaptiveAvgPool2d`` (used by the
  reference's PPM bins, /root/reference/model/pspnet.py:21, and the s4GAN
  discriminator head, /root/reference/util/gan.py:33) as separable averaging
  matrices contracted on the MXU.
- ``max_pool`` reproduces ``nn.MaxPool2d(kernel_size=3, stride=2, padding=1)``
  from the ResNet stem (/root/reference/model/resnet.py:117).
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=128)
def _adaptive_avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) averaging matrix with torch's adaptive bin edges."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """Adaptive average pool NHWC ``x`` to spatial ``output_size=(H, W)``."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    h_out, w_out = output_size
    b, h_in, w_in, c = x.shape
    dtype = x.dtype
    # promote (not hardcode f32): f64 oracle runs must stay exact
    cdt = jnp.promote_types(dtype, jnp.float32)
    mh = jnp.asarray(_adaptive_avg_matrix(h_in, h_out), dtype=cdt)
    mw = jnp.asarray(_adaptive_avg_matrix(w_in, w_out), dtype=cdt)
    y = x.astype(cdt)
    y = jnp.einsum("oh,bhwc->bowc", mh, y, precision="highest")
    y = jnp.einsum("pw,bhwc->bhpc", mw, y, precision="highest")
    return y.astype(dtype)


def max_pool(x: jnp.ndarray, window: int = 3, stride: int = 2, padding: int = 1) -> jnp.ndarray:
    """Max pool NHWC ``x`` (torch ``nn.MaxPool2d`` semantics, pad with -inf)."""
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)

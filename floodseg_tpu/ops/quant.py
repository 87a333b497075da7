"""Post-training int8 quantization of the flow-predict decoder.

The fused predict program is decoder-bound on v5e (TODO.md phase profile:
the cls-head 3x3 conv is ~30 ms of the ~46 ms program). The v5e MXU runs
int8 x int8 -> int32 at twice the bf16 rate; measured on the exact decoder
shape (25x65x65x4096 -> 3x3 -> 512) the quantized conv + dequant epilogue
runs 19.2 ms vs 30.5 ms bf16 (207.7 TOPS vs 130.8 TFLOPS).

This module implements the standard production PTQ recipe for the SegHead
decoder (models/pspnet.py::SegHead = conv3x3 -> BN -> ReLU -> Dropout ->
conv1x1, mirroring /root/reference/model/pspnet.py:96-103):

- eval-mode BN is an affine map, so it FOLDS into the 3x3 conv:
  w' = w * gamma/sqrt(var+eps) (per out-channel), b' = beta - mean * that.
- weights: symmetric per-out-channel int8 (absmax / 127).
- activations: symmetric per-tensor int8 with a DYNAMIC absmax scale
  computed in-program from the fused feature map — no calibration set
  needed, and the scale tracks whatever video is being segmented.
- the int32 accumulator dequantizes in the conv epilogue (sx * sw[c]),
  adds the folded BN bias, ReLU, then the tiny 512->classes 1x1 conv runs
  in the model's compute dtype as before.

Everything here is pure jnp on the variables pytree — it runs inside the
jitted predict program, so the (cheap) weight-quantization ops are fused
into the same executable and checkpoints stay full-precision. Opt-in via
``model.int8_decode`` (predict path only); the reference has no equivalent
(its decoder runs fp16/fp32 cuDNN).
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax


def fold_bn(w: jnp.ndarray, gamma, beta, mean, var, eps: float = 1e-5):
    """Fold eval-mode BN (y = gamma*(x-mean)/sqrt(var+eps)+beta) into a
    preceding bias-free conv. w: (kh, kw, cin, cout). Returns (w', b')."""
    s = gamma.astype(jnp.float32) * lax.rsqrt(var.astype(jnp.float32) + eps)
    w_f = w.astype(jnp.float32) * s[None, None, None, :]
    b_f = beta.astype(jnp.float32) - mean.astype(jnp.float32) * s
    return w_f, b_f


def quantize_weight_per_channel(w: jnp.ndarray):
    """Symmetric per-out-channel int8: absmax over (kh, kw, cin)."""
    scale = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    scale = jnp.maximum(scale, jnp.finfo(jnp.float32).tiny)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_activation_dynamic(x: jnp.ndarray):
    """Symmetric per-tensor int8 with an in-program absmax scale."""
    scale = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
    scale = jnp.maximum(scale, jnp.finfo(jnp.float32).tiny)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def conv_int8(x_q: jnp.ndarray, w_q: jnp.ndarray, padding):
    """int8 x int8 -> int32 conv (NHWC/HWIO), the v5e MXU int8 path."""
    dn = lax.conv_dimension_numbers(x_q.shape, w_q.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x_q, w_q, window_strides=(1, 1), padding=padding,
        dimension_numbers=dn, preferred_element_type=jnp.int32)


def _require(tree: Dict, keys, what: str):
    node = tree
    for k in keys:
        if not isinstance(node, dict) or k not in node:
            raise ValueError(
                f"int8_decode requires a SegHead-shaped decoder "
                f"({what}[{'/'.join(keys)}] missing) — it supports the "
                f"pspnet cls head; use bf16 decode for other archs")
        node = node[k]
    return node


def int8_seghead_decode(params: Dict[str, Any], stats: Dict[str, Any],
                        f: jnp.ndarray, dtype: Any = jnp.bfloat16,
                        eps: float = 1e-5) -> jnp.ndarray:
    """SegHead eval forward with the 3x3 conv in int8 (BN folded).

    params/stats: the head's subtree (e.g. variables["params"]["cls"] /
    variables["batch_stats"]["cls"]). f: (B, H, W, CIN) features. Matches
    SegHead(train=False) up to quantization error; dropout is eval-off.
    """
    w1 = _require(params, ("conv1", "kernel"), "params")
    gamma = _require(params, ("bn", "scale"), "params")
    beta = _require(params, ("bn", "bias"), "params")
    mean = _require(stats, ("bn", "mean"), "batch_stats")
    var = _require(stats, ("bn", "var"), "batch_stats")

    w_f, b_f = fold_bn(w1, gamma, beta, mean, var, eps)
    w_q, sw = quantize_weight_per_channel(w_f)
    x_q, sx = quantize_activation_dynamic(f)

    acc = conv_int8(x_q, w_q, padding=((1, 1), (1, 1)))
    y = acc.astype(jnp.float32) * (sx * sw) + b_f
    y = jax.nn.relu(y).astype(dtype)

    w2 = params["conv2"]["kernel"].astype(dtype)
    b2 = params["conv2"]["bias"].astype(dtype)
    dn = lax.conv_dimension_numbers(y.shape, w2.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(y, w2, (1, 1), ((0, 0), (0, 0)),
                                   dimension_numbers=dn)
    return out + b2


def seghead_decode_folded_f32(params: Dict[str, Any], stats: Dict[str, Any],
                              f: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Full-precision BN-folded SegHead eval forward (test oracle for the
    folding algebra: must match model.apply(..., method='decode') exactly
    in f32, isolating fold error (≈0) from quantization error)."""
    w1 = params["conv1"]["kernel"]
    w_f, b_f = fold_bn(w1, params["bn"]["scale"], params["bn"]["bias"],
                       stats["bn"]["mean"], stats["bn"]["var"], eps)
    x = f.astype(jnp.float32)
    dn = lax.conv_dimension_numbers(x.shape, w_f.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x, w_f, (1, 1), ((1, 1), (1, 1)),
                                 dimension_numbers=dn) + b_f
    y = jax.nn.relu(y)
    w2 = params["conv2"]["kernel"].astype(jnp.float32)
    b2 = params["conv2"]["bias"].astype(jnp.float32)
    dn2 = lax.conv_dimension_numbers(y.shape, w2.shape,
                                     ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(y, w2, (1, 1), ((0, 0), (0, 0)),
                                    dimension_numbers=dn2) + b2

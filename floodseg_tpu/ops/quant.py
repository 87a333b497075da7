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


#: archs whose flow-predict decoder has an int8 path (pspnet SegHead,
#: deeplabv3 DeepLabHead); the vit MaskTransformer does not
INT8_DECODE_ARCHS = ("pspnet", "deeplabv3")


def int8_auto_default(arch: str) -> bool:
    """Resolve the int8_decode=None AUTO default: quantized decode for a
    supported arch on a backend with the 2x int8 MXU rate. Single source of
    truth for the Runner, bench.py, and the tests."""
    import jax
    return (arch in INT8_DECODE_ARCHS
            and jax.default_backend() in ("tpu", "axon"))


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


def scale_from_absmax(absmax) -> jnp.ndarray:
    """Symmetric int8 scale from an |max| bound (shared by every caller so
    pre-quantized inputs and in-decode quantization agree bit-exactly)."""
    scale = absmax.astype(jnp.float32) / 127.0
    return jnp.maximum(scale, jnp.finfo(jnp.float32).tiny)


def quantize_with_scale(x: jnp.ndarray, scale) -> jnp.ndarray:
    """int8 quantization at a FIXED scale. Because the scale does not
    depend on x, quantizing tensor pieces separately and concatenating is
    bit-identical to quantizing the concatenation — which lets XLA fuse
    each piece's quantization into its producer instead of re-reading a
    large concatenated stack (the flow-predict decode input)."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8)


def quantize_activation_dynamic(x: jnp.ndarray, absmax=None):
    """Symmetric per-tensor int8 with an in-program absmax scale.

    ``absmax``: optional precomputed upper bound on ``max|x|`` (a traced
    scalar). Callers that know a bound from an EARLIER, smaller tensor pass
    it so XLA can fuse the quantization into x's producer instead of
    scheduling a full extra read of x for the reduction — e.g. the flow
    predict stack, whose post-resize values are convex combinations of the
    grid-resolution chains (bilinear weights are in [0,1] and sum to 1), so
    the chains' absmax is a valid, nearly-tight bound. If ``x`` is already
    int8, it was pre-quantized with quantize_with_scale at the SAME
    absmax-derived scale and passes through untouched."""
    if x.dtype == jnp.int8:
        assert absmax is not None, "pre-quantized input needs its absmax"
        return x, scale_from_absmax(absmax)
    if absmax is None:
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = scale_from_absmax(absmax)
    return quantize_with_scale(x, scale), scale


def conv_int8(x_q: jnp.ndarray, w_q: jnp.ndarray, padding, dilation=(1, 1)):
    """int8 x int8 -> int32 conv (NHWC/HWIO), the v5e MXU int8 path."""
    dn = lax.conv_dimension_numbers(x_q.shape, w_q.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x_q, w_q, window_strides=(1, 1), padding=padding,
        rhs_dilation=dilation, dimension_numbers=dn,
        preferred_element_type=jnp.int32)


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
                        eps: float = 1e-5, act_absmax=None) -> jnp.ndarray:
    """SegHead eval forward with the 3x3 conv in int8 (BN folded).

    params/stats: the head's subtree (e.g. variables["params"]["cls"] /
    variables["batch_stats"]["cls"]). f: (B, H, W, CIN) features. Matches
    SegHead(train=False) up to quantization error; dropout is eval-off.
    ``act_absmax``: optional precomputed bound on max|f| (see
    quantize_activation_dynamic).
    """
    w1 = _require(params, ("conv1", "kernel"), "params")
    gamma = _require(params, ("bn", "scale"), "params")
    beta = _require(params, ("bn", "bias"), "params")
    mean = _require(stats, ("bn", "mean"), "batch_stats")
    var = _require(stats, ("bn", "var"), "batch_stats")

    w_f, b_f = fold_bn(w1, gamma, beta, mean, var, eps)
    w_q, sw = quantize_weight_per_channel(w_f)
    x_q, sx = quantize_activation_dynamic(f, absmax=act_absmax)

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


def _fold_quant(params, stats, conv_name, bn_name, eps):
    """Fold a conv+BN pair and quantize the folded weight: (w_q, sw, b_f)."""
    w = _require(params, (conv_name, "kernel"), "params")
    gamma = _require(params, (bn_name, "scale"), "params")
    beta = _require(params, (bn_name, "bias"), "params")
    mean = _require(stats, (bn_name, "mean"), "batch_stats")
    var = _require(stats, (bn_name, "var"), "batch_stats")
    w_f, b_f = fold_bn(w, gamma, beta, mean, var, eps)
    w_q, sw = quantize_weight_per_channel(w_f)
    return w_q, sw, b_f


def int8_deeplab_decode(params: Dict[str, Any], stats: Dict[str, Any],
                        f: jnp.ndarray, dtype: Any = jnp.bfloat16,
                        rates=(12, 24, 36), eps: float = 1e-5,
                        act_absmax=None) -> jnp.ndarray:
    """DeepLabHead eval forward with the heavy convs in int8 (BN folded).

    Matches models/deeplabv3.py::DeepLabHead(train=False) (torchvision
    DeepLabHead, /root/reference/model/deeplabv3.py:15-19) up to
    quantization error. int8 on the MXU: the ASPP 1x1 + three dilated 3x3
    branch convs over the 2048-ch input (one shared activation scale), the
    1280->256 projection, and the trailing 3x3 — together ~97% of the
    head's FLOPs. Full precision: the 1x1-spatial pooling branch and the
    tiny classifier 1x1. params/stats: the head's subtree (e.g.
    variables["params"]["classifier"]).
    """
    aspp_p = _require(params, ("aspp",), "params")
    aspp_s = _require(stats, ("aspp",), "batch_stats")
    h, w = f.shape[1], f.shape[2]

    x_q, sx = quantize_activation_dynamic(f, absmax=act_absmax)

    branches = []
    w_q, sw, b_f = _fold_quant(aspp_p, aspp_s, "b0_conv", "b0_bn", eps)
    acc = conv_int8(x_q, w_q, padding=((0, 0), (0, 0)))
    branches.append(jax.nn.relu(acc.astype(jnp.float32) * (sx * sw) + b_f))
    for i, r in enumerate(rates):
        w_q, sw, b_f = _fold_quant(aspp_p, aspp_s, f"b{i + 1}_conv",
                                   f"b{i + 1}_bn", eps)
        acc = conv_int8(x_q, w_q, padding=((r, r), (r, r)), dilation=(r, r))
        branches.append(
            jax.nn.relu(acc.astype(jnp.float32) * (sx * sw) + b_f))

    # image-pooling branch: 1x1 spatial — negligible FLOPs, stays full
    # precision (quantizing it would add error for zero speedup); a
    # pre-quantized input dequantizes through its scale first
    from floodseg_tpu.ops.resize import resize_bilinear
    f_real = (x_q.astype(jnp.float32) * sx if f.dtype == jnp.int8
              else f.astype(jnp.float32))
    y = jnp.mean(f_real, axis=(1, 2), keepdims=True)
    wp, bp = fold_bn(aspp_p["pool_conv"]["kernel"],
                     aspp_p["pool_bn"]["scale"], aspp_p["pool_bn"]["bias"],
                     aspp_s["pool_bn"]["mean"], aspp_s["pool_bn"]["var"], eps)
    y = jax.nn.relu(jnp.einsum("bhwi,io->bhwo", y, wp[0, 0]) + bp)
    branches.append(resize_bilinear(y, (h, w), align_corners=False))

    cat = jnp.concatenate(branches, axis=-1)
    c_q, sc = quantize_activation_dynamic(cat)
    w_q, sw, b_f = _fold_quant(aspp_p, aspp_s, "project_conv",
                               "project_bn", eps)
    acc = conv_int8(c_q, w_q, padding=((0, 0), (0, 0)))
    proj = jax.nn.relu(acc.astype(jnp.float32) * (sc * sw) + b_f)
    # (ASPP project dropout is eval-off)

    p_q, sp = quantize_activation_dynamic(proj)
    w_q, sw, b_f = _fold_quant(params, stats, "conv", "bn", eps)
    acc = conv_int8(p_q, w_q, padding=((1, 1), (1, 1)))
    y = jax.nn.relu(acc.astype(jnp.float32) * (sp * sw) + b_f).astype(dtype)

    w2 = params["classifier"]["kernel"].astype(dtype)
    b2 = params["classifier"]["bias"].astype(dtype)
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

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


def conv_int8(x_q: jnp.ndarray, w_q: jnp.ndarray, padding, dilation=(1, 1),
              strides=(1, 1)):
    """int8 x int8 -> int32 conv (NHWC/HWIO), the v5e MXU int8 path."""
    dn = lax.conv_dimension_numbers(x_q.shape, w_q.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x_q, w_q, window_strides=strides, padding=padding,
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


def _int8_conv_bn(params, stats, conv_name, bn_name, x_q, sx, *,
                  strides=(1, 1), padding=((0, 0), (0, 0)), dilation=(1, 1),
                  eps: float = 1e-5, relu: bool = True):
    """One quantized conv+foldedBN(+ReLU): int8 input at scale sx -> f32."""
    w_q, sw, b_f = _fold_quant(params, stats, conv_name, bn_name, eps)
    acc = conv_int8(x_q, w_q, padding=padding, dilation=dilation,
                    strides=strides)
    y = acc.astype(jnp.float32) * (sx * sw) + b_f
    return jax.nn.relu(y) if relu else y


def _conv_bn_relu_folded(params, stats, conv_name, bn_name, x, *,
                         strides=(1, 1), padding=((0, 0), (0, 0)),
                         dtype=jnp.bfloat16, eps: float = 1e-5):
    """Full-precision (compute-dtype) conv with BN folded — the stem path."""
    w = _require(params, (conv_name, "kernel"), "params")
    w_f, b_f = fold_bn(w, params[bn_name]["scale"], params[bn_name]["bias"],
                       stats[bn_name]["mean"], stats[bn_name]["var"], eps)
    dn = lax.conv_dimension_numbers(x.shape, w_f.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x.astype(dtype), w_f.astype(dtype), strides, padding,
        dimension_numbers=dn, preferred_element_type=jnp.float32)
    return jax.nn.relu(y + b_f).astype(dtype)


def _int8_bottleneck(p, s, x, stride: int, dilation: int, dtype, eps: float):
    """models/resnet.py::Bottleneck eval forward, the three bias-free convs
    (+ downsample) in int8 with their BNs folded. The residual add and ReLU
    stay full precision; the block input is quantized ONCE (conv1 and the
    downsample conv share its scale)."""
    x_q, sx = quantize_activation_dynamic(x)
    y = _int8_conv_bn(p, s, "conv1", "bn1", x_q, sx, eps=eps).astype(dtype)
    y_q, sy = quantize_activation_dynamic(y)
    d = (dilation, dilation)
    y = _int8_conv_bn(p, s, "conv2", "bn2", y_q, sy, strides=(stride, stride),
                      padding=(d, d), dilation=d, eps=eps).astype(dtype)
    y_q, sy = quantize_activation_dynamic(y)
    y = _int8_conv_bn(p, s, "conv3", "bn3", y_q, sy, relu=False, eps=eps)
    if "downsample_conv" in p:
        residual = _int8_conv_bn(p, s, "downsample_conv", "downsample_bn",
                                 x_q, sx, strides=(stride, stride),
                                 relu=False, eps=eps)
    else:
        residual = x.astype(jnp.float32)
    return jax.nn.relu(y + residual).astype(dtype)


def int8_resnet_trunk(params: Dict[str, Any], stats: Dict[str, Any],
                      x: jnp.ndarray, *, depth: int = 50,
                      deep_base: bool = True, semseg_dilation: bool = True,
                      dtype: Any = jnp.bfloat16,
                      eps: float = 1e-5) -> jnp.ndarray:
    """models/resnet.py::ResNetFeatures eval forward (dilated os-8 trunks
    only — both flow backbones) with every bottleneck conv in int8.

    W8A8 PTQ, same recipe as the decoders: BN folded into each bias-free
    conv, symmetric per-out-channel int8 weights, dynamic per-tensor
    activation scales computed in-program. The stem runs in the compute
    dtype (closest to the input, <5% of trunk FLOPs) and residual adds stay
    full precision, bounding error growth through the 16-33 blocks. Returns
    c4 (B, H/8, W/8, 2048).
    """
    from floodseg_tpu.ops.pool import max_pool

    blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[depth]
    if deep_base:
        p1 = ((1, 1), (1, 1))
        x = _conv_bn_relu_folded(params, stats, "conv1", "bn1", x,
                                 strides=(2, 2), padding=p1, dtype=dtype, eps=eps)
        x = _conv_bn_relu_folded(params, stats, "conv2", "bn2", x,
                                 padding=p1, dtype=dtype, eps=eps)
        x = _conv_bn_relu_folded(params, stats, "conv3", "bn3", x,
                                 padding=p1, dtype=dtype, eps=eps)
    else:
        x = _conv_bn_relu_folded(params, stats, "conv1", "bn1", x,
                                 strides=(2, 2), padding=((3, 3), (3, 3)),
                                 dtype=dtype, eps=eps)
    x = max_pool(x, 3, 2, 1)

    def dils(n, new, prev):
        if new == 1:
            return [1] * n
        if semseg_dilation:
            return [new] * n
        return [prev] + [new] * (n - 1)

    stages = [("layer1", blocks[0], 1, [1] * blocks[0]),
              ("layer2", blocks[1], 2, [1] * blocks[1]),
              ("layer3", blocks[2], 1, dils(blocks[2], 2, 1)),
              ("layer4", blocks[3], 1, dils(blocks[3], 4, 2))]
    for name, n, stride, dd in stages:
        for i in range(n):
            key = f"{name}_block{i}"
            x = _int8_bottleneck(params[key], stats[key], x,
                                 stride if i == 0 else 1, dd[i], dtype, eps)
    return x


def ppm_folded(params: Dict[str, Any], stats: Dict[str, Any], f: jnp.ndarray,
               bins=(1, 2, 3, 6), dtype: Any = jnp.bfloat16,
               eps: float = 1e-5) -> jnp.ndarray:
    """models/pspnet.py::PPM eval forward with BN folded into the 1x1 bin
    convs. The bin maps are tiny (<=6x6), so this stays full precision —
    it exists so the int8 encoder path needs no flax apply for the PPM."""
    from floodseg_tpu.ops.pool import adaptive_avg_pool
    from floodseg_tpu.ops.resize import resize_bilinear

    h, w = f.shape[1], f.shape[2]
    out = [f]
    for i, b in enumerate(bins):
        y = adaptive_avg_pool(f.astype(jnp.float32), b)
        wp, bp = fold_bn(params[f"bin{i}_conv"]["kernel"],
                         params[f"bin{i}_bn"]["scale"],
                         params[f"bin{i}_bn"]["bias"],
                         stats[f"bin{i}_bn"]["mean"],
                         stats[f"bin{i}_bn"]["var"], eps)
        y = jax.nn.relu(jnp.einsum("bhwi,io->bhwo", y, wp[0, 0]) + bp)
        out.append(resize_bilinear(y.astype(dtype), (h, w),
                                   align_corners=True))
    return jnp.concatenate(out, axis=-1)


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

"""Bilinear resize as separable matrix multiplies (MXU-friendly).

The reference uses ``F.interpolate(mode='bilinear')`` with both
``align_corners=True`` (model upsampling, e.g. /root/reference/model/pspnet.py:103)
and ``align_corners=False`` (Segmenter mask upsampling,
/root/reference/segm/model/segmenter.py:45). On TPU, a bilinear resize is a
pair of sparse row/column interpolation matrices; we materialize them as
dense constants at trace time (shapes are static under jit) and contract on
the MXU. This is exact (same weights torch computes) and much faster on TPU
than a gather formulation for the sizes this framework uses.
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=256)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros(1, dtype=np.float64)
        else:
            src = i * (in_size - 1) / (out_size - 1)
    else:
        # half-pixel centers; edge values replicate (torch/cv2 semantics)
        src = (i + 0.5) * in_size / out_size - 0.5
    i0 = np.floor(src).astype(np.int64)
    w1 = (src - i0).astype(np.float64)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    i0 = np.clip(i0, 0, in_size - 1)
    np.add.at(m, (np.arange(out_size), i0), 1.0 - w1)
    np.add.at(m, (np.arange(out_size), i1), w1)
    return m  # f64 master copy; resize_bilinear casts per input dtype


def resize_bilinear(x: jnp.ndarray, size, align_corners: bool = True,
                    fast_lowp: bool = False) -> jnp.ndarray:
    """Bilinearly resize NHWC (or HWC) ``x`` to spatial ``size=(H, W)``.

    Matches ``torch.nn.functional.interpolate(mode='bilinear', align_corners=...)``
    exactly (up to float associativity).

    ``fast_lowp``: keep the between-axes intermediate (and the matrices) in
    the INPUT dtype instead of f32 — for a bf16 input this halves the HBM
    traffic of the intermediate. Rounding error is ~bf16 eps (~0.4%), so
    this is only used where a coarser approximation immediately follows
    (the int8-quantized flow-predict decode); every parity path keeps the
    default exact f32 compute.
    """
    h_out, w_out = int(size[0]), int(size[1])
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h_in, w_in, c = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x[0] if squeeze else x
    dtype = x.dtype
    # f32 compute for bf16/f32 inputs (unchanged); true f64 under x64 so
    # the f64 parity oracles stay exact
    cdt = dtype if fast_lowp else jnp.promote_types(dtype, jnp.float32)
    mh = jnp.asarray(_interp_matrix(h_in, h_out, align_corners), dtype=cdt)
    mw = jnp.asarray(_interp_matrix(w_in, w_out, align_corners), dtype=cdt)
    y = x.astype(cdt)
    # 'highest' keeps the interpolation in true f32 on the MXU (the matrices
    # have <=2 nonzeros per row; this is bandwidth-, not FLOP-, bound)
    y = jnp.einsum("oh,bhwc->bowc", mh, y, precision="highest")
    y = jnp.einsum("pw,bhwc->bhpc", mw, y, precision="highest")
    y = y.astype(dtype)
    return y[0] if squeeze else y


def resize_argmax(x: jnp.ndarray, size, align_corners: bool = True) -> jnp.ndarray:
    """``argmax(resize_bilinear(x, size), -1)`` with the resize laid out
    channels-FIRST: for class-logit maps C is tiny (e.g. 5) and on TPU the
    NHWC form puts C on the lane dimension, padding 5 -> 128 on the full-
    resolution f32 intermediate. Transposing the small pre-resize tensor and
    contracting with W on the lane dim keeps the big intermediate dense.
    Same interpolation matrices, same f32 'highest' contractions as
    resize_bilinear, and the resized values are rounded back to the input
    dtype before the argmax (as the unfused form does), so the result is
    elementwise-equal to ``argmax(resize_bilinear(x, size), -1)`` for every
    input dtype — including bf16 logits from the int8 decode — up to exact
    ties. Returns int32 class maps of shape (..., H, W)."""
    h_out, w_out = int(size[0]), int(size[1])
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h_in, w_in, c = x.shape
    if (h_in, w_in) == (h_out, w_out):
        y = jnp.argmax(x, axis=-1).astype(jnp.int32)
        return y[0] if squeeze else y
    cdt = jnp.promote_types(x.dtype, jnp.float32)
    mh = jnp.asarray(_interp_matrix(h_in, h_out, align_corners), dtype=cdt)
    mw = jnp.asarray(_interp_matrix(w_in, w_out, align_corners), dtype=cdt)
    y = jnp.transpose(x.astype(cdt), (0, 3, 1, 2))
    y = jnp.einsum("oh,bchw->bcow", mh, y, precision="highest")
    y = jnp.einsum("pw,bchw->bchp", mw, y, precision="highest")
    # round back to the input dtype before the argmax: resize_bilinear
    # returns dtype-rounded values, so this keeps the fused form
    # elementwise-equal for bf16 logits too (near-tie pixels otherwise
    # resolve differently at f32)
    y = jnp.argmax(y.astype(x.dtype), axis=1).astype(jnp.int32)
    return y[0] if squeeze else y

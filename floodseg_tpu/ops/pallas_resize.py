"""Fused bilinear-resize + int8-quantize Pallas kernel (flow predict).

The int8 flow-predict program quantizes the blended interpolation stack at
a fixed, hint-derived scale right after resizing it from grid resolution to
feature resolution (video/flow_model.py). As two XLA passes the separable
resize materializes its between-axes intermediate in HBM — for the bench
shape (23, 32, 32, 4096)->(65, 65) that is a ~390 MB bf16 round trip that
dominates the pass (trace r4: 2.41 ms/window of 24.0 ms). This kernel does
both interpolation contractions in VMEM per (map, channel-block) grid step
and folds the quantization into the output write, so HBM traffic drops to
read-input + write-int8 (~0.6 GB vs ~1.6 GB).

Numerics are BIT-IDENTICAL to the composition it replaces::

    quantize_with_scale(resize_bilinear(x, hw, align_corners, fast_lowp=True),
                        scale)

in its AS-WRITTEN semantics — i.e. with the bf16 output round that
resize_bilinear's ``astype(dtype)`` denotes actually performed (eager
execution, interpreter mode, or a fold-proof jitted form). Caveat, pinned in
tests/test_pallas_resize.py::test_bit_parity_tpu: when the composition is
jitted as ONE program on TPU, XLA folds the dot's f32->bf16 output convert
into the quantize's bf16->f32 convert and silently skips that round, so the
compiled fallback differs from this kernel by +/-1 int8 on ~1.6% of lanes
(both are within the int8 quantization error that follows; the kernel is
the faithful one).

- the interpolation matrices are cast to x.dtype (bf16) exactly as
  resize_bilinear(fast_lowp=True) does;
- the H-axis contraction runs first, accumulates f32 on the MXU
  (== einsum precision='highest'), and rounds to x.dtype between the axes;
- round/clip/cast match ops/quant.py::quantize_with_scale.

The reference has no analogue (its decode consumes the fp32 stack directly,
/root/reference/flow/model.py:166-179).

STATUS (r5 measurement): OPT-IN, not production. The isolated-trace
motivation (save the ~390 MB between-axes HBM round trip) does not survive
end-to-end: the on-chip A-B (bench.py, median of repeated passes) reads
798.7 fps WITH the kernel vs 880.2 WITHOUT at the bench shape — the XLA
composition fuses into its producer/consumer while a pallas_call is a
fusion barrier, and that costs more than the intermediate saves. Enable
with ``FLOODSEG_PALLAS_RESIZE=1`` (video/flow_model.py gate); bit-parity
stays pinned in tests/test_pallas_resize.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resize import _interp_matrix
from .quant import quantize_with_scale
from .resize import resize_bilinear

#: soft VMEM budget per grid step (bytes); v5e has ~16 MB incl. double buffers
_VMEM_BUDGET = 10 * 1024 * 1024


def _round_to_bf16_grid(y: jnp.ndarray) -> jnp.ndarray:
    """Round f32 values onto the bf16 grid (round-to-nearest-even), staying
    in f32. Bit-identical to ``y.astype(bfloat16).astype(float32)`` for all
    finite/inf values, but expressed as integer bit math so no backend can
    fold it away as a dead convert chain (XLA:CPU folds f32->bf16->f32,
    silently skipping the round; lax.reduce_precision is not lowerable in
    Mosaic).

    NaN caveat: a NaN whose payload lives only in the low 16 mantissa bits
    (e.g. 0x7F800001) rounds to +/-inf here, where the unfused composition
    would propagate NaN — so on NaN inputs the kernel quantizes those lanes
    to +/-127 instead of a backend-defined NaN->int8 cast. The production
    stack is NaN-free (debug_nans-gated in tests/test_sanitizers.py); the
    divergence is pinned in tests/test_pallas_resize.py."""
    u = jax.lax.bitcast_convert_type(y, jnp.uint32)
    rb = (u >> 16) & jnp.uint32(1)                 # RNE tie-break bit
    u = (u + jnp.uint32(0x7FFF) + rb) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def _kernel(s_ref, mh_ref, mw_ref, x_ref, o_ref):
    x = x_ref[0]                                   # (h, w, cb)
    h, w, cb = x.shape
    hh = mh_ref.shape[0]
    # bf16 operands multiply exactly on the MXU at default precision; f32
    # operands need HIGHEST to match the composition's precision='highest'
    # (default f32 dots compute bf16 products on TPU — 0.4% error measured)
    prec = None if x.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    # rows: (H, h) @ (h, w*cb) — f32 MXU accumulation, then round to the
    # input dtype exactly like the einsum composition's between-axes cast
    t = jax.lax.dot(mh_ref[...], x.reshape(h, w * cb),
                    preferred_element_type=jnp.float32, precision=prec)
    if x.dtype == jnp.bfloat16:
        # fold-safe between-axes round: after _round_to_bf16_grid the bf16
        # cast below is lossless, so a backend folding it into the next dot
        # cannot change values.
        t = _round_to_bf16_grid(t)
    t = t.astype(x.dtype).reshape(hh, w, cb)
    # cols: contract w -> (W, H, cb), transpose leading dims after the
    # dtype round (channel stays on the lane dim; Mosaic handles the
    # sublane permute in VMEM)
    y = jax.lax.dot_general(mw_ref[...], t, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    y = jnp.transpose(y, (1, 0, 2))                # (H, W, cb) f32
    if x.dtype == jnp.bfloat16:
        # round to bf16 exactly as the unfused composition's output cast
        # does; without this ~5% of quantized values differ by 1.
        y = _round_to_bf16_grid(y)
    q = jnp.clip(jnp.round(y / s_ref[0]), -127, 127)
    o_ref[0] = q.astype(jnp.int8)


def _vmem_bytes(h, w, hh, ww, cb, itemsize):
    # dominant live buffers per step: x block, f32 row-contraction output,
    # its dtype-rounded copy, f32 col-contraction output, int8 output block
    return (h * w * cb * itemsize + hh * w * cb * (4 + itemsize)
            + ww * hh * cb * (4 + itemsize) + hh * ww * cb)


def resize_quantize_supported(in_hw, out_hw, nch, itemsize=2) -> bool:
    """True if some channel block >= 128 fits the per-step VMEM budget."""
    h, w = in_hw
    hh, ww = out_hw
    cb = 512
    while cb >= 128:
        if nch % cb == 0 and _vmem_bytes(h, w, hh, ww, cb, itemsize) <= _VMEM_BUDGET:
            return True
        cb //= 2
    return False


@partial(jax.jit, static_argnames=("out_hw", "align_corners", "interpret"))
def resize_quantize_int8(x: jnp.ndarray, scale: jnp.ndarray, out_hw,
                         align_corners: bool = True,
                         interpret: bool = False) -> jnp.ndarray:
    """quantize_with_scale(resize_bilinear(x, out_hw, fast_lowp=True), scale)
    as one fused Pallas pass. x: (B, h, w, C); scale: f32 scalar (traced).
    Returns int8 (B, H, W, C). Falls back to the XLA composition when the
    shape doesn't fit the kernel's VMEM budget."""
    b, h, w, c = x.shape
    hh, ww = int(out_hw[0]), int(out_hw[1])
    cb = 512
    while cb >= 128 and (c % cb or
                         _vmem_bytes(h, w, hh, ww, cb, x.dtype.itemsize)
                         > _VMEM_BUDGET):
        cb //= 2
    if cb < 128 or c % cb:
        y = resize_bilinear(x, (hh, ww), align_corners, fast_lowp=True)
        return quantize_with_scale(y, scale)
    mh = jnp.asarray(_interp_matrix(h, hh, align_corners), dtype=x.dtype)
    mw = jnp.asarray(_interp_matrix(w, ww, align_corners), dtype=x.dtype)
    s = jnp.reshape(scale.astype(jnp.float32), (1,))
    grid = (b, c // cb)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # scale (1,)
            pl.BlockSpec((hh, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ww, w), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, cb), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hh, ww, cb), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), jnp.int8),
        interpret=interpret,
    )(s, mh, mw, x)

"""Fused resize+quantize Pallas kernel parity (ops/pallas_resize.py).

The kernel replaces ``quantize_with_scale(resize_bilinear(x, hw,
align_corners, fast_lowp=True), scale)`` in the int8 flow-predict program
(video/flow_model.py). Its contract is BIT-IDENTITY with that composition,
so every test here asserts exact int8 equality — interpreter mode on CPU,
plus a @tpu-marked compiled-path test (mirrors tests/test_pallas_warp.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from floodseg_tpu.ops.pallas_resize import (
    resize_quantize_int8,
    resize_quantize_supported,
    _VMEM_BUDGET,
    _vmem_bytes,
)
from floodseg_tpu.ops.quant import quantize_with_scale, scale_from_absmax
from floodseg_tpu.ops.resize import resize_bilinear


def _composition(x, scale, out_hw, align_corners):
    y = resize_bilinear(x, out_hw, align_corners, fast_lowp=True)
    return quantize_with_scale(y, scale)


def _case(shape, out_hw, dtype, align_corners, seed=0, interpret=True):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(shape) * 3.0, dtype)
    scale = scale_from_absmax(jnp.max(jnp.abs(x.astype(jnp.float32))))
    ref = np.asarray(_composition(x, scale, out_hw, align_corners))
    ours = np.asarray(resize_quantize_int8(x, scale, out_hw, align_corners,
                                           interpret=interpret))
    return ours, ref


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
@pytest.mark.parametrize("align", [True, False])
def test_bit_parity_interpret(dtype, align):
    """Bench-like shape (scaled down): upsample grid-res -> feature-res."""
    ours, ref = _case((3, 16, 16, 128), (33, 33), dtype, align)
    assert ours.dtype == np.int8
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("shape,out_hw", [
    ((2, 7, 9, 128), (13, 11)),    # odd in/out H/W
    ((1, 16, 16, 128), (5, 31)),   # downsample one axis, odd the other
    ((2, 5, 5, 256), (17, 17)),    # multi-block channel dim (cb=256)
])
def test_bit_parity_odd_shapes(shape, out_hw):
    ours, ref = _case(shape, out_hw, jnp.bfloat16, True, seed=shape[1])
    np.testing.assert_array_equal(ours, ref)


def test_bit_parity_extreme_values():
    """Values straddling the clip range and exact-tie rounding: the int8
    round/clip must match quantize_with_scale exactly."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 8, 8, 128)).astype(np.float32)
    x[0, 0, 0, :4] = [1e4, -1e4, 0.0, 1e-8]     # saturating + tiny
    x = jnp.asarray(x, jnp.bfloat16)
    scale = jnp.float32(0.01)                    # forces +/-127 saturation
    ref = np.asarray(_composition(x, scale, (15, 15), True))
    ours = np.asarray(resize_quantize_int8(x, scale, (15, 15), True,
                                           interpret=True))
    assert ref.min() == -127 and ref.max() == 127
    np.testing.assert_array_equal(ours, ref)


def test_fallback_non_fitting_channels():
    """c=192 fits no channel block (192 % 128 != 0 for every cb >= 128), so
    resize_quantize_int8 must take the XLA-composition fallback and still
    return the exact composition result."""
    assert not resize_quantize_supported((8, 8), (15, 15), 192)
    ours, ref = _case((1, 8, 8, 192), (15, 15), jnp.bfloat16, True, seed=9)
    np.testing.assert_array_equal(ours, ref)


def test_supported_vmem_budget():
    """The gate rejects shapes whose smallest block busts the VMEM budget
    (no need to run them: _vmem_bytes is the same formula the kernel uses)."""
    assert resize_quantize_supported((32, 32), (65, 65), 4096)  # bench shape
    assert not resize_quantize_supported((32, 32), (2000, 2000), 128)
    assert _vmem_bytes(32, 32, 2000, 2000, 128, 2) > _VMEM_BUDGET


def test_supported_threads_itemsize():
    """An f32 stack doubles the block footprint: a shape that fits at
    itemsize=2 but not at 4 must flip the gate (ADVICE r4: the production
    gate must pass the real dtype's itemsize, not the default)."""
    fit2 = [hw for hw in range(64, 513, 8)
            if resize_quantize_supported((32, 32), (hw, hw), 4096, itemsize=2)
            and not resize_quantize_supported((32, 32), (hw, hw), 4096,
                                              itemsize=4)]
    assert fit2, "expected some shape that fits bf16 but not f32"


def test_production_gate_opt_in(monkeypatch):
    """The kernel is OPT-IN (r5 A-B measured it 9% slower end-to-end than
    the XLA composition): default OFF regardless of backend/shape; with
    FLOODSEG_PALLAS_RESIZE=1 it engages only on TPU for fitting shapes at
    the real dtype's itemsize."""
    from floodseg_tpu.video.flow_model import _pallas_resize_quant_ok

    monkeypatch.delenv("FLOODSEG_PALLAS_RESIZE", raising=False)
    assert not _pallas_resize_quant_ok((23, 32, 32, 4096), (65, 65),
                                       jnp.bfloat16)
    monkeypatch.setenv("FLOODSEG_PALLAS_RESIZE", "1")
    expected = jax.default_backend() == "tpu"
    assert _pallas_resize_quant_ok((23, 32, 32, 4096), (65, 65),
                                   jnp.bfloat16) == expected
    # itemsize threading end-to-end: f32 at a bf16-only-fitting shape is
    # gated off even when enabled on TPU
    if expected:
        big = next(hw for hw in range(512, 63, -8)
                   if resize_quantize_supported((32, 32), (hw, hw), 4096,
                                                itemsize=2)
                   and not resize_quantize_supported((32, 32), (hw, hw), 4096,
                                                     itemsize=4))
        assert not _pallas_resize_quant_ok((23, 32, 32, 4096), (big, big),
                                           jnp.float32)


def test_nan_caveat_documented():
    """NaN payloads in the low mantissa bits round to +/-inf inside the
    kernel's bit-math (a documented divergence: the unfused composition
    propagates NaN -> quantizes to 0 via jnp.round(nan)=nan -> clip -> nan
    -> int8 cast is backend-defined). The production stack is NaN-free
    (debug_nans-gated); this pins the documented behavior so a silent
    change gets noticed."""
    from floodseg_tpu.ops.pallas_resize import _round_to_bf16_grid

    nan_payload = np.array([0x7F800001], dtype=np.uint32).view(np.float32)
    out = np.asarray(_round_to_bf16_grid(jnp.asarray(nan_payload)))
    assert np.isinf(out[0]) or np.isnan(out[0])


@pytest.mark.tpu
def test_bit_parity_tpu():
    """Compiled-path parity at the real bench shape (23, 32, 32, 4096) ->
    (65, 65), bf16 — the exact tensor the int8 predict program feeds it.

    Two pinned facts (measured r5, experiments/diag_resize.py):
    1. The kernel is BIT-IDENTICAL to the composition's as-written
       semantics — resize to bf16 (output round included), then quantize.
       A fold-proof reference (explicit bit-math round between resize and
       quantize, which XLA cannot erase) matches exactly.
    2. The PLAIN jitted composition is NOT that: XLA:TPU folds the dot's
       f32->bf16 output convert into the quantize's bf16->f32 convert,
       silently skipping the round — 1.62% of lanes differ by exactly 1.
       So the kernel is the faithful implementation and the jitted
       composition is the approximation, not the other way around.
    """
    if jax.default_backend() != "tpu":
        pytest.skip("needs a TPU chip")
    from floodseg_tpu.ops.pallas_resize import _round_to_bf16_grid
    from floodseg_tpu.ops.resize import _interp_matrix

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((23, 32, 32, 4096)) * 2.5,
                    jnp.bfloat16)
    scale = scale_from_absmax(jnp.max(jnp.abs(x.astype(jnp.float32))))
    ours = np.asarray(resize_quantize_int8(x, scale, (65, 65), True))

    def fold_proof(x, s):
        # the composition with its final bf16 round expressed as bit math
        # (semantically what resize_bilinear(...).astype(bf16) writes down;
        # the astype form gets folded away by XLA:TPU when jitted together
        # with the quantize divide)
        mh = jnp.asarray(_interp_matrix(32, 65, True), dtype=x.dtype)
        y = jnp.einsum("oh,bhwc->bowc", mh, x, precision="highest")
        y = jnp.einsum("pw,bhwc->bhpc", mh, y, precision="highest")
        y = _round_to_bf16_grid(y.astype(jnp.float32))
        return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)

    ref = np.asarray(jax.jit(fold_proof)(x, scale))
    np.testing.assert_array_equal(ours, ref)

    # pin the documented divergence of the PLAIN jitted composition: XLA
    # skips the output round, so differences are +/-1 on a small fraction
    ref_plain = np.asarray(jax.jit(
        lambda x, s: _composition(x, s, (65, 65), True))(x, scale))
    d = ours.astype(np.int32) - ref_plain.astype(np.int32)
    assert np.abs(d).max() <= 1
    assert (d != 0).mean() < 0.03

"""Parity tests of floodseg_tpu.ops against torch CPU oracles.

The reference computes with torch F.interpolate / F.grid_sample /
adaptive_avg_pool2d / max_pool2d; these tests pin our XLA reformulations to
the same numerics (NHWC vs torch NCHW).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from floodseg_tpu.ops import (
    resize_bilinear,
    adaptive_avg_pool,
    max_pool,
    grid_sample,
    ohem_cross_entropy,
    cross_entropy_loss,
    binary_cross_entropy,
    intersection_and_union,
)


def _rng():
    return np.random.default_rng(0)


def nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def to_nhwc(t):
    return t.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize(
    "in_size,out_size",
    [((7, 9), (14, 18)), ((55, 55), (433, 433)), ((16, 12), (7, 5)), ((1, 1), (4, 4))],
)
def test_resize_bilinear_matches_torch(align, in_size, out_size):
    x = _rng().standard_normal((2, *in_size, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_size, align_corners=align))
    ref = to_nhwc(F.interpolate(nchw(x), size=out_size, mode="bilinear", align_corners=align))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize(
    "in_size,out_size",
    [((65, 65), (513, 513)), ((16, 12), (7, 5)), ((8, 8), (8, 8))],
)
def test_resize_argmax_matches_unfused(align, in_size, out_size, dtype):
    """The channels-first predict epilogue == argmax(resize) elementwise
    (same interpolation matrices, f32 'highest' contractions, same rounding
    back to the input dtype before the argmax; includes the equal-size
    branch where it degenerates to a plain argmax). bf16 is the production
    int8-decode logit dtype — near-tie pixels must resolve identically."""
    from floodseg_tpu.ops.resize import resize_argmax

    x = _rng().standard_normal((3, *in_size, 5)).astype(np.float32)
    xj = jnp.asarray(x).astype(dtype)
    fused = np.asarray(resize_argmax(xj, out_size, align_corners=align))
    ref = np.asarray(
        jnp.argmax(resize_bilinear(xj, out_size, align_corners=align), -1)
    )
    assert fused.dtype == np.int32
    np.testing.assert_array_equal(fused, ref)
    # HWC (unbatched) roundtrip
    fused1 = np.asarray(resize_argmax(xj[0], out_size, align_corners=align))
    np.testing.assert_array_equal(fused1, ref[0])


@pytest.mark.parametrize("bins", [1, 2, 3, 6, 7])
def test_adaptive_avg_pool_matches_torch(bins):
    x = _rng().standard_normal((2, 20, 27, 4)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), bins))
    ref = to_nhwc(F.adaptive_avg_pool2d(nchw(x), bins))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_max_pool_matches_torch():
    x = _rng().standard_normal((2, 17, 23, 5)).astype(np.float32)
    ours = np.asarray(max_pool(jnp.asarray(x), 3, 2, 1))
    ref = to_nhwc(F.max_pool2d(nchw(x), 3, stride=2, padding=1))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_matches_torch(align):
    x = _rng().standard_normal((2, 14, 18, 6)).astype(np.float32)
    # include out-of-range coords to exercise border padding
    grid = (_rng().uniform(-1.3, 1.3, size=(2, 9, 11, 2))).astype(np.float32)
    ours = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid), align_corners=align))
    ref = to_nhwc(
        F.grid_sample(
            nchw(x),
            torch.from_numpy(grid),
            mode="bilinear",
            padding_mode="border",
            align_corners=align,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def _torch_ohem(pred, target, ignore_index=255, thresh=0.7, min_kept=10):
    """Oracle mirroring reference OhemCrossEntropy2dTensor semantics."""
    b, c, h, w = pred.shape
    flat_t = target.reshape(-1)
    valid = flat_t.ne(ignore_index)
    t = (flat_t * valid.long()).clone()
    num_valid = valid.sum()
    prob = F.softmax(pred, dim=1).transpose(0, 1).reshape(c, -1)
    if min_kept <= num_valid and num_valid > 0:
        prob = prob.masked_fill(~valid, 1)
        mp = prob[t, torch.arange(len(t))]
        threshold = thresh
        _, idx = mp.sort()
        ti = idx[min(len(idx), min_kept) - 1]
        if mp[ti] > thresh:
            threshold = mp[ti]
        kept = mp.le(threshold)
        t = t * kept.long()
        valid = valid * kept
    t = t.masked_fill(~valid, ignore_index).reshape(b, h, w)
    return F.cross_entropy(pred, t, ignore_index=ignore_index)


@pytest.mark.parametrize("min_kept", [5, 50, 100000])
def test_ohem_matches_torch(min_kept):
    logits = _rng().standard_normal((2, 8, 8, 5)).astype(np.float32) * 3
    labels = _rng().integers(0, 5, size=(2, 8, 8)).astype(np.int32)
    labels[0, :2] = 255
    ours = float(ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), min_kept=min_kept))
    ref = float(
        _torch_ohem(
            nchw(logits).float(),
            torch.from_numpy(labels.astype(np.int64)),
            min_kept=min_kept,
        )
    )
    assert abs(ours - ref) < 1e-5


def test_cross_entropy_matches_torch():
    logits = _rng().standard_normal((2, 6, 6, 5)).astype(np.float32)
    labels = _rng().integers(0, 5, size=(2, 6, 6)).astype(np.int32)
    labels[1, 0] = 255
    ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    ref = float(
        F.cross_entropy(
            nchw(logits).float(),
            torch.from_numpy(labels.astype(np.int64)),
            ignore_index=255,
        )
    )
    assert abs(ours - ref) < 1e-5


def test_bce_matches_torch():
    logits = _rng().standard_normal(32).astype(np.float32)
    targets = _rng().uniform(0, 1, 32).astype(np.float32)
    ours = float(binary_cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(
        F.binary_cross_entropy(torch.sigmoid(torch.from_numpy(logits)), torch.from_numpy(targets))
    )
    assert abs(ours - ref) < 1e-5


def test_intersection_and_union_matches_numpy_reference():
    k = 5
    pred = _rng().integers(0, k, size=(1, 16, 16)).astype(np.int64)
    target = _rng().integers(0, k, size=(1, 16, 16)).astype(np.int64)
    target[0, :3] = 255
    inter, union, area_t = (
        np.asarray(a) for a in intersection_and_union(jnp.asarray(pred), jnp.asarray(target), k)
    )

    # numpy oracle: reference util/util.py:36-47 semantics
    o = pred.reshape(-1).copy()
    t = target.reshape(-1)
    o[t == 255] = 255
    i = o[o == t]
    ref_inter, _ = np.histogram(i, bins=np.arange(k + 1))
    ref_out, _ = np.histogram(o, bins=np.arange(k + 1))
    ref_tgt, _ = np.histogram(t, bins=np.arange(k + 1))
    np.testing.assert_array_equal(inter, ref_inter)
    np.testing.assert_array_equal(union, ref_out + ref_tgt - ref_inter)
    np.testing.assert_array_equal(area_t, ref_tgt)


@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_matmul_matches_torch(align):
    from floodseg_tpu.ops.grid_sample import grid_sample_matmul
    x = _rng().standard_normal((2, 14, 18, 6)).astype(np.float32)
    grid = (_rng().uniform(-1.3, 1.3, size=(2, 9, 11, 2))).astype(np.float32)
    ours = np.asarray(grid_sample_matmul(jnp.asarray(x), jnp.asarray(grid),
                                         align_corners=align))
    ref = to_nhwc(
        F.grid_sample(nchw(x), torch.from_numpy(grid), mode="bilinear",
                      padding_mode="border", align_corners=align)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

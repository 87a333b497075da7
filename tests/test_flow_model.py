"""Parity tests: FlowInterpolator vs the reference FlowModel (torch oracle).

The reference's flow/model.py only depends on torch, so we import it from
/root/reference directly, drive it with a tiny conv encoder/decoder, and
require our scan-based single-program clip step to reproduce its outputs.
"""

import sys
from contextlib import contextmanager

import numpy as np
import pytest
import torch
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from floodseg_tpu.video import FlowInterpolator, default_grid  # noqa: E402
from floodseg_tpu.video.grid import crop_motion_vectors_np  # noqa: E402


class _Profiler:
    @contextmanager
    def profile(self, name):
        yield


class _TinyTorch(torch.nn.Module):
    def __init__(self):
        super().__init__()
        torch.manual_seed(1)
        self.encoder = torch.nn.Conv2d(3, 8, 4, stride=4)
        self.decoder = torch.nn.Conv2d(8, 5, 1)


def _make_pair():
    tm = _TinyTorch().eval()
    enc_w = tm.encoder.weight.detach().numpy()
    enc_b = tm.encoder.bias.detach().numpy()
    dec_w = tm.decoder.weight.detach().numpy()
    dec_b = tm.decoder.bias.detach().numpy()

    def encode(x):
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(enc_w.transpose(2, 3, 1, 0)), (4, 4), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision="highest",
        )
        return y + jnp.asarray(enc_b)

    def decode(f):
        y = jax.lax.conv_general_dilated(
            f, jnp.asarray(dec_w.transpose(2, 3, 1, 0)), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision="highest",
        )
        return y + jnp.asarray(dec_b)

    return tm, encode, decode


import jax  # noqa: E402


def _grids(rng, t, b, gh, gw):
    """Smooth near-identity grids."""
    base = np.stack(
        np.meshgrid(np.linspace(-1, 1, gw), np.linspace(-1, 1, gh)), axis=-1
    )[None]
    g = base + rng.uniform(-0.08, 0.08, size=(t, b, gh, gw, 2))
    return g.astype(np.float32)


@pytest.mark.parametrize("feature_based", [True, False])
def test_predict_clip_matches_reference(feature_based):
    from flow.model import FlowModel  # reference oracle

    rng = np.random.default_rng(7)
    tm, encode, decode = _make_pair()
    ref = FlowModel(tm, feature_based=feature_based).eval()

    n = 5
    frame_prev = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    frame_next = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    mvs_l = _grids(rng, n - 1, 1, 4, 4)
    mvs_r = _grids(rng, n - 1, 1, 4, 4)

    with torch.no_grad():
        ref_out = ref.predict(
            torch.from_numpy(frame_prev.transpose(0, 3, 1, 2)),
            torch.from_numpy(frame_next.transpose(0, 3, 1, 2)),
            [torch.from_numpy(m) for m in mvs_l],
            [torch.from_numpy(m) for m in mvs_r],
            n,
            _Profiler(),
        )["pred"].numpy().transpose(0, 2, 3, 1)

    interp = FlowInterpolator(encode, decode, feature_based=feature_based)
    ours = jax.jit(
        lambda fp, fn, ml, mr, dg: interp.predict_clip(fp, fn, ml, mr, n, dg)
    )(
        jnp.asarray(frame_prev), jnp.asarray(frame_next),
        jnp.asarray(mvs_l), jnp.asarray(mvs_r),
        jnp.asarray(default_grid()),
    )
    assert ours.shape == ref_out.shape == (n, 64, 64, 5)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("feature_based", [True, False])
def test_train_forward_matches_reference(feature_based):
    from flow.model import FlowModel

    rng = np.random.default_rng(9)
    tm, encode, decode = _make_pair()
    ref = FlowModel(tm, feature_based=feature_based).train()

    b, t = 3, 4
    frame_prev = rng.standard_normal((b, 64, 64, 3)).astype(np.float32)
    frame_next = rng.standard_normal((b, 64, 64, 3)).astype(np.float32)
    mvs_l = _grids(rng, t, b, 4, 4)
    mvs_r = _grids(rng, t, b, 4, 4)
    left_index = np.array([1, 3, 2])
    right_index = np.array([4, 2, 1])

    with torch.no_grad():
        ref_out = ref(
            None,
            torch.from_numpy(frame_prev.transpose(0, 3, 1, 2)),
            torch.from_numpy(frame_next.transpose(0, 3, 1, 2)),
            [torch.from_numpy(mvs_l[j]) for j in range(t)],
            [torch.from_numpy(mvs_r[j]) for j in range(t)],
            list(left_index),
            list(right_index),
        )["pred"].numpy().transpose(0, 2, 3, 1)

    interp = FlowInterpolator(encode, decode, feature_based=feature_based)
    ours = jax.jit(interp.train_forward)(
        jnp.asarray(frame_prev), jnp.asarray(frame_next),
        jnp.asarray(mvs_l), jnp.asarray(mvs_r),
        jnp.asarray(left_index), jnp.asarray(right_index),
    )
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("feature_based", [True, False])
def test_train_backward_matches_reference(feature_based, x64):
    """GRADIENT parity of the composed flow train forward (f64 both sides):
    d(loss)/d(encoder/decoder weights) through the per-sample warp chains.
    The forward tests above pin grid_sample's values; this pins its
    BACKWARD (the transposed scatter of the bilinear gather) and the
    masked-scan chain/fusion backward — the path every flow training step
    differentiates through (reference flow/model.py:55-106 under
    loss.backward())."""
    from flow.model import FlowModel

    rng = np.random.default_rng(11)
    tm, _, _ = _make_pair()
    tm = tm.double().train()
    ref = FlowModel(tm, feature_based=feature_based).train()

    # the reference's warp() force-casts grids to float32
    # (flow/model.py:246-247) which cannot run against double features;
    # replace with the identical call minus the downcast
    import types as _types

    def _warp64(self, frame, motion_vectors):
        return torch.nn.functional.grid_sample(
            frame, motion_vectors, mode="bilinear", padding_mode="border",
            align_corners=False)

    ref.warp = _types.MethodType(_warp64, ref)

    b, t = 3, 4
    frame_prev = rng.standard_normal((b, 64, 64, 3))
    frame_next = rng.standard_normal((b, 64, 64, 3))
    mvs_l = _grids(rng, t, b, 4, 4).astype(np.float64)
    mvs_r = _grids(rng, t, b, 4, 4).astype(np.float64)
    left_index = np.array([1, 3, 2])
    right_index = np.array([4, 2, 1])
    # a fixed random linear functional as the loss: fully sensitive to
    # every output pixel, no CE nonlinearity to hide scale errors
    w_loss = rng.standard_normal((b, 5, 64, 64))

    out = ref(
        None,
        torch.from_numpy(frame_prev.transpose(0, 3, 1, 2)),
        torch.from_numpy(frame_next.transpose(0, 3, 1, 2)),
        [torch.from_numpy(mvs_l[j]) for j in range(t)],
        [torch.from_numpy(mvs_r[j]) for j in range(t)],
        list(left_index),
        list(right_index),
    )["pred"]
    (out * torch.from_numpy(w_loss)).sum().backward()
    ref_grads = {
        "enc_w": tm.encoder.weight.grad.numpy(),
        "enc_b": tm.encoder.bias.grad.numpy(),
        "dec_w": tm.decoder.weight.grad.numpy(),
        "dec_b": tm.decoder.bias.grad.numpy(),
    }

    params = {
        "enc_w": jnp.asarray(
            tm.encoder.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "enc_b": jnp.asarray(tm.encoder.bias.detach().numpy()),
        "dec_w": jnp.asarray(
            tm.decoder.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "dec_b": jnp.asarray(tm.decoder.bias.detach().numpy()),
    }
    w_loss_nhwc = jnp.asarray(w_loss.transpose(0, 2, 3, 1))

    def loss_fn(p):
        def encode(x):
            y = jax.lax.conv_general_dilated(
                x, p["enc_w"], (4, 4), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision="highest")
            return y + p["enc_b"]

        def decode(f):
            y = jax.lax.conv_general_dilated(
                f, p["dec_w"], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision="highest")
            return y + p["dec_b"]

        interp = FlowInterpolator(encode, decode,
                                  feature_based=feature_based)
        pred = interp.train_forward(
            jnp.asarray(frame_prev), jnp.asarray(frame_next),
            jnp.asarray(mvs_l), jnp.asarray(mvs_r),
            jnp.asarray(left_index), jnp.asarray(right_index))
        return jnp.sum(pred * w_loss_nhwc)

    grads = jax.jit(jax.grad(loss_fn))(params)

    for ours_key, ref_key, tr in (("enc_w", "enc_w", (3, 2, 0, 1)),
                                  ("enc_b", "enc_b", None),
                                  ("dec_w", "dec_w", (3, 2, 0, 1)),
                                  ("dec_b", "dec_b", None)):
        got = np.asarray(grads[ours_key], np.float64)
        if tr is not None:
            got = got.transpose(tr)
        np.testing.assert_allclose(got, ref_grads[ref_key],
                                   rtol=1e-7, atol=1e-9,
                                   err_msg=ours_key)


def test_crop_motion_vectors_matches_reference():
    sys.path.insert(0, "/root/reference")
    from flow.transform import crop_motion_vector as ref_crop

    rng = np.random.default_rng(3)
    grids = [rng.uniform(-1, 1, size=(67, 120, 2)).astype(np.float32) for _ in range(3)]
    h, w, ch, cw, ho, wo = 1072, 1920, 433, 433, 100, 250

    ref_l, ref_r = ref_crop(
        [g.copy() for g in grids], [g.copy() for g in grids], h, w, ch, cw, ho, wo
    )
    ours = crop_motion_vectors_np([g.copy() for g in grids], h, w, ch, cw, ho, wo)
    for a, b_ in zip(ours, ref_l):
        np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-5)

    # vectorized T-stack form (the flow sliding-window test's fast path)
    from floodseg_tpu.video.grid import crop_motion_vectors_stack_np
    stacked = crop_motion_vectors_stack_np(
        np.stack(grids), h, w, ch, cw, ho, wo)
    for a, b_ in zip(stacked, ref_l):
        np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-5)


def test_no_warp_predict_is_linear_blend():
    rng = np.random.default_rng(5)
    _, encode, decode = _make_pair()
    interp = FlowInterpolator(encode, decode, feature_based=True, no_warp=True)
    n = 4
    fp = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), dtype=jnp.float32)
    fn = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), dtype=jnp.float32)
    out = interp.predict_clip(fp, fn, None, None, n)
    assert out.shape == (n, 64, 64, 5)
    # frame 0 equals the plain single-frame path
    single = interp.predict_clip(fp, None, None, None, 1)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single[0]), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("feature_based", [True, False])
def test_sliding_window_predict_matches_reference(feature_based):
    """Crop-based predict — the reference's DEFAULT (no_cropping=False)
    predict path. Our flow_sliding_window_predict must reproduce the
    reference's compute_output + compute_predict_crop + final resize/argmax
    (flow/base.py:182-210, 226-234, 270-277) with the imported torch
    FlowModel and the reference's own crop_motion_vector as the oracle."""
    from flow.model import FlowModel
    from flow.transform import crop_motion_vector as ref_crop
    import torch.nn.functional as F

    from floodseg_tpu.train.evaluate import flow_sliding_window_predict

    rng = np.random.default_rng(11)
    tm, encode, decode = _make_pair()
    ref = FlowModel(tm, feature_based=feature_based).eval()

    n = 4
    h, w, ch, cw = 64, 96, 48, 48
    out_size = (80, 120)
    fp = rng.standard_normal((1, h, w, 3)).astype(np.float32)
    fn_ = rng.standard_normal((1, h, w, 3)).astype(np.float32)
    gh, gw = 4, 6  # block 16 grids over the 64x96 frame
    mvs_l = _grids(rng, n - 1, 1, gh, gw)
    mvs_r = _grids(rng, n - 1, 1, gh, gw)

    # --- torch oracle: the compute_output sliding loop, verbatim semantics
    tfp = torch.from_numpy(fp.transpose(0, 3, 1, 2))
    tfn = torch.from_numpy(fn_.transpose(0, 3, 1, 2))
    tml = [torch.from_numpy(mvs_l[j]) for j in range(n - 1)]
    tmr = [torch.from_numpy(mvs_r[j]) for j in range(n - 1)]
    stride_h = int(np.ceil(ch * 2 / 3))
    stride_w = int(np.ceil(cw * 2 / 3))
    grid_h = int(np.ceil(float(h - ch) / stride_h) + 1)
    grid_w = int(np.ceil(float(w - cw) / stride_w) + 1)
    pred = torch.zeros((n, 5, h, w), dtype=torch.float64)
    cnt = torch.zeros((h, w), dtype=torch.float64)
    with torch.no_grad():
        for ih in range(grid_h):
            for iw in range(grid_w):
                e_h = min(ih * stride_h + ch, h)
                s_h = e_h - ch
                e_w = min(iw * stride_w + cw, w)
                s_w = e_w - cw
                fpc = tfp[:, :, s_h:e_h, s_w:e_w].clone()
                fnc = tfn[:, :, s_h:e_h, s_w:e_w].clone()
                mlc, mrc = ref_crop([m.clone() for m in tml],
                                    [m.clone() for m in tmr],
                                    h, w, ch, cw, s_h, s_w)
                out = ref.predict(fpc, fnc, mlc, mrc, n, _Profiler())["pred"]
                out = F.softmax(out, dim=1)
                cnt[s_h:e_h, s_w:e_w] += 1
                pred[:, :, s_h:e_h, s_w:e_w] += out
    pred /= cnt
    ref_maps = (F.interpolate(pred, out_size, mode="bilinear",
                              align_corners=True)
                .max(1)[1].numpy())

    # --- ours: batched crop fn (same body as make_flow_predict_crop_fn)
    interp = FlowInterpolator(encode, decode, feature_based=feature_based)
    dg = jnp.asarray(default_grid())

    @jax.jit
    def crop_fn(variables, fpc, fnc, ml, mr):
        def one(a, b, l, r):
            logits = interp.predict_clip(a[None], b[None], l[:, None],
                                         r[:, None], n, default_grid=dg,
                                         out_size=a.shape[0:2])
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        return jax.vmap(one, in_axes=(0, 0, 1, 1))(fpc, fnc, ml, mr)

    batch = {"frame_prev": fp, "frame_next": fn_,
             "mvs_left": mvs_l, "mvs_right": mvs_r}
    maps = flow_sliding_window_predict(crop_fn, None, batch, 5, ch, cw,
                                       out_size)
    assert maps.shape == (n,) + out_size == ref_maps.shape
    agree = float((maps == ref_maps).mean())
    # f32 device math vs the torch f64 canvas can flip true near-ties only
    assert agree > 0.999, agree

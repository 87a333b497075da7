"""Flow (frame-interpolation) train/eval/predict steps.

Reference engines: flow/supervised.py (OHEM CE on the interpolated
prediction), flow/base.py:141-344 (val/test/predict). BN running stats are
threaded sequentially through encode(prev) -> encode(next) -> decode exactly
like consecutive torch module calls.
"""

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from floodseg_tpu.ops.metrics import intersection_and_union
from floodseg_tpu.ops.resize import resize_bilinear
from floodseg_tpu.video.flow_model import (
    FlowInterpolator,
    warp_chain_masked,
    interp_weight,
)


def _encode(model, variables, x, train, rng=None, mutable=False):
    kwargs = dict(train=train, method="encode")
    if rng is not None:
        kwargs["rngs"] = {"dropout": rng}
    if mutable:
        (f, _feats), mut = model.apply(variables, x, mutable=["batch_stats"], **kwargs)
        return f, mut["batch_stats"]
    f, _feats = model.apply(variables, x, **kwargs)
    return f, variables.get("batch_stats")


def _decode(model, variables, f, train, rng=None, mutable=False):
    kwargs = dict(train=train, method="decode")
    if rng is not None:
        kwargs["rngs"] = {"dropout": rng}
    if mutable:
        logits, mut = model.apply(variables, f, mutable=["batch_stats"], **kwargs)
        return logits, mut["batch_stats"]
    return model.apply(variables, f, **kwargs), variables.get("batch_stats")


def flow_train_forward(model, params, batch_stats, batch, rng, train: bool,
                       feature_based: bool = True, no_warp: bool = False):
    """Interpolated training forward; returns (logits, new_batch_stats)."""
    fp, fn = batch["frame_prev"], batch["frame_next"]
    li, ri = batch["left_index"], batch["right_index"]
    h, w = fp.shape[1], fp.shape[2]
    n = (li + ri).astype(jnp.float32)
    r1, r2, r3 = (jax.random.split(rng, 3) if rng is not None else (None,) * 3)

    vs = {"params": params, "batch_stats": batch_stats}
    f_prev, bs = _encode(model, vs, fp, train, r1, mutable=train)
    vs = {"params": params, "batch_stats": bs}
    f_next, bs = _encode(model, vs, fn, train, r2, mutable=train)

    if feature_based:
        if no_warp:
            wp, wn = f_prev, f_next
        else:
            wp = warp_chain_masked(f_prev, batch["mvs_left"], li)
            wn = warp_chain_masked(f_next, batch["mvs_right"], ri)
        f = wp * interp_weight(li, n, wp.dtype) + wn * interp_weight(ri, n, wn.dtype)
        vs = {"params": params, "batch_stats": bs}
        logits, bs = _decode(model, vs, f, train, r3, mutable=train)
    else:
        vs = {"params": params, "batch_stats": bs}
        o_prev, bs = _decode(model, vs, f_prev, train, r3, mutable=train)
        vs = {"params": params, "batch_stats": bs}
        o_next, bs = _decode(model, vs, f_next, train, r3, mutable=train)
        if no_warp:
            wp, wn = o_prev, o_next
        else:
            wp = warp_chain_masked(o_prev, batch["mvs_left"], li)
            wn = warp_chain_masked(o_next, batch["mvs_right"], ri)
        logits = wp * interp_weight(li, n, wp.dtype) + wn * interp_weight(ri, n, wn.dtype)

    if logits.shape[1] != h or logits.shape[2] != w:
        logits = resize_bilinear(logits, (h, w), align_corners=True)
    return logits, bs


def plain_train_forward(model, params, batch_stats, images, rng, train: bool):
    """Single-frame encoder->decoder forward (the no-interpolation branch,
    flow/model.py:37-43). Returns (logits, new_batch_stats)."""
    h, w = images.shape[1], images.shape[2]
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    vs = {"params": params, "batch_stats": batch_stats}
    f, bs = _encode(model, vs, images, train, r1, mutable=train)
    vs = {"params": params, "batch_stats": bs}
    logits, bs = _decode(model, vs, f, train, r2, mutable=train)
    if logits.shape[1] != h or logits.shape[2] != w:
        logits = resize_bilinear(logits, (h, w), align_corners=True)
    return logits, bs


def make_flow_train_step(model, loss_fn: Callable, num_classes: int,
                         ignore_index: int = 255,
                         feature_based: bool = True,
                         no_warp: bool = False) -> Tuple[Callable, Callable]:
    """Returns (interp_step, plain_step). The caller flips a host-side coin
    with no_interpolation_percentage to pick one per batch (flow/model.py:37,
    data-dependent Python control flow stays out of the compiled program)."""

    def _step(state, batch, rng, plain: bool):
        labels = batch["label"]

        def compute_loss(params):
            if plain:
                logits, bs = plain_train_forward(
                    model, params, state.batch_stats, batch["frame_current"],
                    rng, train=True,
                )
            else:
                logits, bs = flow_train_forward(
                    model, params, state.batch_stats, batch, rng, train=True,
                    feature_based=feature_based, no_warp=no_warp,
                )
            return loss_fn({"pred": logits}, labels), (logits, bs)

        (loss, (logits, bs)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads=grads, batch_stats=bs)
        pred = jnp.argmax(logits, axis=-1)
        inter, union, target = intersection_and_union(
            pred, labels, num_classes, ignore_index
        )
        return new_state, {"loss": loss, "intersection": inter, "union": union,
                           "target": target}

    return partial(_step, plain=False), partial(_step, plain=True)


def make_flow_eval_step(model, num_classes: int, ignore_index: int = 255,
                        feature_based: bool = True, no_warp: bool = False) -> Callable:
    """Whole-frame validation step (flow/base.py:141-152)."""

    def eval_step(state, batch):
        logits, _ = flow_train_forward(
            model, state.params, state.batch_stats, batch, rng=None,
            train=False, feature_based=feature_based, no_warp=no_warp,
        )
        pred = jnp.argmax(logits, axis=-1)
        inter, union, target = intersection_and_union(
            pred, batch["label"], num_classes, ignore_index
        )
        return {"intersection": inter, "union": union, "target": target}

    return eval_step



def _decode_split_ok(variables) -> bool:
    """Split-decode (key map + interpolated maps as two decode calls) is a
    win only for the cheap single-conv SegHead; the DeepLabHead's batch-1
    dilated ASPP duplicate runs at terrible MXU utilization (measured -30%)
    and the vit MaskTransformer decode is likewise nontrivial per call."""
    return "cls" in variables["params"]


def _predict_encode(model, variables, int8_encode: bool):
    """Encode closure for the predict programs: the model's encode method,
    or the W8A8 PTQ ResNet trunk (ops/quant.py::int8_resnet_trunk) — every
    bottleneck conv in int8 on the MXU, stem + residual adds + PPM full
    precision. Opt-in (`model.int8_encode`): unlike the decoder, encoder
    error feeds EVERY downstream stage (warps, blends, decode), so it ships
    off by default pending a trained-weights validation. Dispatches on the
    params structure: pspnet (backbone + ppm) or deeplabv3 (backbone only);
    vit has no conv trunk and raises."""
    if not int8_encode:
        return lambda x: model.apply(variables, x, train=False,
                                     method="encode")[0]
    from ..ops import quant
    dtype = getattr(model, "dtype", jnp.bfloat16)
    params = variables["params"]
    if "backbone" not in params or "batch_stats" not in variables:
        raise ValueError(
            "int8_encode supports the pspnet/deeplabv3 ResNet trunks; "
            "use the bf16 encoder for other archs")
    stats = variables["batch_stats"]
    depth = getattr(model, "layers", 50)
    if "ppm" in params:  # pspnet: deep-base stem, all-blocks dilation, +PPM
        bins = tuple(getattr(model, "bins", (1, 2, 3, 6)))

        def encode(x):
            c4 = quant.int8_resnet_trunk(
                params["backbone"], stats["backbone"], x, depth=depth,
                deep_base=True, semseg_dilation=True, dtype=dtype)
            return quant.ppm_folded(params["ppm"], stats["ppm"], c4,
                                    bins=bins, dtype=dtype)

        return encode
    # deeplabv3: torchvision stem/dilation, encoder output is c4 itself
    return lambda x: quant.int8_resnet_trunk(
        params["backbone"], stats["backbone"], x, depth=depth,
        deep_base=False, semseg_dilation=False, dtype=dtype)


def _predict_decode(model, variables, int8_decode: bool):
    """Decode closure for the predict programs: the model's decode method,
    or the int8-quantized decoder — the decoder convs are the predict
    program's hot spot and the v5e MXU runs int8 at 2x bf16 (ops/quant.py;
    measured 30.5 -> 19.2 ms on the bench SegHead shape). Dispatches on the
    decoder's params structure: pspnet SegHead ("cls") or the DeepLabHead
    ("classifier" with "aspp"); other decoders (vit MaskTransformer) raise."""
    if not int8_decode:
        return lambda f, act_absmax=None: model.apply(
            variables, f, train=False, method="decode")
    from ..ops import quant
    dtype = getattr(model, "dtype", jnp.bfloat16)
    params = variables["params"]
    if "cls" in params:
        return lambda f, act_absmax=None: quant.int8_seghead_decode(
            params["cls"], variables["batch_stats"]["cls"], f, dtype=dtype,
            act_absmax=act_absmax)
    if "classifier" in params and "aspp" in params["classifier"]:
        return lambda f, act_absmax=None: quant.int8_deeplab_decode(
            params["classifier"], variables["batch_stats"]["classifier"], f,
            dtype=dtype, act_absmax=act_absmax)
    raise ValueError(
        "int8_decode supports the pspnet SegHead and the deeplabv3 "
        "DeepLabHead decoders; use bf16 decode for other archs")


def make_flow_predict_fn(model, n: int, feature_based: bool = True,
                         no_warp: bool = False,
                         out_size: Tuple[int, int] = (1072, 1920),
                         default_grid: Optional[np.ndarray] = None,
                         int8_decode: bool = False,
                         int8_encode: bool = False) -> Callable:
    """One jitted program for a whole key-frame window.

    Returns fn(variables, frame_prev, frame_next, mvs_left, mvs_right) ->
    (n, out_h, out_w) int32 class maps: interpolation + upsample to the
    output frame size (align_corners=True) + argmax all on device
    (flow/base.py:271-277 keeps the upsample inside the timed region, so the
    benchmark includes it).
    """
    dg = None if default_grid is None else jnp.asarray(default_grid)

    @jax.jit
    def predict_fn(variables, frame_prev, frame_next, mvs_left, mvs_right):
        interp = FlowInterpolator(
            encode=_predict_encode(model, variables, int8_encode),
            decode=_predict_decode(model, variables, int8_decode),
            feature_based=feature_based,
            no_warp=no_warp,
            decode_wants_absmax=int8_decode,
            decode_split=_decode_split_ok(variables),
        )
        return interp.predict_clip(
            frame_prev, frame_next, mvs_left, mvs_right, n,
            default_grid=dg, out_size=out_size, argmax_epilogue=True,
        )

    return predict_fn


def make_flow_predict_crop_fn(model, n: int, num_classes: int,
                              feature_based: bool = True,
                              no_warp: bool = False,
                              default_grid: Optional[np.ndarray] = None,
                              int8_decode: bool = False) -> Callable:
    """Batched crop predict for the default (no_cropping=False) predict path
    (flow/base.py:182-210 compute_output + :226-234 compute_predict_crop):
    the full n-frame interpolation chain runs on every sliding-window crop,
    logits upsampled to crop size (align_corners=True) then softmaxed.

    Returns fn(variables, fp_crops (N, ch, cw, 3), fn_crops, ml/mr
    (T, N, bh, bw, 2)) -> (N, n, ch, cw, C) probabilities. The key frame is
    resampled through the FULL-frame default grid exactly like the
    reference, whose ``self.default_motion_vector`` is frame-global even on
    crops (flow/model.py:154-159)."""
    dg = None if default_grid is None else jnp.asarray(default_grid)

    @jax.jit
    def crop_fn(variables, fp_crops, fn_crops, ml, mr):
        interp = FlowInterpolator(
            encode=lambda x: model.apply(variables, x, train=False, method="encode")[0],
            decode=_predict_decode(model, variables, int8_decode),
            feature_based=feature_based,
            no_warp=no_warp,
            decode_wants_absmax=int8_decode,
            decode_split=_decode_split_ok(variables),
        )

        def one(fp, fn_, l, r):
            logits = interp.predict_clip(
                fp[None], fn_[None], l[:, None], r[:, None], n,
                default_grid=dg, out_size=fp.shape[0:2],
            )
            return jax.nn.softmax(
                logits.astype(jnp.float32), axis=-1)[..., :num_classes]

        return jax.vmap(one, in_axes=(0, 0, 1, 1))(fp_crops, fn_crops, ml, mr)

    return crop_fn


def make_cached_flow_predict_fn(model, n: int, feature_based: bool = True,
                                no_warp: bool = False,
                                out_size: Tuple[int, int] = (1072, 1920),
                                default_grid: Optional[np.ndarray] = None,
                                int8_decode: bool = False,
                                int8_encode: bool = False,
                                fused_argmax: bool = True):
    """(full_fn, cached_fn) for sequential-video prediction with key-feature
    reuse: consecutive windows share a key frame, so the previous window's
    encoded next key replaces one of the two encoder passes — numerically
    identical outputs (eval-mode BN), ~half the encoder FLOPs per clip.

    full_fn(variables, fp, fn, ml, mr)        -> (maps, f_next_enc)
    cached_fn(variables, f_prev_enc, fn, ml, mr) -> (maps, f_next_enc)
    """
    dg = None if default_grid is None else jnp.asarray(default_grid)

    def _interp(variables):
        return FlowInterpolator(
            encode=_predict_encode(model, variables, int8_encode),
            decode=_predict_decode(model, variables, int8_decode),
            feature_based=feature_based,
            no_warp=no_warp,
            decode_wants_absmax=int8_decode,
            decode_split=_decode_split_ok(variables),
        )

    @jax.jit
    def full_fn(variables, frame_prev, frame_next, mvs_left, mvs_right):
        return _interp(variables).predict_clip(
            frame_prev, frame_next, mvs_left, mvs_right, n,
            default_grid=dg, out_size=out_size, return_next_enc=True,
            argmax_epilogue=True, fused_argmax=fused_argmax,
        )

    @jax.jit
    def cached_fn(variables, f_prev_enc, frame_next, mvs_left, mvs_right):
        return _interp(variables).predict_clip(
            None, frame_next, mvs_left, mvs_right, n,
            default_grid=dg, out_size=out_size, f_prev_enc=f_prev_enc,
            return_next_enc=True, argmax_epilogue=True,
            fused_argmax=fused_argmax,
        )

    return full_fn, cached_fn


def make_flow_test_crop_fn(model, num_classes: int, feature_based: bool = True,
                           no_warp: bool = False) -> Callable:
    """Batched crop forward for the flow sliding-window test
    (flow/base.py:182-223): all crops of a frame run as one device batch,
    softmax probs upsampled to crop size align_corners=True."""

    @jax.jit
    def crop_fn(variables, frame_prev, frame_next, mvs_left, mvs_right,
                left_index, right_index):
        batch = {
            "frame_prev": frame_prev, "frame_next": frame_next,
            "mvs_left": mvs_left, "mvs_right": mvs_right,
            "left_index": left_index, "right_index": right_index,
        }
        logits, _ = flow_train_forward(
            model, variables["params"], variables.get("batch_stats", {}),
            batch, rng=None, train=False,
            feature_based=feature_based, no_warp=no_warp,
        )
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :num_classes]

    return crop_fn


def make_flow_phase_fns(model, n: int, feature_based: bool = True,
                        out_size: Tuple[int, int] = (1072, 1920),
                        default_grid: Optional[np.ndarray] = None):
    """Per-phase jitted functions for profiling parity with the reference's
    predict_encoder / predict_warp / predict_fusion / predict_decoder regions
    (flow/model.py:119-179). The production path fuses all phases into one
    program (make_flow_predict_fn); these exist to report the same breakdown
    the paper's tables use."""
    from floodseg_tpu.ops.grid_sample import grid_sample
    from floodseg_tpu.video.flow_model import warp
    dg = None if default_grid is None else jnp.asarray(default_grid)

    @jax.jit
    def encode(variables, frames):
        return model.apply(variables, frames, train=False, method="encode")[0]

    @jax.jit
    def warp_chain(f, grids):
        y0 = warp(f, grids[0])
        def step(c, g):
            nx = warp(c, g)
            return nx, nx
        _, rest = jax.lax.scan(step, y0, grids[1:])
        chain = jnp.concatenate([y0[None], rest], axis=0)[:, 0]
        if chain.shape[1] != f.shape[1] or chain.shape[2] != f.shape[2]:
            chain = resize_bilinear(chain, f.shape[1:3], align_corners=True)
        return chain

    @jax.jit
    def fuse(f, f_next, fwd, bwd):
        fk = f
        if feature_based and dg is not None:
            fk = grid_sample(f, dg[None], align_corners=True)
            if fk.shape[1] != f.shape[1] or fk.shape[2] != f.shape[2]:
                fk = resize_bilinear(fk, f.shape[1:3], align_corners=True)
        p = jnp.arange(1, n, dtype=jnp.float32)[:, None, None, None]
        wf = ((n - p) / n).astype(f.dtype)
        wb = (p / n).astype(f.dtype)
        inter = wf * fwd + wb * bwd[::-1]
        return jnp.concatenate([fk[0][None], inter], axis=0)

    @jax.jit
    def decode(variables, maps):
        out = model.apply(variables, maps, train=False, method="decode")
        if out.shape[1] != out_size[0] or out.shape[2] != out_size[1]:
            out = resize_bilinear(out, out_size, align_corners=True)
        return jnp.argmax(out, axis=-1).astype(jnp.int32)

    return {"encode": encode, "warp_chain": warp_chain, "fuse": fuse,
            "decode": decode}


def profile_predict_phases(model, variables, batch, n: int,
                           feature_based: bool = True,
                           out_size: Tuple[int, int] = (1072, 1920),
                           default_grid: Optional[np.ndarray] = None,
                           repeats: int = 5):
    """Run one clip phase-by-phase and return per-phase mean seconds
    (named like the reference's profiler regions)."""
    import time as _time
    fns = make_flow_phase_fns(model, n, feature_based, out_size, default_grid)
    fp = jnp.asarray(batch["frame_prev"])
    fnx = jnp.asarray(batch["frame_next"])
    ml = jnp.asarray(batch["mvs_left"])
    mr = jnp.asarray(batch["mvs_right"])

    def force(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    # warm up every phase AND its readback reduction (the timing barrier is
    # a scalar sum fetch; its first call compiles)
    f = fns["encode"](variables, fp)
    force(f)
    f2 = fns["encode"](variables, fnx)
    fwd = fns["warp_chain"](f, ml)
    force(fwd)
    bwd = fns["warp_chain"](f2, mr)
    maps = fns["fuse"](f, f2, fwd, bwd)
    force(maps)
    force(fns["decode"](variables, maps))

    times = {}

    def timed(name, fn):
        t0 = _time.perf_counter()
        for _ in range(repeats):
            out = fn()
        force(out)
        times[name] = (_time.perf_counter() - t0) / repeats
        return out

    f = timed("predict_encoder", lambda: fns["encode"](variables, fp))
    f2 = fns["encode"](variables, fnx)
    fwd = timed("predict_warp", lambda: fns["warp_chain"](f, ml))
    bwd = fns["warp_chain"](f2, mr)
    maps = timed("predict_fusion", lambda: fns["fuse"](f, f2, fwd, bwd))
    timed("predict_decoder", lambda: fns["decode"](variables, maps))
    return times

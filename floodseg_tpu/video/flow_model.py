"""Frame-interpolation model (Jain & Gonzalez keyframe-warp scheme).

TPU-native equivalent of the reference's FlowModel
(/root/reference/flow/model.py): encode the two key frames only, warp the
feature (or segmentation) maps along per-frame block-MV grids, linearly
blend forward/backward warps, and decode.

Design differences from the torch version (same math, TPU shape discipline):

- The per-clip predict path is ONE jit-compiled program: 2 encoder calls ->
  two fully-unrolled warp chains (blend fused into the stack writes) -> a
  single batched decoder call over all ``n`` maps (the reference already
  batches the decode, flow/model.py:173-179; we fuse the whole clip).
- Training-time variable chain lengths (each sample warps ``left_index``
  times, flow/model.py:92-106) become a fixed-length scan with per-sample
  masking: chains are padded to ``frame_delta - 1`` identity grids by the
  data layer (exactly like flow/dataset.py:156-169) and a ``j < index``
  select keeps the carry unchanged past the true length. Chain lengths are
  always >= 1, so the first (shape-changing) warp runs unconditionally.
- Warps chain at GRID resolution (output of grid_sample has the grid's
  shape), matching the reference; each stored intermediate is resized back
  to the feature resolution with align_corners=True.
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from floodseg_tpu.ops.grid_sample import grid_sample
from floodseg_tpu.ops.resize import resize_bilinear, resize_argmax


def warp(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """One block-MV warp (grid_sample bilinear/border/align_corners=False,
    flow/model.py:244-249)."""
    return grid_sample(x, grid, align_corners=False)


def _pallas_resize_quant_ok(in_shape, out_hw, dtype) -> bool:
    """Gate the fused Pallas resize+quantize kernel. DEFAULT OFF: the r5
    on-chip A-B (bench.py kernel_delta, median-of-passes) measured the
    fused kernel 9% SLOWER end-to-end (798.7 vs 880.2 fps at the bench
    shape) despite its isolated-trace motivation — the XLA composition it
    replaces fuses into neighbors the standalone kernel walls off. Kept as
    an opt-in (`FLOODSEG_PALLAS_RESIZE=1`) with bit-parity pinned in
    tests/test_pallas_resize.py, same status as pallas_warp: the measured
    alternative, not the production path. Requires a real TPU backend and
    shapes whose per-step blocks fit VMEM at the input dtype's width."""
    import os
    if not os.environ.get("FLOODSEG_PALLAS_RESIZE"):
        return False
    if jax.default_backend() != "tpu":
        return False
    from floodseg_tpu.ops.pallas_resize import resize_quantize_supported
    return resize_quantize_supported(in_shape[1:3], out_hw, in_shape[3],
                                     itemsize=jnp.dtype(dtype).itemsize)


def warp_chain_masked(f: jnp.ndarray, grids: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """Warp each sample through its first ``index`` grids (training path).

    f: (B, H, W, C) maps; grids: (T, B, gh, gw, 2) padded chains; index: (B,)
    int >= 1. Chains run at grid resolution with a ``j < index`` mask, then
    resize back to (H, W) align_corners=True (flow/model.py:92-106).
    """
    b, h, w, c = f.shape
    t = grids.shape[0]
    y = warp(f, grids[0])  # index >= 1 always; shape -> grid res

    def step(carry, inp):
        j, g = inp
        nxt = warp(carry, g)
        keep = (j < index)[:, None, None, None]
        return jnp.where(keep, nxt, carry), None

    if t > 1:
        js = jnp.arange(1, t)
        y, _ = jax.lax.scan(step, y, (js, grids[1:]))
    if y.shape[1] != h or y.shape[2] != w:
        y = resize_bilinear(y, (h, w), align_corners=True)
    return y


def interp_weight(index: jnp.ndarray, n: jnp.ndarray, dtype) -> jnp.ndarray:
    """(n - index) / n broadcast over NHWC (flow/model.py:104). Computed at
    >= f32 (f64 under x64 for the parity oracles)."""
    wdt = jnp.promote_types(dtype, jnp.float32)
    s = (n.astype(wdt) - index.astype(wdt)) / n.astype(wdt)
    return s[:, None, None, None].astype(dtype)


@dataclass(frozen=True)
class FlowInterpolator:
    """Wraps an encoder/decoder pair with keyframe-warp interpolation.

    encode: (images NHWC) -> feature map NHWC
    decode: (features NHWC) -> logits NHWC
    feature_based: warp features then decode (True) or decode keyframes then
        warp logits (False) — flow/model.py:49-52.
    no_warp: skip warping, pure linear blending of key maps (flow/model.py
        ``no_warp``).
    """

    encode: Callable[[jnp.ndarray], jnp.ndarray]
    decode: Callable[[jnp.ndarray], jnp.ndarray]
    feature_based: bool = True
    no_warp: bool = False
    # decode accepts act_absmax= (int8 decoders, ops/quant.py): predict_clip
    # then passes a bound on the stack's |max| computed on the SMALL raw key
    # encodings, so the quantization fuses into the resize epilogue instead
    # of re-reading the full-resolution stack (bilinear outputs are convex
    # combinations of inputs, so the bound is valid)
    decode_wants_absmax: bool = False
    # decode the key map and the n-1 interpolated maps as TWO calls and
    # concatenate only the logits — skips the ~430 MB feature-resolution
    # concat copy, bit-identical under eval BN/LN. Only worth it for cheap
    # single-conv heads (pspnet SegHead): measured +11% there but -30% for
    # the DeepLabHead, whose batch-1 dilated ASPP convs run at terrible MXU
    # utilization when duplicated for the lone key map
    decode_split: bool = False

    # ---------------- training ----------------

    def _warp_chain_masked(self, f, grids, index):
        return warp_chain_masked(f, grids, index)

    def train_forward(
        self,
        frame_prev: jnp.ndarray,
        frame_next: jnp.ndarray,
        mvs_left: jnp.ndarray,
        mvs_right: jnp.ndarray,
        left_index: jnp.ndarray,
        right_index: jnp.ndarray,
        out_size: Optional[tuple] = None,
    ) -> jnp.ndarray:
        """Interpolated prediction at the current frame (flow/model.py:55-88).

        mvs_*: (T, B, gh, gw, 2) time-major padded grid chains.
        Returns logits at ``out_size`` (default: frame size).
        """
        h, w = frame_prev.shape[1], frame_prev.shape[2]
        out_size = out_size or (h, w)
        wdt = jnp.promote_types(frame_prev.dtype, jnp.float32)
        n = (left_index + right_index).astype(wdt)

        def weighted(maps, index):
            scale = ((n - index.astype(wdt)) / n)[:, None, None, None]
            return maps * scale.astype(maps.dtype)

        if self.feature_based:
            f_prev = self.encode(frame_prev)
            f_next = self.encode(frame_next)
            if self.no_warp:
                fp, fn = f_prev, f_next
            else:
                fp = self._warp_chain_masked(f_prev, mvs_left, left_index)
                fn = self._warp_chain_masked(f_next, mvs_right, right_index)
            f = weighted(fp, left_index) + weighted(fn, right_index)
            out = self.decode(f)
        else:
            o_prev = self.decode(self.encode(frame_prev))
            o_next = self.decode(self.encode(frame_next))
            if self.no_warp:
                op, on = o_prev, o_next
            else:
                op = self._warp_chain_masked(o_prev, mvs_left, left_index)
                on = self._warp_chain_masked(o_next, mvs_right, right_index)
            out = weighted(op, left_index) + weighted(on, right_index)
        if out.shape[1] != out_size[0] or out.shape[2] != out_size[1]:
            out = resize_bilinear(out, out_size, align_corners=True)
        return out

    # ---------------- inference (the throughput path) ----------------

    def _predict_chain_list(self, f, grids):
        """The unrolled warp chain as a per-step Python list.

        f: (B, H, W, C); grids: (T, B, gh, gw, 2). Returns T maps of shape
        (B, gh, gw, C) — step k is f warped through grids[0..k]. Keeping the
        steps as separate values (instead of stacking here) lets the caller
        fuse per-step epilogues (the (n-p)/n blend) into the stack write.

        Fully unrolled Python loop rather than lax.scan: each iteration is
        ~20 us of gather math on a (32, 32, 4096) map but cost ~68 us
        inside a while loop, partial unrolling still paid
        dynamic-update-slice buffer traffic for the stacked outputs, and T
        is small and static (frame_delta - 2).
        """
        y = warp(f, grids[0])
        ys = [y]
        for k in range(1, grids.shape[0]):
            y = warp(y, grids[k])
            ys.append(y)
        return ys

    def predict_clip(
        self,
        frame_prev: jnp.ndarray,
        frame_next: Optional[jnp.ndarray],
        mvs_left: Optional[jnp.ndarray],
        mvs_right: Optional[jnp.ndarray],
        n: int,
        default_grid: Optional[jnp.ndarray] = None,
        out_size: Optional[tuple] = None,
        f_prev_enc: Optional[jnp.ndarray] = None,
        return_next_enc: bool = False,
        argmax_epilogue: bool = False,
        fused_argmax: bool = True,
    ) -> jnp.ndarray:
        """Segment all ``n`` frames of a keyframe window in one program.

        frame_prev/frame_next: (1, H, W, 3) key frames (frame_next None for
        the tail window). mvs_left: (n-1, 1, gh, gw, 2) forward grids;
        mvs_right: same, reversed inv_grids. Returns (n, H', W', classes)
        logits for frames [prev, prev+1, ..., prev+n-1].

        Mirrors flow/model.py:116-181 (feature_based) / :184-241: key-frame
        map additionally resampled once through the identity ``default_grid``
        (align_corners=True, flow/model.py:154-159) so frame 0 sees the same
        block-quantization blur as the interpolated frames.

        Key-feature reuse (TPU addition, numerically identical): consecutive
        windows share a key frame — window k's next key IS window k+1's prev
        key. Pass the previous window's returned encoding as ``f_prev_enc``
        to skip re-encoding it; ``return_next_enc`` additionally returns the
        RAW (pre-identity-grid) encoding of frame_next for the next window.
        Eval-mode BN is batch-invariant, so cached and fresh paths match.

        ``argmax_epilogue``: return int32 class maps instead of logits, via
        the fused channels-first upsample+argmax (resize_argmax).
        ``fused_argmax=False`` keeps the epilogue as the unfused
        ``argmax(resize_bilinear(...))`` composition — same values (the
        fused form is elementwise-equal, ops/resize.py), kept for A-B
        measurement of the epilogue layouts (bench.py --epilogue-ab).
        """
        ref_frame = frame_prev if frame_prev is not None else frame_next
        h, w = ref_frame.shape[1], ref_frame.shape[2]
        out_size = out_size or (h, w)
        single = frame_next is None

        enc = self.encode
        dec = self.decode
        if not self.feature_based:
            # segmentation mode decodes the key frames up-front and warps the
            # FULL-RESOLUTION logits (flow/model.py:184-241 upsamples o before
            # the warp chains); the batched "decode" is then the identity
            def enc(x):  # noqa: E731
                o = self.decode(self.encode(x))
                if o.shape[1] != h or o.shape[2] != w:
                    o = resize_bilinear(o, (h, w), align_corners=True)
                return o

            dec = lambda x: x  # noqa: E731

        if single:
            f = f_prev_enc if f_prev_enc is not None else enc(frame_prev)
            f_next = None
        elif f_prev_enc is not None:
            f = f_prev_enc
            f_next = enc(frame_next)
        else:
            # both key frames in ONE batched encoder call (eval-mode BN is
            # batch-invariant, so this is numerically identical to two calls)
            f_both = enc(jnp.concatenate([frame_prev, frame_next], axis=0))
            f, f_next = f_both[:1], f_both[1:]
        f_next_raw = f_next
        fh, fw = f.shape[1], f.shape[2]

        def _absmax(x):
            return jnp.max(jnp.abs(x.astype(jnp.float32)))

        # absmax hint for an int8 decoder: every map in the decoded stack is
        # a convex combination (bilinear warps/resizes, identity-grid
        # resample, (n-p)/n + p/n blends) of the raw key encodings, so
        # max|stack| <= max(max|f|, max|f_next|) — computable BEFORE the
        # expensive full-resolution maps materialize
        absmax_hint = None
        if self.decode_wants_absmax and self.feature_based:
            absmax_hint = _absmax(f)
            if f_next is not None:
                absmax_hint = jnp.maximum(absmax_hint, _absmax(f_next))

        maps = []
        if not single:
            if not self.no_warp:
                # NOTE: batching fwd+bwd into one B=2 scan was tried and is
                # ~30x SLOWER on v5e (the batched dynamic-gather lowers to a
                # pathological path); keep the two independent scans, which
                # XLA can overlap.
                # resize-after-fuse: blending and bilinear resize are both
                # linear, so the chains stay at grid resolution and only the
                # n-1 FUSED maps are resized — identical numerics, half the
                # resize/fusion HBM traffic vs the reference's order
                fwd_list = self._predict_chain_list(f, mvs_left)
                bwd_list = self._predict_chain_list(f_next, mvs_right)

        # key-frame map through the identity grid (feature_based only)
        if self.feature_based and not self.no_warp and default_grid is not None:
            fk = grid_sample(f, default_grid[None], align_corners=True)
            if fk.shape[1] != fh or fk.shape[2] != fw:
                fk = resize_bilinear(fk, (fh, fw), align_corners=True)
            f = fk
        maps.append(f[0])

        if not single:
            p = jnp.arange(1, n, dtype=jnp.float32)[:, None, None, None]
            wf = ((n - p) / n).astype(f.dtype)
            wb = (p / n).astype(f.dtype)
            if self.no_warp:
                inter = wf * f[0][None] + wb * f_next[0][None]
            else:
                # blend AT STACK TIME: step p pairs fwd[p-1] with the
                # backward chain's bwd[n-p-1] (natural order), and the
                # scalar blend fuses into each stack write — half the
                # dynamic-update-slice copies of stacking both chains and
                # no separate blend pass over the two stacked buffers
                # (same multiply-adds, bit-identical)
                t = len(fwd_list)
                inter = jnp.stack(
                    [wf[k] * fwd_list[k][0] + wb[k] * bwd_list[t - 1 - k][0]
                     for k in range(t)], axis=0)
                if inter.shape[1] != fh or inter.shape[2] != fw:
                    if absmax_hint is not None and _pallas_resize_quant_ok(
                            inter.shape, (fh, fw), inter.dtype):
                        # OPT-IN fused Pallas resize+quantize (default off:
                        # measured 9% slower end-to-end than the XLA
                        # composition — see ops/pallas_resize.py STATUS)
                        from floodseg_tpu.ops.pallas_resize import (
                            resize_quantize_int8)
                        from floodseg_tpu.ops.quant import scale_from_absmax
                        inter = resize_quantize_int8(
                            inter, scale_from_absmax(absmax_hint), (fh, fw),
                            align_corners=True)
                    else:
                        inter = resize_bilinear(
                            inter, (fh, fw), align_corners=True,
                            fast_lowp=absmax_hint is not None)
            maps.append(inter)

        if absmax_hint is not None:
            # int8 decoder: quantize each piece at the shared hint-derived
            # scale BEFORE the concat — bit-identical to quantizing the
            # concatenation (fixed scale), but each piece's quantization
            # fuses into its producer instead of re-reading the full stack
            from floodseg_tpu.ops.quant import quantize_with_scale, scale_from_absmax
            s = scale_from_absmax(absmax_hint)
            maps = [m if m.dtype == jnp.int8 else quantize_with_scale(m, s)
                    for m in maps]

        # batched decode (flow/model.py:176-179)
        _dec = (dec if absmax_hint is None
                else partial(dec, act_absmax=absmax_hint))
        if single:
            out = _dec(maps[0][None])
        elif self.decode_split:
            # two decodes, concat only the logits (see decode_split above)
            out = jnp.concatenate([_dec(maps[0][None]), _dec(maps[1])],
                                  axis=0)
        else:
            out = _dec(jnp.concatenate([maps[0][None], maps[1]], axis=0))
        if argmax_epilogue and not fused_argmax:
            if out.shape[1] != out_size[0] or out.shape[2] != out_size[1]:
                out = resize_bilinear(out, out_size, align_corners=True)
            out = jnp.argmax(out, axis=-1).astype(jnp.int32)
        elif argmax_epilogue:
            # fused channels-first upsample+argmax for the predict programs:
            # logits have tiny C, and the NHWC resize pads C onto the lane
            # dim of the full-res f32 intermediate (ops/resize.py)
            out = resize_argmax(out, out_size, align_corners=True)
        elif out.shape[1] != out_size[0] or out.shape[2] != out_size[1]:
            out = resize_bilinear(out, out_size, align_corners=True)
        if return_next_enc:
            return out, f_next_raw
        return out

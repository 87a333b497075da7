"""Pallas TPU kernel for the block-MV bilinear warp (grid_sample).

The warp gathers 4 taps per output point from a (H, W, C) feature map. On
TPU, scattered gathers run on the slow path; this kernel reformulates the
warp as a ONE-HOT MATMUL on the MXU: for a tile of P output points, build
the (P, H*W) sparse interpolation matrix from the 4 tap indices/weights with
iota comparisons (VPU), then contract it against the (H*W, C) source tile
(MXU). Tap indices and weights are precomputed with standard XLA ops; the
kernel only sees flat tensors.

Semantics match ops.grid_sample (torch grid_sample bilinear/border). The
XLA gather implementation remains the default — at this op's size it is not
a bottleneck (see bench notes); the kernel exists as the TPU-native fast
path for large point counts and is selected with ``grid_sample_pallas``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _taps(x_shape, grid, align_corners: bool):
    """Flat tap indices (B, P, 4) and weights (B, P, 4) (border padding)."""
    b, h, w, c = x_shape
    gxy = grid.astype(jnp.float32)
    if align_corners:
        fx = (gxy[..., 0] + 1.0) * 0.5 * (w - 1)
        fy = (gxy[..., 1] + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gxy[..., 0] + 1.0) * w - 1.0) * 0.5
        fy = ((gxy[..., 1] + 1.0) * h - 1.0) * 0.5
    x0f, y0f = jnp.floor(fx), jnp.floor(fy)
    wx, wy = fx - x0f, fy - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)
    gh, gw = grid.shape[1], grid.shape[2]
    p = gh * gw

    def flat(yi, xi):
        return (yi * w + xi).reshape(b, p)

    idx = jnp.stack([flat(y0, x0), flat(y0, x1), flat(y1, x0), flat(y1, x1)],
                    axis=-1)
    wgt = jnp.stack([(1 - wx) * (1 - wy), wx * (1 - wy),
                     (1 - wx) * wy, wx * wy], axis=-1).reshape(b, p, 4)
    return idx, wgt.astype(jnp.float32)


def _warp_kernel(idx_ref, w_ref, x_ref, out_ref):
    """One (P_tile, C_tile) output block: one-hot matmul on the MXU.
    Block refs carry a leading batch dim of 1."""
    hw_pad = x_ref.shape[1]
    p_tile = idx_ref.shape[1]
    q = jax.lax.broadcasted_iota(jnp.int32, (p_tile, hw_pad), 1)
    acc = jnp.zeros((p_tile, hw_pad), jnp.float32)
    for t in range(4):
        onehot = (q == idx_ref[0, :, t][:, None]).astype(jnp.float32)
        acc = acc + onehot * w_ref[0, :, t][:, None]
    out_ref[0, :, :] = jnp.dot(
        acc, x_ref[0].astype(jnp.float32), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("align_corners", "interpret"))
def grid_sample_pallas(x, grid, align_corners: bool = False,
                       interpret: bool = False):
    """Pallas MXU warp. x (B, H, W, C), grid (B, gh, gw, 2) -> (B, gh, gw, C).

    interpret=True runs the kernel in the Pallas interpreter (CPU tests).
    """
    b, h, w, c = x.shape
    gh, gw = grid.shape[1], grid.shape[2]
    p = gh * gw
    idx, wgt = _taps(x.shape, grid, align_corners)

    hw = h * w
    hw_pad = -(-hw // 128) * 128
    # tile sizes chosen to keep (p_tile, hw_pad) f32 scratch + double-buffered
    # (hw_pad, c_tile) source blocks inside the 16MB VMEM budget
    p_tile = min(128, p) if p % min(128, p) == 0 else p
    c_tile = min(256, c) if c % min(256, c) == 0 else c

    x_flat = x.reshape(b, hw, c)
    if hw_pad != hw:
        x_flat = jnp.pad(x_flat, ((0, 0), (0, hw_pad - hw), (0, 0)))

    out = pl.pallas_call(
        _warp_kernel,
        out_shape=jax.ShapeDtypeStruct((b, p, c), x.dtype),
        grid=(b, p // p_tile, c // c_tile),
        in_specs=[
            pl.BlockSpec((1, p_tile, 4), lambda bi, i, j: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_tile, 4), lambda bi, i, j: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw_pad, c_tile), lambda bi, i, j: (bi, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p_tile, c_tile),
                               lambda bi, i, j: (bi, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx, wgt, x_flat)
    return out.reshape(b, gh, gw, c)


def _chain_kernel(idx_ref, w_ref, y0_ref, out_ref, state):
    """One (step t, C-tile c) grid cell of the fused warp chain.

    TPU Pallas grids execute sequentially, so the VMEM ``state`` scratch
    carries the chain across the inner t dimension: state <- W_t @ state.
    W_t is the (P, P) one-hot interpolation matrix built on the VPU from the
    step's 4 tap indices/weights; the contraction runs on the MXU.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        state[:] = y0_ref[0]

    p = state.shape[0]
    q = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    acc = jnp.zeros((p, p), jnp.float32)
    for k in range(4):
        onehot = (q == idx_ref[0, :, k][:, None]).astype(jnp.float32)
        acc = acc + onehot * w_ref[0, :, k][:, None]
    new = jnp.dot(acc.astype(state.dtype), state[:],
                  preferred_element_type=jnp.float32).astype(state.dtype)
    state[:] = new
    out_ref[0] = new


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_chain_pallas(y0, grids, interpret: bool = False):
    """Fused warp chain: apply ``grids`` sequentially to ``y0`` and return
    every intermediate.

    y0: (1, gh, gw, C) — the first warped map (already at grid resolution);
    grids: (T, 1, gh, gw, 2) remaining per-frame grids. Returns
    (T + 1, gh, gw, C) = [y0, warp(y0, g0), warp(warp(y0, g0), g1), ...].

    Replaces T separate grid_sample dispatches (latency-bound at ~0.6 ms
    each on v5e through XLA) with ONE kernel whose carry never leaves VMEM.
    """
    b, gh, gw, c = y0.shape
    assert b == 1
    t = grids.shape[0]
    p = gh * gw
    if t == 0:
        return y0.reshape(1, gh, gw, c)

    # treat T as the batch dim of _taps; source spatial dims come from y0
    idx, wgt = _taps((t, gh, gw, c), grids[:, 0], align_corners=False)
    idx = idx.astype(jnp.int32)          # (T, P, 4)
    wgt = wgt.astype(jnp.float32)        # (T, P, 4)

    c_tile = min(512, c) if c % min(512, c) == 0 else c
    out = pl.pallas_call(
        _chain_kernel,
        out_shape=jax.ShapeDtypeStruct((t, p, c), y0.dtype),
        grid=(c // c_tile, t),
        in_specs=[
            pl.BlockSpec((1, p, 4), lambda ci, ti: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 4), lambda ci, ti: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, c_tile), lambda ci, ti: (0, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p, c_tile), lambda ci, ti: (ti, 0, ci),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((p, c_tile), y0.dtype)],
        interpret=interpret,
    )(idx, wgt, y0.reshape(1, p, c))
    chain = jnp.concatenate([y0.reshape(1, p, c), out], axis=0)
    return chain.reshape(t + 1, gh, gw, c)

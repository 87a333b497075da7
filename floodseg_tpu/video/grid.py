"""H.264 block-motion-vector grid algebra.

A "grid" is a (block_h, block_w, 2) array of normalized [-1, 1] (x, y)
sampling coordinates, one per 16px macroblock — the format produced by the
reference's extract_motion_vectors.py and consumed by grid_sample warps.

Host-side (numpy) pieces live here: grid construction from decoder motion
vectors (dataset production, /root/reference/dataset/flow/
extract_motion_vectors.py:21-43) and the crop renormalization used by the
augmentation pipeline and sliding-window eval (/root/reference/flow/
transform.py:215-261).
"""

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

BLOCK_SIZE = 16
FRAME_W, FRAME_H = 1920, 1072


def default_grid(height: int = FRAME_H, width: int = FRAME_W, block: int = BLOCK_SIZE) -> np.ndarray:
    """Identity grid: each block samples its own center (flow/model.py:10-21)."""
    bh, bw = height // block, width // block
    xs = (np.arange(bw) * block + block // 2) / width * 2 - 1
    ys = (np.arange(bh) * block + block // 2) / height * 2 - 1
    grid = np.empty((bh, bw, 2), dtype=np.float32)
    grid[..., 0] = xs[None, :]
    grid[..., 1] = ys[:, None]
    return grid


def grids_from_motion_vectors(
    motion_vectors: np.ndarray,
    height: int = FRAME_H,
    width: int = FRAME_W,
    block: int = BLOCK_SIZE,
):
    """Decoder MVs -> (grid, inv_grid), both identity where no MV lands.

    ``motion_vectors``: (N, >=7) rows in mvextractor layout: src pixel at
    columns (3, 4), dst pixel at (5, 6). For each MV the normalized CENTER of
    the source BLOCK (quantized, src_block*16+8) is written at the dst block
    of ``grid`` (warping the previous frame with ``grid`` moves content
    forward); symmetrically the dst block center lands at the src block of
    ``inv_grid`` (backward warp). Out-of-frame blocks are skipped. Mirrors
    extract_motion_vectors.py:21-43.
    """
    grid = default_grid(height, width, block).copy()
    inv_grid = default_grid(height, width, block).copy()
    bh, bw = grid.shape[:2]
    if motion_vectors is None or len(motion_vectors) == 0:
        return grid, inv_grid

    def center_x(b):
        return (b * block + block // 2) / width * 2 - 1

    def center_y(b):
        return (b * block + block // 2) / height * 2 - 1

    mv = np.asarray(motion_vectors, dtype=np.float64)
    src_bx = (mv[:, 3] // block).astype(np.int64)
    src_by = (mv[:, 4] // block).astype(np.int64)
    dst_bx = (mv[:, 5] // block).astype(np.int64)
    dst_by = (mv[:, 6] // block).astype(np.int64)

    ok = (0 <= dst_bx) & (dst_bx < bw) & (0 <= dst_by) & (dst_by < bh)
    grid[dst_by[ok], dst_bx[ok], 0] = center_x(src_bx[ok])
    grid[dst_by[ok], dst_bx[ok], 1] = center_y(src_by[ok])
    ok = (0 <= src_bx) & (src_bx < bw) & (0 <= src_by) & (src_by < bh)
    inv_grid[src_by[ok], src_bx[ok], 0] = center_x(dst_bx[ok])
    inv_grid[src_by[ok], src_bx[ok], 1] = center_y(dst_by[ok])
    return grid.astype(np.float32), inv_grid.astype(np.float32)


def crop_motion_vectors_np(
    grids,
    height: int,
    width: int,
    crop_h: int,
    crop_w: int,
    h_off: int,
    w_off: int,
):
    """Renormalize a list of grids to a crop window (flow/transform.py:215-261).

    Crops each grid to the blocks covering the window, remaps the normalized
    coordinates from full-frame [-1,1] to crop-window [-1,1], and resizes to
    (crop_h//16, crop_w//16) blocks with bilinear (cv2.INTER_LINEAR)
    interpolation.
    """
    if not grids:
        return grids
    mv_h, mv_w = grids[0].shape[-3], grids[0].shape[-2]
    ppb_h = height / mv_h
    ppb_w = width / mv_w
    fin_bh, fin_bw = crop_h // BLOCK_SIZE, crop_w // BLOCK_SIZE

    bh_off = round(h_off / ppb_h)
    bw_off = round(w_off / ppb_w)
    bh = round((h_off + crop_h) / ppb_h) - bh_off
    bw = round((w_off + crop_w) / ppb_w) - bw_off

    out = []
    for m in grids:
        m = np.array(m[bh_off:bh_off + bh, bw_off:bw_off + bw], dtype=np.float32)
        m[..., 0] = ((((m[..., 0] + 1) / 2) * width - w_off) / (bw * ppb_w)) * 2 - 1
        m[..., 1] = ((((m[..., 1] + 1) / 2) * height - h_off) / (bh * ppb_h)) * 2 - 1
        if cv2 is not None:
            m = cv2.resize(m, (fin_bw, fin_bh), interpolation=cv2.INTER_LINEAR)
        else:
            from floodseg_tpu.ops.resize import resize_bilinear
            import jax.numpy as jnp
            m = np.asarray(resize_bilinear(jnp.asarray(m), (fin_bh, fin_bw),
                                           align_corners=False))
        out.append(m)
    return out


from functools import lru_cache


@lru_cache(maxsize=64)
def _linear_resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix in cv2 INTER_LINEAR /
    half-pixel convention — ops.resize's matrix builder (align_corners=False
    is the same src = (dst+0.5)*n_in/n_out - 0.5 formula), cached in f32 for
    the hot per-crop renormalization path."""
    from floodseg_tpu.ops.resize import _interp_matrix
    return _interp_matrix(n_in, n_out, align_corners=False).astype(np.float32)


def crop_motion_vectors_stack_np(
    grids: np.ndarray,
    height: int,
    width: int,
    crop_h: int,
    crop_w: int,
    h_off: int,
    w_off: int,
) -> np.ndarray:
    """Vectorized ``crop_motion_vectors_np`` over a stacked (T, bh, bw, 2)
    chain: one slice + one coordinate remap + one einsum-resize for ALL T
    grids (the per-grid cv2 loop costs ~2 ms per chain per crop on host,
    ~19 ms/frame in the flow sliding-window test; this is ~10x cheaper).
    Numerics match the loop version (same half-pixel bilinear)."""
    t, mv_h, mv_w = grids.shape[0], grids.shape[1], grids.shape[2]
    ppb_h = height / mv_h
    ppb_w = width / mv_w
    fin_bh, fin_bw = crop_h // BLOCK_SIZE, crop_w // BLOCK_SIZE

    bh_off = round(h_off / ppb_h)
    bw_off = round(w_off / ppb_w)
    bh = round((h_off + crop_h) / ppb_h) - bh_off
    bw = round((w_off + crop_w) / ppb_w) - bw_off

    m = np.array(grids[:, bh_off:bh_off + bh, bw_off:bw_off + bw],
                 dtype=np.float32)
    m[..., 0] = ((((m[..., 0] + 1) / 2) * width - w_off) / (bw * ppb_w)) * 2 - 1
    m[..., 1] = ((((m[..., 1] + 1) / 2) * height - h_off) / (bh * ppb_h)) * 2 - 1
    rh = _linear_resize_matrix(bh, fin_bh)
    rw = _linear_resize_matrix(bw, fin_bw)
    tmp = np.tensordot(rh, m, axes=(1, 1))    # (fin_bh, T, bw, 2)
    out = np.tensordot(tmp, rw, axes=(2, 1))  # (fin_bh, T, 2, fin_bw)
    return np.ascontiguousarray(out.transpose(1, 0, 3, 2))


def flip_grid_np(grid: np.ndarray) -> np.ndarray:
    """Horizontal-flip a grid: mirror block layout and negate x coords
    (flow/transform.py:329-337)."""
    g = grid[:, ::-1].copy()
    g[..., 0] = -g[..., 0]
    return g

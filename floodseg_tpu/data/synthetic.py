"""Synthetic flood-UAV-like dataset generator.

The real UAV-5 dataset is built from two YouTube videos by the reference's
offline tooling (ffmpeg/yt-dlp/mvextractor — /root/reference/dataset/flow/);
neither the videos nor the extracted frames ship with the repo. This module
fabricates a dataset tree with the exact same on-disk layout so the full
train/test/predict stack (and the benchmark) runs hermetically:

- videos of drifting class-colored blobs over textured background, with a
  smooth global+local motion field;
- per-frame block-MV grids derived from that analytic motion through the
  same MV->grid construction used for real H.264 vectors;
- masks and train/val/test/train_u lists in the reference list format.
"""

import os
from typing import Tuple

import numpy as np
from PIL import Image

from floodseg_tpu.video.grid import grids_from_motion_vectors, BLOCK_SIZE

PALETTE = np.array(
    [[0, 0, 0], [30, 95, 170], [65, 117, 5], [212, 98, 1], [255, 244, 1]],
    dtype=np.uint8,
)  # colors.txt


def _motion(t: float, rng_amp: np.ndarray) -> Tuple[float, float]:
    """Smooth global translation (pixels/frame) at time t."""
    dx = rng_amp[0] * np.sin(0.1 * t) + rng_amp[1]
    dy = rng_amp[2] * np.cos(0.07 * t) + rng_amp[3]
    return float(dx), float(dy)


def _render(size, t, offset, rng) -> Tuple[np.ndarray, np.ndarray]:
    """Frame + label at accumulated offset. Deterministic in (size, t)."""
    h, w = size
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ox, oy = offset
    # textured background (class 0 / street 4 bands)
    tex = (np.sin((xx + ox) * 0.11) + np.cos((yy + oy) * 0.13)) * 0.5
    label = np.zeros((h, w), dtype=np.uint8)
    img = np.stack([80 + 40 * tex, 90 + 30 * tex, 70 + 20 * tex], axis=-1)

    # moving class blobs (water 1, tree 2, building 3, street 4)
    blobs = [
        (1, 0.30 * w, 0.60 * h, 0.22 * min(h, w)),
        (2, 0.70 * w, 0.30 * h, 0.15 * min(h, w)),
        (3, 0.55 * w, 0.75 * h, 0.12 * min(h, w)),
        (4, 0.15 * w, 0.20 * h, 0.10 * min(h, w)),
    ]
    for cls, cx, cy, r in blobs:
        cx = (cx + ox) % w
        cy = (cy + oy) % h
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2
        mask = d2 < r * r
        label[mask] = cls
        img[mask] = PALETTE[cls].astype(np.float32) * 0.7 + img[mask] * 0.3
    img = np.clip(img + rng.normal(0, 3, img.shape), 0, 255).astype(np.uint8)
    return img, label


def generate_synthetic_dataset(
    root: str,
    video_id: str = "synth",
    num_frames: int = 60,
    size: Tuple[int, int] = (192, 256),
    frame_delta: int = 5,
    num_labeled: int = 8,
    seed: int = 0,
) -> str:
    """Write a dataset tree under ``root`` and return ``root``."""
    h, w = size
    assert h % BLOCK_SIZE == 0 and w % BLOCK_SIZE == 0
    rng = np.random.default_rng(seed)
    amp = rng.uniform(-2, 2, size=4)

    img_dir = os.path.join(root, "frames", video_id, "images")
    grid_dir = os.path.join(root, "frames", video_id, "grids")
    inv_dir = os.path.join(root, "frames", video_id, "inv_grids")
    mask_dir = os.path.join(root, "masks", video_id)
    list_dir = os.path.join(root, "list", "all")
    for d in (img_dir, grid_dir, inv_dir, mask_dir, list_dir):
        os.makedirs(d, exist_ok=True)

    bh, bw = h // BLOCK_SIZE, w // BLOCK_SIZE
    cy = (np.arange(bh) * BLOCK_SIZE + BLOCK_SIZE // 2).astype(np.float64)
    cx = (np.arange(bw) * BLOCK_SIZE + BLOCK_SIZE // 2).astype(np.float64)
    cxx, cyy = np.meshgrid(cx, cy)

    offset = np.zeros(2)
    labels = {}
    for t in range(num_frames):
        dx, dy = _motion(t, amp)
        offset += (dx, dy)
        img, label = _render(size, t, offset, rng)
        Image.fromarray(img).save(os.path.join(img_dir, f"{t}.jpg"), quality=92)
        labels[t] = label
        # analytic MVs: every dst block's content came from (dst - motion)
        mv = np.zeros((bh * bw, 7))
        mv[:, 0] = -1
        mv[:, 1] = mv[:, 2] = BLOCK_SIZE
        mv[:, 3] = (cxx - dx).ravel()
        mv[:, 4] = (cyy - dy).ravel()
        mv[:, 5] = cxx.ravel()
        mv[:, 6] = cyy.ravel()
        grid, inv_grid = grids_from_motion_vectors(mv, h, w)
        np.save(os.path.join(grid_dir, f"{t}.npy"), grid)
        np.save(os.path.join(inv_dir, f"{t}.npy"), inv_grid)

    # labeled frames spread over the valid range [frame_delta, end-frame_delta]
    lo, hi = frame_delta, num_frames - frame_delta - 1
    lab_ids = np.unique(np.linspace(lo, hi, num_labeled).astype(int))
    for fid in lab_ids:
        Image.fromarray(labels[int(fid)]).save(os.path.join(mask_dir, f"{fid}.png"))

    def write_list(name, ids, label_fmt="masks/{v}/{fid}.png"):
        with open(os.path.join(list_dir, name), "w") as f:
            for fid in ids:
                label = label_fmt.format(v=video_id, fid=fid)
                f.write(f"{label} {video_id} {fid}\n")

    k = len(lab_ids)
    n_val = max(1, int(round(0.15 * k)))
    n_test = max(1, int(round(0.15 * k)))
    n_train = max(1, k - n_val - n_test)
    train_ids = lab_ids[:n_train]
    val_ids = lab_ids[n_train:n_train + n_val]
    test_ids = lab_ids[n_train + n_val:]
    write_list("train.txt", train_ids)
    write_list("val.txt", val_ids if len(val_ids) else lab_ids[:1])
    write_list("test.txt", test_ids if len(test_ids) else lab_ids[:1])
    write_list("test2.txt", lab_ids[:1])
    # unlabeled list: frames without masks (reference train_u.txt has
    # label path "invalid")
    unlab = [t for t in range(lo, hi) if t not in set(int(i) for i in lab_ids)][::3]
    write_list("train_u.txt", unlab, label_fmt="invalid")

    with open(os.path.join(root, "list", "names.txt"), "w") as f:
        f.write("Background\nWater\nTree\nBuilding\nStreet\n")
    with open(os.path.join(root, "list", "colors.txt"), "w") as f:
        for c in PALETTE:
            f.write(f"{c[0]} {c[1]} {c[2]}\n")
    return root

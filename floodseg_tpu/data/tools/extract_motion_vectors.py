"""Extract frames + block-MV grids from an H.264 video.

Equivalent of /root/reference/dataset/flow/extract_motion_vectors.py: decode
each frame with mvextractor's VideoCap, turn the 16x16-block motion vectors
into (grid, inv_grid) sampling grids via
floodseg_tpu.video.grid.grids_from_motion_vectors, and write
``frames/<video>/{images/<i>.jpg, grids/<i>.npy, inv_grids/<i>.npy}``.

The video must be encoded with no B-frames (ingress_new_video.sh:
``ffmpeg -c:v libx264 -x264opts bframes=0 -partitions none
-filter:v fps=25,scale=1920x1072``) so every MV points backward one frame.

mvextractor is an optional dependency (not in the base image); the module
degrades to a clear error message when absent.
"""

import argparse
import os
import sys

import numpy as np

from floodseg_tpu.video.grid import grids_from_motion_vectors, BLOCK_SIZE


def extract(video_path: str, out_root: str = "frames") -> int:
    try:
        from mvextractor.videocap import VideoCap
    except ImportError as e:
        raise SystemExit(
            "mvextractor is required for motion-vector extraction "
            "(pip install motion-vector-extractor) — not bundled in this "
            "image; the rest of the framework runs without it."
        ) from e
    try:
        import cv2
    except ImportError as e:
        raise SystemExit("opencv required for frame writing") from e

    name = os.path.splitext(os.path.basename(video_path))[0]
    img_dir = os.path.join(out_root, name, "images")
    grid_dir = os.path.join(out_root, name, "grids")
    inv_dir = os.path.join(out_root, name, "inv_grids")
    for d in (img_dir, grid_dir, inv_dir):
        os.makedirs(d, exist_ok=True)

    cap = VideoCap()
    if not cap.open(video_path):
        raise SystemExit(f"could not open {video_path}")
    i = 0
    while True:
        ok, frame, mvs, frame_type, _ = cap.read()
        if not ok:
            break
        h, w = frame.shape[:2]
        # only full 16x16 vectors participate (reference asserts size == 16)
        if len(mvs):
            mvs = mvs[(mvs[:, 1] == BLOCK_SIZE) & (mvs[:, 2] == BLOCK_SIZE)]
        grid, inv_grid = grids_from_motion_vectors(mvs, h, w)
        cv2.imwrite(os.path.join(img_dir, f"{i}.jpg"), frame)
        np.save(os.path.join(grid_dir, f"{i}.npy"), grid)
        np.save(os.path.join(inv_dir, f"{i}.npy"), inv_grid)
        i += 1
    cap.release()
    print(f"{name}: {i} frames extracted")
    return i


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("videos", nargs="+")
    p.add_argument("--out", default="frames")
    args = p.parse_args(argv)
    for v in args.videos:
        extract(v, args.out)


if __name__ == "__main__":
    main()

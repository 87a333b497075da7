"""Dataset production tools: frame-id mapping + list building."""

import os

import numpy as np
from PIL import Image

from floodseg_tpu.data.tools.make_flow import (
    get_global_frame_id, build_lists,
)


def test_global_frame_id_constant_speed():
    # florida-02: speed 1.0, start 2389; label 21 -> (21-1)*25 + 2389 = 2889
    # (matches the shipped reference list entry "masks/florida-02/21.png
    # florida 2889")
    assert get_global_frame_id("florida-02", 21) == 2889
    assert get_global_frame_id("florida-02", 1) == 2389
    # florida-07: speed 1.5 -> int(1.5 * 25 * (i-1)) + 8746
    assert get_global_frame_id("florida-07", 3) == int(1.5 * 50) + 8746


def test_global_frame_id_piecewise():
    # florida-05 chapters: [0, 3.0], [515, 1.5], [1060, 2.0]; start 27884
    # label 1 -> rel 0 -> chapter 0 -> 0 + 27884
    assert get_global_frame_id("florida-05", 1) == 27884
    # label 22 -> rel 525 -> chapter 1: 3*515 + 1.5*(525-515) = 1560
    assert get_global_frame_id("florida-05", 22) == 1560 + 27884
    # label 44 -> rel 1075 -> chapter 2: 3*515 + 1.5*(1060-515) + 2*(1075-1060)
    expected = int(3 * 515) + int(1.5 * 545) + int(2 * 15) + 27884
    assert get_global_frame_id("florida-05", 44) == expected


def test_build_lists(tmp_path):
    root = str(tmp_path)
    videos = {"vid-01": "train", "vid-02": "val"}
    speeds = {"vid-01": 1.0, "vid-02": 1.0}
    starts = {"vid-01": 0, "vid-02": 100}
    for v in videos:
        os.makedirs(f"{root}/masks/{v}", exist_ok=True)
        for i in (1, 2):
            Image.fromarray(
                np.random.default_rng(i).integers(0, 5, (8, 8)).astype(np.uint8)
            ).save(f"{root}/masks/{v}/{i}.png")
    lists, dist = build_lists(root, "all", videos,
                              unsupervised_index={"vid-01": [5, 6]},
                              require_frames=False,
                              speeds=speeds, starts=starts)
    assert len(lists["train"]) == 2 and len(lists["val"]) == 2
    assert len(lists["train_u"]) == 2
    assert lists["train_u"][0][0] == "invalid"
    assert os.path.exists(f"{root}/list/all/train.txt")
    assert abs(sum(dist) - 1.0) < 1e-6


def test_sweep_dry_run_expands_grid():
    """sweep.py expands discrete grids into fit commands (reference
    train_agent.sh + experiments/*.yaml W&B sweeps)."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "scripts/sweep.py", "experiments/frame_delta.yaml",
         "--dry_run", "--", "--config", "configs/train_base.yaml"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr
    lines = [l for l in out.stdout.splitlines() if "cli.main fit" in l]
    assert len(lines) == 6  # frame_delta values [2,5,10,15,20,25]
    assert "--data.frame_delta 25" in lines[-1]

#!/usr/bin/env python
"""Hyperparameter sweep driver (reference train_agent.sh + experiments/*.yaml
W&B sweeps). Reads a sweep YAML of dot-path parameter lists, expands the
grid (or samples --count random points), and launches sequential fit runs.

  python scripts/sweep.py experiments/frame_delta.yaml --count 4 \
      -- --config configs/train_base.yaml ...
"""
import argparse
import itertools
import random
import subprocess
import sys

import yaml


def main():
    p = argparse.ArgumentParser()
    p.add_argument("sweep_yaml")
    p.add_argument("--count", type=int, default=None,
                   help="random-sample N points instead of full grid")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("rest", nargs=argparse.REMAINDER,
                   help="args after -- go to every run")
    args = p.parse_args()

    with open(args.sweep_yaml) as f:
        sweep = yaml.safe_load(f)
    params = sweep["parameters"]
    keys = list(params)
    grid = list(itertools.product(*(params[k]["values"] for k in keys)))
    if args.count is not None:
        random.Random(args.seed).shuffle(grid)
        grid = grid[: args.count]

    rest = [a for a in args.rest if a != "--"]
    for i, point in enumerate(grid):
        overrides = [x for k, v in zip(keys, point)
                     for x in (f"--{k}", str(v))]
        run_name = "sweep_" + "_".join(f"{k.split('.')[-1]}={v}"
                                       for k, v in zip(keys, point))
        cmd = [sys.executable, "-m", "floodseg_tpu.cli.main", "fit",
               *rest, *overrides, "--trainer.run_name", run_name]
        print(f"[{i + 1}/{len(grid)}] {' '.join(cmd)}", flush=True)
        subprocess.run(cmd, check=False)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Hyperparameter sweep driver (reference train_agent.sh + experiments/*.yaml
W&B sweeps). Reads a sweep YAML of dot-path parameters — discrete ``values``
lists and/or continuous ``min``/``max`` ranges (the reference's bayes sweeps
become uniform random search) — and launches sequential fit runs. Discrete-
only sweeps expand the full grid unless --count samples it; any continuous
parameter requires --count.

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
    p.add_argument("--dry_run", action="store_true",
                   help="print the run commands without launching them")
    # everything after a literal "--" goes to every run verbatim
    argv = sys.argv[1:]
    rest = []
    if "--" in argv:
        split = argv.index("--")
        argv, rest = argv[:split], argv[split + 1:]
    args = p.parse_args(argv)

    with open(args.sweep_yaml) as f:
        sweep = yaml.safe_load(f)
    params = sweep["parameters"]
    keys = list(params)
    if any("min" in params[k] for k in keys):
        if args.count is None:
            raise SystemExit("continuous (min/max) parameters need --count")
        rnd = random.Random(args.seed)
        grid = [
            tuple(
                round(rnd.uniform(params[k]["min"], params[k]["max"]), 8)
                if "min" in params[k] else rnd.choice(params[k]["values"])
                for k in keys
            )
            for _ in range(args.count)
        ]
    else:
        grid = list(itertools.product(*(params[k]["values"] for k in keys)))
        if args.count is not None:
            random.Random(args.seed).shuffle(grid)
            grid = grid[: args.count]

    for i, point in enumerate(grid):
        overrides = [x for k, v in zip(keys, point)
                     for x in (f"--{k}", str(v))]
        run_name = "sweep_" + "_".join(f"{k.split('.')[-1]}={v}"
                                       for k, v in zip(keys, point))
        cmd = [sys.executable, "-m", "floodseg_tpu.cli.main", "fit",
               *rest, *overrides, "--trainer.run_name", run_name]
        print(f"[{i + 1}/{len(grid)}] {' '.join(cmd)}", flush=True)
        if not args.dry_run:
            subprocess.run(cmd, check=False)


if __name__ == "__main__":
    main()

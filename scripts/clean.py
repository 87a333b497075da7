#!/usr/bin/env python
"""GC checkpoints of incomplete runs (no metrics.json = crashed/failed).
Reference: /root/reference/tools/clean.py (uses W&B run states; here the
metrics.json artifact written at the end of a successful run is the marker).
"""
import argparse
import os
import shutil


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log_dir", default="logs")
    p.add_argument("--apply", action="store_true", help="actually delete")
    args = p.parse_args()
    for run in sorted(os.listdir(args.log_dir)):
        run_dir = os.path.join(args.log_dir, run)
        ckpt_dir = os.path.join(run_dir, "checkpoints")
        if not os.path.isdir(ckpt_dir):
            continue
        if os.path.exists(os.path.join(run_dir, "metrics.json")):
            continue
        size = sum(os.path.getsize(os.path.join(dp, f))
                   for dp, _, fs in os.walk(ckpt_dir) for f in fs)
        print(f"{'DELETE' if args.apply else 'would delete'} {ckpt_dir} "
              f"({size / 1e6:.1f} MB, incomplete run)")
        if args.apply:
            shutil.rmtree(ckpt_dir)


if __name__ == "__main__":
    main()

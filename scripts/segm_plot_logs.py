"""Plot JSONL training logs of one or more runs.

python scripts/segm_plot_logs.py RUN_DIR [RUN_DIR ...]
    [--y-key val_mean_iou --x-key epoch -o plot.png]
or with a YAML config mapping run names to log paths (the reference's
segm/utils/logs.py surface):

python scripts/segm_plot_logs.py --config plots.yaml

plots.yaml:  root: /path/to/logs
             logs: {run_a: run_a/log.txt, run_b: run_b/log.txt}
             vmin: 0.0   # optional y-limits
             epochs: 64  # optional truncation

Prints the latest value of y-key per run, then saves a matplotlib figure.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def read_logs(paths):
    """{name: [entry, ...]} from JSONL files; missing files are skipped with
    a notice (reference segm/utils/logs.py read_logs)."""
    logs = {}
    for name, path in paths.items():
        if not os.path.exists(path):
            print(f"Skipping {name} that has no log file")
            continue
        with open(path) as f:
            logs[name] = [json.loads(ln) for ln in f if ln.strip()]
    return logs


def print_logs(logs, x_key, y_key):
    for name, log in logs.items():
        rows = [e for e in log if y_key in e]
        if not rows:
            continue
        last = rows[-1]
        print(f"{name}:\n   {y_key}: {last[y_key]:.4f} "
              f"({x_key} {last[x_key]})")


def plot_logs(logs, x_key, y_key, out, vmin=None, vmax=None, epochs=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9.6, 6))
    lo, hi = float("inf"), float("-inf")
    for name, log in logs.items():
        if epochs:
            log = log[:epochs]
        xs = [e[x_key] for e in log if y_key in e]
        ys = [e[y_key] for e in log if y_key in e]
        if not ys:
            continue
        ax.plot(xs, ys, label=name)
        lo, hi = min(lo, min(ys)), max(hi, max(ys))
    if vmin is not None:
        lo = vmin
    if vmax is not None:
        hi = vmax
    if lo < hi:
        delta = 0.1 * (hi - lo)
        ax.set_ylim(lo - delta, hi + delta)
    ax.set_xlabel(x_key)
    ax.set_ylabel(y_key)
    ax.grid(True, alpha=0.5)
    ax.legend(loc="best")
    fig.savefig(out, bbox_inches="tight", pad_inches=0.1, dpi=150)
    plt.close(fig)
    print(f"wrote {out}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("runs", nargs="*",
                   help="run dirs containing log.txt (or log files directly)")
    p.add_argument("--config", default=None,
                   help="YAML {root, logs: {name: relpath}, vmin, vmax, epochs}")
    p.add_argument("--x-key", default="epoch")
    p.add_argument("--y-key", default="val_mean_iou")
    p.add_argument("-o", "--out", default="plot.png")
    p.add_argument("--no-plot", action="store_true",
                   help="print latest values only")
    args = p.parse_args(argv)

    vmin = vmax = epochs = None
    if args.config:
        import yaml
        cfg = yaml.safe_load(open(args.config))
        root = cfg.get("root", ".")
        paths = {n: os.path.join(root, rel)
                 for n, rel in cfg["logs"].items()}
        vmin, vmax = cfg.get("vmin"), cfg.get("vmax")
        epochs = cfg.get("epochs")
    else:
        if not args.runs:
            p.error("pass run dirs or --config")
        paths = {}
        for r in args.runs:
            path = os.path.join(r, "log.txt") if os.path.isdir(r) else r
            paths[os.path.basename(os.path.normpath(r))] = path

    logs = read_logs(paths)
    if not logs:
        return 1
    print_logs(logs, args.x_key, args.y_key)
    if not args.no_plot:
        plot_logs(logs, args.x_key, args.y_key, args.out, vmin, vmax, epochs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

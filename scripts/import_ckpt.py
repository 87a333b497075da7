"""One-command import: reference Lightning .ckpt -> floodseg_tpu checkpoint.

Converts a reference-trained Lightning checkpoint (any of the five methods,
pspnet/deeplabv3/vit — layouts in models/lightning_import.py) into a
floodseg_tpu orbax checkpoint that ``--ckpt_path`` restores:

  python scripts/import_ckpt.py --ckpt logs/run/last.ckpt \
      --config configs/flow_supervised.yaml --out logs/imported/ckpt
  python -m floodseg_tpu.cli.main test --config ... --ckpt_path logs/imported/ckpt

For a one-shot evaluation you can skip this script entirely:
``cli.main test --torch_ckpt logs/run/last.ckpt`` imports in-process.
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    from floodseg_tpu.core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--ckpt", required=True,
                    help="reference Lightning .ckpt or bare state_dict .pth")
    ap.add_argument("--config", action="append", default=[],
                    help="floodseg config YAML(s) selecting method/arch "
                         "(repeatable; later files win)")
    ap.add_argument("--out", required=True,
                    help="output orbax checkpoint directory")
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="config dot-overrides, e.g. --set model.arch=pspnet")
    args = ap.parse_args()

    from floodseg_tpu.core.config import load_config, parse_cli_overrides
    from floodseg_tpu.cli.runner import Runner

    cfg = load_config(args.config, parse_cli_overrides(
        [f"--{kv}" if not kv.startswith("--") else kv for kv in args.set]))
    runner = Runner(cfg)
    state = runner.load_torch_ckpt(args.ckpt)

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out), state, force=True)
    ckptr.wait_until_finished()
    print(f"wrote {args.out}; evaluate with:\n  python -m floodseg_tpu.cli."
          f"main test {' '.join('--config ' + c for c in args.config)} "
          f"--ckpt_path {os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()

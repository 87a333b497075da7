"""CLI: ``python -m floodseg_tpu.cli.main {fit,validate,test,predict} [--config X.yaml]...
[--model.arch vit] [--data.batch_size 4] ...``

Mirrors the reference entry points (supervised.py / gan.py / contrastive.py /
flow_supervised.py / flow_gan.py each wrapping FlowLightningCLI with
subcommands fit/test/predict and layered --config YAMLs). The training
method is selected with --method (or in a config file) instead of separate
scripts; ``scripts/`` ships thin per-method wrappers for surface parity.

``fit`` runs test + predict on the trained weights afterwards and writes
metrics.json, like the reference's after_run (base/cli.py:166-198).
"""

import argparse
import sys

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(prog="floodseg_tpu")
    p.add_argument("subcommand", choices=["fit", "validate", "test", "predict"])
    p.add_argument("--config", action="append", default=[],
                   help="YAML config (repeatable; later files win)")
    p.add_argument("--method", default=None,
                   help="supervised|gan|contrastive|flow_supervised|flow_gan")
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--torch_ckpt", default=None,
                   help="import a reference Lightning .ckpt (or bare torch "
                        "state_dict file): validate/test/predict run on the "
                        "converted weights (instead of --ckpt_path); fit "
                        "warm-starts from them with a fresh optimizer")
    p.add_argument("--wandb", default=None)
    p.add_argument("--runid", default=None)
    p.add_argument("--tag", default=None)
    p.add_argument("--seed", type=int, default=None)
    return p


def main(argv=None):
    from floodseg_tpu.core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()

    argv = list(sys.argv[1:] if argv is None else argv)
    parser = build_parser()
    args, extra = parser.parse_known_args(argv)

    from floodseg_tpu.core.config import load_config, parse_cli_overrides
    overrides = parse_cli_overrides(extra)
    cfg = load_config(args.config, overrides)
    if args.method:
        cfg.method = args.method
    if args.ckpt_path:
        cfg.ckpt_path = args.ckpt_path
    if args.wandb:
        cfg.wandb = args.wandb
    if args.runid:
        cfg.runid = args.runid
    if args.tag:
        cfg.tag = args.tag
    if args.seed is not None:
        cfg.trainer.seed = args.seed

    np.random.seed(cfg.trainer.seed)

    # multi-host TPU pods: one process per host, XLA collectives over
    # ICI/DCN (replaces the reference's SLURM+NCCL rendezvous,
    # u2pl/utils/dist_helper.py:10-43) — parallel/dist.py
    from floodseg_tpu.parallel.dist import maybe_initialize_multihost
    maybe_initialize_multihost()
    if cfg.trainer.debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)

    from floodseg_tpu.cli.runner import Runner
    runner = Runner(cfg)

    if args.subcommand == "fit":
        # --torch_ckpt on fit warm-starts from imported reference weights
        # (fresh optimizer; a resume of THIS run still wins)
        state = runner.fit(torch_ckpt=args.torch_ckpt)
        # after_run evaluates the BEST checkpoint, not the (possibly
        # early-stopped, post-best) final state (reference base/cli.py:169-187)
        state = runner.restore_best(state)
        results = runner.test(state)
        print("test:", {k: v for k, v in results.items()
                        if not isinstance(v, list)})
        if runner.is_flow:
            summary = runner.predict(state)
            print("predict:", {k: v for k, v in summary.items()
                               if not isinstance(v, list)})
        runner.logger.close()
        return 0

    # validate / test / predict need a checkpoint
    if args.torch_ckpt:
        state = runner.load_torch_ckpt(args.torch_ckpt)
    else:
        state = runner.load_for_eval(cfg.ckpt_path)
    if args.subcommand == "validate":
        results = runner.validate(state)
        print("validate:", results)
    elif args.subcommand == "test":
        results = runner.test(state)
        print("test:", {k: v for k, v in results.items()
                        if not isinstance(v, list)})
    else:
        summary = runner.predict(state)
        print("predict:", {k: v for k, v in summary.items()
                           if not isinstance(v, list)})
    runner.logger.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

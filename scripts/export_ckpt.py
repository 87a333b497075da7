"""One-command export: floodseg_tpu checkpoint -> reference Lightning .ckpt.

The inverse of scripts/import_ckpt.py: converts a floodseg_tpu orbax
checkpoint (any of the five methods, pspnet/deeplabv3; vit supervised /
gan / contrastive) into a torch ``.ckpt`` in the reference's exact
Lightning ``state_dict`` layout, loadable by the reference's own stack
(``test.sh`` / ``predict.sh`` with ``--ckpt_path``, strict load):

  python scripts/export_ckpt.py --config configs/flow_supervised.yaml \
      --ckpt logs/run/ckpt-best --out exported.ckpt

Layouts in models/lightning_export.py; the byte-exact inverse relationship
with the importer is pinned by tests/test_lightning_export.py.
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def roles_from_state(method: str, state) -> dict:
    """Runner state -> the per-role variable trees the exporter consumes
    (the inverse of Runner._graft_torch_ckpt's dispatch)."""
    def vars_of(st):
        return {"params": st.params, "batch_stats": st.batch_stats}

    if method in ("gan", "flow_gan"):
        sg, sd = state
        return {"model": vars_of(sg),
                "discriminator": {"params": sd.params}}
    if method == "contrastive":
        return {"model": vars_of(state.student),
                "teacher": {"params": state.teacher_params,
                            "batch_stats": state.teacher_batch_stats}}
    return {"model": vars_of(state)}


def main():
    from floodseg_tpu.core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", action="append", default=[],
                    help="floodseg config YAML(s) selecting method/arch "
                         "(repeatable; later files win)")
    ap.add_argument("--ckpt", default=None,
                    help="orbax checkpoint dir (default: the config run's "
                         "last/best checkpoint, as load_for_eval resolves)")
    ap.add_argument("--out", required=True, help="output .ckpt path")
    ap.add_argument("--epoch", type=int, default=None,
                    help="epoch number to stamp into the checkpoint")
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="config dot-overrides, e.g. --set model.arch=pspnet")
    args = ap.parse_args()

    from floodseg_tpu.core.config import load_config, parse_cli_overrides
    from floodseg_tpu.cli.runner import Runner
    from floodseg_tpu.models.lightning_export import (
        export_lightning_checkpoint,
    )

    cfg = load_config(args.config, parse_cli_overrides(
        [f"--{kv}" if not kv.startswith("--") else kv for kv in args.set]))
    runner = Runner(cfg)
    path = args.ckpt or runner.ckpt.last_path or runner.ckpt.best_path
    if path is None:
        # load_for_eval would fall back to a FRESH INIT with only a stdout
        # note — exporting that as a "checkpoint" would hand the reference
        # stack untrained weights. Exporting demands a real checkpoint.
        raise SystemExit(
            "no checkpoint to export: pass --ckpt <orbax dir>, or point "
            "--config at a run whose log dir contains one (this config "
            f"resolves to {runner.logger.log_dir!r} with no checkpoints)")
    state = runner.load_for_eval(path)

    ckpt = export_lightning_checkpoint(
        cfg.model.arch, roles_from_state(cfg.method, state), cfg.method,
        epoch=args.epoch)

    import torch

    # as_tensor (not from_numpy + ascontiguousarray): it copies transposed
    # views as needed AND preserves 0-dim scalars — ascontiguousarray would
    # promote the num_batches_tracked leaves to shape (1,)
    ckpt["state_dict"] = {k: torch.as_tensor(v)
                          for k, v in ckpt["state_dict"].items()}
    torch.save(ckpt, args.out)
    print(f"wrote {args.out} ({len(ckpt['state_dict'])} tensors, "
          f"{cfg.method}/{cfg.model.arch} Lightning layout)")


if __name__ == "__main__":
    main()

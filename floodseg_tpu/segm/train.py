"""Standalone Segmenter trainer.

``python -m floodseg_tpu.segm.train --img-dir ... --ann-dir ... [--val-img-dir
... --val-ann-dir ...] --n-cls 150 --crop-size 512 ...``

TPU-native equivalent of the reference's vendored segm/train.py +
segm/engine.py: click CLI / SLURM+NCCL DDP / timm SGD-polynomial / AMP /
resume become argparse / jax.sharding data-parallel mesh / the shared optax
poly optimizer / bf16 params / orbax checkpoints. The cross-entropy step,
metrics and window-sliding evaluation reuse the main project's op library —
one compiled train step, metrics replicated over the mesh.
"""

import argparse
import json
import os
import time



def build_parser():
    p = argparse.ArgumentParser(prog="floodseg_tpu.segm.train")
    p.add_argument("--log-dir", required=True)
    p.add_argument("--img-dir", default=None, help="training images")
    p.add_argument("--ann-dir", default=None, help="training annotations")
    p.add_argument("--val-img-dir", default=None)
    p.add_argument("--val-ann-dir", default=None)
    p.add_argument("--pascal-context", default=None, metavar="ROOT",
                   help="train on PascalContext from ROOT/VOCdevkit/VOC2010 "
                        "(train+val splits, 60 classes) instead of "
                        "--img-dir/--ann-dir folders — the reference's "
                        "dataset-by-name selection (segm/data/factory.py)")
    p.add_argument("--dataset", default=None,
                   choices=["ade20k", "cityscapes", "pascal_context"],
                   help="named dataset with the faithful mmseg pipeline "
                        "(ratio-range keep-ratio resize, cat_max_ratio "
                        "crop, PhotoMetricDistortion, pad-with-ignore) and "
                        "its standard n_cls/palette/max_ratio — the full "
                        "reference registry (segm/data/factory.py); "
                        "requires --data-root")
    p.add_argument("--data-root", default=None,
                   help="dataset root for --dataset (ade20k: the "
                        "ADEChallengeData2016 dir; cityscapes: the dir "
                        "holding leftImg8bit/gtFine; pascal_context: the "
                        "dir holding VOCdevkit)")
    p.add_argument("--normalization", default="vit",
                   choices=["vit", "deit"],
                   help="normalization stats pair (segm/data/utils.py "
                        "STATS), used by --dataset pipelines")
    p.add_argument("--img-suffix", default=".jpg")
    p.add_argument("--ann-suffix", default=".png")
    p.add_argument("--reduce-zero-label", action="store_true",
                   help="ADE20k label convention (0=unlabeled)")
    p.add_argument("--n-cls", type=int, default=None,
                   help="required unless --pascal-context (then 60)")
    p.add_argument("--im-size", type=int, default=512)
    p.add_argument("--crop-size", type=int, default=None)
    p.add_argument("--window-size", type=int, default=None)
    p.add_argument("--window-stride", type=int, default=None)
    p.add_argument("--patch-size", type=int, default=32)
    p.add_argument("--d-model", type=int, default=768)
    p.add_argument("--n-layers", type=int, default=12)
    p.add_argument("--dec-layers", type=int, default=2)
    p.add_argument("--decoder", default="mask_transformer",
                   choices=["mask_transformer", "linear"],
                   help="MaskTransformer or the linear patch classifier "
                        "(reference segm/model/decoder.py:13-34)")
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--batch-size", type=int, default=8,
                   help="per-device; the global batch is batch * n_devices")
    p.add_argument("--epochs", type=int, default=64)
    p.add_argument("-lr", "--learning-rate", type=float, default=0.001)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--eval-freq", type=int, default=1)
    p.add_argument("--amp", action="store_true",
                   help="bfloat16 compute (the TPU form of AMP)")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--num-devices", type=int, default=None)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    crop = args.crop_size or args.im_size
    window = args.window_size or args.im_size
    stride = args.window_stride or max(1, window - 32)

    import jax
    import jax.numpy as jnp
    from floodseg_tpu.data.loader import DataLoader
    from floodseg_tpu.core.checkpoint import CheckpointManager
    from floodseg_tpu.models.vit import SegmenterViT
    from floodseg_tpu.parallel.mesh import (
        create_mesh, shard_batch, replicated_sharding, sharded_jit,
    )
    from floodseg_tpu.segm.data import (
        SegFolderDataset, pascal_context_dataset, segm_dataset,
        build_train_pipeline, build_eval_pipeline, IGNORE_LABEL,
    )
    from floodseg_tpu.segm.inference import evaluate_dataset
    from floodseg_tpu.segm.logger import MetricLogger
    from floodseg_tpu.train.optim import make_optimizer
    from floodseg_tpu.train.state import create_train_state
    from floodseg_tpu.train import supervised as sup

    avail = len(jax.devices())
    n_dev = avail if args.num_devices is None else min(args.num_devices, avail)
    mesh = create_mesh(devices=jax.devices()[:n_dev]) if n_dev > 1 else None
    global_batch = args.batch_size * (n_dev if mesh is not None else 1)

    if args.dataset:
        if not args.data_root:
            raise SystemExit("--dataset requires --data-root")
        train_ds = segm_dataset(args.dataset, args.data_root, "train",
                                image_size=args.im_size, crop_size=crop,
                                normalization=args.normalization)
        if args.n_cls is None:
            args.n_cls = train_ds.n_cls
    elif args.pascal_context:
        if args.n_cls is None:
            args.n_cls = 60
        train_ds = pascal_context_dataset(
            args.pascal_context, "train",
            transform=build_train_pipeline(args.im_size, crop))
    elif args.img_dir and args.ann_dir:
        if args.n_cls is None:
            raise SystemExit("--n-cls is required with --img-dir/--ann-dir")
        train_ds = SegFolderDataset(
            args.img_dir, args.ann_dir, args.img_suffix, args.ann_suffix,
            transform=build_train_pipeline(args.im_size, crop),
            reduce_zero_label=args.reduce_zero_label)
    else:
        raise SystemExit(
            "pass --dataset+--data-root, --img-dir/--ann-dir, "
            "or --pascal-context")
    if global_batch > len(train_ds):
        raise SystemExit(
            f"global batch {global_batch} ({args.batch_size} x {n_dev} "
            f"devices) exceeds the train set ({len(train_ds)})")
    loader = DataLoader(train_ds, batch_size=global_batch, shuffle=True,
                        num_workers=args.workers, seed=args.seed,
                        infinite=True, drop_last=True)
    steps_per_epoch = max(1, len(train_ds) // global_batch)

    model = SegmenterViT(
        classes=args.n_cls, image_size=crop, patch_size=args.patch_size,
        d_model=args.d_model, n_layers=args.n_layers,
        dec_layers=args.dec_layers, decoder_type=args.decoder,
        dropout=args.dropout,
        dtype=jnp.bfloat16 if args.amp else jnp.float32)
    rng = jax.random.PRNGKey(args.seed)
    max_iter = steps_per_epoch * args.epochs
    tx = make_optimizer(args.learning_rate, max_iter,
                        weight_decay=args.weight_decay, head_lr_scale=1.0)
    state = create_train_state(
        model, rng, jnp.zeros((1, crop, crop, 3), jnp.float32), tx)

    loss_fn = sup.make_loss_fn("ce", aux_weight=0.0,
                               ignore_index=IGNORE_LABEL)
    raw_step = sup.make_train_step(model, loss_fn, args.n_cls, IGNORE_LABEL)
    step = (sharded_jit(raw_step, mesh) if mesh is not None
            else jax.jit(raw_step))

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)["pred"])

    ckpt = CheckpointManager(os.path.join(args.log_dir, "checkpoints"),
                             monitor="val_miou", save_top_k=3)
    start_epoch = 0
    if not args.no_resume and ckpt.last_path is not None:
        state = ckpt.restore(state, ckpt.last_path)
        le = ckpt.last_epoch
        start_epoch = (le + 1) if le is not None else 0
        print(f"resumed from {ckpt.last_path} at epoch {start_epoch}",
              flush=True)
    if mesh is not None:
        state = jax.device_put(state, replicated_sharding(mesh))

    val_ds = None
    if args.dataset:
        val_ds = segm_dataset(args.dataset, args.data_root, "val",
                              image_size=args.im_size, crop_size=crop,
                              normalization=args.normalization)
    elif args.pascal_context:
        val_ds = pascal_context_dataset(
            args.pascal_context, "val",
            transform=build_eval_pipeline(args.im_size))
    elif args.val_img_dir and args.val_ann_dir:
        val_ds = SegFolderDataset(
            args.val_img_dir, args.val_ann_dir, args.img_suffix,
            args.ann_suffix, transform=build_eval_pipeline(args.im_size),
            reduce_zero_label=args.reduce_zero_label)

    it = iter(loader)
    gstep = start_epoch * steps_per_epoch
    for epoch in range(start_epoch, args.epochs):
        logger = MetricLogger()
        t0 = time.time()
        for _ in logger.log_every(range(steps_per_epoch), 50,
                                  f"Epoch: [{epoch}]"):
            batch = next(it)
            batch = (shard_batch(batch, mesh) if mesh is not None
                     else {k: jnp.asarray(v) for k, v in batch.items()})
            state, m = step(state, batch, jax.random.fold_in(rng, gstep))
            logger.update(loss=float(m["loss"]))
            gstep += 1
        print(f"Epoch {epoch}: {logger} ({time.time() - t0:.1f}s)",
              flush=True)

        # epochs without an eval save ONLY last-{epoch}: passing no monitor
        # key keeps un-evaluated models out of the top-k index / best_path
        metrics = {}
        if val_ds is not None and (epoch + 1) % args.eval_freq == 0:
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            # mmseg protocol: labels stay at annotation resolution, probs
            # resized back to ori_shape, nanmean over present classes
            # (reference segm/eval/miou.py, segm/metrics.py:101-121)
            summ = evaluate_dataset(fwd, variables, val_ds, args.n_cls,
                                    window, stride,
                                    ignore_index=IGNORE_LABEL)
            metrics["val_miou"] = summ["miou"]
            print(f"Eval [{epoch}]: mean_iou {summ['miou']:.4f} "
                  f"mean_acc {summ['macc']:.4f}", flush=True)
        ckpt.save(state, epoch, metrics)

        # JSONL epoch log, one dict per line (the reference's log.txt that
        # segm/utils/logs.py plots; read back by scripts/segm_plot_logs.py)
        entry = {"epoch": epoch,
                 "train_loss": logger.meters["loss"].global_avg}
        if "val_miou" in metrics:
            entry["val_mean_iou"] = metrics["val_miou"]
            entry["val_mean_acc"] = summ["macc"]
        with open(os.path.join(args.log_dir, "log.txt"), "a") as f:
            f.write(json.dumps(entry) + "\n")
    ckpt.wait()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

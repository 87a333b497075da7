"""ImageNet-style classification accuracy of a ViT backbone.

python scripts/segm_accuracy.py --data-dir IMAGENET/val --n-cls 1000
    [--ckpt CKPT] [--image-size 224 --patch-size 16]

TPU-native equivalent of the reference's segm/eval/accuracy.py: sliding the
ImageFolder val split through the ViT classifier in batches and reporting
top-1 / top-5 accuracy (segm/metrics.py:18-36). The forward is one jitted
program per batch shape; batches stream through the shared DataLoader.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True,
                   help="ImageFolder split dir (class-per-subdirectory)")
    p.add_argument("--ckpt", default=None,
                   help="orbax variables dir (default: random init)")
    p.add_argument("--n-cls", type=int, default=1000)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--crop-size", type=int, default=None)
    p.add_argument("--patch-size", type=int, default=16)
    p.add_argument("--d-model", type=int, default=768)
    p.add_argument("--n-layers", type=int, default=12)
    p.add_argument("--normalization", default="vit",
                   choices=["vit", "deit"])
    p.add_argument("-bs", "--batch-size", type=int, default=32)
    p.add_argument("-nw", "--num-workers", type=int, default=4)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from floodseg_tpu.data.loader import DataLoader
    from floodseg_tpu.models.vit import ViTClassifier
    from floodseg_tpu.ops.metrics import AverageMeter, topk_accuracy
    from floodseg_tpu.segm.data import ImageFolderClsDataset
    from floodseg_tpu.segm.logger import MetricLogger

    crop = args.crop_size or args.image_size
    ds = ImageFolderClsDataset(args.data_dir, image_size=args.image_size,
                               crop_size=crop, split="val",
                               normalization=args.normalization)
    loader = DataLoader(ds, batch_size=args.batch_size,
                        num_workers=args.num_workers)

    model = ViTClassifier(n_cls=args.n_cls, image_size=crop,
                          patch_size=args.patch_size, d_model=args.d_model,
                          n_layers=args.n_layers)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, crop, crop, 3), jnp.float32), train=False))()
    if args.ckpt:
        from floodseg_tpu.core.checkpoint import restore_variables
        variables = restore_variables(args.ckpt, variables)

    fwd = jax.jit(lambda v, im: model.apply(v, im, train=False))

    k2 = min(5, args.n_cls)  # top-5 needs >= 5 classes
    acc1_m, acc5_m = AverageMeter(), AverageMeter()
    logger = MetricLogger()
    for batch in logger.log_every(loader, 20, "acc"):
        logits = fwd(variables, jnp.asarray(batch["im"]))
        acc1, acc5 = topk_accuracy(logits, jnp.asarray(batch["target"]),
                                   topk=(1, k2))
        n = batch["im"].shape[0]
        acc1_m.update(float(acc1), n)
        acc5_m.update(float(acc5), n)
        logger.update(acc1=float(acc1), acc5=float(acc5))
    print(f"accuracy: top1 {acc1_m.avg:.2f} top{k2} {acc5_m.avg:.2f} "
          f"({acc1_m.count} images)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Folder inference / evaluation with the standalone Segmenter.

python scripts/segm_inference.py --ckpt CKPT -i IN_DIR -o OUT_DIR
    --n-cls 150 [--window-size 512 --window-stride 480] [--blend 0.5]
    [--ann-dir ANN_DIR [--reduce-zero-label]]

TPU-native equivalent of the reference's segm/inference.py (sliding-window
segment every image in a folder, write the colorized map blended over the
input) and, with --ann-dir, of segm/eval/miou.py (mean IoU / mean accuracy
against the ground-truth masks). Colors come from --colors (a colors.txt
palette) or a deterministic generated palette.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def palette(n: int, colors_path=None) -> np.ndarray:
    if colors_path:
        return np.loadtxt(colors_path).astype(np.uint8)[:n]
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (n, 3), dtype=np.uint8)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="orbax variables dir ('-' for random init)")
    p.add_argument("-i", "--input-dir", required=True)
    p.add_argument("-o", "--output-dir", required=True)
    p.add_argument("--n-cls", type=int, required=True)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--window-size", type=int, default=None)
    p.add_argument("--window-stride", type=int, default=None)
    p.add_argument("--patch-size", type=int, default=32)
    p.add_argument("--d-model", type=int, default=768)
    p.add_argument("--n-layers", type=int, default=12)
    p.add_argument("--dec-layers", type=int, default=2)
    p.add_argument("--decoder", default="mask_transformer",
                   choices=["mask_transformer", "linear"])
    p.add_argument("--colors", default=None)
    p.add_argument("--blend", type=float, default=0.5)
    p.add_argument("--ann-dir", default=None,
                   help="ground-truth masks (stem-matched .png): report "
                        "mean_iou/mean_acc like segm/eval/miou.py")
    p.add_argument("--ann-suffix", default=".png")
    p.add_argument("--reduce-zero-label", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from floodseg_tpu.models.vit import SegmenterViT
    from floodseg_tpu.segm.inference import sliding_inference
    from floodseg_tpu.data.transforms import MEAN, STD

    window = args.window_size or args.image_size
    stride = args.window_stride or max(1, window - 32)
    model = SegmenterViT(classes=args.n_cls, image_size=window,
                         patch_size=args.patch_size, d_model=args.d_model,
                         n_layers=args.n_layers, dec_layers=args.dec_layers,
                         decoder_type=args.decoder)
    x0 = jnp.zeros((1, window, window, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, x0, train=False))()
    if args.ckpt != "-":
        from floodseg_tpu.core.checkpoint import restore_variables
        variables = restore_variables(args.ckpt, variables)

    fwd = jax.jit(lambda v, crops: model.apply(v, crops, train=False)["pred"])
    colors = palette(args.n_cls, args.colors)
    os.makedirs(args.output_dir, exist_ok=True)
    mean, std = np.asarray(MEAN, np.float32), np.asarray(STD, np.float32)

    meter = None
    n_matched = 0
    if args.ann_dir:
        from floodseg_tpu.ops.metrics import (
            MetricMeter, intersection_and_union,
        )
        meter = MetricMeter(args.n_cls)

    names = sorted(f for f in os.listdir(args.input_dir)
                   if f.lower().endswith((".jpg", ".jpeg", ".png")))
    for name in names:
        pil = Image.open(os.path.join(args.input_dir, name)).convert("RGB")
        ori = np.asarray(pil)
        # short-side resize (aspect preserved) — mmseg test protocol; the
        # probability map is resized back to ori_shape before argmax/score
        sc = args.image_size / min(ori.shape[:2])
        im = pil.resize((max(1, round(ori.shape[1] * sc)),
                         max(1, round(ori.shape[0] * sc))))
        x = (np.asarray(im, np.float32) - mean) / std
        prob = sliding_inference(fwd, variables, x, args.n_cls, window,
                                 stride, ori_shape=ori.shape[:2])
        pred = prob.argmax(-1)
        seg_rgb = colors[pred]
        blend = (args.blend * seg_rgb +
                 (1 - args.blend) * ori).astype(np.uint8)
        Image.fromarray(blend).save(os.path.join(args.output_dir, name))
        if meter is not None:
            stem = os.path.splitext(name)[0]
            ann = os.path.join(args.ann_dir, stem + args.ann_suffix)
            if os.path.exists(ann):
                lab = np.asarray(Image.open(ann)).astype(np.int32)
                if args.reduce_zero_label:
                    lab = np.where(lab == 0, 256, lab) - 1
                i, u, t = intersection_and_union(
                    jnp.asarray(pred.astype(np.int32)), jnp.asarray(lab),
                    args.n_cls, 255)
                meter.update(i, u, t)
                n_matched += 1
        print(name, flush=True)
    print(f"wrote {len(names)} segmentations to {args.output_dir}")
    if meter is not None and meter.count > 0:
        # mmseg protocol: absent classes (zero union) are excluded from the
        # class means, matching reference segm/metrics.py:101-121
        s = meter.summary_mmseg()
        # a partial score must not read as a full-dataset one
        if n_matched < len(names):
            print(f"WARNING: only {n_matched}/{len(names)} images had a "
                  f"matching annotation under {args.ann_dir} "
                  f"(check --ann-suffix)")
        print(f"mean_iou {s['miou']:.4f} mean_acc {s['macc']:.4f} "
              f"overall_acc {s['allacc']:.4f} ({n_matched}/{len(names)} "
              f"images)")
        print("iou_per_class",
              [None if np.isnan(v) else round(float(v), 4)
               for v in s["iou_class"]])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

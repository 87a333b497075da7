"""Folder inference with the standalone Segmenter.

python scripts/segm_inference.py --ckpt CKPT -i IN_DIR -o OUT_DIR
    --n-cls 150 [--window-size 512 --window-stride 480] [--blend 0.5]

TPU-native equivalent of the reference's segm/inference.py: sliding-window
segment every image in a folder and write the colorized map blended over the
input. Colors come from --colors (a colors.txt palette) or a deterministic
generated palette.
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
    p.add_argument("--colors", default=None)
    p.add_argument("--blend", type=float, default=0.5)
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
                         n_layers=args.n_layers, dec_layers=args.dec_layers)
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

    names = sorted(f for f in os.listdir(args.input_dir)
                   if f.lower().endswith((".jpg", ".jpeg", ".png")))
    for name in names:
        pil = Image.open(os.path.join(args.input_dir, name)).convert("RGB")
        ori = np.asarray(pil)
        im = pil.resize((args.image_size, args.image_size))
        x = (np.asarray(im, np.float32) - mean) / std
        prob = sliding_inference(fwd, variables, x, args.n_cls, window,
                                 stride, ori_shape=ori.shape[:2])
        seg_rgb = colors[prob.argmax(-1)]
        blend = (args.blend * seg_rgb +
                 (1 - args.blend) * ori).astype(np.uint8)
        Image.fromarray(blend).save(os.path.join(args.output_dir, name))
        print(name, flush=True)
    print(f"wrote {len(names)} segmentations to {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

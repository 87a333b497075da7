"""Visualize Segmenter ViT attention maps.

python scripts/show_attn_map.py CKPT IMAGE OUT_DIR [--layer-id 0]
    [--x-patch 0 --y-patch 0] [--enc|--dec] [--cls|--patch] [--n-cls 5]

TPU-native equivalent of the reference's segm/scripts/show_attn_map.py:
per-head attention maps of one encoder/decoder layer, upsampled by the
patch size and saved as one PNG per head (and per class embedding in
--dec --cls mode). Checkpoints are orbax variable trees saved by the
floodseg_tpu trainers (use --random-init to inspect an untrained model).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", help="orbax checkpoint dir (or '-' for random init)")
    p.add_argument("image")
    p.add_argument("out_dir")
    p.add_argument("--layer-id", type=int, default=0)
    p.add_argument("--x-patch", type=int, default=0)
    p.add_argument("--y-patch", type=int, default=0)
    p.add_argument("--dec", action="store_true",
                   help="decoder attention (default: encoder)")
    p.add_argument("--cls", action="store_true",
                   help="class-token query (default: one patch query)")
    p.add_argument("--n-cls", type=int, default=5)
    p.add_argument("--image-size", type=int, default=768)
    p.add_argument("--patch-size", type=int, default=32)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from floodseg_tpu.models.vit import SegmenterViT
    from floodseg_tpu.segm.attn import attention_maps, head_maps
    from floodseg_tpu.data.transforms import MEAN, STD

    model = SegmenterViT(classes=args.n_cls, image_size=args.image_size,
                         patch_size=args.patch_size)

    size = args.image_size - args.image_size % args.patch_size
    img = Image.open(args.image).convert("RGB").resize((size, size))
    x = (np.asarray(img, np.float32) - np.asarray(MEAN)) / np.asarray(STD)
    x = jnp.asarray(x)[None]

    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, x, train=False))()
    if args.ckpt != "-":
        from floodseg_tpu.core.checkpoint import restore_variables
        variables = restore_variables(args.ckpt, variables)

    maps = attention_maps(model, variables, x)
    which = "decoder" if args.dec else "encoder"
    layers = maps[which]
    if args.layer_id >= len(layers):
        raise SystemExit(f"{which} has {len(layers)} layers, "
                         f"layer-id {args.layer_id} invalid")
    g = size // args.patch_size
    hm = head_maps(layers[args.layer_id], (g, g), args.patch_size,
                   query="cls" if args.cls else "patch",
                   xy_patch=(args.x_patch, args.y_patch),
                   n_cls=args.n_cls, is_decoder=args.dec)

    os.makedirs(args.out_dir, exist_ok=True)
    base = "dec" if args.dec else "enc"
    for h in range(hm.shape[0]):
        for j in range(hm.shape[1]):
            m = hm[h, j]
            m = (255 * (m - m.min()) / max(m.max() - m.min(), 1e-8))
            name = f"{base}_layer{args.layer_id}_attn-head{h}"
            if hm.shape[1] > 1:
                name += f"_cls{j}"
            Image.fromarray(m.astype(np.uint8)).save(
                os.path.join(args.out_dir, name + ".png"))
    print(f"wrote {hm.shape[0] * hm.shape[1]} maps to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

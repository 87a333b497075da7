"""Attention-map extraction for the Segmenter ViT.

Reference: ``get_attention_map_enc/dec`` hooks (segm/model/segmenter.py:50-60,
vit.py:149, decoder.py:104) used by segm/scripts/show_attn_map.py. TPU-native
form: the Attention module ``sow``s its softmax probabilities; one apply with
``mutable=["intermediates"]`` returns every layer's maps — no forward hooks,
no module surgery, still a single compiled program.
"""

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp


def attention_maps(model, variables, image: jnp.ndarray) -> Dict[str, list]:
    """All attention tensors of one forward pass.

    image: (1, H, W, 3) normalized. Returns {"encoder": [L x (1, heads, N, N)],
    "decoder": [...]} ordered by layer.
    """
    _, inter = model.apply(
        variables, image, train=False, mutable=["intermediates"]
    )
    inter = inter["intermediates"]

    def collect(tree) -> list:
        out = []
        i = 0
        while f"block{i}" in tree:
            out.append(np.asarray(tree[f"block{i}"]["attn"]["attn"][0],
                                  np.float32))
            i += 1
        return out

    return {
        "encoder": collect(inter["encoder"]),
        "decoder": collect(inter["decoder"]),
    }


def head_maps(
    attn: np.ndarray,
    grid: Tuple[int, int],
    patch_size: int,
    query: str = "cls",
    xy_patch: Tuple[int, int] = (0, 0),
    n_cls: int = 0,
    is_decoder: bool = False,
) -> np.ndarray:
    """Per-head spatial maps from one layer's attention tensor.

    attn: (1, heads, N, N). Encoder tokens = [cls, patches...]; decoder
    tokens = [patches..., class embeddings...] (MaskTransformer appends the
    n_cls class tokens at the END — segm/model/decoder.py:60-66).

    query="cls": the class token(s) attending over patches ->
      encoder: (heads, 1, gh, gw); decoder: (heads, n_cls, gh, gw).
    query="patch": one patch (x, y) attending over patches -> (heads, 1, gh, gw).
    Maps are nearest-upsampled by patch_size (show_attn_map.py:149-152).
    """
    gh, gw = grid
    a = attn[0]  # (heads, N, N)
    if is_decoder:
        if query == "cls":
            maps = a[:, -n_cls:, :-n_cls]            # (heads, n_cls, P)
        else:
            x, y = xy_patch
            maps = a[:, gw * y + x: gw * y + x + 1, :-n_cls]
    else:
        if query == "cls":
            maps = a[:, 0:1, 1:]                      # (heads, 1, P)
        else:
            x, y = xy_patch
            q = 1 + gw * y + x
            maps = a[:, q:q + 1, 1:]
    heads, nq, _ = maps.shape
    maps = maps.reshape(heads, nq, gh, gw)
    return np.repeat(np.repeat(maps, patch_size, axis=2), patch_size, axis=3)

"""ViT checkpoint-converter parity: a minimal torch implementation of the
reference's VisionTransformer forward (timm-style weights) vs my flax model
with converted weights. Validates patchify ordering, fused-qkv layout, and
LN placement — the pretrained-weight fidelity risk (SURVEY §7 #4)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from floodseg_tpu.models.vit import VisionTransformer
from floodseg_tpu.models.torch_import import convert_vit_encoder

D, HEADS, LAYERS, PATCH, IMG = 32, 4, 2, 8, 32


def _torch_vit_forward(sd, x):
    """Reference VisionTransformer.forward(return_features=True)
    (segm/model/vit.py:106-134) in plain torch ops."""
    b = x.shape[0]
    tokens = F.conv2d(x, sd["patch_embed.proj.weight"],
                      sd["patch_embed.proj.bias"], stride=PATCH)
    tokens = tokens.flatten(2).transpose(1, 2)  # (B, N, D)
    cls = sd["cls_token"].expand(b, -1, -1)
    tokens = torch.cat([cls, tokens], dim=1)
    tokens = tokens + sd["pos_embed"]

    for i in range(LAYERS):
        p = f"blocks.{i}"
        y = F.layer_norm(tokens, (D,), sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"])
        qkv = F.linear(y, sd[f"{p}.attn.qkv.weight"], sd[f"{p}.attn.qkv.bias"])
        n = qkv.shape[1]
        qkv = qkv.reshape(b, n, 3, HEADS, D // HEADS).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (D // HEADS) ** -0.5
        attn = attn.softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(b, n, D)
        y = F.linear(y, sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"])
        tokens = tokens + y
        y = F.layer_norm(tokens, (D,), sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"])
        y = F.linear(y, sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"])
        y = F.gelu(y)
        y = F.linear(y, sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"])
        tokens = tokens + y
    return F.layer_norm(tokens, (D,), sd["norm.weight"], sd["norm.bias"])


def test_vit_converter_forward_parity():
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    n_patches = (IMG // PATCH) ** 2
    sd = {
        "patch_embed.proj.weight": t(D, 3, PATCH, PATCH),
        "patch_embed.proj.bias": t(D),
        "cls_token": t(1, 1, D),
        "pos_embed": t(1, n_patches + 1, D),
        "norm.weight": 1 + t(D), "norm.bias": t(D),
    }
    for i in range(LAYERS):
        p = f"blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": 1 + t(D), f"{p}.norm1.bias": t(D),
            f"{p}.attn.qkv.weight": t(3 * D, D), f"{p}.attn.qkv.bias": t(3 * D),
            f"{p}.attn.proj.weight": t(D, D), f"{p}.attn.proj.bias": t(D),
            f"{p}.norm2.weight": 1 + t(D), f"{p}.norm2.bias": t(D),
            f"{p}.mlp.fc1.weight": t(4 * D, D), f"{p}.mlp.fc1.bias": t(4 * D),
            f"{p}.mlp.fc2.weight": t(D, 4 * D), f"{p}.mlp.fc2.bias": t(D),
        })

    x = np.random.default_rng(0).standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        ref = _torch_vit_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = VisionTransformer(image_size=IMG, patch_size=PATCH, n_layers=LAYERS,
                              d_model=D, n_heads=HEADS, dropout=0.0)
    params = convert_vit_encoder(sd, n_layers=LAYERS)
    ours = np.asarray(jax.jit(
        lambda v, y: model.apply(v, y, train=False)
    )({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x)))

    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_decoder_linear_converter_parity():
    """DecoderLinear (reference segm/model/decoder.py:13-34): Linear head
    over patch tokens + reshape to the patch grid, through the full
    Segmenter wrapper (encode -> drop cls -> decode -> upsample)."""
    from floodseg_tpu.models.vit import SegmenterViT, DecoderLinear
    from floodseg_tpu.models.torch_import import convert_segmenter_state_dict

    g = torch.Generator().manual_seed(1)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    n_cls = 5
    n_patches = (IMG // PATCH) ** 2
    sd = {
        "patch_embed.proj.weight": t(D, 3, PATCH, PATCH),
        "patch_embed.proj.bias": t(D),
        "cls_token": t(1, 1, D),
        "pos_embed": t(1, n_patches + 1, D),
        "norm.weight": 1 + t(D), "norm.bias": t(D),
    }
    for i in range(LAYERS):
        p = f"blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": 1 + t(D), f"{p}.norm1.bias": t(D),
            f"{p}.attn.qkv.weight": t(3 * D, D), f"{p}.attn.qkv.bias": t(3 * D),
            f"{p}.attn.proj.weight": t(D, D), f"{p}.attn.proj.bias": t(D),
            f"{p}.norm2.weight": 1 + t(D), f"{p}.norm2.bias": t(D),
            f"{p}.mlp.fc1.weight": t(4 * D, D), f"{p}.mlp.fc1.bias": t(4 * D),
            f"{p}.mlp.fc2.weight": t(D, 4 * D), f"{p}.mlp.fc2.bias": t(D),
        })
    head_w, head_b = t(n_cls, D), t(n_cls)

    x = np.random.default_rng(1).standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        # reference Segmenter.forward (segm/model/segmenter.py:32-48) with
        # DecoderLinear: encode, drop cls token, head, grid, upsample
        feats = _torch_vit_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
        patches = feats[:, 1:]
        logits = F.linear(patches, head_w, head_b)       # decoder.head
        gs = IMG // PATCH
        logits = logits.transpose(1, 2).reshape(2, n_cls, gs, gs)
        ref = F.interpolate(logits, size=(IMG, IMG), mode="bilinear",
                            align_corners=False).numpy().transpose(0, 2, 3, 1)

    model = SegmenterViT(classes=n_cls, image_size=IMG, patch_size=PATCH,
                         d_model=D, n_layers=LAYERS, n_heads=HEADS,
                         dropout=0.0, decoder_type="linear")
    full_sd = {f"model.encoder.{k}": v for k, v in sd.items()}
    full_sd["model.decoder.head.weight"] = head_w
    full_sd["model.decoder.head.bias"] = head_b
    variables = convert_segmenter_state_dict(full_sd, n_layers=LAYERS,
                                             decoder="linear")
    ours = np.asarray(jax.jit(
        lambda v, y: model.apply(v, y, train=False)
    )(jax.tree.map(jnp.asarray, variables), jnp.asarray(x))["pred"])

    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
    # the flax module tree really is the linear decoder (one Dense)
    assert set(variables["params"]["decoder"]) == {"head"}
    assert isinstance(model, SegmenterViT) and DecoderLinear is not None

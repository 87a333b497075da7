"""Segmenter ViT (patch-embed encoder + MaskTransformer decoder) in flax.

Mirrors the reference's vendored Segmenter subset
(/root/reference/segm/model/{vit,blocks,decoder,segmenter}.py) as configured
by /root/reference/model/vit.py: ViT-B/32 (d=768, 12 layers, 12 heads),
2-layer MaskTransformer decoder; 1-layer n_cls=256 MaskTransformer as the
U2PL rep head (model/vit.py:60-87).

TPU notes: patch embedding is an unfold+matmul (MXU) instead of a strided
conv; attention is a fused-qkv einsum chain over <=577 tokens (no masking),
which XLA fuses well at this size.
"""

from typing import Any, Optional

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from floodseg_tpu.models.layers import DropPath
from floodseg_tpu.ops.resize import resize_bilinear


def patchify(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """NHWC image -> (B, h*w, patch*patch*C) token sequence."""
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)


class Attention(nn.Module):
    heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        b, n, d = x.shape
        hd = d // self.heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, param_dtype=jnp.float32, precision="highest", name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision="highest") * (hd ** -0.5)
        # softmax at >= f32 (bf16 stability; f64 under x64 for the oracles)
        sdt = jnp.promote_types(x.dtype, jnp.float32)
        attn = nn.softmax(attn.astype(sdt), axis=-1).astype(x.dtype)
        # retrievable with apply(..., mutable=["intermediates"]) — the
        # TPU-native form of get_attention_map_enc/dec hooks
        # (segm/model/{vit.py:149,decoder.py:104}); no-op otherwise.
        # skipped during init so the collection never enters the variables
        if not self.is_initializing():
            self.sow("intermediates", "attn", attn)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        y = jnp.einsum("bhqk,bhkd->bhqd", attn, v, precision="highest")
        y = y.transpose(0, 2, 1, 3).reshape(b, n, d)
        y = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, precision="highest", name="proj")(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class FeedForward(nn.Module):
    hidden: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d = x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32, precision="highest", name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, precision="highest", name="fc2")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class Block(nn.Module):
    heads: int
    mlp_dim: int
    dropout: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        y = Attention(self.heads, self.dropout, self.dtype, name="attn")(y, train)
        x = x + DropPath(self.drop_path, name="dp1")(y, deterministic=not train)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        y = FeedForward(self.mlp_dim, self.dropout, self.dtype, name="mlp")(y, train)
        return x + DropPath(self.drop_path, name="dp2")(y, deterministic=not train)


def resize_pos_embed(pos_embed, grid_old, grid_new, num_extra_tokens=1):
    """Bilinearly interpolate the 2D patch position grid (segm/model/utils.py:22)."""
    extra = pos_embed[:, :num_extra_tokens]
    grid = pos_embed[:, num_extra_tokens:]
    d = grid.shape[-1]
    grid = grid.reshape(1, grid_old[0], grid_old[1], d)
    grid = resize_bilinear(grid, grid_new, align_corners=False)
    return jnp.concatenate([extra, grid.reshape(1, -1, d)], axis=1)


class VisionTransformer(nn.Module):
    image_size: int = 768
    patch_size: int = 32
    n_layers: int = 12
    d_model: int = 768
    n_heads: int = 12
    dropout: float = 0.1
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """NHWC image (H, W divisible by patch) -> (B, 1 + h*w, D) features."""
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        grid0 = self.image_size // self.patch_size

        tokens = patchify(x, self.patch_size)
        tokens = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                          precision="highest", name="patch_proj")(tokens)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.d_model), jnp.float32
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, grid0 * grid0 + 1, self.d_model),
            jnp.float32,
        )
        cls = jnp.broadcast_to(cls_token, (b, 1, self.d_model)).astype(tokens.dtype)
        tokens = jnp.concatenate([cls, tokens], axis=1)
        if tokens.shape[1] != pos_embed.shape[1]:
            pos_embed = resize_pos_embed(pos_embed, (grid0, grid0), (gh, gw))
        tokens = tokens + pos_embed.astype(tokens.dtype)
        tokens = nn.Dropout(self.dropout, deterministic=not train)(tokens)

        dpr = np.linspace(0, self.drop_path_rate, self.n_layers)
        for i in range(self.n_layers):
            tokens = Block(
                self.n_heads, 4 * self.d_model, self.dropout, float(dpr[i]),
                self.dtype, name=f"block{i}",
            )(tokens, train)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm")(tokens)


class MaskTransformer(nn.Module):
    n_cls: int
    patch_size: int = 32
    d_model: int = 768
    n_layers: int = 2
    n_heads: int = 12
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, im_size, train: bool = False):
        """(B, N, D_enc) patch tokens -> (B, H/P, W/P, n_cls) mask logits."""
        h, _ = im_size
        gs = h // self.patch_size
        b = x.shape[0]

        x = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                     precision="highest", name="proj_dec")(x)
        cls_emb = self.param(
            "cls_emb", nn.initializers.truncated_normal(0.02),
            (1, self.n_cls, self.d_model), jnp.float32,
        )
        x = jnp.concatenate(
            [x, jnp.broadcast_to(cls_emb, (b, self.n_cls, self.d_model)).astype(x.dtype)],
            axis=1,
        )
        for i in range(self.n_layers):
            x = Block(self.n_heads, 4 * self.d_model, self.dropout, 0.0,
                      self.dtype, name=f"block{i}")(x, train)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="decoder_norm")(x)

        patches, cls_feat = x[:, : -self.n_cls], x[:, -self.n_cls:]
        scale = self.d_model ** -0.5
        proj_patch = self.param(
            "proj_patch", nn.initializers.normal(scale), (self.d_model, self.d_model),
            jnp.float32,
        )
        proj_classes = self.param(
            "proj_classes", nn.initializers.normal(scale), (self.d_model, self.d_model),
            jnp.float32,
        )
        patches = patches @ proj_patch.astype(patches.dtype)
        cls_feat = cls_feat @ proj_classes.astype(cls_feat.dtype)
        ndt = jnp.promote_types(patches.dtype, jnp.float32)
        patches = patches / jnp.linalg.norm(
            patches.astype(ndt), axis=-1, keepdims=True
        ).astype(patches.dtype)
        cls_feat = cls_feat / jnp.linalg.norm(
            cls_feat.astype(ndt), axis=-1, keepdims=True
        ).astype(cls_feat.dtype)

        masks = jnp.einsum("bnd,bcd->bnc", patches, cls_feat, precision="highest")
        masks = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32,
                             name="mask_norm")(masks)
        gw = masks.shape[1] // gs
        return masks.reshape(b, gs, gw, self.n_cls)


class DecoderLinear(nn.Module):
    """Linear patch classifier: one Dense over encoder tokens, reshaped to
    the patch grid (reference segm/model/decoder.py:13-34). The cheap
    alternative to MaskTransformer in the Segmenter paper's ablations."""

    n_cls: int
    patch_size: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, im_size, train: bool = False):
        """(B, N, D_enc) patch tokens -> (B, H/P, W/P, n_cls) logits."""
        h, _ = im_size
        gs = h // self.patch_size
        x = nn.Dense(self.n_cls, dtype=self.dtype, param_dtype=jnp.float32,
                     precision="highest", name="head")(x)
        b, n, c = x.shape
        return x.reshape(b, gs, n // gs, c)


class ViTClassifier(nn.Module):
    """ViT image classifier: encoder cls token -> Linear head. The model
    shape the reference's classification-accuracy eval drives
    (segm/eval/accuracy.py via segm/model/factory.py create_vit — a timm
    ViT with its classification head)."""

    n_cls: int = 1000
    image_size: int = 224
    patch_size: int = 16
    d_model: int = 768
    n_layers: int = 12
    n_heads: Optional[int] = None
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = VisionTransformer(
            image_size=self.image_size, patch_size=self.patch_size,
            n_layers=self.n_layers, d_model=self.d_model,
            n_heads=self.n_heads or self.d_model // 64,
            dropout=self.dropout, dtype=self.dtype, name="encoder",
        )(x, train)
        cls_token = feats[:, 0]
        return nn.Dense(self.n_cls, dtype=self.dtype,
                        param_dtype=jnp.float32, precision="highest",
                        name="head")(cls_token)


class SegmenterViT(nn.Module):
    """Full Segmenter: pad -> encode -> drop cls -> decode -> upsample -> unpad.

    Reference: segm/model/segmenter.py:32-48 via model/vit.py (patch 32,
    d_model 768, 12 enc layers, 2 dec layers). ``decoder_type`` selects the
    MaskTransformer (default) or the linear decoder
    (segm/model/factory.py decoder name "linear").
    """

    classes: int = 5
    image_size: int = 768
    patch_size: int = 32
    d_model: int = 768
    n_layers: int = 12
    dec_layers: int = 2
    n_heads: Optional[int] = None   # default: d_model // 64 (ViT-B heads)
    dropout: float = 0.1
    decoder_type: str = "mask_transformer"  # "mask_transformer" | "linear"
    with_rep: bool = False
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None  # unused (no BN); kept for a uniform API

    def setup(self):
        heads = self.n_heads or self.d_model // 64
        self.encoder = VisionTransformer(
            image_size=self.image_size, patch_size=self.patch_size,
            n_layers=self.n_layers, d_model=self.d_model,
            n_heads=heads, dropout=self.dropout, dtype=self.dtype,
            name="encoder",
        )
        if self.decoder_type == "linear":
            self.decoder = DecoderLinear(
                n_cls=self.classes, patch_size=self.patch_size,
                dtype=self.dtype, name="decoder",
            )
        else:
            self.decoder = MaskTransformer(
                n_cls=self.classes, patch_size=self.patch_size, d_model=self.d_model,
                n_layers=self.dec_layers, n_heads=heads,
                dropout=self.dropout, dtype=self.dtype, name="decoder",
            )
        if self.with_rep:
            self.rep_decoder = MaskTransformer(
                n_cls=256, patch_size=self.patch_size, d_model=self.d_model,
                n_layers=1, n_heads=heads, dropout=self.dropout,
                dtype=self.dtype, name="rep",
            )

    def _pad(self, x):
        ps = self.patch_size
        h, w = x.shape[1], x.shape[2]
        pad_h = (ps - h % ps) % ps
        pad_w = (ps - w % ps) % ps
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        return x

    def encode(self, x, train: bool = False):
        """Spatial patch-token map — the flow-path encoder.

        TPU EXTENSION beyond the reference's capability boundary: the
        reference EXCLUDES vit from the frame-interpolation path
        (flow/base.py:94-103 raises NotImplementedError). The explicit
        encoder/decoder split makes keyframe-warp interpolation over token
        maps natural, so the boundary is extended deliberately (SURVEY §7
        "keep the same capability boundary or extend deliberately").

        Requires patch-multiple inputs so the token grid spans exactly the
        frame the MV grids are normalized to (padding would misalign the
        [-1,1] warp coordinates); the Runner rounds vit flow sizes to
        32-multiples like ``round_train``.
        """
        h, w = x.shape[1], x.shape[2]
        ps = self.patch_size
        assert h % ps == 0 and w % ps == 0, (
            f"vit flow input must be a multiple of {ps}, got {(h, w)}"
        )
        feats = self.encoder(x, train)
        gh, gw = h // ps, w // ps
        f = feats[:, 1:].reshape(feats.shape[0], gh, gw, feats.shape[-1])
        return f, None

    def decode(self, f, train: bool = False):
        """(B, gh, gw, D) token map -> (B, gh, gw, classes) mask logits at
        token resolution (the flow path resizes to the output size, mirroring
        how pspnet/deeplab decoders return stride-8 logits)."""
        b, gh, gw, d = f.shape
        tokens = f.reshape(b, gh * gw, d)
        return self.decoder(
            tokens, (gh * self.patch_size, gw * self.patch_size), train
        )

    def __call__(self, x, train: bool = False):
        h_ori, w_ori = x.shape[1], x.shape[2]
        x = self._pad(x)
        h, w = x.shape[1], x.shape[2]
        feats = self.encoder(x, train)
        patch_tokens = feats[:, 1:]
        masks = self.decoder(patch_tokens, (h, w), train)
        masks = resize_bilinear(masks, (h, w), align_corners=False)
        masks = masks[:, :h_ori, :w_ori]
        out = {"pred": masks}
        if train and self.with_rep:
            rep = self.rep_decoder(patch_tokens, (h, w), train)
            # reference quirk (model/vit.py:80-87): VITRepModel reads "h, w"
            # from the hooked TOKEN tensor (B, N+1, D), so the rep map is
            # bilinearly resized to (num_tokens+1, d_model) BEFORE the
            # wrapper's final resize to image size (wrapper.py:45-46).
            # Bilinear is not transitive — the extra hop is numerically
            # load-bearing for U2PL-ViT training.
            rep = resize_bilinear(rep, (feats.shape[1], feats.shape[2]),
                                  align_corners=True)
            rep = resize_bilinear(rep, (h_ori, w_ori), align_corners=True)
            out["rep"] = rep
        return out

"""PyTorch checkpoint -> flax variables converters.

Needed for mIoU parity with the reference, whose accuracy depends on
pretrained initializations (deep-base ResNet ``initmodel/resnet*_v2.pth``,
/root/reference/model/resnet.py:200-231; full-model Lightning checkpoints).
Works on plain state_dict mappings (numpy/torch tensors); torch itself is
only needed by the caller to load the file.

Layout conventions converted:
  conv   OIHW -> HWIO
  linear (out, in) -> (in, out)
  BN     weight/bias -> scale/bias params; running_mean/var -> batch_stats
"""

from typing import Dict, Mapping, Tuple

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv(sd, key):
    return {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}


def _conv_b(sd, key):
    out = _conv(sd, key)
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _bn(sd, key) -> Tuple[dict, dict]:
    params = {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}
    stats = {"mean": _np(sd[f"{key}.running_mean"]), "var": _np(sd[f"{key}.running_var"])}
    return params, stats


def _linear(sd, key):
    out = {"kernel": _np(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def convert_resnet_backbone(
    sd: Mapping, blocks, deep_base: bool = True, prefix: str = ""
) -> Tuple[dict, dict]:
    """Reference-style ResNet state_dict -> (params, batch_stats) pytrees.

    ``sd`` keys follow /root/reference/model/resnet.py naming
    (conv1/bn1[,conv2,bn2,conv3,bn3], layer{1..4}.{i}.conv{1..3}/bn{1..3},
    downsample.0/.1). ``prefix`` selects a sub-tree (e.g. "backbone.").
    """
    p: Dict[str, dict] = {}
    s: Dict[str, dict] = {}

    def take_bn(src, dst):
        p[dst], s[dst] = _bn(sd, prefix + src)

    p["conv1"] = _conv(sd, prefix + "conv1")
    take_bn("bn1", "bn1")
    if deep_base:
        p["conv2"] = _conv(sd, prefix + "conv2")
        take_bn("bn2", "bn2")
        p["conv3"] = _conv(sd, prefix + "conv3")
        take_bn("bn3", "bn3")

    for li, n in enumerate(blocks, start=1):
        for bi in range(n):
            src = f"layer{li}.{bi}"
            dst = f"layer{li}_block{bi}"
            blk_p: Dict[str, dict] = {}
            blk_s: Dict[str, dict] = {}
            for ci in (1, 2, 3):
                blk_p[f"conv{ci}"] = _conv(sd, f"{prefix}{src}.conv{ci}")
                blk_p[f"bn{ci}"], blk_s[f"bn{ci}"] = _bn(sd, f"{prefix}{src}.bn{ci}")
            if f"{prefix}{src}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = _conv(sd, f"{prefix}{src}.downsample.0")
                blk_p["downsample_bn"], blk_s["downsample_bn"] = _bn(
                    sd, f"{prefix}{src}.downsample.1"
                )
            p[dst] = blk_p
            s[dst] = blk_s
    return p, s


def _seg_head(sd, conv1_key, bn_key, conv2_key) -> Tuple[dict, dict]:
    params = {
        "conv1": _conv(sd, conv1_key),
        "conv2": _conv_b(sd, conv2_key),
    }
    params["bn"], stats = _bn(sd, bn_key)
    return params, {"bn": stats}


def convert_pspnet_state_dict(sd: Mapping, layers: int = 50) -> dict:
    """Reference PSPNet state_dict (/root/reference/model/pspnet.py) -> variables.

    Reference layer0 Sequential indices: 0/1 conv1/bn1, 3/4 conv2/bn2,
    6/7 conv3/bn3 (relu/maxpool hold no params).
    """
    from floodseg_tpu.models.resnet import DEPTH_BLOCKS

    remap = {
        "conv1": "layer0.0", "bn1": "layer0.1",
        "conv2": "layer0.3", "bn2": "layer0.4",
        "conv3": "layer0.6", "bn3": "layer0.7",
    }
    flat = dict(sd)
    for mine, theirs in remap.items():
        for suf in ("weight", "bias", "running_mean", "running_var"):
            k = f"{theirs}.{suf}"
            if k in flat:
                flat[f"{mine}.{suf}"] = flat[k]

    bb_p, bb_s = convert_resnet_backbone(flat, DEPTH_BLOCKS[layers], deep_base=True)

    ppm_p: Dict[str, dict] = {}
    ppm_s: Dict[str, dict] = {}
    for i in range(4):
        ppm_p[f"bin{i}_conv"] = _conv(sd, f"ppm.features.{i}.1")
        ppm_p[f"bin{i}_bn"], ppm_s[f"bin{i}_bn"] = _bn(sd, f"ppm.features.{i}.2")

    cls_p, cls_s = _seg_head(sd, "cls.0", "cls.1", "cls.4")
    params = {"backbone": bb_p, "ppm": ppm_p, "cls": cls_p}
    stats = {"backbone": bb_s, "ppm": ppm_s, "cls": cls_s}
    if "aux.0.weight" in sd:
        params["aux"], stats["aux"] = _seg_head(sd, "aux.0", "aux.1", "aux.4")
    if "rep.0.weight" in sd:
        params["rep"], stats["rep"] = _seg_head(sd, "rep.0", "rep.1", "rep.4")
    return {"params": params, "batch_stats": stats}


def convert_deeplabv3_state_dict(sd: Mapping, layers: int = 50) -> dict:
    """torchvision ``deeplabv3_resnet{50,101}`` state_dict -> variables.

    The reference builds its DeepLabV3 from torch.hub pretrained weights
    (/root/reference/model/deeplabv3.py:15-19) with the head conv layers
    replaced; this converts the full torchvision naming:
    backbone.* (standard stem), classifier.0 = ASPP
    (convs.0 1x1 / convs.1-3 dilated 3x3 / convs.4 image pooling, project),
    classifier.{1,2,4} = 3x3 conv + BN + final 1x1, aux_classifier = FCNHead.
    """
    from floodseg_tpu.models.resnet import DEPTH_BLOCKS

    bb_p, bb_s = convert_resnet_backbone(
        sd, DEPTH_BLOCKS[layers], deep_base=False, prefix="backbone.")

    aspp_p: Dict[str, dict] = {}
    aspp_s: Dict[str, dict] = {}
    aspp_p["b0_conv"] = _conv(sd, "classifier.0.convs.0.0")
    aspp_p["b0_bn"], aspp_s["b0_bn"] = _bn(sd, "classifier.0.convs.0.1")
    for i in (1, 2, 3):
        aspp_p[f"b{i}_conv"] = _conv(sd, f"classifier.0.convs.{i}.0")
        aspp_p[f"b{i}_bn"], aspp_s[f"b{i}_bn"] = _bn(sd, f"classifier.0.convs.{i}.1")
    # ASPPPooling: index 0 is the (parameterless) AdaptiveAvgPool2d
    aspp_p["pool_conv"] = _conv(sd, "classifier.0.convs.4.1")
    aspp_p["pool_bn"], aspp_s["pool_bn"] = _bn(sd, "classifier.0.convs.4.2")
    aspp_p["project_conv"] = _conv(sd, "classifier.0.project.0")
    aspp_p["project_bn"], aspp_s["project_bn"] = _bn(sd, "classifier.0.project.1")

    cls_p = {"aspp": aspp_p, "conv": _conv(sd, "classifier.1"),
             "classifier": _conv_b(sd, "classifier.4")}
    cls_p["bn"], cls_bn_s = _bn(sd, "classifier.2")
    params = {"backbone": bb_p, "classifier": cls_p}
    stats = {"backbone": bb_s, "classifier": {"aspp": aspp_s, "bn": cls_bn_s}}
    if "aux_classifier.0.weight" in sd:
        aux_p = {"conv": _conv(sd, "aux_classifier.0"),
                 "classifier": _conv_b(sd, "aux_classifier.4")}
        aux_p["bn"], aux_bn_s = _bn(sd, "aux_classifier.1")
        params["aux_classifier"] = aux_p
        stats["aux_classifier"] = {"bn": aux_bn_s}
    return {"params": params, "batch_stats": stats}


def _ln(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _block(sd, prefix):
    """timm/reference transformer Block -> my Block params
    (segm/model/blocks.py naming: norm1, attn.qkv/proj, norm2, mlp.fc1/fc2)."""
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "attn": {
            "qkv": _linear(sd, f"{prefix}.attn.qkv"),
            "proj": _linear(sd, f"{prefix}.attn.proj"),
        },
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
        },
    }


def convert_vit_encoder(sd: Mapping, n_layers: int = 12, prefix: str = "") -> dict:
    """timm/reference VisionTransformer state_dict -> my VisionTransformer
    params (segm/model/vit.py naming; reference loads timm checkpoints with
    pos-embed resize, segm/model/utils.py:22-63).

    The strided patch conv becomes the patchify matmul: OIHW (D, C, P, P) ->
    (P*P*C, D) with (py, px, c) feature order matching models.vit.patchify.
    """
    w = _np(sd[f"{prefix}patch_embed.proj.weight"])  # (D, C, P, P)
    d = w.shape[0]
    patch_kernel = w.transpose(2, 3, 1, 0).reshape(-1, d)
    params = {
        "patch_proj": {"kernel": patch_kernel,
                       "bias": _np(sd[f"{prefix}patch_embed.proj.bias"])},
        "cls_token": _np(sd[f"{prefix}cls_token"]),
        "pos_embed": _np(sd[f"{prefix}pos_embed"]),
        "norm": _ln(sd, f"{prefix}norm"),
    }
    for i in range(n_layers):
        params[f"block{i}"] = _block(sd, f"{prefix}blocks.{i}")
    return params


def convert_mask_transformer(sd: Mapping, n_layers: int = 2, prefix: str = "") -> dict:
    """Reference MaskTransformer state_dict -> my MaskTransformer params
    (segm/model/decoder.py:37-102 naming)."""
    params = {
        "proj_dec": _linear(sd, f"{prefix}proj_dec"),
        "cls_emb": _np(sd[f"{prefix}cls_emb"]),
        "proj_patch": _np(sd[f"{prefix}proj_patch"]),
        "proj_classes": _np(sd[f"{prefix}proj_classes"]),
        "decoder_norm": _ln(sd, f"{prefix}decoder_norm"),
        "mask_norm": _ln(sd, f"{prefix}mask_norm"),
    }
    for i in range(n_layers):
        params[f"block{i}"] = _block(sd, f"{prefix}blocks.{i}")
    return params


def convert_s4gan_discriminator(sd: Mapping, prefix: str = "") -> dict:
    """Reference s4GAN_discriminator state_dict -> S4GANDiscriminator params
    (/root/reference/util/gan.py:10-43). Sequential indices: layers.{0,3,6,9}
    are the four stride-2 convs (LeakyReLU/Dropout hold no params), final.0
    is the sigmoid head's Linear (our head is the same Linear pre-sigmoid)."""
    params = {}
    for i, li in enumerate((0, 3, 6, 9)):
        params[f"conv{i + 1}"] = _conv_b(sd, f"{prefix}layers.{li}")
    params["final"] = _linear(sd, f"{prefix}final.0")
    return params


def convert_decoder_linear(sd: Mapping, prefix: str = "") -> dict:
    """Reference DecoderLinear state_dict -> my DecoderLinear params
    (segm/model/decoder.py:13-34: a single n_cls Linear named ``head``)."""
    return {"head": _linear(sd, f"{prefix}head")}


def convert_segmenter_state_dict(sd: Mapping, n_layers: int = 12,
                                 dec_layers: int = 2,
                                 decoder: str = "mask_transformer") -> dict:
    """Full reference Segmenter (model/vit.py VITSegmentModel) -> variables.
    ``decoder`` selects the MaskTransformer or linear decoder conversion
    (segm/model/factory.py decoder name "linear")."""
    dec = (convert_decoder_linear(sd, "model.decoder.")
           if decoder == "linear"
           else convert_mask_transformer(sd, dec_layers, "model.decoder."))
    return {"params": {
        "encoder": convert_vit_encoder(sd, n_layers, "model.encoder."),
        "decoder": dec,
    }}

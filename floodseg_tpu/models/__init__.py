"""Model factory mirroring the reference's arch dispatch.

Reference dispatch: supervised.py:79-93 / flow/base.py:94-103 select
pspnet / deeplabv3 / vit by the ``arch`` hparam; ``semisupervised`` adds the
U2PL rep head.
"""

from typing import Any, Optional

import jax.numpy as jnp

from floodseg_tpu.models.resnet import ResNetFeatures
from floodseg_tpu.models.pspnet import PSPNet, PPM
from floodseg_tpu.models.deeplabv3 import DeepLabV3
from floodseg_tpu.models.vit import SegmenterViT, VisionTransformer, MaskTransformer
from floodseg_tpu.models.discriminator import S4GANDiscriminator

ARCHS = ("pspnet", "deeplabv3", "vit")

# archs supported by the flow (frame-interpolation) path. The reference
# excludes vit there (flow/base.py:94-103 raises NotImplementedError); this
# build EXTENDS the boundary deliberately (SURVEY §7) — SegmenterViT exposes
# encode (spatial patch-token map) / decode (MaskTransformer over warped
# tokens), so keyframe-warp interpolation composes with it like any other
# encoder/decoder pair.
FLOW_ARCHS = ("pspnet", "deeplabv3", "vit")


def build_model(
    arch: str,
    classes: int = 5,
    layers: int = 50,
    image_size: int = 768,
    semisupervised: bool = False,
    with_aux: bool = True,
    remat: bool = False,
    dtype: Any = jnp.float32,
    axis_name: Optional[str] = None,
):
    if arch == "pspnet":
        return PSPNet(classes=classes, layers=layers, with_aux=with_aux,
                      with_rep=semisupervised, remat=remat, dtype=dtype,
                      axis_name=axis_name)
    if arch == "deeplabv3":
        return DeepLabV3(classes=classes, layers=layers, with_aux=with_aux,
                         with_rep=semisupervised, remat=remat, dtype=dtype,
                         axis_name=axis_name)
    if arch == "vit":
        return SegmenterViT(classes=classes, image_size=image_size,
                            with_rep=semisupervised, dtype=dtype)
    raise ValueError(f"unknown arch {arch!r}; expected one of {ARCHS}")


__all__ = [
    "ARCHS",
    "FLOW_ARCHS",
    "build_model",
    "ResNetFeatures",
    "PSPNet",
    "PPM",
    "DeepLabV3",
    "SegmenterViT",
    "VisionTransformer",
    "MaskTransformer",
    "S4GANDiscriminator",
]

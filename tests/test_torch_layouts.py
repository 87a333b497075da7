"""Frozen key/shape inventories of the REAL pretrained files the reference
consumes — the offline half of real-weights import validation.

The reference seeds DeepLabV3 from torchvision's ``deeplabv3_resnet{50,101}``
(/root/reference/model/deeplabv3.py:15-19) and the segm ViT from timm's
``vit_base_patch32_384`` (/root/reference/segm/model/factory.py:70-77).
Neither library is installed in this zero-egress image and the weight files
cannot be downloaded, so these tests freeze the exact state-dict inventories
(every key string + tensor shape) from the public architecture definitions
(torchvision segmentation/deeplabv3.py + resnet.py with
replace_stride_with_dilation=[False, True, True]; timm 0.4.x
vision_transformer.py, the version segm pins) and assert two properties a
fabricated-replica test cannot:

1. CONSUMPTION IS EXACT: the converter reads precisely the inventory —
   every key except the documented ignores (``num_batches_tracked``; the
   classification ``head`` of the timm ViT) is consumed, so a converter
   regression that silently starts skipping keys fails here, not as a
   quietly random-init weight.
2. THE GRAFT COVERS THE MODEL: converted trees graft into the real flax
   models with ``strict_cover`` — any renamed/reshaped drift between the
   frozen layout and the model raises.

Literal key counts and spot keys pin the inventory generators themselves.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from floodseg_tpu.models.lightning_import import graft_variables
from floodseg_tpu.models.torch_import import (
    convert_deeplabv3_state_dict,
    convert_vit_encoder,
)

# ---------------------------------------------------------------------------
# inventory generators (public layouts, frozen here)
# ---------------------------------------------------------------------------


def _bn_keys(prefix, ch):
    return {
        f"{prefix}.weight": (ch,),
        f"{prefix}.bias": (ch,),
        f"{prefix}.running_mean": (ch,),
        f"{prefix}.running_var": (ch,),
        f"{prefix}.num_batches_tracked": (),
    }


def deeplabv3_inventory(layers=50, classes=21):
    """torchvision ``deeplabv3_resnet{50,101}(aux_loss=True)`` state_dict:
    IntermediateLayerGetter(resnet, dilation=[F,T,T]) backbone +
    DeepLabHead(2048, C) classifier + FCNHead(1024, C) aux_classifier.
    Same naming whether the heads are torchvision's pretrained ones or the
    reference's fresh replacements (model/deeplabv3.py:18-19) — only the
    final-conv class dim differs."""
    blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[layers]
    inv = {"backbone.conv1.weight": (64, 3, 7, 7)}
    inv.update(_bn_keys("backbone.bn1", 64))
    inplanes = 64
    for li, n in enumerate(blocks, start=1):
        planes = 64 * 2 ** (li - 1)
        for bi in range(n):
            p = f"backbone.layer{li}.{bi}"
            inv[f"{p}.conv1.weight"] = (planes, inplanes, 1, 1)
            inv.update(_bn_keys(f"{p}.bn1", planes))
            inv[f"{p}.conv2.weight"] = (planes, planes, 3, 3)
            inv.update(_bn_keys(f"{p}.bn2", planes))
            inv[f"{p}.conv3.weight"] = (planes * 4, planes, 1, 1)
            inv.update(_bn_keys(f"{p}.bn3", planes * 4))
            if bi == 0:
                inv[f"{p}.downsample.0.weight"] = (planes * 4, inplanes, 1, 1)
                inv.update(_bn_keys(f"{p}.downsample.1", planes * 4))
            inplanes = planes * 4
    # DeepLabHead = ASPP(2048, [12, 24, 36]) -> 3x3 conv/BN/ReLU -> 1x1
    inv["classifier.0.convs.0.0.weight"] = (256, 2048, 1, 1)
    inv.update(_bn_keys("classifier.0.convs.0.1", 256))
    for i in (1, 2, 3):
        inv[f"classifier.0.convs.{i}.0.weight"] = (256, 2048, 3, 3)
        inv.update(_bn_keys(f"classifier.0.convs.{i}.1", 256))
    inv["classifier.0.convs.4.1.weight"] = (256, 2048, 1, 1)  # ASPPPooling
    inv.update(_bn_keys("classifier.0.convs.4.2", 256))
    inv["classifier.0.project.0.weight"] = (256, 1280, 1, 1)
    inv.update(_bn_keys("classifier.0.project.1", 256))
    inv["classifier.1.weight"] = (256, 256, 3, 3)
    inv.update(_bn_keys("classifier.2", 256))
    inv["classifier.4.weight"] = (classes, 256, 1, 1)
    inv["classifier.4.bias"] = (classes,)
    # FCNHead(1024, C)
    inv["aux_classifier.0.weight"] = (256, 1024, 3, 3)
    inv.update(_bn_keys("aux_classifier.1", 256))
    inv["aux_classifier.4.weight"] = (classes, 256, 1, 1)
    inv["aux_classifier.4.bias"] = (classes,)
    return inv


def timm_vit_inventory(img=384, patch=32, depth=12, dim=768, classes=1000):
    """timm 0.4.x ``vit_base_patch32_384`` state_dict (representation_size
    None -> pre_logits is Identity, no dist token)."""
    n = (img // patch) ** 2
    inv = {
        "cls_token": (1, 1, dim),
        "pos_embed": (1, n + 1, dim),
        "patch_embed.proj.weight": (dim, 3, patch, patch),
        "patch_embed.proj.bias": (dim,),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        inv.update({
            f"{p}.norm1.weight": (dim,), f"{p}.norm1.bias": (dim,),
            f"{p}.attn.qkv.weight": (3 * dim, dim),
            f"{p}.attn.qkv.bias": (3 * dim,),
            f"{p}.attn.proj.weight": (dim, dim),
            f"{p}.attn.proj.bias": (dim,),
            f"{p}.norm2.weight": (dim,), f"{p}.norm2.bias": (dim,),
            f"{p}.mlp.fc1.weight": (4 * dim, dim),
            f"{p}.mlp.fc1.bias": (4 * dim,),
            f"{p}.mlp.fc2.weight": (dim, 4 * dim),
            f"{p}.mlp.fc2.bias": (dim,),
        })
    inv["norm.weight"] = (dim,)
    inv["norm.bias"] = (dim,)
    inv["head.weight"] = (classes, dim)
    inv["head.bias"] = (classes,)
    return inv


class _Recording(dict):
    """Tracks which keys the converter actually READS (``in`` probes on
    optional keys do not count as consumption)."""

    def __init__(self, d):
        super().__init__(d)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _tensors(inv, seed=0):
    rng = np.random.default_rng(seed)
    out = {}
    for k, shape in inv.items():
        if k.endswith("num_batches_tracked"):
            out[k] = np.asarray(100, dtype=np.int64)
        elif k.endswith("running_var"):
            out[k] = np.abs(rng.standard_normal(shape)).astype(np.float32) + 0.5
        else:
            out[k] = (rng.standard_normal(shape) * 0.05).astype(np.float32)
    return out


# ---------------------------------------------------------------------------
# inventory self-pins (counts + spot keys freeze the generators)
# ---------------------------------------------------------------------------


def test_inventory_pins():
    r50 = deeplabv3_inventory(50)
    r101 = deeplabv3_inventory(101)
    vit = timm_vit_inventory()
    assert len(r50) == 370
    assert len(r101) == 676
    assert len(vit) == 152
    assert r50["backbone.layer3.5.conv3.weight"] == (1024, 256, 1, 1)
    assert r101["backbone.layer3.22.conv2.weight"] == (256, 256, 3, 3)
    assert "backbone.layer3.6.conv1.weight" not in r50
    assert "backbone.fc.weight" not in r50  # IntermediateLayerGetter drops fc
    assert r50["classifier.0.project.0.weight"] == (256, 1280, 1, 1)
    assert vit["pos_embed"] == (1, 145, 768)
    assert vit["blocks.11.attn.qkv.weight"] == (2304, 768)
    assert "blocks.12.norm1.weight" not in vit
    assert "pre_logits.fc.weight" not in vit


# ---------------------------------------------------------------------------
# exact consumption + strict-cover graft
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "layers", [50, pytest.param(101, marks=pytest.mark.slow)])
def test_deeplabv3_converter_consumes_exact_inventory(layers):
    inv = deeplabv3_inventory(layers, classes=5)
    sd = _Recording(_tensors(inv))
    var = convert_deeplabv3_state_dict(sd, layers=layers)
    ignorable = {k for k in inv if k.endswith("num_batches_tracked")}
    unread = set(inv) - sd.read - ignorable
    assert not unread, f"converter silently ignored {sorted(unread)[:5]}..."

    from floodseg_tpu.models.deeplabv3 import DeepLabV3

    model = DeepLabV3(classes=5, layers=layers, with_aux=True)
    # train=True so the (train-only) aux head's params exist in the tree
    init = model.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)},
                      jnp.zeros((1, 33, 33, 3)), train=True)
    # strict_cover: every model param must be covered by the real file's
    # layout AND every converted leaf must exist with a matching shape
    graft_variables(init["params"], var["params"], strict_cover=True)
    graft_variables(init["batch_stats"], var["batch_stats"],
                    strict_cover=True)


def test_timm_vit_converter_consumes_exact_inventory():
    inv = timm_vit_inventory()
    sd = _Recording(_tensors(inv))
    params = convert_vit_encoder(sd, n_layers=12)
    # the classification head is the documented ignore: segmentation never
    # loads it (segm factory drops it the same way)
    ignorable = {"head.weight", "head.bias"}
    unread = set(inv) - sd.read - ignorable
    assert not unread, f"converter silently ignored {sorted(unread)[:5]}..."

    from floodseg_tpu.models.vit import VisionTransformer

    model = VisionTransformer(image_size=384, patch_size=32, n_layers=12,
                              d_model=768, n_heads=12, dropout=0.0)
    init = model.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros((1, 384, 384, 3)), train=False)
    graft_variables(init["params"], params, strict_cover=True)

"""Lightning-checkpoint EXPORT (models/lightning_export.py): the inverse of
the importer, pinned as an exact round trip on the reference's own layouts.

Protocol: fabricate a reference-format state_dict with the reference's own
torch modules (exactly as test_lightning_import.py does), run it through
import_lightning_checkpoint, export the resulting roles back with
export_lightning_checkpoint, and require the exported state_dict to equal
the original KEY FOR KEY and BYTE FOR BYTE — including FlowPSPNet's
``layers.``/``encoder.`` duplicate aliases and the ``num_batches_tracked``
leaves a strict ``load_state_dict`` demands. A strict torch load into a
fresh reference module then proves loadability directly.

No jax/flax involved in the round trips themselves, but constructing the
reference torch modules costs ~5 s each on this box, so every test that
builds one is slow-marked; the fabricated-vit layout tests stay in the
fast tier.
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

from oracle_shims import shim_skimage

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

from floodseg_tpu.models.lightning_export import (  # noqa: E402
    export_lightning_checkpoint,
)
from floodseg_tpu.models.lightning_import import (  # noqa: E402
    import_lightning_checkpoint,
)
# shared fabrication helpers — the import and export suites must fabricate
# IDENTICAL layouts, so they use one implementation
from test_lightning_import import _container, _ref_pspnet  # noqa: E402

CLASSES = 5


def _roundtrip(ckpt, family, arch):
    """import -> export must reproduce the original state_dict exactly."""
    out = import_lightning_checkpoint(ckpt)
    assert out["method_family"] == family
    assert out["arch"] == arch
    exported = export_lightning_checkpoint(
        out["arch"], out["roles"], out["method_family"],
        epoch=out.get("epoch"))
    orig = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    got = exported["state_dict"]
    assert sorted(got) == sorted(orig), (
        sorted(set(orig) - set(got))[:6], sorted(set(got) - set(orig))[:6])
    for k in orig:
        want = orig[k].numpy() if hasattr(orig[k], "numpy") else orig[k]
        np.testing.assert_array_equal(got[k], want, err_msg=k)
        assert got[k].dtype == np.asarray(want).dtype, k
    return exported


@pytest.fixture(scope="module")
def nets():
    """Constructed reference modules shared across tests (each PSPNet-50
    construction costs seconds; the tests only read/load state dicts)."""
    return {"semi": _ref_pspnet(semisupervised=True, seed=11),
            "semi2": _ref_pspnet(semisupervised=True, seed=2),
            "bare": _ref_pspnet(semisupervised=False, seed=13)}


@pytest.mark.slow
def test_supervised_pspnet_roundtrip_and_strict_load(nets):
    import copy

    net = nets["semi"]
    ckpt = {"state_dict": _container(model=net), "epoch": 4}
    exported = _roundtrip(ckpt, "supervised", "pspnet")
    assert exported["epoch"] == 4
    # strict load into a DIFFERENT module (a copy: loading must not clobber
    # the shared fixture that test_contrastive reads as a distinct init)
    fresh = copy.deepcopy(nets["semi2"])
    role = {k[len("model."):]: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in exported["state_dict"].items()}
    fresh.load_state_dict(role, strict=True)
    np.testing.assert_array_equal(
        fresh.model.cls[4].weight.detach().numpy(),
        net.model.cls[4].weight.detach().numpy())


@pytest.mark.slow
def test_contrastive_roundtrip(nets):
    student, teacher = nets["semi"], nets["semi2"]
    ckpt = {"state_dict": _container(model=student, model_teacher=teacher)}
    exported = _roundtrip(ckpt, "contrastive", "pspnet")
    # the two roles must not be mixed up in the export either
    sd = exported["state_dict"]
    assert not np.allclose(sd["model.model.cls.4.weight"],
                           sd["model_teacher.model.cls.4.weight"])


@pytest.mark.slow
def test_gan_roundtrip(nets):
    shim_skimage()
    from util.gan import s4GAN_discriminator  # reference

    torch.manual_seed(3)
    d = s4GAN_discriminator(num_classes=CLASSES)
    _roundtrip({"state_dict": _container(model_G=nets["bare"], model_D=d)},
               "gan", "pspnet")


@pytest.mark.slow
def test_flow_supervised_roundtrip_and_strict_load():
    """The hardest layout: FlowModel(FlowPSPNet) registers the shared
    backbone under layer{i}., layers.{i}. AND encoder.0.{i}. (ppm also as
    encoder.1.) — the export must regenerate every alias byte-identically
    or a strict reference-side load fails on missing keys."""
    shim_skimage()
    from flow.model import FlowModel      # reference
    from model.pspnet import FlowPSPNet   # reference

    torch.manual_seed(4)
    hp = SimpleNamespace(layers=50, classes=CLASSES, pretrained=False)
    g = FlowModel(FlowPSPNet(hp))
    ckpt = {"state_dict": _container(model_G=g)}
    exported = _roundtrip(ckpt, "flow_supervised", "pspnet")

    torch.manual_seed(44)
    fresh = FlowModel(FlowPSPNet(hp))
    role = {k[len("model_G."):]: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in exported["state_dict"].items()}
    fresh.load_state_dict(role, strict=True)
    np.testing.assert_array_equal(
        fresh.model.decoder[4].weight.detach().numpy(),
        g.model.decoder[4].weight.detach().numpy())


@pytest.mark.slow
def test_flow_gan_deeplab_roundtrip():
    shim_skimage()
    from util.gan import s4GAN_discriminator       # reference
    from test_deeplab_import import TorchDeepLabV3  # local replica

    torch.manual_seed(5)
    full = TorchDeepLabV3(CLASSES)

    class OutTransform(tnn.Module):  # model/deeplabv3.py:36-43
        def __init__(self, model):
            super().__init__()
            self.model = model

    class FlowWrap(tnn.Module):      # FlowModel attribute layout
        def __init__(self):
            super().__init__()
            self.model = tnn.Module()
            self.model.encoder = OutTransform(full.backbone)
            self.model.decoder = full.classifier

    d = s4GAN_discriminator(num_classes=CLASSES)
    _roundtrip({"state_dict": _container(model_G=FlowWrap(), model_D=d)},
               "flow_gan", "deeplabv3")


def _fabricated_vit_sd(prefix, rng, dec="decoder", D=16, P=8):
    """Segmenter-layout keys under ``prefix`` (as in test_lightning_import):
    encoder block count 2, decoder block count 1."""
    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    sd = {}
    e = prefix + "encoder."
    sd[e + "cls_token"] = t(1, 1, D)
    sd[e + "pos_embed"] = t(1, 5, D)
    sd[e + "patch_embed.proj.weight"] = t(D, 3, P, P)
    sd[e + "patch_embed.proj.bias"] = t(D)
    sd[e + "norm.weight"] = t(D)
    sd[e + "norm.bias"] = t(D)
    for blocks, n in ((e + "blocks.", 2), (f"{prefix}{dec}.blocks.", 1)):
        for i in range(n):
            b = f"{blocks}{i}."
            for ln in ("norm1", "norm2"):
                sd[b + ln + ".weight"] = t(D)
                sd[b + ln + ".bias"] = t(D)
            sd[b + "attn.qkv.weight"] = t(3 * D, D)
            sd[b + "attn.qkv.bias"] = t(3 * D)
            sd[b + "attn.proj.weight"] = t(D, D)
            sd[b + "attn.proj.bias"] = t(D)
            sd[b + "mlp.fc1.weight"] = t(4 * D, D)
            sd[b + "mlp.fc1.bias"] = t(4 * D)
            sd[b + "mlp.fc2.weight"] = t(D, 4 * D)
            sd[b + "mlp.fc2.bias"] = t(D)
    dc = f"{prefix}{dec}."
    sd[dc + "proj_dec.weight"] = t(D, D)
    sd[dc + "proj_dec.bias"] = t(D)
    sd[dc + "cls_emb"] = t(1, CLASSES, D)
    sd[dc + "proj_patch"] = t(D, D)
    sd[dc + "proj_classes"] = t(D, D)
    for n in ("decoder_norm", "mask_norm"):
        w = D if n == "decoder_norm" else CLASSES
        sd[dc + n + ".weight"] = t(w)
        sd[dc + n + ".bias"] = t(w)
    return sd


def test_vit_supervised_roundtrip():
    sd = _fabricated_vit_sd("model.model.", np.random.default_rng(0))
    _roundtrip({"state_dict": sd}, "supervised", "vit")


def test_vit_semi_roundtrip():
    """VITSemi layout: ModelRepresentation(model=VITSegmentModel) plus the
    VITRepModel 1-layer MaskTransformer rep head at rep.rep_model.*
    (model/vit.py:60-87, n_cls=256)."""
    rng = np.random.default_rng(1)
    sd = _fabricated_vit_sd("model.model.model.", rng)
    D = 16

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    r = "model.rep.rep_model."
    sd[r + "proj_dec.weight"] = t(D, D)
    sd[r + "proj_dec.bias"] = t(D)
    sd[r + "cls_emb"] = t(1, 256, D)
    sd[r + "proj_patch"] = t(D, D)
    sd[r + "proj_classes"] = t(D, D)
    sd[r + "decoder_norm.weight"] = t(D)
    sd[r + "decoder_norm.bias"] = t(D)
    sd[r + "mask_norm.weight"] = t(256)
    sd[r + "mask_norm.bias"] = t(256)
    b = r + "blocks.0."
    for ln in ("norm1", "norm2"):
        sd[b + ln + ".weight"] = t(D)
        sd[b + ln + ".bias"] = t(D)
    sd[b + "attn.qkv.weight"] = t(3 * D, D)
    sd[b + "attn.qkv.bias"] = t(3 * D)
    sd[b + "attn.proj.weight"] = t(D, D)
    sd[b + "attn.proj.bias"] = t(D)
    sd[b + "mlp.fc1.weight"] = t(4 * D, D)
    sd[b + "mlp.fc1.bias"] = t(4 * D)
    sd[b + "mlp.fc2.weight"] = t(D, 4 * D)
    sd[b + "mlp.fc2.bias"] = t(D)
    _roundtrip({"state_dict": sd}, "supervised", "vit")


def test_vit_flow_export_rejects():
    out = import_lightning_checkpoint(
        {"state_dict": _fabricated_vit_sd("model.model.",
                                          np.random.default_rng(2))})
    with pytest.raises(ValueError, match="no vit flow layout"):
        export_lightning_checkpoint("vit", out["roles"], "flow_supervised")


@pytest.mark.slow
def test_export_from_runner_state_full_circle(tmp_path):
    """Reference ckpt -> Runner state (load_torch_ckpt) -> export_ckpt's
    roles_from_state -> Lightning layout: the full product circle must
    reproduce the original state_dict byte for byte (modulo f32<->f32
    graft casts, which are exact)."""
    import yaml

    from floodseg_tpu.cli.runner import Runner
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.data.synthetic import generate_synthetic_dataset

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    from export_ckpt import roles_from_state

    net = _ref_pspnet(semisupervised=False, seed=21)
    ckpt_path = tmp_path / "ref.ckpt"
    torch.save({"state_dict": _container(model=net), "epoch": 7},
               str(ckpt_path))

    root = generate_synthetic_dataset(
        str(tmp_path / "data"), num_frames=12, frame_delta=3,
        size=(96, 128), num_labeled=6)
    cfg = {
        "method": "supervised",
        "trainer": {"max_epochs": 1, "seed": 0,
                    "log_dir": str(tmp_path / "logs"), "run_name": "exp",
                    "num_devices": 1},
        "model": {"arch": "pspnet", "layers": 50, "classes": CLASSES,
                  "test_base_size": 128, "pretrained": False,
                  "save_video": False, "save_images": False},
        "data": {"data_root": root, "data_variant": "all", "batch_size": 2,
                 "train_w": 65, "workers": 0, "resize_h": 96,
                 "resize_w": 128, "frame_delta": 3, "predict_v_id": "synth"},
    }
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.dump(cfg))

    runner = Runner(load_config([str(path)], {}))
    state = runner.load_torch_ckpt(str(ckpt_path))

    exported = export_lightning_checkpoint(
        "pspnet", roles_from_state("supervised", state), "supervised",
        epoch=7)
    orig = {k: v.numpy() for k, v in
            _container(model=net).items()}
    got = exported["state_dict"]
    assert sorted(got) == sorted(orig), (
        sorted(set(orig) - set(got))[:6], sorted(set(got) - set(orig))[:6])
    for k in orig:
        np.testing.assert_array_equal(got[k], orig[k], err_msg=k)
    assert exported["epoch"] == 7

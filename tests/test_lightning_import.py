"""Lightning-checkpoint import: layout detection + conversion + graft.

Fabricates FULL Lightning-format state dicts with the reference's own torch
modules (the LightningModule state_dict is just nn.Module.state_dict over
its attribute tree, so a container module with the same attribute names —
``model`` / ``model_G`` / ``model_D`` / ``model_teacher`` — produces
byte-identical key layouts) and checks models/lightning_import.py routes
each method/arch to the right converter. The converters' NUMERIC parity is
pinned separately (test_models/test_deeplab_import/test_vit_import); these
tests pin the prefix routing and the graft-coverage guarantees on top.
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from floodseg_tpu.models.lightning_import import (  # noqa: E402
    graft_variables, import_lightning_checkpoint,
)
from floodseg_tpu.models.torch_import import (  # noqa: E402
    convert_pspnet_state_dict, convert_s4gan_discriminator,
)

CLASSES = 5


def _ref_pspnet(semisupervised=False, seed=0):
    shim_skimage()
    from model.pspnet import PSPNetSemi  # reference

    torch.manual_seed(seed)
    hp = SimpleNamespace(layers=50, classes=CLASSES, pretrained=False,
                         semisupervised=semisupervised)
    model, _, _ = PSPNetSemi(hp)
    return model


def _container(**attrs) -> dict:
    c = tnn.Module()
    for k, v in attrs.items():
        setattr(c, k, v)
    return c.state_dict()


def _trees_equal(a, b, path=""):
    if isinstance(a, dict) or isinstance(b, dict):
        assert sorted(a) == sorted(b), (path, sorted(a), sorted(b))
        for k in a:
            _trees_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=path)


def test_supervised_pspnet_layout():
    net = _ref_pspnet()
    ckpt = {"state_dict": _container(model=net), "epoch": 3}
    out = import_lightning_checkpoint(ckpt)
    assert out["method_family"] == "supervised"
    assert out["arch"] == "pspnet"
    assert out["epoch"] == 3
    want = convert_pspnet_state_dict(
        {k: v.numpy() for k, v in net.state_dict().items()})
    _trees_equal(out["roles"]["model"], want)


def test_contrastive_pspnet_layout():
    student = _ref_pspnet(semisupervised=True, seed=1)
    teacher = _ref_pspnet(semisupervised=True, seed=2)
    ckpt = {"state_dict": _container(model=student, model_teacher=teacher)}
    out = import_lightning_checkpoint(ckpt)
    assert out["method_family"] == "contrastive"
    roles = out["roles"]
    assert "rep" in roles["model"]["params"]          # the U2PL rep head
    assert "rep" in roles["teacher"]["params"]
    # the two roles are DIFFERENT inits and must not be mixed up
    s_w = roles["model"]["params"]["cls"]["conv2"]["kernel"]
    t_w = roles["teacher"]["params"]["cls"]["conv2"]["kernel"]
    assert not np.allclose(s_w, t_w)
    np.testing.assert_array_equal(
        t_w, np.asarray(teacher.model.cls[4].weight.detach().numpy()
                        ).transpose(2, 3, 1, 0))


def test_gan_pspnet_layout():
    shim_skimage()
    from util.gan import s4GAN_discriminator  # reference

    torch.manual_seed(3)
    g = _ref_pspnet()
    d = s4GAN_discriminator(num_classes=CLASSES)
    ckpt = {"state_dict": _container(model_G=g, model_D=d)}
    out = import_lightning_checkpoint(ckpt)
    assert out["method_family"] == "gan"
    assert out["arch"] == "pspnet"
    want_d = convert_s4gan_discriminator(
        {k: v.numpy() for k, v in d.state_dict().items()})
    _trees_equal(out["roles"]["discriminator"]["params"], want_d)


def test_flow_supervised_pspnet_layout():
    shim_skimage()
    from flow.model import FlowModel      # reference
    from model.pspnet import FlowPSPNet   # reference

    torch.manual_seed(4)
    hp = SimpleNamespace(layers=50, classes=CLASSES, pretrained=False)
    inner = FlowPSPNet(hp)
    g = FlowModel(inner)
    out = import_lightning_checkpoint({"state_dict": _container(model_G=g)})
    assert out["method_family"] == "flow_supervised"
    assert out["arch"] == "pspnet"
    params = out["roles"]["model"]["params"]
    assert "aux" not in params     # FlowPSPNet drops the aux head
    # decoder (== cls) weights land in the cls slot
    np.testing.assert_array_equal(
        params["cls"]["conv2"]["kernel"],
        inner.decoder[4].weight.detach().numpy().transpose(2, 3, 1, 0))
    # and the duplicate layers./encoder. aliases were not double-read:
    # backbone weights equal the canonical layer tensors
    np.testing.assert_array_equal(
        params["backbone"]["conv1"]["kernel"],
        inner.layer0[0].weight.detach().numpy().transpose(2, 3, 1, 0))


def test_flow_gan_deeplab_layout():
    """FlowDeepLabv3 layout (encoder=OutTransformModule(backbone),
    decoder=classifier — model/deeplabv3.py:47-54) + discriminator, using
    the local torchvision replica from test_deeplab_import."""
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
    out = import_lightning_checkpoint(
        {"state_dict": _container(model_G=FlowWrap(), model_D=d)})
    assert out["method_family"] == "flow_gan"
    assert out["arch"] == "deeplabv3"
    params = out["roles"]["model"]["params"]
    assert "aux_classifier" not in params
    np.testing.assert_array_equal(
        params["classifier"]["classifier"]["kernel"],
        full.classifier[4].weight.detach().numpy().transpose(2, 3, 1, 0))


def test_vit_supervised_layout():
    """Hand-fabricated VITSegmentModel key layout (model.model.encoder.* /
    model.model.decoder.*, model/vit.py:13-56) — the reference segm modules
    need timm which this image lacks, and the vit converter's numerics are
    pinned in test_vit_import; here only the routing is under test."""
    rng = np.random.default_rng(0)

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    D, P, NCLS = 16, 8, CLASSES
    sd = {}
    e = "model.model.encoder."
    sd[e + "cls_token"] = t(1, 1, D)
    sd[e + "pos_embed"] = t(1, 5, D)
    sd[e + "patch_embed.proj.weight"] = t(D, 3, P, P)
    sd[e + "patch_embed.proj.bias"] = t(D)
    sd[e + "norm.weight"] = t(D)
    sd[e + "norm.bias"] = t(D)
    for blocks, n in ((e + "blocks.", 2), ("model.model.decoder.blocks.", 1)):
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
    dec = "model.model.decoder."
    sd[dec + "proj_dec.weight"] = t(D, D)
    sd[dec + "proj_dec.bias"] = t(D)
    sd[dec + "cls_emb"] = t(1, NCLS, D)
    sd[dec + "proj_patch"] = t(D, D)
    sd[dec + "proj_classes"] = t(D, D)
    for n in ("decoder_norm", "mask_norm"):
        sd[dec + n + ".weight"] = t(D if n == "decoder_norm" else NCLS)
        sd[dec + n + ".bias"] = t(D if n == "decoder_norm" else NCLS)

    out = import_lightning_checkpoint({"state_dict": sd})
    assert out["method_family"] == "supervised"
    assert out["arch"] == "vit"
    p = out["roles"]["model"]["params"]
    assert "block1" in p["encoder"] and "block0" in p["decoder"]
    np.testing.assert_array_equal(p["decoder"]["cls_emb"],
                                  sd[dec + "cls_emb"])


def test_graft_guards():
    target = {"a": {"w": np.zeros((2, 2), np.float32)},
              "b": {"w": np.ones((3,), np.float32)}}
    src_ok = {"a": {"w": np.full((2, 2), 5.0)}}
    merged = graft_variables(target, src_ok)
    assert float(np.asarray(merged["a"]["w"]).sum()) == 20.0
    assert float(np.asarray(merged["b"]["w"]).sum()) == 3.0  # kept
    with pytest.raises(ValueError, match="missing from the model"):
        graft_variables(target, {"zzz": {"w": np.zeros((2, 2))}})
    with pytest.raises(ValueError, match="shape"):
        graft_variables(target, {"a": {"w": np.zeros((4, 4))}})
    with pytest.raises(ValueError, match="not covered"):
        graft_variables(target, src_ok, strict_cover=True)


@pytest.mark.slow
def test_cli_test_on_torch_ckpt(tmp_path):
    """End-to-end: fabricate a reference supervised Lightning ckpt, run the
    product CLI ``test --torch_ckpt`` on a synthetic dataset, and check the
    imported weights actually drive the eval (vs fresh init)."""
    import yaml

    from floodseg_tpu.data.synthetic import generate_synthetic_dataset
    from floodseg_tpu.cli.runner import Runner
    from floodseg_tpu.core.config import load_config

    net = _ref_pspnet(seed=7)
    ckpt_path = tmp_path / "ref.ckpt"
    torch.save({"state_dict": _container(model=net), "epoch": 9},
               str(ckpt_path))

    root = generate_synthetic_dataset(
        str(tmp_path / "data"), num_frames=12, frame_delta=3,
        size=(96, 128), num_labeled=6)
    cfg = {
        "method": "supervised",
        "trainer": {"max_epochs": 1, "seed": 0,
                    "log_dir": str(tmp_path / "logs"), "run_name": "imp",
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

    # grafted leaves == the torch tensors (spot-check head + deep BN stat)
    w = np.asarray(state.params["cls"]["conv2"]["kernel"])
    np.testing.assert_allclose(
        w, net.cls[4].weight.detach().numpy().transpose(2, 3, 1, 0),
        rtol=1e-6)
    var = np.asarray(state.batch_stats["backbone"]["layer4_block2"]["bn3"]["var"])
    np.testing.assert_allclose(
        var, net.layer4[2].bn3.running_var.numpy(), rtol=1e-6)

    results = runner.test(state)
    assert np.isfinite(results["test_miou1_epoch"])

    # the eval must actually consume the import: same forward on both sides
    net.eval()
    x = np.random.default_rng(0).standard_normal((1, 33, 33, 3)).astype(
        np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))["pred"].numpy()
    ours = np.asarray(jax.jit(
        lambda v, i: runner.model.apply(v, i, train=False)["pred"]
    )({"params": state.params, "batch_stats": state.batch_stats},
      jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_runner_torch_ckpt_gan_and_contrastive(tmp_path):
    """load_torch_ckpt grafts into the (G, D) tuple state and the U2PLState
    (student + teacher + synced flag)."""
    import yaml

    from floodseg_tpu.data.synthetic import generate_synthetic_dataset
    from floodseg_tpu.cli.runner import Runner
    from floodseg_tpu.core.config import load_config

    shim_skimage()
    from util.gan import s4GAN_discriminator  # reference

    root = generate_synthetic_dataset(
        str(tmp_path / "data"), num_frames=12, frame_delta=3,
        size=(96, 128), num_labeled=6)

    def make_cfg(method):
        cfg = {
            "method": method,
            "trainer": {"max_epochs": 2, "seed": 0,
                        "log_dir": str(tmp_path / "logs"),
                        "run_name": f"imp-{method}", "num_devices": 1},
            "model": {"arch": "pspnet", "layers": 50, "classes": CLASSES,
                      "test_base_size": 128, "pretrained": False,
                      "semisupervised": method == "contrastive",
                      "save_video": False, "save_images": False},
            "data": {"data_root": root, "data_variant": "all",
                     "batch_size": 2, "train_w": 65, "workers": 0,
                     "resize_h": 96, "resize_w": 128, "frame_delta": 3,
                     "predict_v_id": "synth"},
        }
        path = tmp_path / f"{method}.yaml"
        path.write_text(yaml.dump(cfg))
        return Runner(load_config([str(path)], {}))

    # --- gan: G + D tuple ---
    g, d = _ref_pspnet(seed=11), s4GAN_discriminator(num_classes=CLASSES)
    gan_ckpt = tmp_path / "gan.ckpt"
    torch.save({"state_dict": _container(model_G=g, model_D=d)},
               str(gan_ckpt))
    sg, sd_ = make_cfg("gan").load_torch_ckpt(str(gan_ckpt))
    np.testing.assert_allclose(
        np.asarray(sg.params["cls"]["conv2"]["kernel"]),
        g.cls[4].weight.detach().numpy().transpose(2, 3, 1, 0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sd_.params["conv1"]["kernel"]),
        d.layers[0].weight.detach().numpy().transpose(2, 3, 1, 0), rtol=1e-6)

    # --- contrastive: student + teacher + synced flag ---
    student = _ref_pspnet(semisupervised=True, seed=12)
    teacher = _ref_pspnet(semisupervised=True, seed=13)
    u2pl_ckpt = tmp_path / "u2pl.ckpt"
    torch.save({"state_dict": _container(model=student,
                                         model_teacher=teacher)},
               str(u2pl_ckpt))
    ustate = make_cfg("contrastive").load_torch_ckpt(str(u2pl_ckpt))
    assert bool(np.asarray(ustate.teacher_synced))
    np.testing.assert_allclose(
        np.asarray(ustate.student.params["rep"]["conv2"]["kernel"]),
        student.rep[4].weight.detach().numpy().transpose(2, 3, 1, 0),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ustate.teacher_params["cls"]["conv2"]["kernel"]),
        teacher.model.cls[4].weight.detach().numpy().transpose(2, 3, 1, 0),
        rtol=1e-6)


@pytest.mark.slow
def test_import_ckpt_script_roundtrip_and_fit_warmstart(tmp_path):
    """The one untested link in the import chain: scripts/import_ckpt.py's
    orbax save must restore via ``--ckpt_path`` (load_for_eval) with the
    imported weights intact, and ``fit(torch_ckpt=...)`` must graft the same
    weights into a TRAIN state (optimizer untouched) for warm-start
    fine-tuning."""
    import runpy

    import yaml

    from floodseg_tpu.data.synthetic import generate_synthetic_dataset
    from floodseg_tpu.cli.runner import Runner
    from floodseg_tpu.core.config import load_config

    net = _ref_pspnet(seed=21)
    ckpt_path = tmp_path / "ref.ckpt"
    torch.save({"state_dict": _container(model=net), "epoch": 3},
               str(ckpt_path))

    root = generate_synthetic_dataset(
        str(tmp_path / "data"), num_frames=12, frame_delta=3,
        size=(96, 128), num_labeled=6)
    cfg = {
        "method": "supervised",
        "trainer": {"max_epochs": 1, "seed": 0,
                    "log_dir": str(tmp_path / "logs"), "run_name": "rt",
                    "num_devices": 1},
        "model": {"arch": "pspnet", "layers": 50, "classes": CLASSES,
                  "test_base_size": 128, "pretrained": False,
                  "save_video": False, "save_images": False},
        "data": {"data_root": root, "data_variant": "all", "batch_size": 2,
                 "train_w": 65, "workers": 0, "resize_h": 96,
                 "resize_w": 128, "frame_delta": 3, "predict_v_id": "synth"},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.dump(cfg))
    out = tmp_path / "imported" / "ckpt"

    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "import_ckpt.py")
    old_argv = sys.argv
    try:
        sys.argv = ["import_ckpt.py", "--ckpt", str(ckpt_path),
                    "--config", str(cfg_path), "--out", str(out)]
        runpy.run_path(script, run_name="__main__")
    finally:
        sys.argv = old_argv

    ref_w = net.cls[4].weight.detach().numpy().transpose(2, 3, 1, 0)
    ref_var = net.layer4[2].bn3.running_var.numpy()

    # --ckpt_path restore path (what the CLI test/predict subcommands use)
    runner = Runner(load_config([str(cfg_path)], {}))
    state = runner.load_for_eval(str(out))
    np.testing.assert_allclose(
        np.asarray(state.params["cls"]["conv2"]["kernel"]), ref_w, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["backbone"]["layer4_block2"]["bn3"]["var"]),
        ref_var, rtol=1e-6)

    # fit warm start: graft into a train state (with optimizer state)
    runner2 = Runner(load_config([str(cfg_path)], {}))
    tstate, _, _ = runner2._build_states_and_steps(max_iter=5)
    fresh_opt = tstate.opt_state
    grafted = runner2._graft_torch_ckpt(tstate, str(ckpt_path))
    np.testing.assert_allclose(
        np.asarray(grafted.params["cls"]["conv2"]["kernel"]), ref_w,
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grafted.batch_stats["backbone"]["layer4_block2"]["bn3"]["var"]),
        ref_var, rtol=1e-6)
    # the optimizer tree is untouched by the graft (fresh moments)
    assert jax.tree_util.tree_structure(grafted.opt_state) == \
        jax.tree_util.tree_structure(fresh_opt)

"""Standalone Segmenter pipeline tests: folder dataset, sliding-window
inference, attention-map extraction, trainer smoke run."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from floodseg_tpu.segm.data import SegFolderDataset, build_train_pipeline
from floodseg_tpu.segm.inference import sliding_inference, window_anchors


@pytest.fixture(scope="module")
def seg_root(tmp_path_factory):
    """4 train + 2 val (image, mask) pairs, 64x64, 4 classes (0 = ADE
    'unlabeled' when reduce_zero_label)."""
    root = tmp_path_factory.mktemp("segdata")
    rng = np.random.default_rng(0)
    for split, n in (("training", 4), ("validation", 2)):
        img_dir = root / "images" / split
        ann_dir = root / "annotations" / split
        img_dir.mkdir(parents=True)
        ann_dir.mkdir(parents=True)
        for i in range(n):
            img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            # blocky masks so crops usually contain 2+ classes
            mask = np.kron(rng.integers(0, 4, (4, 4)),
                           np.ones((16, 16))).astype(np.uint8)
            Image.fromarray(img).save(img_dir / f"im{i}.jpg")
            Image.fromarray(mask).save(ann_dir / f"im{i}.png")
    return str(root)


def test_seg_folder_dataset(seg_root):
    ds = SegFolderDataset(os.path.join(seg_root, "images", "training"),
                          os.path.join(seg_root, "annotations", "training"))
    assert len(ds) == 4
    s = ds.get(0, np.random.default_rng(0))
    assert s["frame_current"].shape == (64, 64, 3)
    assert s["label"].shape == (64, 64)
    assert s["label"].max() <= 3

    # ADE20k convention: 0 -> ignore(255), k -> k-1
    ds_rz = SegFolderDataset(os.path.join(seg_root, "images", "training"),
                             os.path.join(seg_root, "annotations", "training"),
                             reduce_zero_label=True)
    s0 = ds.get(1, np.random.default_rng(1))
    s1 = ds_rz.get(1, np.random.default_rng(1))
    zero = s0["label"] == 0
    assert (s1["label"][zero] == 255).all()
    assert (s1["label"][~zero] == s0["label"][~zero] - 1).all()


def test_train_pipeline_shapes(seg_root):
    tf = build_train_pipeline(im_size=64, crop_size=48)
    ds = SegFolderDataset(os.path.join(seg_root, "images", "training"),
                          os.path.join(seg_root, "annotations", "training"),
                          transform=tf)
    s = ds.get(0, np.random.default_rng(0))
    assert s["frame_current"].shape == (48, 48, 3)
    assert s["label"].shape == (48, 48)


def test_window_anchors():
    assert window_anchors(64, 64, 32) == [0]
    assert window_anchors(64, 32, 16) == [0, 16, 32]
    assert window_anchors(70, 32, 16) == [0, 16, 32, 38]


def test_sliding_inference_matches_direct():
    """A pixelwise forward makes window merging exact: sliding probabilities
    must equal softmax of the direct forward, for any window/stride."""
    w_proj = np.asarray(np.random.default_rng(0).standard_normal((3, 5)),
                        np.float32)

    def fwd(variables, crops):
        return jnp.einsum("bhwc,ck->bhwk", crops, jnp.asarray(w_proj))

    img = np.random.default_rng(1).standard_normal((48, 64, 3)).astype(np.float32)
    direct = np.asarray(jax.nn.softmax(
        jnp.einsum("hwc,ck->hwk", jnp.asarray(img), jnp.asarray(w_proj)), -1))
    for ws, stride in ((32, 16), (48, 24)):
        prob = sliding_inference(fwd, None, img, 5, ws, stride)
        np.testing.assert_allclose(prob, direct, rtol=1e-5, atol=1e-6)
    # flip averaging of a flip-equivariant forward changes nothing
    prob = sliding_inference(fwd, None, img, 5, 32, 16, flip=True)
    np.testing.assert_allclose(prob, direct, rtol=1e-5, atol=1e-6)


def test_attention_maps_and_head_maps():
    from floodseg_tpu.models.vit import SegmenterViT
    from floodseg_tpu.segm.attn import attention_maps, head_maps

    model = SegmenterViT(classes=4, image_size=32, patch_size=16,
                         d_model=64, n_layers=2, dec_layers=1, dropout=0.0)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert "intermediates" not in variables  # init must not store attention

    maps = attention_maps(model, variables, x)
    n_patches = (32 // 16) ** 2
    assert len(maps["encoder"]) == 2
    assert len(maps["decoder"]) == 1
    assert maps["encoder"][0].shape == (1, 1, n_patches + 1, n_patches + 1)
    assert maps["decoder"][0].shape == (1, 1, n_patches + 4, n_patches + 4)
    # rows are softmax distributions
    np.testing.assert_allclose(maps["encoder"][0].sum(-1), 1.0, atol=1e-5)

    hm = head_maps(maps["encoder"][0], (2, 2), 16, query="cls")
    assert hm.shape == (1, 1, 32, 32)
    hm = head_maps(maps["decoder"][0], (2, 2), 16, query="cls", n_cls=4,
                   is_decoder=True)
    assert hm.shape == (1, 4, 32, 32)
    hm = head_maps(maps["encoder"][0], (2, 2), 16, query="patch",
                   xy_patch=(1, 1))
    assert hm.shape == (1, 1, 32, 32)


@pytest.mark.slow
def test_segm_train_cli_smoke(seg_root, tmp_path):
    from floodseg_tpu.segm.train import main

    argv = [
        "--log-dir", str(tmp_path / "logs"),
        "--img-dir", os.path.join(seg_root, "images", "training"),
        "--ann-dir", os.path.join(seg_root, "annotations", "training"),
        "--val-img-dir", os.path.join(seg_root, "images", "validation"),
        "--val-ann-dir", os.path.join(seg_root, "annotations", "validation"),
        "--n-cls", "4", "--im-size", "64", "--crop-size", "32",
        "--window-size", "32", "--window-stride", "16",
        "--patch-size", "16", "--d-model", "64", "--n-layers", "1",
        "--dec-layers", "1", "--batch-size", "2", "--epochs", "2",
        "--num-devices", "1", "--workers", "2",
    ]
    assert main(argv) == 0
    ckpts = os.listdir(tmp_path / "logs" / "checkpoints")
    assert "last" in ckpts

    # resume picks up after the last epoch without error
    assert main(argv + ["--epochs", "3"]) == 0


@pytest.mark.slow
def test_segm_train_cli_linear_decoder(seg_root, tmp_path):
    """--decoder linear trains and evaluates end-to-end (reference
    DecoderLinear, segm/model/decoder.py:13-34)."""
    from floodseg_tpu.segm.train import main

    argv = [
        "--log-dir", str(tmp_path / "logs_lin"),
        "--img-dir", os.path.join(seg_root, "images", "training"),
        "--ann-dir", os.path.join(seg_root, "annotations", "training"),
        "--val-img-dir", os.path.join(seg_root, "images", "validation"),
        "--val-ann-dir", os.path.join(seg_root, "annotations", "validation"),
        "--n-cls", "4", "--im-size", "64", "--crop-size", "32",
        "--window-size", "32", "--window-stride", "16",
        "--patch-size", "16", "--d-model", "64", "--n-layers", "1",
        "--decoder", "linear", "--batch-size", "2", "--epochs", "1",
        "--num-devices", "1", "--workers", "2",
    ]
    assert main(argv) == 0
    ckpts = os.listdir(tmp_path / "logs_lin" / "checkpoints")
    assert "last" in ckpts


def test_prepare_cityscapes_conversion(tmp_path):
    """labelIds -> 19 trainIds conversion + flattened folder layout."""
    import subprocess
    import sys
    from PIL import Image as PILImage

    src = tmp_path / "cs"
    for city in ("aaa", "bbb"):
        (src / "leftImg8bit" / "train" / city).mkdir(parents=True)
        (src / "gtFine" / "train" / city).mkdir(parents=True)
        (src / "leftImg8bit" / "val" / city).mkdir(parents=True)
        (src / "gtFine" / "val" / city).mkdir(parents=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    ids = np.zeros((32, 32), np.uint8)
    ids[:16] = 7    # road -> trainId 0
    ids[16:] = 26   # car  -> trainId 13
    ids[0, 0] = 3   # unlabeled-ish id -> 255
    PILImage.fromarray(img).save(
        src / "leftImg8bit" / "train" / "aaa" / "x_00_leftImg8bit.png")
    PILImage.fromarray(ids).save(
        src / "gtFine" / "train" / "aaa" / "x_00_gtFine_labelIds.png")

    dst = tmp_path / "out"
    out = subprocess.run(
        [sys.executable, "scripts/prepare_seg_dataset.py", "cityscapes",
         str(src), str(dst)], capture_output=True, text=True,
        cwd="/root/repo")
    assert out.returncode == 0, out.stderr
    lab = np.asarray(PILImage.open(
        dst / "annotations" / "train" / "x_00.png"))
    assert lab[0, 1] == 0 and lab[20, 0] == 13 and lab[0, 0] == 255
    ds = SegFolderDataset(str(dst / "images" / "train"),
                          str(dst / "annotations" / "train"),
                          img_suffix=".png")
    assert len(ds) == 1


def test_sliding_inference_stride_beyond_window_no_nan():
    """A stride larger than the (possibly shrunken) window must not leave
    uncovered pixels (0/0 -> NaN probabilities); the stride is clamped."""
    def fwd(variables, crops):
        return jnp.zeros(crops.shape[:3] + (3,))

    img = np.zeros((40, 100, 3), np.float32)
    prob = sliding_inference(fwd, None, img, 3, window_size=1024,
                             window_stride=992)
    assert np.isfinite(prob).all()
    np.testing.assert_allclose(prob.sum(-1), 1.0, atol=1e-6)

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


def test_topk_accuracy_matches_torch_recipe():
    """topk_accuracy vs the torch recipe the reference quotes
    (segm/metrics.py:18-36, pytorch/examples imagenet)."""
    import torch
    import jax.numpy as jnp
    from floodseg_tpu.ops.metrics import topk_accuracy

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((16, 10)).astype(np.float32)
    targets = rng.integers(0, 10, (16,))

    output, target = torch.from_numpy(logits), torch.from_numpy(targets)
    maxk = 5
    _, pred = output.topk(maxk, 1, True, True)
    pred = pred.t()
    correct = pred.eq(target.view(1, -1).expand_as(pred))
    want = [float(correct[:k].reshape(-1).float().sum(0) * 100.0 / 16)
            for k in (1, 5)]

    got = topk_accuracy(jnp.asarray(logits), jnp.asarray(targets), (1, 5))
    np.testing.assert_allclose([float(g) for g in got], want)


@pytest.fixture(scope="module")
def cls_root(tmp_path_factory):
    """ImageFolder layout: 3 classes x 4 images of distinct mean colors."""
    root = tmp_path_factory.mktemp("clsdata")
    rng = np.random.default_rng(0)
    for ci, cname in enumerate(["apple", "boat", "cat"]):
        d = root / cname
        d.mkdir()
        for i in range(4):
            im = np.full((70, 90, 3), 60 * ci, np.uint8)
            im += rng.integers(0, 20, im.shape, dtype=np.uint8)
            Image.fromarray(im).save(d / f"{i}.jpg")
    return str(root)


def test_image_folder_cls_dataset(cls_root):
    from floodseg_tpu.segm.data import ImageFolderClsDataset

    ds = ImageFolderClsDataset(cls_root, image_size=32, crop_size=32,
                               split="val")
    assert len(ds) == 12 and ds.n_cls == 3
    assert ds.classes == ["apple", "boat", "cat"]
    rng = np.random.default_rng(0)
    s = ds.get(0, rng)
    assert s["im"].shape == (32, 32, 3) and s["im"].dtype == np.float32
    assert int(s["target"]) == 0
    assert int(ds.get(11, rng)["target"]) == 2
    # train split: random-resized crop still yields the fixed crop size
    ds_t = ImageFolderClsDataset(cls_root, image_size=32, crop_size=32,
                                 split="train")
    assert ds_t.get(5, rng)["im"].shape == (32, 32, 3)


def test_segm_accuracy_cli(cls_root, capsys):
    """scripts/segm_accuracy.py end-to-end (reference segm/eval/accuracy.py
    surface): folder -> ViT classifier -> top-1/top-5 report."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "segm_accuracy", os.path.join(os.path.dirname(__file__), "..",
                                      "scripts", "segm_accuracy.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main(["--data-dir", cls_root, "--n-cls", "3",
                   "--image-size", "32", "--patch-size", "16",
                   "--d-model", "64", "--n-layers", "1",
                   "-bs", "4", "-nw", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "top1" in out and "top3" in out  # top-k clamps to n_cls=3


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    """Tiny fabricated VOC2010 PascalContext layout."""
    root = tmp_path_factory.mktemp("voc")
    voc = root / "VOCdevkit" / "VOC2010"
    (voc / "JPEGImages").mkdir(parents=True)
    (voc / "SegmentationClassContext").mkdir()
    splits = voc / "ImageSets" / "SegmentationContext"
    splits.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for stem in ["2008_000001", "2008_000002", "2008_000003"]:
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
                        ).save(voc / "JPEGImages" / f"{stem}.jpg")
        Image.fromarray(rng.integers(0, 60, (40, 40), dtype=np.uint8)
                        ).save(voc / "SegmentationClassContext" / f"{stem}.png")
    (splits / "train.txt").write_text("2008_000001\n2008_000002\n")
    (splits / "val.txt").write_text("2008_000003\n")
    return str(root)


def test_pascal_context_layout(voc_root):
    """pascal_context_dataset over the VOC2010 layout
    (reference segm/data/pascal_context.py): split files select stems; the
    test split raises exactly like the reference."""
    from floodseg_tpu.segm.data import pascal_context_dataset
    tmp_path = voc_root

    tr = pascal_context_dataset(str(tmp_path), "train")
    va = pascal_context_dataset(str(tmp_path), "val")
    assert len(tr) == 2 and len(va) == 1
    assert tr.n_cls == 60 and tr.ignore_label == 255
    s = tr.get(0, np.random.default_rng(0))
    assert s["frame_current"].shape == (40, 40, 3)
    assert s["label"].shape == (40, 40)
    with pytest.raises(ValueError):
        pascal_context_dataset(str(tmp_path), "test")


def test_plot_logs_cli(tmp_path, capsys):
    """scripts/segm_plot_logs.py (reference segm/utils/logs.py surface):
    JSONL run logs -> latest-value report + saved figure."""
    import importlib.util
    import json as _json
    for run, mious in (("a", [0.1, 0.3]), ("b", [0.2, 0.25])):
        d = tmp_path / run
        d.mkdir()
        with open(d / "log.txt", "w") as f:
            for ep, m in enumerate(mious):
                f.write(_json.dumps({"epoch": ep, "train_loss": 1.0 - m,
                                     "val_mean_iou": m}) + "\n")
    spec = importlib.util.spec_from_file_location(
        "segm_plot_logs", os.path.join(os.path.dirname(__file__), "..",
                                       "scripts", "segm_plot_logs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out_png = tmp_path / "plot.png"
    rc = mod.main([str(tmp_path / "a"), str(tmp_path / "b"),
                   "-o", str(out_png)])
    assert rc == 0
    assert out_png.exists() and out_png.stat().st_size > 0
    printed = capsys.readouterr().out
    assert "val_mean_iou: 0.3000" in printed
    # config-file mode with a missing log is skipped with a notice
    cfg = tmp_path / "plots.yaml"
    cfg.write_text("root: %s\nlogs: {a: a/log.txt, ghost: nope/log.txt}\n"
                   % tmp_path)
    rc = mod.main(["--config", str(cfg), "--no-plot"])
    assert rc == 0
    assert "Skipping ghost" in capsys.readouterr().out


@pytest.mark.slow
def test_segm_train_cli_pascal_context(voc_root, tmp_path):
    """--pascal-context selects the VOC2010 dataset by name (n_cls defaults
    to 60), trains and evaluates end-to-end."""
    from floodseg_tpu.segm.train import main

    argv = [
        "--log-dir", str(tmp_path / "logs_pc"),
        "--pascal-context", voc_root,
        "--im-size", "32", "--crop-size", "32",
        "--window-size", "32", "--window-stride", "16",
        "--patch-size", "16", "--d-model", "64", "--n-layers", "1",
        "--dec-layers", "1", "--batch-size", "2", "--epochs", "1",
        "--num-devices", "1", "--workers", "2",
    ]
    assert main(argv) == 0
    assert "last" in os.listdir(tmp_path / "logs_pc" / "checkpoints")


@pytest.mark.slow
def test_segm_train_cli_linear_decoder(tmp_path, seg_root):
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


# ---------------------------------------------------------------------------
# mmseg metric-protocol golden tests (reference segm/metrics.py:84-123 wraps
# mmseg.core.mean_iou then np.nanmean: absent classes are EXCLUDED from the
# class means, unlike the flood protocol which averages them in as 0)
# ---------------------------------------------------------------------------

def _mmseg_mean_iou_oracle(preds, gts, num_classes, ignore_index=255):
    """Tiny numpy re-statement of mmseg.core.mean_iou semantics: accumulate
    intersect/union/label histograms over the whole dataset, divide with
    0/0 -> NaN, and nanmean over classes."""
    inter = np.zeros(num_classes)
    union = np.zeros(num_classes)
    label = np.zeros(num_classes)
    for p, g in zip(preds, gts):
        p, g = p.reshape(-1), g.reshape(-1)
        valid = g != ignore_index
        p, g = p[valid], g[valid]
        for c in range(num_classes):
            i = np.sum((p == c) & (g == c))
            inter[c] += i
            union[c] += np.sum(p == c) + np.sum(g == c) - i
            label[c] += np.sum(g == c)
    with np.errstate(invalid="ignore", divide="ignore"):
        iou = inter / union
        acc = inter / label
    return {
        "miou": float(np.nanmean(iou)),
        "macc": float(np.nanmean(acc)),
        "allacc": float(inter.sum() / label.sum()),
        "iou_class": iou,
    }


def test_summary_mmseg_matches_oracle_and_diverges_from_flood():
    """Protocol pin: MetricMeter.summary_mmseg == the mmseg nanmean oracle
    on random predictions with an absent class + ignore pixels, and the
    flood-protocol summary() differs exactly by the absent-class dilution."""
    from floodseg_tpu.ops.metrics import MetricMeter, intersection_and_union

    rng = np.random.default_rng(7)
    n_cls = 6  # classes 4,5 never appear in pred or gt -> union 0
    meter = MetricMeter(n_cls)
    preds, gts = [], []
    for _ in range(3):
        pred = rng.integers(0, 4, (17, 23)).astype(np.int32)
        gt = rng.integers(0, 4, (17, 23)).astype(np.int32)
        gt[rng.random((17, 23)) < 0.1] = 255
        preds.append(pred), gts.append(gt)
        i, u, t = intersection_and_union(jnp.asarray(pred), jnp.asarray(gt),
                                         n_cls, 255)
        meter.update(i, u, t)

    oracle = _mmseg_mean_iou_oracle(preds, gts, n_cls)
    s = meter.summary_mmseg()
    assert s["miou"] == pytest.approx(oracle["miou"], abs=1e-12)
    assert s["macc"] == pytest.approx(oracle["macc"], abs=1e-12)
    assert s["allacc"] == pytest.approx(oracle["allacc"], abs=1e-12)
    # absent classes reported NaN per class, excluded from the mean
    assert np.isnan(s["iou_class"][4]) and np.isnan(s["iou_class"][5])
    # the flood protocol (foundation.py:135-172) averages absent classes
    # in as 0: same sums, different mean -- exactly a 4/6 dilution here
    flood = meter.summary()
    assert flood["miou"] == pytest.approx(s["miou"] * 4 / 6, rel=1e-9)


def test_segm_eval_protocol_golden(tmp_path):
    """End-to-end eval-protocol golden: SegFolderDataset + build_eval_pipeline
    (short-side image resize, label kept at ori resolution) + sliding windows
    + ori-shape scoring, against a hand-computed mIoU.

    The 'model' ignores its input and always predicts class 1, so the
    prediction survives every resize exactly and the metric is computable by
    hand from the label histogram alone:
      IoU_1 = n1 / n_valid, IoU_{0,2,3} = 0, class 4 absent -> NaN-excluded
      mIoU  = (n1 / n_valid) / 4, mAcc = 1/4, allAcc = n1 / n_valid
    Pins the protocol of reference segm/eval/miou.py + segm/metrics.py.
    """
    from floodseg_tpu.segm.data import SegFolderDataset, build_eval_pipeline
    from floodseg_tpu.segm.inference import evaluate_dataset

    img_dir, ann_dir = tmp_path / "img", tmp_path / "ann"
    img_dir.mkdir(), ann_dir.mkdir()
    rng = np.random.default_rng(3)
    n1 = nv = 0
    for i in range(2):
        # non-square, differing ori sizes: exercises the short-side resize
        # (image -> 32-short-side) and the prob resize back to ori_shape
        h, w = (40, 72) if i == 0 else (56, 44)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        lab = rng.integers(0, 4, (h, w)).astype(np.uint8)  # class 4 absent
        lab[rng.random((h, w)) < 0.05] = 255
        Image.fromarray(img).save(img_dir / f"f{i}.jpg")
        Image.fromarray(lab).save(ann_dir / f"f{i}.png")
        n1 += int(np.sum(lab == 1))
        nv += int(np.sum(lab != 255))

    ds = SegFolderDataset(str(img_dir), str(ann_dir),
                          transform=build_eval_pipeline(32))
    # label must be untouched by the eval pipeline (ori resolution)
    s0 = ds.get(0, np.random.default_rng(0))
    assert s0["label"].shape == (40, 72)
    assert s0["frame_current"].shape[0] == 32  # short side resized

    def fwd(variables, crops):
        logits = jnp.zeros(crops.shape[:3] + (5,))
        return logits.at[..., 1].set(5.0)

    summ = evaluate_dataset(fwd, None, ds, num_classes=5,
                            window_size=32, window_stride=16)
    assert summ["miou"] == pytest.approx((n1 / nv) / 4, abs=1e-9)
    assert summ["macc"] == pytest.approx(1 / 4, abs=1e-9)
    assert summ["allacc"] == pytest.approx(n1 / nv, abs=1e-9)
    assert np.isnan(summ["iou_class"][4])


def test_segm_inference_cli_ann_dir(tmp_path, capsys):
    """Drive scripts/segm_inference.py end-to-end with --ann-dir: writes one
    blended segmentation per image and reports mmseg-protocol metrics
    (absent classes print as None, means exclude them)."""
    import importlib

    mod = importlib.import_module("scripts.segm_inference")
    img_dir, ann_dir, out_dir = tmp_path / "i", tmp_path / "a", tmp_path / "o"
    img_dir.mkdir(), ann_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
                        ).save(img_dir / f"x{i}.jpg")
        Image.fromarray(rng.integers(0, 3, (40, 56)).astype(np.uint8)
                        ).save(ann_dir / f"x{i}.png")
    rc = mod.main([
        "--ckpt", "-", "-i", str(img_dir), "-o", str(out_dir),
        "--n-cls", "5", "--image-size", "32", "--patch-size", "8",
        "--d-model", "64", "--n-layers", "1", "--dec-layers", "1",
        "--ann-dir", str(ann_dir),
    ])
    assert rc == 0
    assert sorted(os.listdir(out_dir)) == ["x0.jpg", "x1.jpg"]
    out = capsys.readouterr().out
    assert "mean_iou" in out and "(2/2 images)" in out


# ---------------------------------------------------------------------------
# mmseg pipeline-op semantics (reference segm/data/base.py configures mmcv's
# Resize/RandomCrop/PhotoMetricDistortion/Pad; the ops here restate those
# semantics natively and these tests pin them)
# ---------------------------------------------------------------------------

def test_ratio_range_resize_keep_ratio_semantics():
    """mmcv.imrescale sizing: factor = min(max_scale/long, min_scale/short),
    rounded as int(dim*f + 0.5); label resized nearest alongside."""
    from floodseg_tpu.segm.pipeline import RatioRangeResize

    op = RatioRangeResize((2048, 512), ratio_range=(1.0, 1.0))  # fixed ratio
    im = np.zeros((400, 600, 3), np.float32)
    lab = np.arange(400 * 600).reshape(400, 600).astype(np.int32) % 7
    s = op({"frame_current": im, "label": lab}, np.random.default_rng(0))
    # factor = min(2048/600, 512/400) = 1.28 -> (512, 768)
    assert s["frame_current"].shape == (512, 768, 3)
    assert s["label"].shape == (512, 768)
    # long-edge-capped case: very wide image
    im = np.zeros((100, 5000, 3), np.float32)
    s = op({"frame_current": im}, np.random.default_rng(0))
    # factor = min(2048/5000, 512/100) = 0.4096 -> (41, 2048)
    assert s["frame_current"].shape == (41, 2048, 3)


def test_ratio_range_resize_draws_ratio():
    from floodseg_tpu.segm.pipeline import RatioRangeResize

    op = RatioRangeResize((512, 512), ratio_range=(0.5, 2.0))
    im = np.zeros((512, 512, 3), np.float32)
    sizes = {op({"frame_current": im.copy()},
                np.random.default_rng(i))["frame_current"].shape[0]
             for i in range(12)}
    assert len(sizes) > 4  # ratio actually varies
    assert all(254 <= h <= 1024 for h in sizes)  # int(512*r) bounds


def test_random_crop_cat_max_ratio():
    """A label that is 90% class 0 except one diverse corner: with
    cat_max_ratio=0.75 the accepted crop must be the diverse one whenever
    one exists within 10 draws; crops never exceed the image."""
    from floodseg_tpu.segm.pipeline import RandomCropCatMax

    lab = np.zeros((64, 64), np.int32)
    lab[:32, :32] = np.arange(32 * 32).reshape(32, 32) % 4  # diverse quadrant
    im = np.zeros((64, 64, 3), np.float32)
    op = RandomCropCatMax((32, 32), cat_max_ratio=0.75)
    hits = 0
    for seed in range(20):
        s = op({"frame_current": im.copy(), "label": lab.copy()},
               np.random.default_rng(seed))
        assert s["label"].shape == (32, 32)
        cls, cnt = np.unique(s["label"], return_counts=True)
        if cnt.max() / cnt.sum() < 0.75:
            hits += 1
    assert hits >= 15  # the retry loop steers towards diverse crops

    # smaller-than-crop image: offsets clamp to 0, crop = whole image
    s = op({"frame_current": np.zeros((16, 16, 3), np.float32),
            "label": np.zeros((16, 16), np.int32)},
           np.random.default_rng(0))
    assert s["label"].shape == (16, 16)


def test_photometric_distortion_bounds_and_identity():
    from floodseg_tpu.segm.pipeline import PhotoMetricDistortion

    im = np.random.default_rng(0).uniform(0, 255, (40, 40, 3)).astype(
        np.float32)
    op = PhotoMetricDistortion()
    outs = []
    for seed in range(16):
        out = op({"frame_current": im.copy()},
                 np.random.default_rng(seed))["frame_current"]
        assert out.dtype == np.float32
        assert out.min() >= 0 and out.max() <= 255
        assert out.shape == im.shape
        outs.append(out)
    # distortions vary across seeds and some seed draws all-skip coins
    # (probability (1/2)^5 per seed; just require variation)
    assert any(not np.allclose(outs[0], o) for o in outs[1:])
    # label untouched
    s = op({"frame_current": im.copy(), "label": np.ones((40, 40))},
           np.random.default_rng(1))
    assert np.all(s["label"] == 1)


def test_pad_to_size_values():
    from floodseg_tpu.segm.pipeline import PadToSize

    op = PadToSize((32, 32), pad_val=0, seg_pad_val=255)
    s = op({"frame_current": np.ones((20, 24, 3), np.float32),
            "label": np.ones((20, 24), np.int32)},
           np.random.default_rng(0))
    assert s["frame_current"].shape == (32, 32, 3)
    assert s["label"].shape == (32, 32)
    assert np.all(s["frame_current"][20:] == 0)
    assert np.all(s["label"][20:] == 255)
    assert np.all(s["label"][:20, 24:] == 255)
    # no-op on larger inputs
    big = np.ones((40, 40, 3), np.float32)
    assert op({"frame_current": big}, np.random.default_rng(0))[
        "frame_current"].shape == (40, 40, 3)


def test_mmseg_train_pipeline_end_to_end():
    """Composed pipeline yields a crop-sized normalized image + label with
    ignore padding where the scaled image undershoots the crop."""
    from floodseg_tpu.segm.pipeline import build_mmseg_train_pipeline

    tf = build_mmseg_train_pipeline(image_size=64, crop_size=64, max_ratio=2,
                                    normalization="vit")
    rng = np.random.default_rng(0)
    im = rng.uniform(0, 255, (48, 80, 3)).astype(np.float32)
    lab = rng.integers(0, 5, (48, 80)).astype(np.int32)
    for seed in range(6):
        s = tf({"frame_current": im.copy(), "label": lab.copy()},
               np.random.default_rng(seed))
        assert s["frame_current"].shape == (64, 64, 3)
        assert s["label"].shape == (64, 64)
        vals = np.unique(s["label"])
        assert set(vals.tolist()) <= set(range(5)) | {255}


def test_segm_dataset_presets(tmp_path):
    """segm_dataset wires layout + metadata per preset: ADE20k's
    reduce_zero_label folder layout and Cityscapes' recursive per-city
    suffix convention both resolve; n_cls/palette metadata attached."""
    from floodseg_tpu.segm.data import segm_dataset

    rng = np.random.default_rng(0)
    # ADE20k layout
    ade = tmp_path / "ade"
    for sub in ("training", "validation"):
        (ade / "images" / sub).mkdir(parents=True)
        (ade / "annotations" / sub).mkdir(parents=True)
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
                            ).save(ade / "images" / sub / f"x{i}.jpg")
            Image.fromarray(rng.integers(0, 10, (40, 56)).astype(np.uint8)
                            ).save(ade / "annotations" / sub / f"x{i}.png")
    ds = segm_dataset("ade20k", str(ade), "train", image_size=32,
                      crop_size=32)
    assert ds.n_cls == 150 and len(ds.palette) == 150 and len(ds) == 2
    s = ds.get(0, rng)
    assert s["frame_current"].shape == (32, 32, 3)
    # reduce_zero_label: raw 0 -> 255, raw k -> k-1
    assert set(np.unique(s["label"]).tolist()) <= set(range(9)) | {255}
    val = segm_dataset("ade20k", str(ade), "val", image_size=32)
    sv = val.get(0, rng)
    assert sv["label"].shape == (40, 56)  # ori resolution for eval

    # Cityscapes layout (nested city dirs, trainId labels)
    cs = tmp_path / "cs"
    for city in ("aaa", "bbb"):
        (cs / "leftImg8bit" / "train" / city).mkdir(parents=True)
        (cs / "gtFine" / "train" / city).mkdir(parents=True)
        Image.fromarray(rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
                        ).save(cs / "leftImg8bit" / "train" / city /
                               f"{city}_000000_leftImg8bit.png")
        Image.fromarray(rng.integers(0, 19, (40, 56)).astype(np.uint8)
                        ).save(cs / "gtFine" / "train" / city /
                               f"{city}_000000_gtFine_labelTrainIds.png")
    ds = segm_dataset("cityscapes", str(cs), "train", image_size=32,
                      crop_size=32)
    assert ds.n_cls == 19 and len(ds) == 2 and ds.max_ratio == 2
    s = ds.get(1, rng)
    assert s["frame_current"].shape == (32, 32, 3)


@pytest.mark.slow
def test_segm_train_cli_dataset_preset(tmp_path):
    """--dataset ade20k --data-root drives the full mmseg pipeline through
    the trainer (ratio-range resize, cat-max crop, photometric, pad) and the
    ori-shape eval, resolving n_cls from the preset."""
    from floodseg_tpu.segm.train import main

    rng = np.random.default_rng(0)
    ade = tmp_path / "ade"
    for sub in ("training", "validation"):
        (ade / "images" / sub).mkdir(parents=True)
        (ade / "annotations" / sub).mkdir(parents=True)
        for i in range(4 if sub == "training" else 2):
            Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
                            ).save(ade / "images" / sub / f"x{i}.jpg")
            Image.fromarray(rng.integers(0, 10, (48, 64)).astype(np.uint8)
                            ).save(ade / "annotations" / sub / f"x{i}.png")
    argv = [
        "--log-dir", str(tmp_path / "logs"),
        "--dataset", "ade20k", "--data-root", str(ade),
        "--im-size", "32", "--crop-size", "32",
        "--window-size", "32", "--window-stride", "16",
        "--patch-size", "16", "--d-model", "64", "--n-layers", "1",
        "--dec-layers", "1", "--batch-size", "2", "--epochs", "1",
        "--num-devices", "1", "--workers", "2",
    ]
    assert main(argv) == 0
    assert "last" in os.listdir(tmp_path / "logs" / "checkpoints")

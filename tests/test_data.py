"""Data pipeline tests: synthetic dataset tree -> datasets -> loader batches,
plus transform parity spot-checks against the reference pipeline."""

import sys

import numpy as np
import pytest

from floodseg_tpu.data import (
    SemDataset, FlowDataset, DataLoader, parse_list,
    build_train_transform, build_val_transform, build_test_transform,
)
from floodseg_tpu.data.synthetic import generate_synthetic_dataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return generate_synthetic_dataset(str(root), num_frames=40, frame_delta=5,
                                      size=(96, 128), num_labeled=6)


def test_parse_list(synth_root):
    items = parse_list(f"{synth_root}/list/all/train.txt")
    assert len(items) >= 1
    label, vid, fid = items[0]
    assert label.startswith("masks/") and vid == "synth" and isinstance(fid, int)


def test_sem_dataset_and_loader(synth_root):
    tf = build_train_transform(33, 33, resize=(96, 128), scale_min=0.8, scale_max=1.2)
    ds = SemDataset("train", synth_root, f"{synth_root}/list/all/train.txt", tf)
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=1)
    batch = next(iter(loader))
    assert batch["frame_current"].shape == (2, 33, 33, 3)
    assert batch["label"].shape == (2, 33, 33)
    assert batch["frame_current"].dtype == np.float32
    labels = batch["label"]
    assert ((labels >= 0) & (labels < 5) | (labels == 255)).all()


def test_loader_determinism(synth_root):
    tf = build_train_transform(33, 33, resize=(96, 128))
    ds = SemDataset("train", synth_root, f"{synth_root}/list/all/train.txt", tf)
    b1 = next(iter(DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=7)))
    b2 = next(iter(DataLoader(ds, batch_size=2, shuffle=True, num_workers=4, seed=7)))
    np.testing.assert_array_equal(b1["frame_current"], b2["frame_current"])
    np.testing.assert_array_equal(b1["label"], b2["label"])


def test_flow_dataset_train(synth_root):
    delta = 5
    tf = build_train_transform(33, 33, resize=(96, 128), with_rotate=False,
                               scale_min=0.8, scale_max=1.2)
    ds = FlowDataset("train", synth_root, f"{synth_root}/list/all/train.txt",
                     type="l", transform=tf, frame_delta=delta)
    rng = np.random.default_rng(0)
    s = ds.get(0, rng)
    assert s["frame_prev"].shape == (33, 33, 3)
    assert s["frame_next"].shape == (33, 33, 3)
    assert len(s["mvs_left"]) == delta - 1 and len(s["mvs_right"]) == delta - 1
    # grids cropped to crop//16 blocks
    assert s["mvs_left"][0].shape == (33 // 16, 33 // 16, 2)
    assert 1 <= s["left_index"] < delta
    assert s["left_index"] + s["right_index"] == delta


def test_flow_dataset_predict_and_collate(synth_root):
    from floodseg_tpu.data.dataset import collate
    delta = 5
    tf = build_test_transform(resize=(96, 128), normalize=True)
    ds = FlowDataset("predict", synth_root, type="u", transform=tf,
                     frame_delta=delta, predict_v_id="synth")
    assert len(ds) == 40 // delta
    rng = np.random.default_rng(0)
    items = [ds.get(i, rng) for i in range(2)]
    assert items[0]["frame_id"] == 0 and items[1]["frame_id"] == delta
    batch = collate(items)
    assert batch["frame_prev"].shape == (2, 96, 128, 3)
    assert batch["mvs_left"].shape == (delta - 1, 2, 96 // 16, 128 // 16, 2)


def test_val_frame_delta_is_index_seeded(synth_root):
    ds = FlowDataset("val", synth_root, f"{synth_root}/list/all/val.txt",
                     type="l", frame_delta=5)
    a = ds.get(0, np.random.default_rng(1))
    b = ds.get(0, np.random.default_rng(99))
    assert a["left_index"] == b["left_index"]


def test_transform_pipeline_matches_reference_statistically():
    """Drive the reference single-frame pipeline and ours with the same input
    and no randomness (deterministic subset) and compare outputs."""
    sys.path.insert(0, "/root/reference")
    import collections
    import collections.abc
    collections.Iterable = collections.abc.Iterable  # py>=3.10 shim for the reference
    import util.transform as ref_t

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(96, 128, 3)).astype(np.uint8)
    lab = rng.integers(0, 6, size=(96, 128)).astype(np.uint8)

    from floodseg_tpu.data.transforms import MEAN, STD, Compose, IgnoreClasses, Resize, Crop, Normalize

    ref_pipeline = ref_t.Compose([
        ref_t.IgnoreClasses([5]),
        ref_t.Resize((64, 96)),
        ref_t.Crop([33, 33], crop_type="center", padding=MEAN, ignore_label=255),
        ref_t.ToTensor(),
        ref_t.Normalize(mean=MEAN, std=STD),
    ])
    ref_img, ref_lab = ref_pipeline(img.astype(np.float32), lab.copy())
    ref_img = ref_img.numpy().transpose(1, 2, 0)

    ours = Compose([
        IgnoreClasses([5]),
        Resize((64, 96)),
        Crop([33, 33], crop_type="center", padding=MEAN, ignore_label=255),
        Normalize(),
    ])({"frame_current": img.astype(np.float32), "label": lab.copy()},
       np.random.default_rng(0))

    np.testing.assert_allclose(ours["frame_current"], ref_img, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(ours["label"], ref_lab.numpy())

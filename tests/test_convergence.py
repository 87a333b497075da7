"""Convergence regression gate.

The reference has no unit tests; its quality control is empirical — held-out
video mIoU (SURVEY §4). This is the hermetic equivalent: a short supervised
fit on the synthetic dataset must reach a val mIoU floor, catching
optimizer/BN/loss/transform regressions that shape-level tests cannot.

Calibration: round 2 (CPU f32) best val mIoU 0.507, test-on-best 0.493;
round 3 (after the poly-LR off-by-one fix re-rolled the trajectory) best
val 0.475, test-on-best 0.332 — these tiny fits (3-image val split) bounce
with any legitimate numeric change, so gates sit well below the healthy
band but far above the ~0.12 collapse level. On the real v5e the same fit
reached best val 0.487 this round (bf16-matmul regime; see the tpu-marked
gate below).
"""

import os

import pytest
import yaml

from floodseg_tpu.data.synthetic import generate_synthetic_dataset


@pytest.mark.slow
def test_supervised_fit_converges(tmp_path):
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner

    root = generate_synthetic_dataset(
        str(tmp_path / "data"), num_frames=30, frame_delta=5,
        size=(96, 128), num_labeled=20)
    cfg = {
        "method": "supervised",
        "trainer": {"max_epochs": 30, "seed": 1,
                    "log_dir": str(tmp_path / "logs"), "run_name": "conv",
                    "num_devices": 1, "early_stopping_patience": 1000},
        "model": {"arch": "pspnet", "layers": 50, "classes": 5,
                  "test_base_size": 128, "optim": {"lr": 0.01},
                  "loss": {"min_kept": 200}, "pretrained": False,
                  "save_video": False, "save_images": False},
        "data": {"data_root": root, "data_variant": "all", "batch_size": 4,
                 "train_w": 65, "workers": 2, "resize_h": 96, "resize_w": 128,
                 "scale_min": 0.8, "scale_max": 1.2, "frame_delta": 5,
                 "predict_v_id": "synth"},
    }
    path = tmp_path / "conv.yaml"
    path.write_text(yaml.dump(cfg))

    runner = Runner(load_config([str(path)], {}))
    state = runner.fit()
    best = runner.logger.summary.get("best_val_miou", 0.0)
    assert best >= 0.40, (
        f"supervised fit failed to converge: best val mIoU {best:.3f} < 0.40 "
        f"(calibrated healthy value ~0.51)")

    # after-fit evaluation on the BEST checkpoint must hold the level too.
    # Gate 0.30: best-checkpoint selection runs over the tiny synthetic val
    # split, so test-on-best bounces with the trajectory re-roll of any
    # legitimate numeric change (observed 0.33-0.49 across round-2/3
    # calibrations; collapse level ~0.12)
    state = runner.restore_best(state)
    results = runner.test(state)
    assert results["test_miou1_epoch"] >= 0.30, results["test_miou1_epoch"]


@pytest.mark.tpu
@pytest.mark.slow
def test_supervised_fit_converges_tpu(tmp_path):
    """TPU-regime convergence gate: the SAME fit as the CPU gate, run on the
    real chip where matmuls default to bf16 passes. Calibration (round 2/3,
    v5e): best val mIoU ~0.41 vs ~0.51 on CPU f32 — the 0.40 CPU gate would
    be borderline on hardware, so this gate sits at 0.30: far above the
    ~0.12 collapse level, below the measured healthy 0.41. Run with
    FLOODSEG_TEST_TPU=1 (the conftest otherwise forces the CPU mesh)."""
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs the real TPU chip (FLOODSEG_TEST_TPU=1)")

    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner

    root = generate_synthetic_dataset(
        str(tmp_path / "data"), num_frames=30, frame_delta=5,
        size=(96, 128), num_labeled=20)
    cfg = {
        "method": "supervised",
        "trainer": {"max_epochs": 30, "seed": 1,
                    "log_dir": str(tmp_path / "logs"), "run_name": "convtpu",
                    "num_devices": 1, "early_stopping_patience": 1000},
        "model": {"arch": "pspnet", "layers": 50, "classes": 5,
                  "test_base_size": 128, "optim": {"lr": 0.01},
                  "loss": {"min_kept": 200}, "pretrained": False,
                  "save_video": False, "save_images": False},
        "data": {"data_root": root, "data_variant": "all", "batch_size": 4,
                 "train_w": 65, "workers": 2, "resize_h": 96, "resize_w": 128,
                 "scale_min": 0.8, "scale_max": 1.2, "frame_delta": 5,
                 "predict_v_id": "synth"},
    }
    path = tmp_path / "convtpu.yaml"
    path.write_text(yaml.dump(cfg))

    runner = Runner(load_config([str(path)], {}))
    runner.fit()
    best = runner.logger.summary.get("best_val_miou", 0.0)
    assert best >= 0.30, (
        f"TPU supervised fit failed to converge: best val mIoU {best:.3f} "
        f"< 0.30 (calibrated healthy value ~0.41 in the bf16-matmul regime)")


@pytest.mark.slow
def test_flow_supervised_fit_converges(tmp_path):
    """Flow-interpolation training gate. Calibration (round 2, CPU): loss
    5.06 -> ~1.0 and whole-frame interp val mIoU plateaus at 0.15-0.16 by
    epoch ~12 (collapse level: 0.01-0.08 in the first epochs). 0.12 cleanly
    separates a working warp/interp training path from a broken one."""
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner

    root = generate_synthetic_dataset(
        str(tmp_path / "data"), num_frames=30, frame_delta=5,
        size=(96, 128), num_labeled=20)
    cfg = {
        "method": "flow_supervised",
        "trainer": {"max_epochs": 30, "seed": 1,
                    "log_dir": str(tmp_path / "logs"), "run_name": "convf",
                    "num_devices": 1, "early_stopping_patience": 1000},
        "model": {"arch": "pspnet", "layers": 50, "classes": 5,
                  "test_base_size": 128, "optim": {"lr": 0.01},
                  "loss": {"min_kept": 200}, "pretrained": False,
                  "save_video": False, "save_images": False},
        "data": {"data_root": root, "data_variant": "all", "batch_size": 4,
                 "train_w": 65, "workers": 2, "resize_h": 96, "resize_w": 128,
                 "scale_min": 0.8, "scale_max": 1.2, "frame_delta": 5,
                 "predict_v_id": "synth"},
    }
    path = tmp_path / "convf.yaml"
    path.write_text(yaml.dump(cfg))

    runner = Runner(load_config([str(path)], {}))
    runner.fit()
    best = runner.logger.summary.get("best_val_miou", 0.0)
    assert best >= 0.12, (
        f"flow_supervised fit failed to converge: best val mIoU {best:.3f} "
        f"< 0.12 (calibrated healthy plateau ~0.16)")

"""End-to-end CLI tests: fit/test/predict through the real entry point on a
synthetic dataset tree (the reference's CPU-runnable mini path)."""

import json
import os

import numpy as np
import pytest
import yaml

from floodseg_tpu.data.synthetic import generate_synthetic_dataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthcli")
    return generate_synthetic_dataset(str(root), num_frames=30, frame_delta=5,
                                      size=(96, 128), num_labeled=6)


def _mini_config(tmp_path, synth_root, method):
    cfg = {
        "method": method,
        "trainer": {"max_epochs": 2, "seed": 1, "log_dir": str(tmp_path / "logs"),
                    "run_name": f"t_{method}", "limit_train_batches": 2,
                    "limit_val_batches": 2, "limit_test_batches": 1,
                    "save_top_k": 2},
        "model": {"arch": "pspnet", "layers": 50, "classes": 5,
                  "test_base_size": 128,
                  "optim": {"lr": 0.0005},
                  "loss": {"min_kept": 200},
                  "sup_only_epoch": 1,
                  "contrastive": {"num_queries": 16, "num_negatives": 4,
                                  "max_enqueue": 32, "bank_capacity": 256,
                                  "bank_class0_capacity": 512},
                  "semisupervised": method in ("gan", "contrastive", "flow_gan"),
                  "save_video": False, "save_images": False,
                  "pretrained": False},
        "data": {"data_root": synth_root, "data_variant": "all",
                 "batch_size": 2, "train_w": 33, "workers": 2,
                 "resize_h": 96, "resize_w": 128,
                 "scale_min": 0.9, "scale_max": 1.1,
                 "frame_delta": 5, "predict_v_id": "synth"},
    }
    p = tmp_path / f"{method}.yaml"
    p.write_text(yaml.dump(cfg))
    return str(p)


def _run(argv):
    from floodseg_tpu.cli.main import main
    return main(argv)


def test_config_links(tmp_path, synth_root):
    from floodseg_tpu.core.config import load_config
    path = _mini_config(tmp_path, synth_root, "supervised")
    cfg = load_config([path], {"model.arch": "vit", "data.train_w": "100"})
    assert cfg.model.arch == "vit"
    assert cfg.data.train_h == cfg.data.train_w == 96  # vit rounds to 32
    assert cfg.model.test_h == 96
    cfg2 = load_config([path], {"data.train_w": "100"})
    assert cfg2.data.train_h == 97  # pspnet rounds to 8k+1


@pytest.mark.slow
def test_fit_supervised_cli(tmp_path, synth_root):
    path = _mini_config(tmp_path, synth_root, "supervised")
    assert _run(["fit", "--config", path]) == 0
    log_dir = tmp_path / "logs" / "t_supervised"
    metrics = json.loads((log_dir / "metrics.json").read_text())
    assert "test_miou1_epoch" in metrics
    assert 0.0 <= metrics["test_miou1_epoch"] <= 1.0
    # top-k checkpoints + last exist
    ckpts = os.listdir(log_dir / "checkpoints")
    assert "last" in ckpts and any(c.startswith("epoch=") for c in ckpts)


@pytest.mark.slow
def test_fit_flow_supervised_cli_with_predict(tmp_path, synth_root):
    path = _mini_config(tmp_path, synth_root, "flow_supervised")
    assert _run(["fit", "--config", path]) == 0
    log_dir = tmp_path / "logs" / "t_flow_supervised"
    metrics = json.loads((log_dir / "metrics.json").read_text())
    assert "predict_miou1_epoch" in metrics
    assert metrics["frames"] > 0


@pytest.mark.slow
def test_test_subcommand_restores_checkpoint(tmp_path, synth_root):
    path = _mini_config(tmp_path, synth_root, "supervised")
    # reuse the checkpoint from an earlier fit if present, else fit quickly
    log_dir = tmp_path / "logs" / "t_supervised"
    if not (log_dir / "checkpoints" / "last").exists():
        _run(["fit", "--config", path])
    rc = _run(["test", "--config", path,
               "--ckpt_path", str(log_dir / "checkpoints" / "last")])
    assert rc == 0


@pytest.mark.slow
def test_fit_contrastive_cli(tmp_path, synth_root):
    path = _mini_config(tmp_path, synth_root, "contrastive")
    assert _run(["fit", "--config", path]) == 0
    metrics = json.loads(
        (tmp_path / "logs" / "t_contrastive" / "metrics.json").read_text())
    assert "test_miou1_epoch" in metrics


@pytest.mark.slow
def test_fit_gan_cli(tmp_path, synth_root):
    path = _mini_config(tmp_path, synth_root, "gan")
    assert _run(["fit", "--config", path]) == 0
    metrics = json.loads(
        (tmp_path / "logs" / "t_gan" / "metrics.json").read_text())
    assert "test_miou1_epoch" in metrics


@pytest.mark.slow
def test_fit_flow_gan_cli(tmp_path, synth_root):
    path = _mini_config(tmp_path, synth_root, "flow_gan")
    assert _run(["fit", "--config", path]) == 0
    metrics = json.loads(
        (tmp_path / "logs" / "t_flow_gan" / "metrics.json").read_text())
    assert "test_miou1_epoch" in metrics
    assert "predict_miou1_epoch" in metrics


@pytest.mark.slow
def test_fit_vit_cli(tmp_path, synth_root):
    path = _mini_config(tmp_path, synth_root, "supervised")
    assert _run(["fit", "--config", path, "--model.arch", "vit",
                 "--trainer.run_name", "t_vit"]) == 0
    metrics = json.loads(
        (tmp_path / "logs" / "t_vit" / "metrics.json").read_text())
    assert "test_miou1_epoch" in metrics


def test_unlabeled_fallback_splits_train(tmp_path, synth_root):
    """Without train_u.txt, the unlabeled stream is split off the labeled
    train list by data_ratio (reference foundation.py:446-462)."""
    import shutil
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner

    root2 = tmp_path / "nounlabeled"
    shutil.copytree(synth_root, root2)
    os.remove(root2 / "list" / "all" / "train_u.txt")

    path = _mini_config(tmp_path, str(root2), "supervised")
    cfg = load_config([path], {"data.data_ratio": "0.5"})
    runner = Runner(cfg)
    ds_u = runner._unlabeled_dataset(None)
    ds_l = runner._dataset("train", "train.txt", "l", None)
    assert len(ds_u) == len(ds_l) - int(0.5 * len(ds_l))

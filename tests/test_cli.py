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
                    "save_top_k": 2,
                    # single-device by default: the conftest exposes 8
                    # virtual CPU devices and DP would need global batches
                    # larger than the tiny synthetic train set
                    "num_devices": 1},
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
    # the LightningCLI-inherited validate subcommand (base/cli.py:198)
    rc = _run(["validate", "--config", path,
               "--ckpt_path", str(log_dir / "checkpoints" / "last")])
    assert rc == 0
    metrics = json.loads((log_dir / "metrics.json").read_text())
    assert "val_miou_epoch" in metrics


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


@pytest.mark.slow
def test_fit_contrastive_vit_cli(tmp_path, synth_root):
    """U2PL over the vit arch (reference contrastive.py:122-124 VITSemi:
    1-layer n_cls=256 MaskTransformer rep head, Adam optimizer) — the
    teacher has no BN buffers, exercising the empty-batch_stats path."""
    path = _mini_config(tmp_path, synth_root, "contrastive")
    assert _run(["fit", "--config", path, "--model.arch", "vit",
                 "--model.optim.optim", "Adam",
                 "--trainer.run_name", "t_con_vit"]) == 0
    metrics = json.loads(
        (tmp_path / "logs" / "t_con_vit" / "metrics.json").read_text())
    assert "test_miou1_epoch" in metrics


@pytest.mark.slow
def test_fit_gan_deeplab_cli(tmp_path, synth_root):
    """s4GAN over the deeplabv3 arch (reference gan.py:92-95): the
    loss-untouched aux_classifier subtree must stay frozen (torch
    None-grad skip semantics, runner's exclude_subtrees mask)."""
    path = _mini_config(tmp_path, synth_root, "gan")
    assert _run(["fit", "--config", path, "--model.arch", "deeplabv3",
                 "--trainer.run_name", "t_gan_dl"]) == 0
    metrics = json.loads(
        (tmp_path / "logs" / "t_gan_dl" / "metrics.json").read_text())
    assert "test_miou1_epoch" in metrics


@pytest.mark.slow
def test_gan_deeplab_aux_stays_frozen(tmp_path, synth_root):
    """The runner's exclude_subtrees key must match deeplabv3's ACTUAL param
    tree: one real gan step through the product wiring leaves aux_classifier
    bit-identical (torch None-grad skip — the gan loss never reads the aux
    output) while the main classifier moves. Guards against a head rename or
    mask-key typo silently re-enabling weight decay on the aux params."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner

    path = _mini_config(tmp_path, synth_root, "gan")
    cfg = load_config([path], {"model.arch": "deeplabv3",
                               "trainer.run_name": "t_gan_dl_frz"})
    runner = Runner(cfg)
    state, train_fn, _ = runner._build_states_and_steps(max_iter=10)
    aux0 = jax.tree.map(np.array, state[0].params["aux_classifier"])
    cls0 = jax.tree.map(np.array, state[0].params["classifier"])

    h, w = cfg.data.train_h, cfg.data.train_w
    rng = np.random.default_rng(0)

    def part():
        return {"frame_current": jnp.asarray(
                    rng.standard_normal((2, h, w, 3)), jnp.float32),
                "label": jnp.asarray(rng.integers(0, 5, (2, h, w)), jnp.int32)}

    batch = {"l": part(), "u": part(), "gt": part()}
    state2, _ = train_fn(state, batch, jax.random.PRNGKey(0), 0)

    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 state2[0].params["aux_classifier"], aux0)
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state2[0].params["classifier"], cls0))
    assert max(moved) > 0.0


def test_unlabeled_fallback_splits_train(tmp_path, synth_root):
    """Without train_u.txt, train.txt is random-split into DISJOINT l/u sets
    by data_ratio — the labeled set shrinks too (reference
    foundation.py:446-462 random_split([size_l, size_u]))."""
    import shutil
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner

    root2 = tmp_path / "nounlabeled"
    shutil.copytree(synth_root, root2)
    os.remove(root2 / "list" / "all" / "train_u.txt")

    path = _mini_config(tmp_path, str(root2), "gan")
    cfg = load_config([path], {"data.data_ratio": "0.5"})
    runner = Runner(cfg)
    full = runner._dataset("train", "train.txt", "l", None)
    ds_l, ds_u = runner._train_datasets(None, need_unlabeled=True)
    size_l = int(0.5 * len(full))
    assert len(ds_l) == size_l
    assert len(ds_u) == len(full) - size_l
    # disjoint: no item appears in both splits
    assert not (set(map(tuple, ds_l.items)) & set(map(tuple, ds_u.items)))


def test_unlabeled_list_keeps_full_labeled_set(tmp_path, synth_root):
    """With train_u.txt present the labeled set is the FULL train list."""
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner

    path = _mini_config(tmp_path, synth_root, "gan")
    cfg = load_config([path], {"data.data_ratio": "0.5"})
    runner = Runner(cfg)
    full = runner._dataset("train", "train.txt", "l", None)
    ds_l, ds_u = runner._train_datasets(None, need_unlabeled=True)
    assert len(ds_l) == len(full)
    assert len(ds_u) > 0


@pytest.mark.slow
def test_after_fit_evaluates_best_checkpoint(tmp_path, synth_root):
    """restore_best loads the top-val checkpoint, not the final state
    (reference base/cli.py:169-187 uses best_model_path)."""
    import jax.numpy as jnp
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner

    path = _mini_config(tmp_path, synth_root, "supervised")
    cfg = load_config([path], {"trainer.run_name": "t_best"})
    runner = Runner(cfg)
    state, _, _ = runner._build_states_and_steps(max_iter=1)

    best_state = state.replace(step=jnp.int32(111))
    worse_state = state.replace(step=jnp.int32(222))
    runner.ckpt.save(best_state, epoch=0, metrics={"val_miou_epoch": 0.9})
    runner.ckpt.save(worse_state, epoch=1, metrics={"val_miou_epoch": 0.1})

    restored = runner.restore_best(worse_state)
    assert int(restored.step) == 111
    # resume epoch derives from the LAST durable save, not the top-k index
    runner.ckpt.wait()
    assert runner.ckpt.last_epoch == 1


def _fit_params(tmp_path, synth_root, method, run_name, num_devices,
                batch_size, extra=None):
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner
    path = _mini_config(tmp_path, synth_root, method)
    ov = {"trainer.num_devices": str(num_devices),
          "data.batch_size": str(batch_size),
          # one epoch: bitwise-close single-step parity (longer fits drift
          # by f32 reduction-order differences amplified through BN)
          "trainer.max_epochs": "1",
          "trainer.run_name": run_name}
    ov.update(extra or {})
    runner = Runner(load_config([path], ov))
    state = runner.fit()
    if method in ("gan", "flow_gan"):
        state = state[0]
    if method == "contrastive":
        state = state.student
    return state


@pytest.mark.slow
@pytest.mark.parametrize("method,extra", [
    ("supervised", None),
    ("gan", None),
    # contra loss scales by 1/world_size by DESIGN (reference
    # contrastive.py:379-382), so identity across device counts needs it off
    ("contrastive", {"model.contrastive.enabled": "false"}),
])
def test_fit_dp_matches_single_device(tmp_path, synth_root, method, extra):
    """A Runner fit sharded over 2 devices is step-identical to the same
    GLOBAL batch on one device (DDP parity: grad allreduce + SyncBN +
    sync_dist come from the sharded jit, reference configs/train_base.yaml:24)."""
    import jax

    s1 = _fit_params(tmp_path, synth_root, method, f"dp1_{method}", 1, 4, extra)
    s2 = _fit_params(tmp_path, synth_root, method, f"dp2_{method}", 2, 2, extra)
    l1, l2 = jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        # atol 1e-3: f32 reduction-order noise between the sharded
        # allreduce and the single-device sum amplifies through the fit's
        # two optimizer steps (observed up to 4.2e-4 on the stem conv after
        # the poly fix made BOTH steps run hot — step 1 previously sat at
        # lr ~0 under the off-by-one schedule). This Runner-level test
        # guards the WIRING (shardings, batch split, metric aggregation);
        # exact single-step collective identity is pinned separately by
        # tests/test_parallel.py.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_cli_pretrained_backbone_load(tmp_path, synth_root):
    """model.pretrained + pretrained_path loads a torch resnet50_v2-style
    state_dict into the runner's backbone (reference model/resnet.py:200-231,
    supervised.py pretrained=True default). Fabricates the .pth in the exact
    reference format from the reference's own ResNet class."""
    import sys
    import jax
    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from model.resnet import resnet50  # noqa: E402

    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner
    from floodseg_tpu.models.torch_import import convert_resnet_backbone
    from floodseg_tpu.models.resnet import DEPTH_BLOCKS

    torch.manual_seed(0)
    net = resnet50(pretrained=False, deep_base=True)
    pth = tmp_path / "resnet50_v2.pth"
    torch.save(net.state_dict(), str(pth))

    path = _mini_config(tmp_path, synth_root, "supervised")
    cfg = load_config([path], {"model.pretrained": "true",
                               "model.pretrained_path": str(pth),
                               "trainer.run_name": "t_pre"})
    runner = Runner(cfg)
    state, _, _ = runner._build_states_and_steps(max_iter=1)

    want_p, want_s = convert_resnet_backbone(
        net.state_dict(), DEPTH_BLOCKS[50], deep_base=True)
    got_p = state.params["backbone"]
    got_s = state.batch_stats["backbone"]
    for want, got in ((want_p, got_p), (want_s, got_s)):
        wl = jax.tree.leaves(want)
        # the state may carry extra (randomly initialized) heads; compare
        # the converted subtree leaf-by-leaf via matching key paths
        flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
        for kp, v in flat_w:
            node = got
            for k in kp:
                node = node[k.key]
            np.testing.assert_array_equal(np.asarray(node), np.asarray(v))
        assert len(wl) > 50  # a real backbone, not a stub


@pytest.mark.slow
def test_test_path_accepts_replicated_state(tmp_path, synth_root):
    """After a DP fit the state is committed-replicated over the mesh; the
    (unsharded) multi-scale test path must evaluate it as-is."""
    import jax
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner
    from floodseg_tpu.parallel.mesh import replicated_sharding

    path = _mini_config(tmp_path, synth_root, "supervised")
    cfg = load_config([path], {"trainer.num_devices": "2",
                               "trainer.run_name": "t_repl"})
    r = Runner(cfg)
    assert r.mesh is not None
    state, _, _ = r._build_states_and_steps(max_iter=1)
    state = jax.device_put(state, replicated_sharding(r.mesh))
    res = r.test(state)
    assert "test_miou1_epoch" in res


@pytest.mark.slow
def test_predict_dp_matches_single_device(tmp_path, synth_root):
    """Clip-parallel predict through the Runner (one window per device via
    shard_map, remainder clips singly) returns the same temporal-consistency
    metrics as the single-device loop."""
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner

    path = _mini_config(tmp_path, synth_root, "flow_supervised")
    out = {}
    for nd in (1, 2):
        # no_cropping pins the whole-frame predict program — the path that
        # is clip-parallel under the mesh (the default crop-based predict
        # follows the reference's single-device compute_output loop)
        cfg = load_config([path], {"trainer.num_devices": str(nd),
                                   "model.no_cropping": "true",
                                   "trainer.run_name": f"pdp{nd}"})
        r = Runner(cfg)
        state, _, _ = r._build_states_and_steps(max_iter=1)
        out[nd] = r.predict(state)
    assert out[1]["frames"] == out[2]["frames"] > 0
    np.testing.assert_allclose(out[1]["predict_miou1_epoch"],
                               out[2]["predict_miou1_epoch"], rtol=1e-6)


@pytest.mark.slow
def test_normalize_on_device_matches_host(tmp_path, synth_root):
    """data.normalize_on_device relocates (x-mean)/std into the compiled
    step (frames ship as float16 raw pixels): the fit must match the
    host-normalized path up to float16 pixel quantization."""
    import jax

    s_host = _fit_params(tmp_path, synth_root, "supervised", "norm_host", 1, 4)
    s_dev = _fit_params(tmp_path, synth_root, "supervised", "norm_dev", 1, 4,
                        extra={"data.normalize_on_device": "true"})
    for a, b in zip(jax.tree.leaves(s_host.params),
                    jax.tree.leaves(s_dev.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


@pytest.mark.slow
def test_log_test_images_table(tmp_path, synth_root):
    """trainer.log_test_images collects (image, colorized gt, prediction)
    rows at test time (reference LogWandBPredictionsCallback,
    base/cli.py:24-65); without W&B they are saved as PNG artifacts."""
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner

    path = _mini_config(tmp_path, synth_root, "supervised")
    cfg = load_config([path], {"trainer.run_name": "t_imgs",
                               "trainer.log_test_images": "2",
                               "trainer.limit_test_batches": "2"})
    runner = Runner(cfg)
    state, _, _ = runner._build_states_and_steps(max_iter=1)
    runner.test(state)
    out = tmp_path / "logs" / "t_imgs" / "test_outputs"
    files = sorted(os.listdir(out))
    assert "000_image.png" in files and "000_prediction.png" in files
    assert "001_ground_truth.png" in files
    assert len(files) == 6  # 2 rows x 3 columns


@pytest.mark.slow
def test_multihost_entry_initializes(tmp_path, synth_root):
    """FLOODSEG_MULTIHOST=1 routes through jax.distributed.initialize with
    an explicit single-process rendezvous (the reference's env-driven NCCL
    init, u2pl/utils/dist_helper.py:10-43) and the CLI still works."""
    import subprocess
    import sys

    path = _mini_config(tmp_path, synth_root, "supervised")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = os.environ.copy()
    env.update({
        "FLOODSEG_MULTIHOST": "1",
        "FLOODSEG_COORDINATOR": "localhost:12655",
        "FLOODSEG_NUM_PROCESSES": "1",
        "FLOODSEG_PROCESS_ID": "0",
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": root + os.pathsep + env.get("PYTHONPATH", ""),
    })
    res = subprocess.run(
        [sys.executable, "-m", "floodseg_tpu.cli.main", "validate",
         "--config", path, "--trainer.run_name", "t_mh"],
        cwd=root, env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "[multihost] jax.distributed initialized: process 0/1" in res.stdout


def test_multihost_rejects_partial_rendezvous(tmp_path, synth_root,
                                              monkeypatch):
    """FLOODSEG_COORDINATOR without NUM_PROCESSES/PROCESS_ID must fail
    loudly — defaulting to a 1-process topology would silently run every
    pod host as an independent training."""
    path = _mini_config(tmp_path, synth_root, "supervised")
    monkeypatch.setenv("FLOODSEG_MULTIHOST", "1")
    monkeypatch.setenv("FLOODSEG_COORDINATOR", "localhost:12656")
    monkeypatch.delenv("FLOODSEG_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("FLOODSEG_PROCESS_ID", raising=False)
    with pytest.raises(RuntimeError, match="FLOODSEG_NUM_PROCESSES"):
        _run(["validate", "--config", path,
              "--trainer.run_name", "t_mh_partial"])


def test_check_val_every_n_epoch(tmp_path, synth_root, monkeypatch):
    """trainer.check_val_every_n_epoch skips validation (and the named
    top-k checkpoint) on off epochs, like the Lightning Trainer honoring
    configs/train_base.yaml:12; last-{epoch} still saves every epoch."""
    import jax.numpy as jnp
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner

    path = _mini_config(tmp_path, synth_root, "supervised")
    cfg = load_config([path], {"trainer.run_name": "t_valn",
                               "trainer.check_val_every_n_epoch": "2",
                               "trainer.max_epochs": "4"})
    runner = Runner(cfg)
    eval_epochs = set()

    def fake_build(max_iter):
        state = {"w": jnp.zeros((2,))}
        z = jnp.zeros((5,), jnp.int32)

        def train_fn(s, b, r, e):
            return s, {"loss": jnp.float32(0.0), "intersection": z,
                       "union": z, "target": z}

        def eval_fn(s, b, e):
            eval_epochs.add(e)
            o = jnp.ones((5,), jnp.int32)
            return {"intersection": o, "union": o, "target": o}

        return state, train_fn, eval_fn

    monkeypatch.setattr(runner, "_build_states_and_steps", fake_build)
    runner.fit()
    assert eval_epochs == {1, 3}
    idx = json.loads((tmp_path / "logs" / "t_valn" / "checkpoints"
                      / "index.json").read_text())
    # only evaluated epochs enter the top-k index; resume still sees epoch 3
    assert {e["epoch"] for e in idx} == {1, 3}
    assert runner.ckpt.last_epoch == 3


def test_u2pl_train_fn_no_device_sync(tmp_path, synth_root, monkeypatch):
    """The contrastive train loop must not read device values back per step
    (rel_step derives from host counters) — a sync would stall the
    deferred-metric-readback pipelining of the fit loop."""
    import jax.numpy as jnp
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner
    from floodseg_tpu.train import contrastive as u2pl_mod
    from typing import NamedTuple

    class _Student(NamedTuple):
        step: object

    class _State(NamedTuple):
        student: _Student

    rels = []

    def fake_steps(*a, **k):
        def semi(s, b, r, frac, rel):
            rels.append(rel)
            return s, {}
        return (lambda s, b, r: (s, {})), semi

    fake_state = _State(_Student(jnp.int32(7)))
    monkeypatch.setattr(u2pl_mod, "make_u2pl_steps", fake_steps)
    monkeypatch.setattr(u2pl_mod, "create_u2pl_state",
                        lambda *a, **k: fake_state)
    monkeypatch.setattr(u2pl_mod, "sync_teacher", lambda s: s)

    path = _mini_config(tmp_path, synth_root, "contrastive")
    cfg = load_config([path], {"trainer.run_name": "t_nosync",
                               "model.pretrained": "false"})
    runner = Runner(cfg)
    # run the fake steps eagerly: jit+donation would delete the reused fake
    # state and hide the host-side logic under test
    runner._jit_train = lambda fn, **k: fn
    # max_iter=4 with max_epochs=2 -> steps_per_epoch=2, sup_only=1
    _, train_fn, _ = runner._build_states_and_steps(max_iter=4)

    ArrayImpl = type(jnp.zeros(()))
    def boom(self):
        raise AssertionError("device->host sync inside the train loop")
    monkeypatch.setattr(ArrayImpl, "__int__", boom)
    monkeypatch.setattr(ArrayImpl, "__float__", boom)

    train_fn(fake_state, None, None, 0)   # sup epoch
    train_fn(fake_state, None, None, 1)   # semi: rel = 0
    train_fn(fake_state, None, None, 1)   # rel = 1
    assert [int(np.asarray(r)) for r in rels] == [0, 1]


def test_u2pl_teacher_sync_only_at_boundary_epoch(tmp_path, synth_root,
                                                  monkeypatch):
    """Student->teacher sync happens exactly once, AT the boundary epoch
    (reference contrastive.py:214-219). A resume past the boundary must not
    re-sync — that would clobber the restored EMA teacher with the student."""
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner
    from floodseg_tpu.train import contrastive as u2pl_mod

    from typing import NamedTuple

    class _Student(NamedTuple):
        step: int

    class _State(NamedTuple):
        student: _Student

    calls = {"sync": 0}
    fake_state = _State(_Student(7))  # NamedTuple: jit-traceable pytree

    def fake_steps(*a, **k):
        return (lambda s, b, r: (s, {})), (lambda s, b, r, frac, rel: (s, {}))

    def fake_sync(s):
        calls["sync"] += 1
        return s

    monkeypatch.setattr(u2pl_mod, "make_u2pl_steps", fake_steps)
    monkeypatch.setattr(u2pl_mod, "create_u2pl_state",
                        lambda *a, **k: fake_state)
    monkeypatch.setattr(u2pl_mod, "sync_teacher", fake_sync)

    path = _mini_config(tmp_path, synth_root, "contrastive")
    cfg = load_config([path], {"trainer.run_name": "t_sync",
                               "model.pretrained": "false"})

    # fresh fit: sup epoch, then boundary epoch syncs exactly once
    runner = Runner(cfg)
    _, train_fn, _ = runner._build_states_and_steps(max_iter=4)
    train_fn(fake_state, None, None, 0)    # e < sup_only: supervised path
    assert calls["sync"] == 0
    train_fn(fake_state, None, None, 1)    # boundary epoch: one sync
    train_fn(fake_state, None, None, 1)
    assert calls["sync"] == 1

    # resume PAST the boundary: a fresh process must never re-sync
    calls["sync"] = 0
    runner2 = Runner(cfg)
    _, train_fn2, _ = runner2._build_states_and_steps(max_iter=4)
    train_fn2(fake_state, None, None, 2)
    train_fn2(fake_state, None, None, 3)
    assert calls["sync"] == 0


def test_gan_gt_loader_labeled_split_and_independent_shuffle(tmp_path,
                                                             synth_root):
    """The gan 'gt' loader serves the LABELED split (reference gan.py:270
    builds it over dataset_train_l — labels of unlabeled-split images must
    never reach the discriminator) and shuffles INDEPENDENTLY of the 'l'
    loader (three separate shuffle=True DataLoaders in the reference);
    a shared stream would make batch['gt'] == batch['l'] every step."""
    import shutil
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner

    root2 = tmp_path / "nounlab_gt"
    shutil.copytree(synth_root, root2)
    os.remove(root2 / "list" / "all" / "train_u.txt")
    path = _mini_config(tmp_path, str(root2), "gan")
    cfg = load_config([path], {"data.data_ratio": "0.5",
                               "trainer.run_name": "t_gtloader"})
    runner = Runner(cfg)
    tf = runner._transforms()
    loaders, _ = runner._train_loaders(tf)
    train_l, train_u = runner._train_datasets(tf["train"],
                                              need_unlabeled=True)
    assert sorted(map(tuple, loaders["gt"].dataset.items)) == \
        sorted(map(tuple, train_l.items))
    # no unlabeled-split item leaks into the gt loader
    assert not (set(map(tuple, loaders["gt"].dataset.items))
                & set(map(tuple, train_u.items)))
    # independent shuffles: the first epoch's batches differ between
    # roles that share the same underlying item list
    bl = next(iter(loaders["l"]))
    bg = next(iter(loaders["gt"]))
    assert not np.array_equal(np.asarray(bl["label"]),
                              np.asarray(bg["label"])) or \
        not np.allclose(np.asarray(bl["frame_current"]),
                        np.asarray(bg["frame_current"]))


def test_fit_raises_on_too_small_train_set(tmp_path, synth_root):
    """A train split smaller than the global batch must fail loudly — an
    infinite drop_last loader over it would yield nothing and the fit
    loop would block forever."""
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner

    path = _mini_config(tmp_path, synth_root, "supervised")
    cfg = load_config([path], {"data.batch_size": "4096",
                               "trainer.run_name": "t_toosmall"})
    runner = Runner(cfg)
    with pytest.raises(ValueError, match="exceeds the train set"):
        runner._train_loaders(runner._transforms())


def test_data_ratio_one_without_unlabeled_raises(tmp_path, synth_root):
    """data_ratio=1.0 with no train_u.txt leaves the unlabeled split empty;
    silently reusing the full train list for BOTH splits would fake
    semi-supervision (the old fallback did exactly that)."""
    import shutil
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner

    root2 = tmp_path / "nounlab_r1"
    shutil.copytree(synth_root, root2)
    os.remove(root2 / "list" / "all" / "train_u.txt")
    path = _mini_config(tmp_path, str(root2), "gan")
    cfg = load_config([path], {"trainer.run_name": "t_ratio1"})
    runner = Runner(cfg)
    with pytest.raises(ValueError, match="data_ratio"):
        runner._train_datasets(runner._transforms()["train"],
                               need_unlabeled=True)


@pytest.mark.slow
def test_contrastive_eval_serves_student_before_boundary(tmp_path,
                                                         synth_root):
    """Before the sup_only_epoch boundary sync the teacher is still its
    random init — _eval_variables must serve the STUDENT (reference
    contrastive.py:177-180 forward()); after sync_teacher, the teacher."""
    import jax
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner
    from floodseg_tpu.train.contrastive import sync_teacher

    path = _mini_config(tmp_path, synth_root, "contrastive")
    cfg = load_config([path], {"trainer.run_name": "t_evalvars"})
    runner = Runner(cfg)
    state, _, _ = runner._build_states_and_steps(max_iter=1)
    v = runner._eval_variables(state)
    sp = jax.tree.leaves(state.student.params)[0]
    assert np.array_equal(np.asarray(jax.tree.leaves(v["params"])[0]),
                          np.asarray(sp))
    state2 = sync_teacher(state)
    v2 = runner._eval_variables(state2)
    assert np.array_equal(np.asarray(jax.tree.leaves(v2["params"])[0]),
                          np.asarray(sp))  # teacher just synced to student
    assert bool(np.asarray(state2.teacher_synced))


def test_early_stopping_state_survives_resume(tmp_path, synth_root,
                                              monkeypatch):
    """EarlyStopping best/wait state is persisted per epoch and restored on
    resume (Lightning restores the callback from the checkpoint): the first
    post-resume validation must NOT restart patience."""
    import json as _json
    import jax.numpy as jnp
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner

    path = _mini_config(tmp_path, synth_root, "supervised")
    cfg = load_config([path], {"trainer.run_name": "t_esresume",
                               "trainer.max_epochs": "3"})
    runner = Runner(cfg)

    def fake_build(max_iter):
        state = {"w": jnp.zeros((2,))}
        z = jnp.zeros((5,), jnp.int32)

        def train_fn(s, b, r, e):
            return s, {"loss": jnp.float32(0.0), "intersection": z,
                       "union": z, "target": z}

        def eval_fn(s, b, e):
            o = jnp.ones((5,), jnp.int32)
            return {"intersection": o, "union": o, "target": o}

        return state, train_fn, eval_fn

    monkeypatch.setattr(runner, "_build_states_and_steps", fake_build)
    runner.fit()
    es = _json.loads((tmp_path / "logs" / "t_esresume" /
                      "early_stop.json").read_text())
    # constant val mIoU: first epoch is the best, the rest wait
    assert es["best_epoch"] == 0 and es["wait_count"] == 2

    cfg2 = load_config([path], {"trainer.run_name": "t_esresume",
                                "trainer.max_epochs": "5",
                                "trainer.resume": "true",
                                "trainer.early_stopping_patience": "4"})
    runner2 = Runner(cfg2)
    monkeypatch.setattr(runner2, "_build_states_and_steps", fake_build)
    runner2.fit()
    es2 = _json.loads((tmp_path / "logs" / "t_esresume" /
                       "early_stop.json").read_text())
    # resumed at epoch 3 with wait_count 2: epochs 3,4 wait too -> 4, and
    # best_epoch stays 0 (a reset would report best_epoch 3, wait 1)
    assert es2["best_epoch"] == 0 and es2["wait_count"] == 4


@pytest.mark.slow
def test_fit_flow_vit_cli(tmp_path, synth_root):
    """Flow (frame-interpolation) over the vit arch — a deliberate TPU
    extension (the reference raises NotImplementedError for vit in the flow
    path, flow/base.py:94-103): full fit + whole-clip predict through
    SegmenterViT.encode/decode, with vit flow frame sizes rounded to patch
    multiples by the Runner."""
    path = _mini_config(tmp_path, synth_root, "flow_supervised")
    assert _run(["fit", "--config", path, "--model.arch", "vit",
                 "--model.optim.optim", "Adam", "--data.train_w", "64",
                 "--trainer.run_name", "t_flow_vit"]) == 0
    metrics = json.loads(
        (tmp_path / "logs" / "t_flow_vit" / "metrics.json").read_text())
    assert "test_miou1_epoch" in metrics
    assert "predict_miou1_epoch" in metrics
    assert metrics["frames"] > 0


def test_flow_vit_sizing_preserves_no_cropping_invariant(tmp_path, synth_root):
    """vit flow rounds only WHOLE-frame (test/predict) sizes to patch
    multiples; the train resize must stay at the no_cropping formula
    (int(th*1.5)+1) or RandScale's engineered scale_min (1/1.5+0.001) can
    produce frames smaller than the crop, crashing Crop(crop_padding=None).
    Applies the train transform at the adversarial minimum scale to prove
    the invariant holds."""
    import numpy as np
    from floodseg_tpu.core.config import load_config
    from floodseg_tpu.cli.runner import Runner

    path = _mini_config(tmp_path, synth_root, "flow_supervised")
    cfg = load_config([path], {"model.arch": "vit", "data.train_w": "96",
                               "model.no_cropping": "true",
                               "trainer.run_name": "t_fvs"})
    runner = Runner(cfg)
    tfs = runner._transforms()
    th = cfg.data.train_h
    assert th == 96
    # the train pipeline survives many draws incl. min-scale frames
    rng = np.random.default_rng(0)
    sample = {
        "frame_current": rng.integers(0, 255, (100, 140, 3)).astype(np.uint8),
        "frame_prev": rng.integers(0, 255, (100, 140, 3)).astype(np.uint8),
        "frame_next": rng.integers(0, 255, (100, 140, 3)).astype(np.uint8),
        "mvs_left": [np.zeros((4, 5, 2), np.float32)],
        "mvs_right": [np.zeros((4, 5, 2), np.float32)],
        "label": rng.integers(0, 5, (100, 140)).astype(np.uint8),
        "left_index": 1, "right_index": 1,
    }
    for i in range(30):
        out = tfs["train"]({k: (v.copy() if isinstance(v, np.ndarray) else
                                [g.copy() for g in v] if isinstance(v, list)
                                else v) for k, v in sample.items()},
                           np.random.default_rng(i))
        assert out["frame_current"].shape[:2] == (th, th)


@pytest.mark.slow
def test_fit_flow_gan_vit_cli(tmp_path, synth_root):
    """s4GAN + frame interpolation over vit (TPU extension x TPU extension:
    the reference supports neither vit in flow nor, a fortiori, flow_gan
    over it): the 4-phase adversarial step drives SegmenterViT.encode/
    decode through the interpolator with the discriminator on the blended
    prediction."""
    path = _mini_config(tmp_path, synth_root, "flow_gan")
    assert _run(["fit", "--config", path, "--model.arch", "vit",
                 "--model.optim.optim", "Adam", "--data.train_w", "64",
                 "--trainer.run_name", "t_flow_gan_vit"]) == 0
    metrics = json.loads(
        (tmp_path / "logs" / "t_flow_gan_vit" / "metrics.json").read_text())
    assert "test_miou1_epoch" in metrics

"""Flow training/predict end-to-end on the synthetic dataset."""

import os
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from floodseg_tpu.data import FlowDataset, DataLoader, build_train_transform, build_test_transform
from floodseg_tpu.data.synthetic import generate_synthetic_dataset, PALETTE
from floodseg_tpu.models import build_model
from floodseg_tpu.train.optim import make_optimizer
from floodseg_tpu.train.state import create_train_state
from floodseg_tpu.train.supervised import make_loss_fn
from floodseg_tpu.train.flow import (
    make_flow_train_step,
    make_flow_eval_step,
    make_flow_predict_fn,
)
from floodseg_tpu.train.predict import run_predict

DELTA = 5


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthflow")
    return generate_synthetic_dataset(str(root), num_frames=30, frame_delta=DELTA,
                                      size=(96, 128), num_labeled=6)


@pytest.fixture(scope="module")
def model_and_state():
    model = build_model("pspnet", classes=5, layers=50, with_aux=False)
    tx = make_optimizer(base_lr=0.001, max_iter=10)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 33, 33, 3)), tx=tx
    )
    return model, state


@pytest.mark.slow
def test_flow_train_step(synth_root, model_and_state):
    model, state = model_and_state
    tf = build_train_transform(33, 33, resize=(96, 128), with_rotate=False,
                               scale_min=0.9, scale_max=1.1)
    ds = FlowDataset("train", synth_root, f"{synth_root}/list/all/train.txt",
                     type="l", transform=tf, frame_delta=DELTA)
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                        drop_last=True, infinite=True)

    loss_fn = make_loss_fn("ohem", aux_weight=0.0, ohem_min_kept=200)
    interp_step, plain_step = make_flow_train_step(model, loss_fn, num_classes=5)
    interp_step = jax.jit(interp_step)
    plain_step = jax.jit(plain_step)

    key = jax.random.PRNGKey(1)
    it = iter(loader)
    losses = []
    for i in range(4):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        step = plain_step if i == 1 else interp_step  # exercise both branches
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()

    # eval step on a val batch
    ds_val = FlowDataset("val", synth_root, f"{synth_root}/list/all/val.txt",
                         type="l",
                         transform=build_test_transform(resize=(96, 128), normalize=True),
                         frame_delta=DELTA)
    batch = {k: jnp.asarray(v) for k, v in
             next(iter(DataLoader(ds_val, batch_size=1))).items()}
    eval_step = jax.jit(make_flow_eval_step(model, num_classes=5))
    m = eval_step(state, batch)
    assert np.asarray(m["union"]).sum() > 0


@pytest.mark.slow
def test_flow_predict_runner(synth_root, model_and_state, tmp_path):
    model, state = model_and_state
    ds = FlowDataset("predict", synth_root, type="u",
                     transform=build_test_transform(resize=(96, 128), normalize=True),
                     frame_delta=DELTA, predict_v_id="synth")
    loader = DataLoader(ds, batch_size=1, num_workers=1)

    predict_fn = make_flow_predict_fn(model, n=DELTA, out_size=(96, 128))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    video_path = str(tmp_path / "video" / "synth.avi")
    summary = run_predict(
        predict_fn, variables, loader, num_classes=5,
        colors=PALETTE, video_path=video_path,
        save_images_dir=str(tmp_path / "frames"),
    )
    assert summary["frames"] == len(ds) * DELTA
    assert 0.0 <= summary["predict_miou1_epoch"] <= 1.0
    assert summary["frames_per_second"] > 0
    import os
    assert os.path.exists(video_path)
    assert os.path.exists(tmp_path / "frames" / "0.png")


def test_flow_sliding_window_test(synth_root, model_and_state):
    from floodseg_tpu.train.evaluate import flow_sliding_window_test
    from floodseg_tpu.train.flow import make_flow_test_crop_fn

    model, state = model_and_state
    ds = FlowDataset("test", synth_root, f"{synth_root}/list/all/test.txt",
                     type="l",
                     transform=build_test_transform(resize=(96, 128), normalize=True),
                     frame_delta=DELTA)
    batch = next(iter(DataLoader(ds, batch_size=1)))
    crop_fn = make_flow_test_crop_fn(model, num_classes=5)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pred = flow_sliding_window_test(crop_fn, variables, batch, 5,
                                    crop_h=65, crop_w=65)
    assert pred.shape == (96, 128)
    assert pred.min() >= 0 and pred.max() < 5


def test_predict_frame_ids_per_clip(tmp_path):
    """PNG naming derives from EACH clip's frame_id: a multi-clip (DP)
    batch of NON-consecutive clips must not be numbered from the first
    clip's id (train/predict.py)."""
    colors = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0],
                       [0, 0, 255], [9, 9, 9]], np.uint8)
    n_per = 3

    def fake_fn(variables, fp, fn_, ml, mr):
        return jnp.zeros((fp.shape[0] * n_per, 8, 8), jnp.int32)

    batch = {
        "frame_prev": np.zeros((2, 8, 8, 3), np.float32),
        "frame_next": np.zeros((2, 8, 8, 3), np.float32),
        "mvs_left": np.zeros((n_per - 1, 2, 2, 2, 2), np.float32),
        "mvs_right": np.zeros((n_per - 1, 2, 2, 2, 2), np.float32),
        "frame_id": np.array([100, 400]),  # clips NOT consecutive
    }
    out_dir = tmp_path / "frames"
    summary = run_predict(fake_fn, None, [batch], 5, colors=colors,
                          save_images_dir=str(out_dir),
                          compute_metrics=False)
    assert summary["frames"] == 6
    assert sorted(os.listdir(out_dir)) == [
        "100.png", "101.png", "102.png", "400.png", "401.png", "402.png"]


@pytest.mark.slow
def test_profile_predict_phases_matches_fused(synth_root, model_and_state):
    """The profiling phase pipeline (predict_encoder/warp/fusion/decoder —
    the reference's profiler regions, flow/model.py:119-179) produces the
    SAME class maps as the fused production program, and reports a positive
    mean time per region."""
    from floodseg_tpu.train.flow import profile_predict_phases

    model, state = model_and_state
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ds = FlowDataset("predict", synth_root, type="u",
                     transform=build_test_transform(resize=(96, 128),
                                                    normalize=True),
                     frame_delta=DELTA, predict_v_id="synth")
    batch = next(iter(DataLoader(ds, batch_size=1, num_workers=1)))
    dg = ds.default_grid

    times = profile_predict_phases(model, variables, batch, n=DELTA,
                                   out_size=(96, 128), default_grid=dg,
                                   repeats=2)
    assert set(times) == {"predict_encoder", "predict_warp",
                          "predict_fusion", "predict_decoder"}
    assert all(t > 0 for t in times.values())

    # phase-by-phase output == fused program output
    from floodseg_tpu.train.flow import make_flow_phase_fns
    fns = make_flow_phase_fns(model, DELTA, out_size=(96, 128),
                              default_grid=dg)
    fp, fn_ = jnp.asarray(batch["frame_prev"]), jnp.asarray(batch["frame_next"])
    ml, mr = jnp.asarray(batch["mvs_left"]), jnp.asarray(batch["mvs_right"])
    f = fns["encode"](variables, fp)
    f2 = fns["encode"](variables, fn_)
    fwd = fns["warp_chain"](f, ml)
    bwd = fns["warp_chain"](f2, mr)
    maps = fns["fuse"](f, f2, fwd, bwd)
    phased = np.asarray(fns["decode"](variables, maps))

    fused = make_flow_predict_fn(model, n=DELTA, out_size=(96, 128),
                                 default_grid=dg)
    want = np.asarray(fused(variables, fp, fn_, ml, mr))
    np.testing.assert_array_equal(phased, want)


@pytest.mark.slow
def test_cached_predict_matches_full(synth_root, model_and_state):
    """Key-feature reuse across consecutive windows is bit-identical to
    fresh per-window encoding (eval-mode BN is batch-invariant)."""
    from floodseg_tpu.train.flow import make_cached_flow_predict_fn
    from floodseg_tpu.video.grid import default_grid as make_default_grid

    model, state = model_and_state
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ds = FlowDataset("predict", synth_root, type="u",
                     transform=build_test_transform(resize=(96, 128),
                                                    normalize=True),
                     frame_delta=DELTA, predict_v_id="synth")
    loader = DataLoader(ds, batch_size=1, num_workers=1)
    batches = list(loader)[:3]

    dg = ds.default_grid
    plain = make_flow_predict_fn(model, n=DELTA, out_size=(96, 128),
                                 default_grid=dg)
    full_fn, cached_fn = make_cached_flow_predict_fn(
        model, n=DELTA, out_size=(96, 128), default_grid=dg)

    feat = None
    for i, b in enumerate(batches):
        fp, fn_ = jnp.asarray(b["frame_prev"]), jnp.asarray(b["frame_next"])
        ml, mr = jnp.asarray(b["mvs_left"]), jnp.asarray(b["mvs_right"])
        want = np.asarray(plain(variables, fp, fn_, ml, mr))
        if i == 0:
            got, feat = full_fn(variables, fp, fn_, ml, mr)
        else:
            got, feat = cached_fn(variables, feat, fn_, ml, mr)
        np.testing.assert_array_equal(np.asarray(got), want)

    # run_predict with cached_fns reports identical metrics to plain
    loader1 = DataLoader(ds, batch_size=1, num_workers=1)
    loader2 = DataLoader(ds, batch_size=1, num_workers=1)
    s_plain = run_predict(plain, variables, loader1, num_classes=5)
    s_cached = run_predict(plain, variables, loader2, num_classes=5,
                           cached_fns=(full_fn, cached_fn))
    assert s_plain["frames"] == s_cached["frames"]
    np.testing.assert_allclose(s_plain["predict_miou1_epoch"],
                               s_cached["predict_miou1_epoch"], rtol=0)


@pytest.mark.slow
def test_cached_predict_handles_missing_key_frame(synth_root, model_and_state,
                                                  tmp_path):
    """A MISSING shared key frame resolves differently for adjacent windows
    (f_next walks down, the next f_prev walks up) — the cache must detect the
    mismatch via the resolved ids and re-encode, staying bit-identical."""
    import shutil
    from floodseg_tpu.train.flow import make_cached_flow_predict_fn

    root2 = str(tmp_path / "gapped")
    shutil.copytree(synth_root, root2)
    # remove the shared key frame between windows 1 and 2 (frame 2*DELTA)
    os.remove(os.path.join(root2, "frames", "synth", "images",
                           f"{2 * DELTA}.jpg"))

    model, state = model_and_state
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ds = FlowDataset("predict", root2, type="u",
                     transform=build_test_transform(resize=(96, 128),
                                                    normalize=True),
                     frame_delta=DELTA, predict_v_id="synth")
    batches = list(DataLoader(ds, batch_size=1, num_workers=1))
    # the gap is real: window 1's resolved next != window 2's resolved prev
    assert int(batches[1]["next_frame_id"][0]) != int(batches[2]["prev_frame_id"][0])

    dg = ds.default_grid
    plain = make_flow_predict_fn(model, n=DELTA, out_size=(96, 128),
                                 default_grid=dg)
    full_fn, cached_fn = make_cached_flow_predict_fn(
        model, n=DELTA, out_size=(96, 128), default_grid=dg)

    s_plain = run_predict(plain, variables,
                          DataLoader(ds, batch_size=1, num_workers=1),
                          num_classes=5)
    s_cached = run_predict(plain, variables,
                           DataLoader(ds, batch_size=1, num_workers=1),
                           num_classes=5, cached_fns=(full_fn, cached_fn))
    assert s_plain["frames"] == s_cached["frames"]
    np.testing.assert_allclose(s_plain["predict_miou1_epoch"],
                               s_cached["predict_miou1_epoch"], rtol=0)


@pytest.mark.slow
def test_flow_path_with_deeplabv3():
    """deeplabv3 is the second flow-capable arch (FLOW_ARCHS, reference
    model/deeplabv3.py FlowDeepLabv3): interp train step and whole-clip
    predict run through its encode/decode methods."""
    from floodseg_tpu.models import build_model
    from floodseg_tpu.video.grid import default_grid as make_default_grid

    model = build_model("deeplabv3", classes=5, layers=50, with_aux=False)
    tx = make_optimizer(base_lr=0.001, max_iter=10)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), tx=tx)

    rng = np.random.default_rng(0)
    t, gh, gw = 2, 2, 2
    batch = {
        "frame_prev": jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32),
        "frame_next": jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32),
        "mvs_left": jnp.asarray(rng.uniform(-1, 1, (t, 2, gh, gw, 2)), jnp.float32),
        "mvs_right": jnp.asarray(rng.uniform(-1, 1, (t, 2, gh, gw, 2)), jnp.float32),
        "left_index": jnp.ones((2,), jnp.int32),
        "right_index": jnp.ones((2,), jnp.int32),
        "label": jnp.asarray(rng.integers(0, 5, (2, 32, 32)), jnp.int32),
    }
    loss_fn = make_loss_fn("ce", aux_weight=0.0)
    interp_step, _ = make_flow_train_step(model, loss_fn, num_classes=5)
    state, m = jax.jit(interp_step)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))

    pf = make_flow_predict_fn(model, n=3, out_size=(32, 32),
                              default_grid=make_default_grid(32, 32))
    vs = {"params": state.params, "batch_stats": state.batch_stats}
    out = pf(vs, batch["frame_prev"][:1], batch["frame_next"][:1],
             batch["mvs_left"][:, :1], batch["mvs_right"][:, :1])
    assert out.shape == (3, 32, 32)


@pytest.mark.slow
def test_flow_path_with_vit():
    """TPU EXTENSION: vit in the flow path (the reference raises
    NotImplementedError there, flow/base.py:94-103). SegmenterViT.encode
    yields the spatial patch-token map and decode runs the MaskTransformer
    over the warped/blended tokens, so the interpolator composes with it
    like any other encoder/decoder pair."""
    from floodseg_tpu.models import build_model, FLOW_ARCHS
    from floodseg_tpu.video.grid import default_grid as make_default_grid

    assert "vit" in FLOW_ARCHS
    model = build_model("vit", classes=5, image_size=64)
    tx = make_optimizer(base_lr=0.001, max_iter=10)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3)), tx=tx)

    rng = np.random.default_rng(0)
    t, gh, gw = 2, 4, 4
    batch = {
        "frame_prev": jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32),
        "frame_next": jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32),
        "mvs_left": jnp.asarray(rng.uniform(-1, 1, (t, 2, gh, gw, 2)), jnp.float32),
        "mvs_right": jnp.asarray(rng.uniform(-1, 1, (t, 2, gh, gw, 2)), jnp.float32),
        "left_index": jnp.ones((2,), jnp.int32),
        "right_index": jnp.ones((2,), jnp.int32),
        "label": jnp.asarray(rng.integers(0, 5, (2, 64, 64)), jnp.int32),
    }
    loss_fn = make_loss_fn("ce", aux_weight=0.0)
    interp_step, _ = make_flow_train_step(model, loss_fn, num_classes=5)
    state2, m = jax.jit(interp_step)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    # gradients actually reached the encoder
    p0 = state.params["encoder"]["block0"]["attn"]["qkv"]["kernel"]
    p1 = state2.params["encoder"]["block0"]["attn"]["qkv"]["kernel"]
    assert np.abs(np.asarray(p0 - p1)).max() > 0

    pf = make_flow_predict_fn(model, n=3, out_size=(64, 64),
                              default_grid=make_default_grid(64, 64))
    vs = {"params": state.params, "batch_stats": state.batch_stats}
    out = pf(vs, batch["frame_prev"][:1], batch["frame_next"][:1],
             batch["mvs_left"][:, :1], batch["mvs_right"][:, :1])
    assert out.shape == (3, 64, 64)
    assert set(np.unique(np.asarray(out))) <= set(range(5))


def test_vit_encode_decode_composes_to_forward():
    """decode(encode(x)) upsampled must reproduce __call__'s pred exactly:
    pins the token-grid reshape ordering the flow extension relies on."""
    from floodseg_tpu.models.vit import SegmenterViT
    from floodseg_tpu.ops.resize import resize_bilinear

    model = SegmenterViT(classes=5, image_size=96, patch_size=32, d_model=64,
                         n_layers=2, dec_layers=1, dropout=0.0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 96, 96, 3)),
                    jnp.float32)
    k = jax.random.PRNGKey(0)
    variables = model.init({"params": k}, x, train=False)
    want = model.apply(variables, x, train=False)["pred"]
    f, _ = model.apply(variables, x, train=False, method="encode")
    assert f.shape == (2, 3, 3, 64)
    masks = model.apply(variables, f, train=False, method="decode")
    got = resize_bilinear(masks, (96, 96), align_corners=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

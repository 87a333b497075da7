"""int8 decoder quantization (ops/quant.py): BN-folding algebra must be
exact, and the int8 path must track the f32 decode closely enough that the
predicted class maps barely move. TPU-only perf (the 2x MXU int8 rate) is
measured by ``bench.py --int8``; these tests pin the NUMERICS on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from floodseg_tpu.models import build_model
from floodseg_tpu.ops import quant


@pytest.fixture(scope="module")
def pspnet_vars():
    model = build_model("pspnet", classes=5, layers=50, with_aux=False)
    x0 = jnp.zeros((1, 33, 33, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    # make the BN running stats non-trivial so folding is actually exercised
    bn = variables["batch_stats"]["cls"]["bn"]
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    bn["mean"] = 0.3 * jax.random.normal(k1, bn["mean"].shape)
    bn["var"] = jnp.exp(0.5 * jax.random.normal(k2, bn["var"].shape))
    p = variables["params"]["cls"]["bn"]
    p["scale"] = 1.0 + 0.1 * jax.random.normal(k1, p["scale"].shape)
    p["bias"] = 0.1 * jax.random.normal(k2, p["bias"].shape)
    return model, variables


@pytest.fixture(scope="module")
def pspnet_head_vars():
    """Head-only variables for the decode-numerics tests: initializing the
    full PSPNet-50 costs ~35 s of CPU compile, but ``method="decode"`` only
    touches the ``cls`` SegHead — so init just that submodule (same 4096→
    512→classes config the model builds at pspnet.py:88) and graft it under
    the model's variable paths. A structural drift between this and the real
    head fails loudly: apply() would hit missing params or shape mismatches.
    """
    from floodseg_tpu.models.pspnet import SegHead

    model = build_model("pspnet", classes=5, layers=50, with_aux=False)
    head = SegHead(512, 5)
    hv = head.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 9, 11, 4096)), train=False)
    variables = {"params": {"cls": hv["params"]},
                 "batch_stats": {"cls": hv["batch_stats"]}}
    # make the BN running stats non-trivial so folding is actually exercised
    bn = variables["batch_stats"]["cls"]["bn"]
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    bn["mean"] = 0.3 * jax.random.normal(k1, bn["mean"].shape)
    bn["var"] = jnp.exp(0.5 * jax.random.normal(k2, bn["var"].shape))
    p = variables["params"]["cls"]["bn"]
    p["scale"] = 1.0 + 0.1 * jax.random.normal(k1, p["scale"].shape)
    p["bias"] = 0.1 * jax.random.normal(k2, p["bias"].shape)
    return model, variables


def _features(variables, shape=(2, 9, 11)):
    cin = variables["params"]["cls"]["conv1"]["kernel"].shape[2]
    f = jax.random.normal(jax.random.PRNGKey(3), (*shape, cin))
    return jax.nn.relu(f)  # PPM output is post-ReLU (non-negative)


def test_fold_bn_matches_eval_decode(pspnet_head_vars):
    """Folded-BN f32 head == model.apply(method='decode') eval forward."""
    model, variables = pspnet_head_vars
    f = _features(variables)
    want = model.apply(variables, f, train=False, method="decode")
    got = quant.seghead_decode_folded_f32(
        variables["params"]["cls"], variables["batch_stats"]["cls"], f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_int8_decode_tracks_f32(pspnet_vars):
    """int8 logits stay close to f32 logits; argmax maps barely move."""
    model, variables = pspnet_vars
    f = _features(variables, shape=(2, 17, 19))
    want = np.asarray(
        model.apply(variables, f, train=False, method="decode"), np.float32)
    got = np.asarray(jax.jit(quant.int8_seghead_decode,
                             static_argnames=("dtype",))(
        variables["params"]["cls"], variables["batch_stats"]["cls"], f,
        dtype=jnp.float32), np.float32)
    assert got.shape == want.shape
    # logits error small relative to the logit RANGE (per-map)
    rng = np.abs(want).max()
    assert np.abs(got - want).max() / rng < 0.05, (
        np.abs(got - want).max(), rng)
    # class decisions essentially unchanged (random weights = near-uniform
    # logits is the WORST case for argmax stability)
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.98, agree


def test_int8_decode_rejects_non_seghead(pspnet_head_vars):
    _, variables = pspnet_head_vars
    f = _features(variables)
    with pytest.raises(ValueError, match="SegHead"):
        quant.int8_seghead_decode({"conv1": {}},
                                  variables["batch_stats"]["cls"], f)


@pytest.fixture(scope="module")
def trained_pspnet_head():
    """A PSPNet-50 whose cls head — the exact component int8_decode
    replaces — is TRAINED to convergence on real encoder features: real
    Adam trajectory, real BN running stats, peaked logits (random-init
    near-uniform logits are the worst case for argmax stability; a trained
    head is the regime the int8 auto-default ships in)."""
    import optax

    model = build_model("pspnet", classes=4, layers=50, with_aux=False)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 33, 33, 3)), train=False)
    palette = jnp.asarray([[2.0, -1.0, -1.0], [-1.0, 2.0, -1.0],
                           [-1.0, -1.0, 2.0], [1.0, 1.0, 1.0]])

    # labels live at the encoder's output resolution (stride 8: 33 -> 5);
    # images are the block-upsampled palette + noise -> a color-to-class
    # task the head can solve from whatever features the frozen random
    # backbone produces
    def make_batch(i):
        key = jax.random.fold_in(jax.random.PRNGKey(5), i)
        lab = jax.random.randint(key, (4, 5, 5), 0, 4)
        img = jnp.repeat(jnp.repeat(palette[lab], 7, axis=1),
                         7, axis=2)[:, :33, :33]
        img = img + 0.2 * jax.random.normal(jax.random.fold_in(key, 1),
                                            img.shape)
        return img, lab.astype(jnp.int32)

    encode = jax.jit(lambda img: model.apply(variables, img, train=False,
                                             method="encode")[0])
    data = [(encode(img), lab)
            for img, lab in (make_batch(i) for i in range(8))]

    params, stats = dict(variables["params"]), variables["batch_stats"]
    tx = optax.adam(1e-2)
    opt_state = tx.init(params["cls"])

    def loss_of(p_cls, stats_cls, f, lab, key):
        v = {"params": {**params, "cls": p_cls},
             "batch_stats": {**stats, "cls": stats_cls}}
        out, mut = model.apply(v, f, train=True, method="decode",
                               mutable=["batch_stats"],
                               rngs={"dropout": key})
        logp = jax.nn.log_softmax(out, axis=-1)
        nll = -jnp.take_along_axis(logp, lab[..., None], axis=-1).mean()
        return nll, mut["batch_stats"]["cls"]

    @jax.jit
    def step(p_cls, stats_cls, opt_state, f, lab, key):
        (loss, new_stats), g = jax.value_and_grad(
            loss_of, has_aux=True)(p_cls, stats_cls, f, lab, key)
        upd, opt_state = tx.update(g, opt_state, p_cls)
        return optax.apply_updates(p_cls, upd), new_stats, opt_state, loss

    p_cls, stats_cls = params["cls"], stats["cls"]
    loss = None
    for i in range(280):
        f, lab = data[i % len(data)]
        p_cls, stats_cls, opt_state, loss = step(
            p_cls, stats_cls, opt_state, f, lab,
            jax.random.fold_in(jax.random.PRNGKey(9), i))
    trained = {"params": {**params, "cls": p_cls},
               "batch_stats": {**stats, "cls": stats_cls}}
    return model, trained, make_batch, float(loss)


@pytest.mark.slow
def test_int8_decode_on_trained_model(trained_pspnet_head):
    """End-to-end int8 validation on a TRAINED head (the auto-default's
    shipping regime): the int8 decode of real encoder features must
    reproduce the f32 class maps essentially everywhere, and the task
    stays solved through the quantized head."""
    model, variables, make_batch, loss = trained_pspnet_head
    # calibrated: the deterministic fit reaches ~0.04 train loss by step
    # 280 (~0.007 by 400), ~0.81 held-out acc (the head memorizes its 8
    # batches; held-out generalizes through frozen random features)
    assert loss < 0.1, f"head fit did not learn (loss {loss})"
    img, lab = make_batch(100)  # held-out batch
    feats = model.apply(variables, img, train=False, method="encode")[0]
    want = np.asarray(model.apply(variables, feats, train=False,
                                  method="decode"), np.float32)
    got = np.asarray(quant.int8_seghead_decode(
        variables["params"]["cls"], variables["batch_stats"]["cls"], feats,
        dtype=jnp.float32), np.float32)
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.995, agree
    # and the trained model actually solved the task through the int8 head
    acc = (got.argmax(-1) == np.asarray(lab)).mean()
    acc_f32 = (want.argmax(-1) == np.asarray(lab)).mean()
    assert acc_f32 > 0.75, acc_f32
    assert acc >= acc_f32 - 0.01, (acc, acc_f32)


@pytest.mark.slow
def test_predict_fn_int8_runs(pspnet_vars):
    """The fused predict program compiles and runs with int8_decode, and its
    class maps match the bf16-decode program almost everywhere.

    Slow tier: two full predict-program compiles over PSPNet-50 (~55 s on a
    1-CPU box); the fast tier keeps the decode-numerics pins (fold_bn) and
    the flow-program smokes in test_train_flow."""
    from floodseg_tpu.train.flow import make_flow_predict_fn
    from floodseg_tpu.video.grid import default_grid

    model, variables = pspnet_vars
    n = 3
    h = w = 33
    dg = default_grid(h - 1, w - 1)
    k = jax.random.PRNGKey(1)
    fp = jax.random.uniform(k, (1, h, w, 3))
    fn_ = jax.random.uniform(jax.random.fold_in(k, 1), (1, h, w, 3))
    gh, gw = dg.shape[0], dg.shape[1]
    ident = jnp.broadcast_to(jnp.asarray(dg), (n - 1, 1, gh, gw, 2))

    base = make_flow_predict_fn(model, n=n, out_size=(h, w), default_grid=dg)
    q = make_flow_predict_fn(model, n=n, out_size=(h, w), default_grid=dg,
                             int8_decode=True)
    out_b = np.asarray(base(variables, fp, fn_, ident, ident))
    out_q = np.asarray(q(variables, fp, fn_, ident, ident))
    assert out_q.shape == out_b.shape
    assert (out_q == out_b).mean() > 0.97, (out_q == out_b).mean()


def test_runner_int8_auto_resolution():
    """Runner._int8_decode: None = auto (pspnet + int8-MXU backend only),
    explicit True/False always win."""
    from types import SimpleNamespace
    from floodseg_tpu.cli.runner import Runner

    def resolve(int8_decode, arch):
        r = Runner.__new__(Runner)
        r.cfg = SimpleNamespace(model=SimpleNamespace(
            int8_decode=int8_decode, arch=arch))
        return r._int8_decode()

    on_mxu = jax.default_backend() in ("tpu", "axon")
    assert resolve(True, "pspnet") is True
    assert resolve(True, "vit") is True       # forced: quant errors loudly
    assert resolve(False, "pspnet") is False
    assert resolve(None, "vit") is False      # no int8 MaskTransformer path
    assert resolve(None, "pspnet") is on_mxu       # auto = backend-gated
    assert resolve(None, "deeplabv3") is on_mxu    # DeepLabHead supported


def _perturb_bn(tree, key, is_stats):
    """Non-trivial BN running stats + affine so the folding algebra is
    actually exercised (init is mean=0/var=1/scale=1/bias=0)."""
    import zlib
    out = {}
    for k, v in tree.items():
        # crc32, not hash(): str hash is salted per process and would
        # make the fixture non-deterministic across runs
        key = jax.random.fold_in(key, zlib.crc32(k.encode()) % 2**30)
        if isinstance(v, dict):
            out[k] = _perturb_bn(v, key, is_stats)
        elif is_stats and k == "mean":
            out[k] = 0.3 * jax.random.normal(key, v.shape)
        elif is_stats and k == "var":
            out[k] = jnp.exp(0.5 * jax.random.normal(key, v.shape))
        elif not is_stats and k == "scale":
            out[k] = 1.0 + 0.1 * jax.random.normal(key, v.shape)
        elif not is_stats and k == "bias" and v.ndim == 1:
            out[k] = 0.1 * jax.random.normal(key, v.shape)
        else:
            out[k] = v
    return out


@pytest.fixture(scope="module")
def deeplab_vars():
    model = build_model("deeplabv3", classes=5, layers=50, with_aux=False)
    x0 = jnp.zeros((1, 33, 33, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    perturb = _perturb_bn

    variables = {
        "params": {**variables["params"],
                   "classifier": perturb(variables["params"]["classifier"],
                                         jax.random.PRNGKey(11), False)},
        "batch_stats": {**variables["batch_stats"],
                        "classifier": perturb(
                            variables["batch_stats"]["classifier"],
                            jax.random.PRNGKey(12), True)},
    }
    return model, variables


@pytest.mark.slow
def test_int8_deeplab_tracks_f32(deeplab_vars):
    """int8 DeepLabHead decode tracks the f32 decode; argmax maps barely
    move even on random near-uniform logits (the worst case)."""
    model, variables = deeplab_vars
    f = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(3),
                                      (2, 17, 19, 2048)))
    want = np.asarray(
        model.apply(variables, f, train=False, method="decode"), np.float32)
    got = np.asarray(jax.jit(quant.int8_deeplab_decode,
                             static_argnames=("dtype",))(
        variables["params"]["classifier"],
        variables["batch_stats"]["classifier"], f,
        dtype=jnp.float32), np.float32)
    assert got.shape == want.shape
    rng = np.abs(want).max()
    assert np.abs(got - want).max() / rng < 0.08, (
        np.abs(got - want).max(), rng)
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.95, agree


@pytest.mark.slow
def test_predict_fn_int8_deeplab_runs(deeplab_vars):
    """The fused flow-predict program routes deeplabv3 through the int8
    DeepLabHead and its class maps match the full-precision program.

    Slow tier (same reasoning as the pspnet counterpart): two full
    predict-program compiles over DeepLabV3-50."""
    from floodseg_tpu.train.flow import make_flow_predict_fn
    from floodseg_tpu.video.grid import default_grid

    model, variables = deeplab_vars
    n = 3
    h, w = 32, 32
    dg = default_grid(h, w)
    k = jax.random.PRNGKey(1)
    fp = jax.random.uniform(k, (1, h, w, 3))
    fn_ = jax.random.uniform(jax.random.fold_in(k, 1), (1, h, w, 3))
    gh, gw = dg.shape[0], dg.shape[1]
    ident = jnp.broadcast_to(jnp.asarray(dg), (n - 1, 1, gh, gw, 2))

    base = make_flow_predict_fn(model, n=n, out_size=(h, w), default_grid=dg)
    q = make_flow_predict_fn(model, n=n, out_size=(h, w), default_grid=dg,
                             int8_decode=True)
    out_b = np.asarray(base(variables, fp, fn_, ident, ident))
    out_q = np.asarray(q(variables, fp, fn_, ident, ident))
    assert out_q.shape == out_b.shape
    assert (out_q == out_b).mean() > 0.95, (out_q == out_b).mean()


@pytest.fixture(scope="module")
def pspnet_enc_vars():
    """PSPNet-50 with non-trivial BN stats in the BACKBONE and PPM so the
    trunk folding algebra is exercised end-to-end."""
    model = build_model("pspnet", classes=5, layers=50, with_aux=False)
    x0 = jnp.zeros((1, 33, 33, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    variables = {
        "params": {**variables["params"],
                   "backbone": _perturb_bn(variables["params"]["backbone"],
                                           jax.random.PRNGKey(21), False),
                   "ppm": _perturb_bn(variables["params"]["ppm"],
                                      jax.random.PRNGKey(22), False)},
        "batch_stats": {**variables["batch_stats"],
                        "backbone": _perturb_bn(
                            variables["batch_stats"]["backbone"],
                            jax.random.PRNGKey(23), True),
                        "ppm": _perturb_bn(variables["batch_stats"]["ppm"],
                                           jax.random.PRNGKey(24), True)},
    }
    return model, variables


@pytest.mark.slow
def test_int8_trunk_tracks_f32_encode(pspnet_enc_vars):
    """int8 W8A8 ResNet trunk + folded PPM tracks the flax eval encode, and
    the class maps after a full-precision decode barely move."""
    model, variables = pspnet_enc_vars
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 33, 33, 3))
    want = np.asarray(model.apply(variables, x, train=False,
                                  method="encode")[0], np.float32)
    p, s = variables["params"], variables["batch_stats"]

    @jax.jit
    def enc_q(x):
        c4 = quant.int8_resnet_trunk(p["backbone"], s["backbone"], x,
                                     depth=50, deep_base=True,
                                     semseg_dilation=True, dtype=jnp.float32)
        return quant.ppm_folded(p["ppm"], s["ppm"], c4, dtype=jnp.float32)

    got = np.asarray(enc_q(x), np.float32)
    assert got.shape == want.shape
    # feature error small relative to the feature scale, direction intact
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    cos = (got * want).sum() / (np.linalg.norm(got) * np.linalg.norm(want))
    assert rel < 0.10, rel
    assert cos > 0.995, cos
    # what matters downstream: the decoded class maps
    dec = jax.jit(lambda f: model.apply(variables, f, train=False,
                                        method="decode"))
    agree = (np.asarray(dec(got)).argmax(-1)
             == np.asarray(dec(want)).argmax(-1)).mean()
    assert agree > 0.90, agree


@pytest.mark.slow
def test_int8_trunk_deeplab_shape(deeplab_vars):
    """torchvision-style trunk (7x7 stem, first-block-keeps-prev-dilation)
    dispatches correctly and tracks the flax encode."""
    model, variables = deeplab_vars
    x = jax.random.uniform(jax.random.PRNGKey(6), (1, 32, 32, 3))
    want = np.asarray(model.apply(variables, x, train=False,
                                  method="encode")[0], np.float32)
    got = np.asarray(jax.jit(
        lambda x: quant.int8_resnet_trunk(
            variables["params"]["backbone"],
            variables["batch_stats"]["backbone"], x, depth=50,
            deep_base=False, semseg_dilation=False, dtype=jnp.float32))(x),
        np.float32)
    assert got.shape == want.shape
    cos = (got * want).sum() / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.995, cos


@pytest.mark.slow
def test_predict_fn_int8_encode_runs(pspnet_enc_vars):
    """The fused predict program compiles with int8_encode and its class
    maps track the full-precision-encoder program."""
    from floodseg_tpu.train.flow import make_flow_predict_fn
    from floodseg_tpu.video.grid import default_grid

    model, variables = pspnet_enc_vars
    n = 3
    h = w = 33
    dg = default_grid(h - 1, w - 1)
    k = jax.random.PRNGKey(8)
    fp = jax.random.uniform(k, (1, h, w, 3))
    fn_ = jax.random.uniform(jax.random.fold_in(k, 1), (1, h, w, 3))
    ident = jnp.broadcast_to(jnp.asarray(dg), (n - 1, 1, *dg.shape))

    base = make_flow_predict_fn(model, n=n, out_size=(h, w), default_grid=dg)
    q = make_flow_predict_fn(model, n=n, out_size=(h, w), default_grid=dg,
                             int8_encode=True)
    out_b = np.asarray(base(variables, fp, fn_, ident, ident))
    out_q = np.asarray(q(variables, fp, fn_, ident, ident))
    assert out_q.shape == out_b.shape
    assert (out_q == out_b).mean() > 0.90, (out_q == out_b).mean()


def test_predict_fn_int8_encode_vit_rejects():
    """Forced int8 encode on a conv-less backbone fails loudly at build.

    A tiny ViT suffices: the gate dispatches on the model TYPE before any
    compute, so depth/width are irrelevant (full-size init costs ~14 s)."""
    from floodseg_tpu.train.flow import make_flow_predict_fn
    from floodseg_tpu.video.grid import default_grid
    from floodseg_tpu.models.vit import SegmenterViT

    model = SegmenterViT(classes=5, image_size=64, patch_size=32,
                         d_model=64, n_layers=1, dec_layers=1)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    dg = default_grid(64, 64)
    fn = make_flow_predict_fn(model, n=3, out_size=(64, 64), default_grid=dg,
                              int8_encode=True)
    ident = jnp.broadcast_to(jnp.asarray(dg), (2, 1, *dg.shape))
    x = jnp.zeros((1, 64, 64, 3))
    with pytest.raises(ValueError, match="int8_encode supports"):
        fn(variables, x, x, ident, ident)


def test_predict_fn_int8_vit_rejects():
    """Forced int8 on an unsupported decoder fails loudly at build time
    (tiny ViT: the gate dispatches on model type, not weights)."""
    from floodseg_tpu.train.flow import make_flow_predict_fn
    from floodseg_tpu.video.grid import default_grid
    from floodseg_tpu.models.vit import SegmenterViT

    model = SegmenterViT(classes=5, image_size=64, patch_size=32,
                         d_model=64, n_layers=1, dec_layers=1)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    dg = default_grid(64, 64)
    fn = make_flow_predict_fn(model, n=3, out_size=(64, 64), default_grid=dg,
                              int8_decode=True)
    ident = jnp.broadcast_to(jnp.asarray(dg), (2, 1, *dg.shape))
    x = jnp.zeros((1, 64, 64, 3))
    with pytest.raises(ValueError, match="int8_decode supports"):
        fn(variables, x, x, ident, ident)

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


def _features(variables, shape=(2, 9, 11)):
    cin = variables["params"]["cls"]["conv1"]["kernel"].shape[2]
    f = jax.random.normal(jax.random.PRNGKey(3), (*shape, cin))
    return jax.nn.relu(f)  # PPM output is post-ReLU (non-negative)


def test_fold_bn_matches_eval_decode(pspnet_vars):
    """Folded-BN f32 head == model.apply(method='decode') eval forward."""
    model, variables = pspnet_vars
    f = _features(variables)
    want = model.apply(variables, f, train=False, method="decode")
    got = quant.seghead_decode_folded_f32(
        variables["params"]["cls"], variables["batch_stats"]["cls"], f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


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


def test_int8_decode_rejects_non_seghead(pspnet_vars):
    _, variables = pspnet_vars
    f = _features(variables)
    with pytest.raises(ValueError, match="SegHead"):
        quant.int8_seghead_decode({"conv1": {}},
                                  variables["batch_stats"]["cls"], f)


def test_predict_fn_int8_runs(pspnet_vars):
    """The fused predict program compiles and runs with int8_decode, and its
    class maps match the bf16-decode program almost everywhere."""
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

"""Model shape tests + forward parity of PSPNet against the reference model.

The reference's PSPNet (torch) is imported from /root/reference as a test
oracle: we randomize its weights/BN stats, convert the state_dict with
torch_import, and require identical eval-mode outputs.
"""

import sys
from types import SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from floodseg_tpu.models import build_model, S4GANDiscriminator

KEY = jax.random.PRNGKey(0)


def _init(model, x, train):
    return jax.jit(
        lambda: model.init({"params": KEY, "dropout": KEY}, x, train=train)
    )()


def test_pspnet_shapes():
    """One full PSPNet-50 init shared by the train/eval/encode/decode shape
    checks (each full-model compile costs ~30 s on a 1-CPU box, so the fast
    tier pays for exactly one)."""
    x = jnp.zeros((1, 33, 33, 3))
    m = build_model("pspnet", classes=5, layers=50, semisupervised=True)
    vs = _init(m, x, True)
    out, _ = jax.jit(
        lambda v: m.apply(v, x, train=True, rngs={"dropout": KEY}, mutable=["batch_stats"])
    )(vs)
    assert out["pred"].shape == (1, 33, 33, 5)
    assert out["aux"].shape == (1, 33, 33, 5)
    assert out["rep"].shape == (1, 33, 33, 256)
    # eval: only pred
    out_eval = jax.jit(lambda v: m.apply(v, x, train=False))(vs)
    assert set(out_eval) == {"pred"}
    # encode/decode split (same variables: rep head params are simply unused)
    f = m.apply(vs, x, train=False, method="encode")[0]
    assert f.shape == (1, 5, 5, 4096)  # stride 8: (33-1)/8+1, 2048*2 after PPM
    logits = m.apply(vs, f, train=False, method="decode")
    assert logits.shape == (1, 5, 5, 5)


@pytest.mark.slow
def test_deeplabv3_shapes():
    x = jnp.zeros((1, 32, 32, 3))
    m = build_model("deeplabv3", classes=5, layers=50, semisupervised=True)
    vs = _init(m, x, True)
    out, _ = jax.jit(
        lambda v: m.apply(v, x, train=True, rngs={"dropout": KEY}, mutable=["batch_stats"])
    )(vs)
    assert out["pred"].shape == (1, 32, 32, 5)
    assert out["aux"].shape == (1, 32, 32, 5)
    assert out["rep"].shape == (1, 32, 32, 256)


def test_vit_shapes():
    """Shape/padding semantics (pad-to-patch-multiple, rep head, pred) do
    not depend on depth/width, so a tiny ViT keeps this in the fast tier;
    the full-size ViT-B/32 is covered by the slow-tier timm-converter and
    trajectory oracles (test_vit_import / test_vit_trajectory)."""
    from floodseg_tpu.models.vit import SegmenterViT

    x = jnp.zeros((1, 64, 64, 3))
    m = SegmenterViT(classes=5, image_size=64, patch_size=32,
                     d_model=64, n_layers=2, dec_layers=1, with_rep=True)
    vs = _init(m, x, True)
    out = jax.jit(
        lambda v: m.apply(v, x, train=True, rngs={"dropout": KEY})
    )(vs)
    assert out["pred"].shape == (1, 64, 64, 5)
    assert out["rep"].shape == (1, 64, 64, 256)
    # non-multiple-of-patch input gets padded and unpadded
    x2 = jnp.zeros((1, 50, 70, 3))
    out2 = jax.jit(lambda v: m.apply(v, x2, train=False))(vs)
    assert out2["pred"].shape == (1, 50, 70, 5)
    # the factory still constructs the full-size variant (no init needed)
    assert build_model("vit", classes=5, image_size=64,
                       semisupervised=True).d_model == 768


def test_discriminator_shapes():
    d = S4GANDiscriminator(num_classes=5)
    x = jnp.zeros((2, 64, 64, 8))
    vs = d.init({"params": KEY, "dropout": KEY}, x, train=True)
    logit, feat = d.apply(vs, x, train=False)
    assert logit.shape == (2,)
    assert feat.shape == (2, 512)


@pytest.mark.slow
def test_pspnet_forward_parity_with_reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from model.pspnet import PSPNet as RefPSPNet  # noqa: E402

    from floodseg_tpu.models.torch_import import convert_pspnet_state_dict

    torch.manual_seed(0)
    ref = RefPSPNet(SimpleNamespace(layers=50, classes=5, pretrained=False))
    ref.eval()
    # randomize BN running stats so eval-mode normalization is nontrivial
    sd = ref.state_dict()
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.randn_like(v) * 0.2
        elif k.endswith("running_var"):
            sd[k] = torch.rand_like(v) + 0.5
    ref.load_state_dict(sd)

    x = np.random.default_rng(3).standard_normal((1, 3, 33, 33)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))["pred"].numpy().transpose(0, 2, 3, 1)

    m = build_model("pspnet", classes=5, layers=50)
    variables = convert_pspnet_state_dict(ref.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)
    ours = jax.jit(lambda v, y: m.apply(v, y, train=False))(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )["pred"]
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-3, atol=1e-3)


def test_torch_batch_norm_parity():
    """TorchBatchNorm (models/layers.py) vs torch nn.BatchNorm2d in f64:
    identical train-mode outputs, identical running stats (including the
    UNBIASED running_var update torch uses and flax's nn.BatchNorm does
    not), identical eval-mode outputs. This pins the semantics every
    composed train-trajectory oracle relies on."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn
    from floodseg_tpu.models.layers import batch_norm

    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        class M(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                return batch_norm(train, dtype=jnp.float64, name="bn")(x)

        rng = np.random.default_rng(0)
        m = M()
        v = m.init(KEY, jnp.zeros((2, 5, 5, 7)), train=True)
        v = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), v)
        tb = torch.nn.BatchNorm2d(7).double()
        vars_ = {"params": v["params"], "batch_stats": v["batch_stats"]}
        for _ in range(3):
            xi = rng.standard_normal((2, 5, 5, 7))
            y, mut = m.apply(vars_, jnp.asarray(xi), train=True,
                             mutable=["batch_stats"])
            vars_ = {"params": vars_["params"],
                     "batch_stats": mut["batch_stats"]}
            yt = tb(torch.from_numpy(xi.transpose(0, 3, 1, 2)))
            np.testing.assert_allclose(
                np.asarray(y), yt.detach().numpy().transpose(0, 2, 3, 1),
                rtol=1e-11, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(vars_["batch_stats"]["bn"]["mean"]),
            tb.running_mean.numpy(), rtol=1e-12, atol=1e-15)
        np.testing.assert_allclose(
            np.asarray(vars_["batch_stats"]["bn"]["var"]),
            tb.running_var.numpy(), rtol=1e-12)
        xe = rng.standard_normal((2, 5, 5, 7))
        tb.eval()
        ye = m.apply(vars_, jnp.asarray(xe), train=False)
        np.testing.assert_allclose(
            np.asarray(ye), tb(torch.from_numpy(
                xe.transpose(0, 3, 1, 2))).detach().numpy().transpose(
                    0, 2, 3, 1),
            rtol=1e-11, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", old)


@pytest.mark.slow
def test_vit_rep_two_hop_resize_quirk():
    """The ViT rep map must pass through the reference's ACCIDENTAL
    intermediate resize to (num_tokens+1, d_model) before the final resize
    to image size (model/vit.py:80-87 reads h, w off the hooked TOKEN
    tensor; wrapper.py:45-46 then resizes to the image). Bilinear is not
    transitive, so a direct one-hop resize is numerically different."""
    import jax
    import jax.numpy as jnp
    from floodseg_tpu.models.vit import SegmenterViT
    from floodseg_tpu.ops.resize import resize_bilinear

    # 3x3 patch grid: a 2x2 rep map is an exact bilinear field and the
    # two-hop collapses to the one-hop; 3x3 exposes the non-transitivity
    model = SegmenterViT(classes=5, image_size=96, patch_size=32,
                         d_model=64, n_layers=1, dec_layers=1,
                         dropout=0.0, with_rep=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 96, 96, 3)),
                    jnp.float32)
    k = jax.random.PRNGKey(0)
    variables = model.init({"params": k, "dropout": k}, x, train=True)
    out = model.apply(variables, x, train=True, rngs={"dropout": k})

    def raw_rep(m, x):
        xp = m._pad(x)
        h, w = xp.shape[1], xp.shape[2]
        f = m.encoder(xp, True)
        return m.rep_decoder(f[:, 1:], (h, w), True), f.shape

    rep0, fshape = model.apply(variables, x, method=raw_rep,
                               rngs={"dropout": k})
    n_tok, d = fshape[1], fshape[2]   # (9 patches + cls, d_model)
    assert (n_tok, d) == (10, 64)
    want = resize_bilinear(
        resize_bilinear(rep0, (n_tok, d), align_corners=True),
        (96, 96), align_corners=True)
    np.testing.assert_allclose(np.asarray(out["rep"]), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    one_hop = resize_bilinear(rep0, (96, 96), align_corners=True)
    assert np.abs(np.asarray(one_hop) - np.asarray(out["rep"])).max() > 1e-4

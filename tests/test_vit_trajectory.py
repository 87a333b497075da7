"""Composed ViT train-trajectory oracle vs a plain-torch Segmenter replica.

Companion to test_train_trajectory.py (PSPNet/SGD): composes the vit arch's
training path — patchify-projection, pre-LN attention blocks, GELU MLPs,
the LINEAR decoder, bilinear upsample, masked CE — through backward and
torch.optim.Adam with encoder@lr / decoder@10lr groups and the post-step
poly schedule (reference model/vit.py VITSemi grouping: modules_back =
[encoder], modules_head = [decoder]; supervised.py:161-163 Adam with
CLASSIC L2 weight decay; foundation.py:124-132 LR stepping).

The torch side is the same plain-ops forward the converter-parity tests
use (timm is absent from this image), made trainable by holding the state
dict as nn.Parameters — torch autograd differentiates through the
functional ops exactly like the module form.

Unlike the PSPNet oracle, EVERY op here is smooth (GELU/softmax/LayerNorm
— no ReLU masks, no maxpool, no BN), so there are no gradient-mask flips
and both f64 trajectories track at numerics level for all steps: every
assertion stays tight.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from floodseg_tpu.models.vit import SegmenterViT
from floodseg_tpu.models.torch_import import convert_segmenter_state_dict
from floodseg_tpu.train.optim import make_optimizer
from floodseg_tpu.train.state import TrainState
from floodseg_tpu.train.supervised import make_loss_fn, make_train_step

D, HEADS, LAYERS, PATCH, IMG = 32, 4, 2, 8, 32
N_CLS = 5
STEPS = 3
BASE_LR = 1e-3
MAX_ITER = 50
BATCH = 2


def _torch_params():
    g = torch.Generator().manual_seed(2)

    def t(*shape):
        return torch.randn(*shape, generator=g, dtype=torch.float64) * 0.1

    n_patches = (IMG // PATCH) ** 2
    sd = {
        "patch_embed.proj.weight": t(D, 3, PATCH, PATCH),
        "patch_embed.proj.bias": t(D),
        "cls_token": t(1, 1, D),
        "pos_embed": t(1, n_patches + 1, D),
        "norm.weight": 1 + t(D), "norm.bias": t(D),
    }
    for i in range(LAYERS):
        p = f"blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": 1 + t(D), f"{p}.norm1.bias": t(D),
            f"{p}.attn.qkv.weight": t(3 * D, D), f"{p}.attn.qkv.bias": t(3 * D),
            f"{p}.attn.proj.weight": t(D, D), f"{p}.attn.proj.bias": t(D),
            f"{p}.norm2.weight": 1 + t(D), f"{p}.norm2.bias": t(D),
            f"{p}.mlp.fc1.weight": t(4 * D, D), f"{p}.mlp.fc1.bias": t(4 * D),
            f"{p}.mlp.fc2.weight": t(D, 4 * D), f"{p}.mlp.fc2.bias": t(D),
        })
    head = {"head.weight": t(N_CLS, D), "head.bias": t(N_CLS)}
    return ({k: torch.nn.Parameter(v) for k, v in sd.items()},
            {k: torch.nn.Parameter(v) for k, v in head.items()})


def _torch_forward(enc, dec, x):
    """Reference Segmenter forward with DecoderLinear in plain torch ops
    (segm/model/{vit,blocks,decoder,segmenter}.py), trainable."""
    b = x.shape[0]
    tokens = F.conv2d(x, enc["patch_embed.proj.weight"],
                      enc["patch_embed.proj.bias"], stride=PATCH)
    tokens = tokens.flatten(2).transpose(1, 2)
    cls = enc["cls_token"].expand(b, -1, -1)
    tokens = torch.cat([cls, tokens], dim=1)
    tokens = tokens + enc["pos_embed"]
    for i in range(LAYERS):
        p = f"blocks.{i}"
        y = F.layer_norm(tokens, (D,), enc[f"{p}.norm1.weight"],
                         enc[f"{p}.norm1.bias"])
        qkv = F.linear(y, enc[f"{p}.attn.qkv.weight"], enc[f"{p}.attn.qkv.bias"])
        n = qkv.shape[1]
        qkv = qkv.reshape(b, n, 3, HEADS, D // HEADS).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (D // HEADS) ** -0.5
        attn = attn.softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(b, n, D)
        y = F.linear(y, enc[f"{p}.attn.proj.weight"], enc[f"{p}.attn.proj.bias"])
        tokens = tokens + y
        y = F.layer_norm(tokens, (D,), enc[f"{p}.norm2.weight"],
                         enc[f"{p}.norm2.bias"])
        y = F.linear(y, enc[f"{p}.mlp.fc1.weight"], enc[f"{p}.mlp.fc1.bias"])
        y = F.gelu(y)
        y = F.linear(y, enc[f"{p}.mlp.fc2.weight"], enc[f"{p}.mlp.fc2.bias"])
        tokens = tokens + y
    tokens = F.layer_norm(tokens, (D,), enc["norm.weight"], enc["norm.bias"])
    patches = tokens[:, 1:]
    logits = F.linear(patches, dec["head.weight"], dec["head.bias"])
    gs = IMG // PATCH
    logits = logits.transpose(1, 2).reshape(b, N_CLS, gs, gs)
    return F.interpolate(logits, size=(IMG, IMG), mode="bilinear",
                         align_corners=False)


@pytest.mark.slow
def test_vit_train_trajectory_matches_torch(x64):
    rng = np.random.default_rng(7)
    xs = rng.standard_normal((STEPS, BATCH, 3, IMG, IMG))
    ys = rng.integers(0, N_CLS, (STEPS, BATCH, IMG, IMG))
    ys = np.where(rng.random(ys.shape) < 0.05, 255, ys).astype(np.int64)
    x_eval = rng.standard_normal((BATCH, 3, IMG, IMG))

    # ---- torch: Adam(encoder@lr, decoder@10lr, classic-L2 wd) + poly ----
    enc, dec = _torch_params()
    crit = torch.nn.CrossEntropyLoss(ignore_index=255)
    opt = torch.optim.Adam(
        [{"params": list(enc.values()), "lr": BASE_LR},
         {"params": list(dec.values()), "lr": BASE_LR * 10}],
        lr=BASE_LR, weight_decay=1e-4)
    init_sd = {k: v.detach().clone() for k, v in {**enc, **dec}.items()}
    ref_losses = []
    for it in range(STEPS):
        out = _torch_forward(enc, dec, torch.from_numpy(xs[it]))
        loss = crit(out, torch.from_numpy(ys[it]))
        opt.zero_grad()
        loss.backward()
        opt.step()
        lr = BASE_LR * (1 - (it + 1) / MAX_ITER) ** 0.9
        opt.param_groups[0]["lr"] = lr
        opt.param_groups[1]["lr"] = lr * 10
        ref_losses.append(float(loss.detach()))
    with torch.no_grad():
        ref_eval = _torch_forward(enc, dec, torch.from_numpy(x_eval)).numpy()

    # ---- ours ----
    model = SegmenterViT(classes=N_CLS, image_size=IMG, patch_size=PATCH,
                         d_model=D, n_layers=LAYERS, n_heads=HEADS,
                         dropout=0.0, decoder_type="linear",
                         dtype=jnp.float64)
    full_sd = {f"model.encoder.{k}": v for k, v in init_sd.items()
               if not k.startswith("head.")}
    full_sd.update({f"model.decoder.{k}": v for k, v in init_sd.items()
                    if k.startswith("head.")})
    variables = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float64),
        convert_segmenter_state_dict(full_sd, n_layers=LAYERS,
                                     decoder="linear"))
    tx = make_optimizer(BASE_LR, MAX_ITER, "adam", weight_decay=1e-4)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"], batch_stats={},
                       opt_state=tx.init(variables["params"]), tx=tx)

    loss_fn = make_loss_fn("cross_entropy", aux_weight=0.0, ignore_index=255)
    step = jax.jit(make_train_step(model, loss_fn, N_CLS, 255))

    our_losses = []
    for it in range(STEPS):
        batch = {"frame_current": jnp.asarray(xs[it].transpose(0, 2, 3, 1)),
                 "label": jnp.asarray(ys[it].astype(np.int32))}
        state, metrics = step(state, batch, jax.random.PRNGKey(it))
        our_losses.append(float(metrics["loss"]))

    # smooth ops end-to-end: numerics-level agreement at EVERY step
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-7)

    our_eval = np.asarray(jax.jit(
        lambda v, x: model.apply({"params": v}, x, train=False)["pred"]
    )(state.params, jnp.asarray(x_eval.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(our_eval, ref_eval.transpose(0, 2, 3, 1),
                               rtol=1e-7, atol=1e-7)

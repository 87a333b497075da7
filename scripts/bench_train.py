#!/usr/bin/env python
"""Training-step throughput at the reference's production shapes.

Reference envelope (train.sh / configs/train_flow_gan.yaml): 1 GPU, batch 2,
crop 433x433, frame_delta 25, ResNet-101. Prints steps/sec per method on
the current device with synthetic device-resident batches (pure step time,
no input pipeline).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def synth_batch(rng, method, b, hw, delta, classes=5):
    img = lambda: jnp.asarray(rng.standard_normal((b, hw, hw, 3)), jnp.float32)
    lab = lambda: jnp.asarray(rng.integers(0, classes, (b, hw, hw)), jnp.int32)
    grids = lambda: jnp.asarray(
        rng.uniform(-1, 1, (delta - 1, b, hw // 16, hw // 16, 2)), jnp.float32)
    idx = lambda: jnp.asarray(rng.integers(1, delta, (b,)), jnp.int32)
    flow = {"frame_current": img(), "frame_prev": img(), "frame_next": img(),
            "mvs_left": grids(), "mvs_right": grids(),
            "left_index": idx(), "right_index": delta - idx()}
    if method == "supervised":
        return {"frame_current": img(), "label": lab()}
    if method == "flow_supervised":
        return {**flow, "label": lab()}
    if method == "gan":
        base = {"frame_current": img(), "label": lab()}
        return {"l": base, "u": {"frame_current": img()},
                "gt": {"frame_current": img(), "label": lab()}}
    if method == "flow_gan":
        return {"l": {**flow, "label": lab()},
                "u": dict(flow),
                "gt": {"frame_current": img(), "label": lab()}}
    if method == "contrastive":
        return {"l": {"frame_current": img(), "label": lab()},
                "u": {"frame_current": img()}}
    raise ValueError(method)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--method", default="flow_gan")
    p.add_argument("--layers", type=int, default=101)
    p.add_argument("--crop", type=int, default=433)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--delta", type=int, default=25)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--donate", action="store_true",
                   help="donate the input state buffers (halves live HBM "
                        "for params/opt state)")
    args = p.parse_args()

    from floodseg_tpu.models import build_model, S4GANDiscriminator
    from floodseg_tpu.train.optim import make_optimizer
    from floodseg_tpu.train.state import create_train_state
    from floodseg_tpu.train import supervised as sup
    from floodseg_tpu.train import flow as flow_mod
    from floodseg_tpu.train import gan as gan_mod
    from floodseg_tpu.train import contrastive as u2pl_mod

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    hw = args.crop
    model = build_model("pspnet", classes=5, layers=args.layers,
                        with_aux=args.method in ("supervised", "contrastive"),
                        semisupervised=args.method == "contrastive",
                        remat=args.remat, dtype=dtype)
    tx = make_optimizer(1e-4, 1000)
    sample = jnp.zeros((args.batch, hw, hw, 3), jnp.float32)
    batch = synth_batch(rng, args.method, args.batch, hw, args.delta)
    loss_fn = sup.make_loss_fn("ohem", 0.4 if args.method != "flow_supervised" else 0.0,
                               ohem_min_kept=100000)

    dn = (0,) if args.donate else ()
    dn2 = (0, 1) if args.donate else ()
    if args.method == "supervised":
        state = create_train_state(model, key, sample, tx)
        step = jax.jit(sup.make_train_step(model, loss_fn, 5),
                       donate_argnums=dn)
        run = lambda s, b, r: step(s, b, r)
    elif args.method == "flow_supervised":
        state = create_train_state(model, key, sample, tx)
        interp, _ = flow_mod.make_flow_train_step(model, loss_fn, 5)
        step = jax.jit(interp, donate_argnums=dn)
        run = lambda s, b, r: step(s, b, r)
    elif args.method in ("gan", "flow_gan"):
        model_d = S4GANDiscriminator(5, dtype=dtype)
        tx_d = make_optimizer(1e-4, 1000, optimizer="adam", betas=(0.9, 0.99),
                              weight_decay=0.0, head_lr_scale=1.0)
        sg = create_train_state(model, key, sample, tx)
        sd = create_train_state(model_d, key,
                                jnp.zeros((args.batch, hw, hw, 8), jnp.float32), tx_d)
        g_fwd = (gan_mod.flow_g_forward(model) if args.method == "flow_gan"
                 else gan_mod.single_frame_g_forward(model))
        gstep = jax.jit(gan_mod.make_gan_train_step(g_fwd, model_d, 5),
                        donate_argnums=dn2)
        state = (sg, sd)
        run = lambda s, b, r: gstep(s[0], s[1], b, r)[:2] + (None,)

        def run(s, b, r):
            a, d, m = gstep(s[0], s[1], b, r)
            return (a, d), m
    else:  # contrastive
        cfg = u2pl_mod.ContrastiveConfig(num_devices=1)
        state = u2pl_mod.create_u2pl_state(model, key, sample, tx)
        _, semi = u2pl_mod.make_u2pl_steps(model, 5, cfg)
        semi = jax.jit(semi, donate_argnums=dn)
        run = lambda s, b, r: semi(s, b, r, jnp.float32(0.5), jnp.int32(100))

    t0 = time.perf_counter()
    state, metrics = run(state, batch, key)
    first = float(jax.tree.leaves(metrics)[0].sum())
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = run(state, batch, jax.random.fold_in(key, i))
    _ = float(jax.tree.leaves(metrics)[0].sum())  # execution barrier
    dt = time.perf_counter() - t0
    print(f"{args.method} layers={args.layers} crop={args.crop} "
          f"batch={args.batch} {args.dtype}: "
          f"{dt / args.steps * 1000:.1f} ms/step = {args.steps / dt:.2f} steps/s "
          f"({args.batch * args.steps / dt:.2f} samples/s)")


if __name__ == "__main__":
    main()

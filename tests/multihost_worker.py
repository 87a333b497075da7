"""Worker for the 2-process multi-host smoke test (test_multihost.py).

Each process: rendezvous through the product's FLOODSEG_* env path
(parallel/dist.py — the role of the reference's SLURM+NCCL setup_distributed,
u2pl/utils/dist_helper.py:10-43), build the global DP mesh, contribute its
process-LOCAL half of the batch, run ONE supervised train step, and print
the (replicated) loss + a param checksum. The parent asserts both ranks
print identical values — the DDP-allreduce equivalence check.

Run standalone:
  FLOODSEG_MULTIHOST=1 FLOODSEG_COORDINATOR=localhost:PORT \
  FLOODSEG_NUM_PROCESSES=2 FLOODSEG_PROCESS_ID={0,1} python multihost_worker.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from floodseg_tpu.parallel.dist import maybe_initialize_multihost  # noqa: E402

assert maybe_initialize_multihost(), "FLOODSEG_MULTIHOST env missing"

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from floodseg_tpu.models import build_model  # noqa: E402
from floodseg_tpu.parallel import (  # noqa: E402
    create_mesh, make_sharded_train_step, replicated_sharding,
    shard_batch_local,
)
from floodseg_tpu.train.optim import make_optimizer  # noqa: E402
from floodseg_tpu.train.state import create_train_state  # noqa: E402
from floodseg_tpu.train.supervised import make_loss_fn, make_train_step  # noqa: E402


def main():
    rank = jax.process_index()
    world = jax.process_count()
    mesh = create_mesh()  # all devices across all processes

    model = build_model("pspnet", classes=5, layers=50)
    tx = make_optimizer(base_lr=0.01, max_iter=10)
    # identical PRNG on every process -> identical replicated init
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((world, 33, 33, 3)), tx=tx)
    state = jax.device_put(state, replicated_sharding(mesh))

    loss_fn = make_loss_fn("ohem", aux_weight=0.4, ohem_min_kept=100)
    step = make_sharded_train_step(
        make_train_step(model, loss_fn, num_classes=5), mesh)

    # each rank contributes ITS OWN local sample (different data per rank,
    # like a DistributedSampler shard)
    rng = np.random.default_rng(100 + rank)
    batch = shard_batch_local(
        {"frame_current": rng.standard_normal((1, 33, 33, 3)).astype(
            np.float32),
         "label": rng.integers(0, 5, size=(1, 33, 33)).astype(np.int32)},
        mesh)

    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics)
    # loss/params are replicated -> identical across ranks iff the gradient
    # all-reduce really spanned both processes
    leaf = jax.tree.leaves(new_state.params)[0]
    print("RESULT " + json.dumps({
        "rank": rank,
        "world": world,
        "global_devices": len(jax.devices()),
        "loss": round(float(metrics["loss"]), 6),
        "param_checksum": round(float(jnp.sum(jnp.abs(leaf))), 4),
    }), flush=True)


if __name__ == "__main__":
    main()

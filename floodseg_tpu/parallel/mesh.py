"""Device mesh + sharding rules.

The reference's only parallelism is single-node data parallelism: Lightning
DDP/NCCL with SyncBatchNorm and sync_dist metric reduction (SURVEY §2.3,
/root/reference/configs/train_base.yaml:24, base/cli.py:159). The TPU-native
equivalent needs no NCCL and no gradient hooks:

- one ``jax.sharding.Mesh`` over all chips (ICI; add a "dcn" outer axis for
  multi-slice later);
- the train step jitted with the BATCH sharded over the "data" axis and the
  train state replicated — XLA inserts the grad all-reduce;
- BatchNorm statistics are computed over the GLOBAL logical batch under this
  sharding, which is exactly SyncBatchNorm;
- metric counts (intersection/union/target) come back replicated (they are
  reductions over the global batch), replacing sync_dist=True.

Multi-host entry: call ``jax.distributed.initialize()`` before anything else
(cli handles this), then the same code runs unchanged — ``jax.devices()``
spans all hosts.
"""

from typing import Callable, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(axes: Sequence[str] = ("data",),
                shape: Optional[Sequence[int]] = None,
                devices=None) -> Mesh:
    """Mesh over all (or given) devices; defaults to 1-D data parallelism."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    return Mesh(devices.reshape(tuple(shape)), tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data",
                time_major_keys=("mvs_left", "mvs_right")) -> dict:
    """Device-put a numpy batch with the batch dim sharded over ``axis``.

    Grid chains are time-major (T, B, ...) so their SECOND dim is the batch
    dim; scalars/indices shard on their only dim.
    """
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if k in time_major_keys:
            spec = P(None, axis)
        elif v.ndim == 0:
            spec = P()
        else:
            spec = P(axis)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def shard_batch_local(batch: dict, mesh: Mesh, axis: str = "data",
                      time_major_keys=("mvs_left", "mvs_right")) -> dict:
    """Multi-host ``shard_batch``: each process passes its process-LOCAL
    slice of the global batch (its own data loader's output, like each DDP
    rank's DistributedSampler shard) and the pieces assemble into one global
    jax.Array without any cross-host copy. Single-process this degenerates
    to ``shard_batch`` semantics.
    """
    nproc = jax.process_count()
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if k in time_major_keys:
            spec = P(None, axis)
            gshape = (v.shape[0], v.shape[1] * nproc) + v.shape[2:]
        elif v.ndim == 0:
            spec = P()
            gshape = ()
        else:
            spec = P(axis)
            gshape = (v.shape[0] * nproc,) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), v, gshape)
    return out


def sharded_jit(fn: Callable, mesh: Mesh, batch_argnums=(1,),
                donate_argnums=()) -> Callable:
    """jit ``fn`` for data parallelism over ``mesh``: every argument except
    the batch args is constrained replicated, batches arrive pre-sharded by
    ``shard_batch``. XLA inserts the gradient all-reduce; BatchNorm moments
    over the sharded batch dim are global (= SyncBatchNorm); metric
    reductions come back replicated (= sync_dist=True)."""
    repl = replicated_sharding(mesh)
    batch_argnums = set(batch_argnums)

    def constrained(*args):
        args = [a if i in batch_argnums
                else jax.lax.with_sharding_constraint(a, repl)
                for i, a in enumerate(args)]
        return fn(*args)

    return jax.jit(constrained, donate_argnums=donate_argnums)


def make_sharded_train_step(train_step: Callable, mesh: Mesh) -> Callable:
    """jit ``train_step(state, batch, rng)`` with state replicated and the
    batch sharded (XLA adds the gradient all-reduce). The batch must be
    placed with ``shard_batch`` — the axis lives in its shardings."""
    return sharded_jit(train_step, mesh, batch_argnums=(1,),
                       donate_argnums=(0,))


def make_dp_predict_fn(predict_fn: Callable, mesh: Mesh,
                       axis: str = "data") -> Callable:
    """Data-parallel clip inference: different key-frame windows to
    different chips.

    Wraps a single-clip ``predict_fn(variables, fp, fn, ml, mr)`` so a batch
    of D clips (leading dim = mesh size) runs one-per-chip via shard_map;
    variables are replicated. Scales video throughput linearly over ICI —
    headroom beyond the reference's single-GPU predict loop.
    """
    from jax import shard_map

    def per_chip(variables, fp, fn_, ml, mr):
        # shards arrive exactly as one clip: fp (1, H, W, 3), ml (T, 1, ...)
        out = predict_fn(variables, fp, fn_, ml, mr)
        return out[None]

    sharded = shard_map(
        per_chip, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(None, axis), P(None, axis)),
        out_specs=P(axis),
        check_vma=False,  # jax>=0.9 name for check_rep
    )
    return jax.jit(sharded)

"""Multi-host rendezvous (the reference's NCCL/SLURM init, TPU-native).

The reference rendezvouses DDP workers through SLURM env vars + NCCL
(/root/reference/u2pl/utils/dist_helper.py:10-43,
/root/reference/segm/utils/distributed.py:10-35: read PROCID/NTASKS/
MASTER_ADDR, init_process_group("nccl")). The TPU equivalent is one
``jax.distributed.initialize`` per host process; afterwards every process
sees the global device list and a single Mesh + XLA collectives replace
NCCL (SURVEY §5.8).

Env surface (read by the CLI when FLOODSEG_MULTIHOST is set):
  FLOODSEG_COORDINATOR    host:port   (MASTER_ADDR:MASTER_PORT equivalent)
  FLOODSEG_NUM_PROCESSES  world size  (NTASKS / WORLD_SIZE)
  FLOODSEG_PROCESS_ID     this rank   (PROCID / RANK)
On TPU pods all three may be omitted — the coordinator auto-detects from
the pod metadata.
"""

import os


def maybe_initialize_multihost(env=os.environ) -> bool:
    """Initialize jax.distributed iff FLOODSEG_MULTIHOST is set.

    Returns True when initialization ran. Explicit rendezvous must be fully
    specified: defaulting a missing NUM_PROCESSES/PROCESS_ID to a 1-process
    topology would make every pod host train independently instead of
    failing loudly on a half-configured launch.
    """
    if not env.get("FLOODSEG_MULTIHOST"):
        return False
    import jax

    kw = {}
    if env.get("FLOODSEG_COORDINATOR"):
        missing = [v for v in ("FLOODSEG_NUM_PROCESSES",
                               "FLOODSEG_PROCESS_ID")
                   if env.get(v) is None]
        if missing:
            raise RuntimeError(
                "FLOODSEG_COORDINATOR is set but "
                f"{', '.join(missing)} is not; explicit multihost "
                "rendezvous needs all three (MASTER_ADDR/WORLD_SIZE/"
                "RANK equivalents)")
        kw = dict(
            coordinator_address=env["FLOODSEG_COORDINATOR"],
            num_processes=int(env["FLOODSEG_NUM_PROCESSES"]),
            process_id=int(env["FLOODSEG_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kw)
    print(f"[multihost] jax.distributed initialized: "
          f"process {jax.process_index()}/{jax.process_count()}",
          flush=True)
    return True

"""2-process multi-host smoke: the FLOODSEG_MULTIHOST rendezvous path
end-to-end (VERDICT r3 item 6).

Spawns two OS processes that rendezvous through parallel/dist.py
(jax.distributed.initialize with explicit coordinator/world/rank — the
TPU-native analogue of the reference's SLURM+NCCL setup_distributed,
/root/reference/u2pl/utils/dist_helper.py:10-43) and run one supervised DP
train step over the 2-device global mesh. Both ranks must report the SAME
loss and post-step param checksum: that equality only holds if the gradient
all-reduce actually crossed the process boundary.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_rendezvous_and_dp_step():
    port = _free_port()
    procs = []
    for rank in range(2):
        env = os.environ.copy()
        env.update({
            "FLOODSEG_MULTIHOST": "1",
            "FLOODSEG_COORDINATOR": f"localhost:{port}",
            "FLOODSEG_NUM_PROCESSES": "2",
            "FLOODSEG_PROCESS_ID": str(rank),
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        })
        # the pytest parent's XLA_FLAGS forces 8 virtual devices; the
        # workers must see 1 CPU device each (a real per-host topology)
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO))

    results = []
    for rank, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-3000:]}"
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"rank {rank} printed no RESULT:\n{out[-1000:]}"
        results.append(json.loads(lines[0][len("RESULT "):]))

    r0, r1 = sorted(results, key=lambda r: r["rank"])
    assert r0["world"] == r1["world"] == 2
    assert r0["global_devices"] == r1["global_devices"] == 2
    # replicated outputs agree across ranks <=> the all-reduce spanned both
    assert r0["loss"] == r1["loss"]
    assert r0["param_checksum"] == r1["param_checksum"]
    import math
    assert math.isfinite(r0["loss"])

"""Small-utility coverage: ConcatDataset routing, PhaseProfiler, checkpoint
top-k retention."""

import numpy as np

from floodseg_tpu.core.profiler import PhaseProfiler
from floodseg_tpu.data.dataset import ConcatDataset


class _FakeDs:
    def __init__(self, n, tag):
        self.n, self.tag = n, tag

    def __len__(self):
        return self.n

    def get(self, i, rng):
        return {"tag": self.tag, "i": i}


def test_concat_dataset_routes_and_tags():
    ds = ConcatDataset([_FakeDs(3, "a"), _FakeDs(2, "b")])
    assert len(ds) == 5
    rng = np.random.default_rng(0)
    assert ds.get(0, rng) == {"tag": "a", "i": 0, "dataset_idx": 0}
    assert ds.get(3, rng) == {"tag": "b", "i": 0, "dataset_idx": 1}
    assert ds.get(-1, rng) == {"tag": "b", "i": 1, "dataset_idx": 1}


def test_phase_profiler():
    import time
    p = PhaseProfiler()
    with p.profile("x"):
        time.sleep(0.01)
    with p.profile("x"):
        time.sleep(0.01)
    s = p.summary()
    assert s["x"]["count"] == 2
    assert s["x"]["mean"] >= 0.009
    assert p.sum("x") >= 0.018


def test_checkpoint_topk(tmp_path):
    import jax.numpy as jnp
    from floodseg_tpu.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), save_top_k=2)
    for epoch, miou in enumerate([0.1, 0.5, 0.3, 0.7]):
        state = {"w": jnp.full((2,), float(epoch))}
        mgr.save(state, epoch, {"val_miou_epoch": miou})
    # top-2 kept: epochs 3 (0.7) and 1 (0.5)
    kept = {e["epoch"] for e in mgr._index}
    assert kept == {1, 3}
    assert mgr.best_path.endswith("epoch=3-val_miou_epoch=0.7000")
    restored = mgr.restore({"w": jnp.zeros((2,))}, mgr.best_path)
    np.testing.assert_array_equal(np.asarray(restored["w"]), [3.0, 3.0])
    # last == newest
    restored_last = mgr.restore({"w": jnp.zeros((2,))})
    np.testing.assert_array_equal(np.asarray(restored_last["w"]), [3.0, 3.0])
    # a save that cannot enter the top-k skips the named write entirely,
    # but still refreshes "last" and the resume epoch
    import os
    mgr.save({"w": jnp.full((2,), 4.0)}, 4, {"val_miou_epoch": 0.05})
    mgr.wait()
    assert not any(f.startswith("epoch=4") for f in os.listdir(mgr.directory))
    assert mgr.last_epoch == 4
    restored_last = mgr.restore({"w": jnp.zeros((2,))})
    np.testing.assert_array_equal(np.asarray(restored_last["w"]), [4.0, 4.0])
    assert {e["epoch"] for e in mgr._index} == {1, 3}


def test_checkpoint_topk_zero(tmp_path):
    """save_top_k=0 keeps no named checkpoints but still refreshes 'last'
    (Lightning semantics; regressed once when retention moved up-front)."""
    import os
    import jax.numpy as jnp
    from floodseg_tpu.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), save_top_k=0)
    for epoch in range(2):
        mgr.save({"w": jnp.full((2,), float(epoch))}, epoch,
                 {"val_miou_epoch": 0.5})
    mgr.wait()
    assert not any(f.startswith("epoch=") for f in os.listdir(mgr.directory))
    assert mgr.best_path is None
    assert mgr.last_epoch == 1
    restored = mgr.restore({"w": jnp.zeros((2,))})
    np.testing.assert_array_equal(np.asarray(restored["w"]), [1.0, 1.0])


def test_every_config_field_is_read_somewhere():
    """Declared config surface that nothing reads is a parity lie: every
    dataclass field must be referenced outside its declaration site (the
    reference honors each of these knobs via Lightning/jsonargparse)."""
    import dataclasses
    import glob
    import os
    import re
    from floodseg_tpu.core import config as cfgmod

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = []
    for pat in ("floodseg_tpu/**/*.py", "scripts/*.py", "bench.py"):
        for f in glob.glob(os.path.join(root, pat), recursive=True):
            if f.endswith(os.path.join("core", "config.py")):
                continue  # the declaration site itself doesn't count
            with open(f) as fh:
                src.append(fh.read())
    blob = "\n".join(src)
    dead = []
    for cls in (cfgmod.Config, cfgmod.ModelConfig, cfgmod.DataConfig,
                cfgmod.TrainerConfig, cfgmod.OptimConfig, cfgmod.LossConfig,
                cfgmod.ContrastiveCfg):
        for f in dataclasses.fields(cls):
            if not re.search(rf"\b{re.escape(f.name)}\b", blob):
                dead.append(f"{cls.__name__}.{f.name}")
    assert not dead, f"dead config knobs (declared but never read): {dead}"


def test_checkpoint_missing_monitor_never_topk(tmp_path):
    """Epochs where the monitored metric was not computed (eval skipped)
    write only last-{epoch}: an un-evaluated model must never become
    best_path even while top-k slots are free."""
    import os
    import jax.numpy as jnp
    from floodseg_tpu.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), save_top_k=3)
    mgr.save({"w": jnp.zeros((2,))}, 0, {})  # eval skipped this epoch
    mgr.wait()
    assert mgr.best_path is None
    assert not any(f.startswith("epoch=") for f in os.listdir(mgr.directory))
    assert mgr.last_epoch == 0
    mgr.save({"w": jnp.ones((2,))}, 1, {"val_miou_epoch": 0.4})
    mgr.wait()
    assert mgr.best_path.endswith("epoch=1-val_miou_epoch=0.4000")


def test_checkpoint_symlink_fresh_every_save(tmp_path):
    """The 'last' convenience symlink is refreshed during save() — not only
    at end-of-fit wait() — so an external reader (test.sh/predict.sh started
    mid-training) never sees it dangle after older last-{e} dirs are
    pruned."""
    import os
    import jax.numpy as jnp
    from floodseg_tpu.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), save_top_k=1)
    for epoch in range(3):
        mgr.save({"w": jnp.full((2,), float(epoch))}, epoch,
                 {"val_miou_epoch": 0.5})
        link = os.path.join(mgr.directory, "last")
        # mid-training (no wait() yet): the symlink exists and its target is
        # a finalized checkpoint directory
        if epoch > 0:
            assert os.path.islink(link)
            assert os.path.isdir(os.path.realpath(link))
    mgr.wait()


def test_checkpoint_crash_leaves_durable_last(tmp_path):
    """At any instant there is a complete last-{epoch} on disk: the previous
    one is only removed after the next save has drained."""
    import os
    import jax.numpy as jnp
    from floodseg_tpu.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), save_top_k=1)
    mgr.save({"w": jnp.ones((2,))}, 0, {"val_miou_epoch": 0.5})
    # epoch 1's write may be in flight right after save() returns; epoch 0's
    # durable last must still exist until the NEXT save drains
    mgr.save({"w": jnp.full((2,), 2.0)}, 1, {"val_miou_epoch": 0.6})
    lasts = [f for f in os.listdir(mgr.directory) if f.startswith("last-")
             and ".orbax-checkpoint-tmp" not in f]
    assert "last-0" in lasts
    mgr.wait()
    # a fresh manager (crash-restart) resumes from the newest durable last
    mgr2 = CheckpointManager(str(tmp_path / "ck"), save_top_k=1)
    assert mgr2.last_epoch == 1
    # the legacy 'last' name resolves (symlink refreshed by wait)
    restored = mgr2.restore({"w": jnp.zeros((2,))},
                            os.path.join(mgr.directory, "last"))
    np.testing.assert_array_equal(np.asarray(restored["w"]), [2.0, 2.0])


def test_checkpoint_last_resolution_edge_cases(tmp_path):
    """'last' resolution: cross-directory requests never fall back to the
    manager's own run; a stale symlink is re-resolved to the newest durable
    last-{epoch}; legacy last_meta.json drives resume before the
    metric-pruned index; crash-orphaned index entries are dropped."""
    import json
    import pytest
    import os
    import jax.numpy as jnp
    from floodseg_tpu.core.checkpoint import CheckpointManager

    # run A: two durable lasts + a STALE symlink left by an earlier wait()
    a = CheckpointManager(str(tmp_path / "A"), save_top_k=1)
    a.save({"w": jnp.full((2,), 5.0)}, 5, {"val_miou_epoch": 0.5})
    a.wait()  # symlink last -> last-5
    a.save({"w": jnp.full((2,), 6.0)}, 6, {"val_miou_epoch": 0.6})
    a._ckptr.wait_until_finished()  # durable, but symlink still -> last-5

    # run B: a different run entirely
    b = CheckpointManager(str(tmp_path / "B"), save_top_k=1)
    b.save({"w": jnp.zeros((2,))}, 0, {"val_miou_epoch": 0.1})
    b.wait()

    # manager B restoring A's '.../last' must yield A's NEWEST durable
    # epoch (6), not the stale symlink target (5) and never B's weights
    restored = b.restore({"w": jnp.zeros((2,))},
                         str(tmp_path / "A" / "last"))
    np.testing.assert_array_equal(np.asarray(restored["w"]), [6.0, 6.0])

    # a '.../last' request for an empty directory raises instead of
    # silently resolving against the manager's own run
    os.makedirs(tmp_path / "C")
    with pytest.raises(FileNotFoundError):
        b.restore({"w": jnp.zeros((2,))}, str(tmp_path / "C" / "last"))

    # legacy layout: unversioned 'last' + last_meta.json beats the
    # metric-pruned index's max epoch for resume
    legacy = tmp_path / "L"
    lm = CheckpointManager(str(legacy), save_top_k=5)
    lm.save({"w": jnp.ones((2,))}, 7, {"val_miou_epoch": 0.9})
    lm.wait()
    os.remove(legacy / "last")  # drop the symlink; fabricate legacy layout
    os.rename(legacy / "last-7", legacy / "last")
    (legacy / "last_meta.json").write_text(json.dumps({"epoch": 9}))
    lm2 = CheckpointManager(str(legacy), save_top_k=5)
    assert lm2.last_epoch == 9

    # crash-orphaned index entries (dir never finalized) are dropped on load
    ghost_dir = tmp_path / "G"
    g = CheckpointManager(str(ghost_dir), save_top_k=2)
    g.save({"w": jnp.ones((2,))}, 0, {"val_miou_epoch": 0.5})
    g.wait()
    idx = json.loads((ghost_dir / "index.json").read_text())
    idx.append({"name": "epoch=1-val_miou_epoch=0.9000", "epoch": 1,
                "metric": 0.9})
    (ghost_dir / "index.json").write_text(json.dumps(idx))
    g2 = CheckpointManager(str(ghost_dir), save_top_k=2)
    assert len(g2._index) == 1
    assert g2.best_path.endswith("epoch=0-val_miou_epoch=0.5000")

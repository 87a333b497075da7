"""Checkpointing: orbax-backed save/restore with top-k retention.

Reference semantics (base/cli.py:138-148): save every epoch, keep the top 5
by val_miou_epoch plus "last"; filenames carry epoch + metric; after_run
re-evaluates the best checkpoint. Full train state (params + BN stats +
optimizer state + step) round-trips.
"""

import json
import os
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, save_top_k: int = 5,
                 monitor: str = "val_miou_epoch", mode: str = "max"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_top_k = save_top_k
        self.monitor = monitor
        self.mode = mode
        self._index_path = os.path.join(self.directory, "index.json")
        self._last_meta_path = os.path.join(self.directory, "last_meta.json")
        self._index: List[Dict] = []
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._index = json.load(f)
        self._ckptr = ocp.StandardCheckpointer()

    # ---- paths ----

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    @property
    def last_path(self) -> Optional[str]:
        p = self._path("last")
        return p if os.path.exists(p) else None

    @property
    def last_epoch(self) -> Optional[int]:
        """Epoch of the "last" checkpoint. Tracked in its own meta file: the
        top-k index prunes by METRIC, so its max epoch can be older than the
        newest save and must not drive resume."""
        if os.path.exists(self._last_meta_path):
            with open(self._last_meta_path) as f:
                return json.load(f)["epoch"]
        if self._index:  # legacy checkpoints saved before last_meta existed
            return max(e["epoch"] for e in self._index)
        return None

    @property
    def best_path(self) -> Optional[str]:
        if not self._index:
            return None
        best = max(self._index, key=lambda e: e["metric"]) if self.mode == "max" \
            else min(self._index, key=lambda e: e["metric"])
        return self._path(best["name"])

    # ---- save / restore ----

    def save(self, state: Any, epoch: int, metrics: Dict[str, float]):
        """Async save: writes overlap the next epoch's compute. The barrier
        sits at the START of the next save (and in restore/wait), so only
        quiesced directories are ever pruned or re-read."""
        self._ckptr.wait_until_finished()  # drain the previous epoch's writes
        metric = float(metrics.get(self.monitor, float("-inf")))
        name = f"epoch={epoch}-{self.monitor}={metric:.4f}"
        # decide retention up-front: skip the named save when it would not
        # survive the top-k prune (one write saved vs write-then-delete)
        keeps = self.save_top_k < 0 or len(self._index) < self.save_top_k
        if not keeps:
            key = (min if self.mode == "max" else max)
            worst = key(self._index, key=lambda e: e["metric"])["metric"]
            keeps = metric > worst if self.mode == "max" else metric < worst
        if keeps:
            self._ckptr.save(self._path(name), state, force=True)
            self._index.append({"name": name, "epoch": epoch, "metric": metric})
        last = self._path("last")
        if os.path.exists(last):
            shutil.rmtree(last)
        self._ckptr.save(last, state, force=True)
        with open(self._last_meta_path, "w") as f:
            json.dump({"epoch": epoch}, f)
        self._prune()
        with open(self._index_path, "w") as f:
            json.dump(self._index, f, indent=1)

    def wait(self):
        """Block until all in-flight async writes are durable."""
        self._ckptr.wait_until_finished()

    def _prune(self):
        if self.save_top_k < 0:
            return
        key = (lambda e: -e["metric"]) if self.mode == "max" else (lambda e: e["metric"])
        keep = sorted(self._index, key=key)[: self.save_top_k]
        keep_names = {e["name"] for e in keep}
        for e in list(self._index):
            if e["name"] not in keep_names:
                p = self._path(e["name"])
                if os.path.exists(p):
                    shutil.rmtree(p)
                self._index.remove(e)

    def restore(self, target: Any, path: Optional[str] = None) -> Any:
        """Restore into the structure of ``target`` (a concrete train state)."""
        self._ckptr.wait_until_finished()  # in case a save is in flight
        path = path or self.last_path
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return self._ckptr.restore(path, target)


def save_variables(path: str, variables: Any):
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), variables, force=True)
    ckptr.wait_until_finished()


def restore_variables(path: str, target: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)

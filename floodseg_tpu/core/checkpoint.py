"""Checkpointing: orbax-backed save/restore with top-k retention.

Reference semantics (base/cli.py:138-148): save every epoch, keep the top 5
by val_miou_epoch plus "last"; filenames carry epoch + metric; after_run
re-evaluates the best checkpoint. Full train state (params + BN stats +
optimizer state + step) round-trips.

Saves are ASYNC (orbax finishes the device-to-host copy before returning;
the disk write overlaps the next epoch). Crash safety: "last" is a
versioned ``last-{epoch}`` directory — orbax finalizes atomically (tmp dir
+ rename), and the previous epoch's last-* is only removed AFTER the next
save has drained, so a crash at any instant leaves at least one complete
last checkpoint on disk.
"""

import json
import os
import shutil
from typing import Any, Dict, List, Optional, Tuple

import orbax.checkpoint as ocp


def _is_finalized(path: str) -> bool:
    """True for a completed orbax checkpoint dir (tmp dirs carry an
    ``.orbax-checkpoint-tmp`` infix until the atomic rename)."""
    return os.path.isdir(path) and ".orbax-checkpoint-tmp" not in path


def _scan_last_entries(directory: str) -> List[Tuple[int, str]]:
    """Finalized (epoch, path) last-checkpoints in ``directory``, oldest
    first; the legacy unversioned 'last' dir sorts before any last-{e}."""
    out = []
    if not os.path.isdir(directory):
        return out
    for f in os.listdir(directory):
        p = os.path.join(directory, f)
        if f.startswith("last-") and _is_finalized(p):
            try:
                out.append((int(f[len("last-"):]), p))
            except ValueError:
                continue
        elif f == "last" and not os.path.islink(p) and _is_finalized(p):
            out.append((-1, p))  # legacy unversioned "last"
    return sorted(out)


def _resolve_last(path: str) -> Optional[str]:
    """Resolve a ``.../last`` request to the newest durable last checkpoint
    IN THAT DIRECTORY (never another manager's) — covers both a missing
    'last' (crash before the symlink refresh) and a stale symlink left by
    an earlier completed fit."""
    entries = _scan_last_entries(os.path.dirname(os.path.abspath(path)))
    if entries:
        return entries[-1][1]
    # legacy layout: the literal (non-symlink) dir is all there is
    return path if os.path.exists(path) else None


class CheckpointManager:
    def __init__(self, directory: str, save_top_k: int = 5,
                 monitor: str = "val_miou_epoch", mode: str = "max"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_top_k = save_top_k
        self.monitor = monitor
        self.mode = mode
        self._index_path = os.path.join(self.directory, "index.json")
        self._index: List[Dict] = []
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._index = json.load(f)
            # drop crash orphans: index.json is written while the async
            # checkpoint write is still in flight, so a crash can leave
            # entries whose directory never finalized — keeping them would
            # waste top-k retention slots and skew best_path forever
            self._index = [e for e in self._index
                           if _is_finalized(self._path(e["name"]))]
        self._ckptr = ocp.StandardCheckpointer()

    # ---- paths ----

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def _last_entries(self) -> List[Tuple[int, str]]:
        return _scan_last_entries(self.directory)

    @property
    def last_path(self) -> Optional[str]:
        entries = self._last_entries()
        return entries[-1][1] if entries else None

    @property
    def last_epoch(self) -> Optional[int]:
        """Epoch of the newest durable last checkpoint. Derived from what is
        actually ON DISK (not the metric-pruned top-k index, whose max epoch
        can be older than the newest save; and not a meta file, which could
        outrun a crashed async write)."""
        entries = self._last_entries()
        if entries and entries[-1][0] >= 0:
            return entries[-1][0]
        # legacy layout (pre-versioned 'last'): last_meta.json recorded the
        # epoch of the newest save — the top-k index prunes by METRIC and
        # its max epoch can be older, so it is only the final fallback
        meta = self._path("last_meta.json")
        if os.path.exists(meta):
            with open(meta) as f:
                return json.load(f)["epoch"]
        if self._index:
            return max(e["epoch"] for e in self._index)
        return None

    @property
    def best_path(self) -> Optional[str]:
        # only entries whose write finalized (a crash can leave index.json
        # referencing a checkpoint whose tmp dir was never renamed)
        live = [e for e in self._index if _is_finalized(self._path(e["name"]))]
        if not live:
            return None
        best = max(live, key=lambda e: e["metric"]) if self.mode == "max" \
            else min(live, key=lambda e: e["metric"])
        return self._path(best["name"])

    # ---- save / restore ----

    def save(self, state: Any, epoch: int, metrics: Dict[str, float]):
        """Async save: writes overlap the next epoch's compute. The barrier
        sits at the START of the next save (and in restore/wait), so only
        quiesced directories are ever pruned or re-read.

        Epochs where the monitored metric was not computed (eval skipped —
        check_val_every_n_epoch > 1, or no val set) write ONLY the
        crash-fallback last-{epoch}: an un-evaluated model must never occupy
        a top-k slot or become best_path."""
        self._ckptr.wait_until_finished()  # drain the previous epoch's writes
        # previous last-* checkpoints are durable now — drop all but the
        # newest (it remains the crash fallback until THIS save drains)
        for _, p in self._last_entries()[:-1]:
            shutil.rmtree(p)
        # the survivor is durable: point the convenience 'last' symlink at it
        # NOW so external readers (test.sh/predict.sh mid-training, or after
        # a crash) never see it dangle until end-of-fit wait()
        self._refresh_last_link()
        metric = metrics.get(self.monitor)
        # decide retention up-front: skip the named save when it would not
        # survive the top-k prune (one write saved vs write-then-delete)
        if metric is None or self.save_top_k == 0:
            keeps = False
        elif self.save_top_k < 0 or len(self._index) < self.save_top_k:
            keeps = True
        else:
            key = (min if self.mode == "max" else max)
            worst = key(self._index, key=lambda e: e["metric"])["metric"]
            keeps = metric > worst if self.mode == "max" else metric < worst
        if keeps:
            metric = float(metric)
            name = f"epoch={epoch}-{self.monitor}={metric:.4f}"
            self._ckptr.save(self._path(name), state, force=True)
            self._index.append({"name": name, "epoch": epoch, "metric": metric})
        self._ckptr.save(self._path(f"last-{epoch}"), state, force=True)
        self._prune()
        with open(self._index_path, "w") as f:
            json.dump(self._index, f, indent=1)

    def _refresh_last_link(self):
        """Point the ``last`` symlink (the stable path test.sh/predict.sh
        pass as --ckpt_path) at the newest DURABLE last-{epoch}."""
        entries = self._last_entries()
        if not entries:
            return
        link = self._path("last")
        tmp = self._path(".last.tmp")
        try:
            if os.path.islink(link) or not os.path.exists(link):
                if os.path.lexists(tmp):
                    os.remove(tmp)
                os.symlink(os.path.basename(entries[-1][1]), tmp)
                os.replace(tmp, link)
        except OSError:
            pass  # symlink-less filesystems: restore() resolves instead

    def wait(self):
        """Block until all in-flight async writes are durable, then refresh
        the ``last`` symlink to the newest durable last-{epoch}."""
        self._ckptr.wait_until_finished()
        self._refresh_last_link()

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
        """Restore into the structure of ``target`` (a concrete train state).

        A ``.../last`` path resolves to the newest durable ``last-{epoch}``
        IN ITS OWN directory (test.sh/predict.sh surface) — covering a
        missing 'last' after a crash AND a stale symlink from an earlier
        completed fit, without ever falling back to this manager's run."""
        self._ckptr.wait_until_finished()  # in case a save is in flight
        if path is not None and os.path.basename(path) == "last":
            resolved = _resolve_last(path)
            if resolved is None:
                raise FileNotFoundError(f"no last checkpoint at {path}")
            path = resolved
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

"""Experiment runner: fit / test / predict for every training method.

The TPU-native equivalent of the reference's LightningCLI + LightningModule
engines (base/cli.py, supervised.py, gan.py, contrastive.py,
flow_supervised.py, flow_gan.py):

- fit: epoch loop with per-step jitted train functions, val mIoU each epoch,
  top-k checkpointing, EarlyStopping(val_miou_epoch, patience 10,
  min_delta 1e-3) (cli.py:104);
- after fit: test + predict on the best checkpoint, metrics.json
  (cli.py:166-198);
- test: multi-scale sliding-window (single-frame) / crop-grid sliding window
  or whole-frame (flow) over the two held-out videos, reported as
  test_miou{1,2}_epoch + averages (foundation.py:224-259);
- predict: flow per-clip interpolation inference with temporal consistency
  and video writing (flow/base.py:226-344).
"""

import json
import os
import time
import uuid
from typing import Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from floodseg_tpu.core.config import Config, round_train
from floodseg_tpu.core.checkpoint import CheckpointManager
from floodseg_tpu.core.logging import RunLogger
from floodseg_tpu.data import (
    SemDataset, FlowDataset, DataLoader,
    build_train_transform, build_val_transform, build_test_transform,
)
from floodseg_tpu.data.transforms import Compose
from floodseg_tpu.models import build_model, S4GANDiscriminator, FLOW_ARCHS
from floodseg_tpu.ops.metrics import MetricMeter, intersection_and_union
from floodseg_tpu.train.optim import (exclude_subtrees, make_optimizer,
                                      poly_schedule)
from floodseg_tpu.train.state import create_train_state
from floodseg_tpu.train import supervised as sup
from floodseg_tpu.train import gan as gan_mod
from floodseg_tpu.train import flow as flow_mod
from floodseg_tpu.train import contrastive as u2pl_mod
from floodseg_tpu.train.evaluate import make_crop_forward, multi_scale_test, flow_sliding_window_test
from floodseg_tpu.train.predict import run_predict
from floodseg_tpu.parallel.mesh import (
    create_mesh, shard_batch, replicated_sharding, sharded_jit,
)

FLOW_METHODS = ("flow_supervised", "flow_gan")
SEMI_METHODS = ("gan", "flow_gan", "contrastive")
_FRAME_KEYS = ("frame_current", "frame_prev", "frame_next")


class _EvalState(NamedTuple):
    """Minimal state-shaped pytree for eval-only step functions."""
    params: dict
    batch_stats: dict


def _dtype(cfg: Config):
    return jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32


def _jnp_batch(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


_TIME_MAJOR_KEYS = ("mvs_left", "mvs_right")  # (T, B, ...) layout


def _iter_single_samples(batch):
    """Split a collated loader batch into single-sample batches. The
    sliding-window test programs process one frame (pair) at a time;
    data.batch_size_test sizes only the LOADER, matching the reference
    where test_step also receives whatever foundation.py:491 batches."""
    bsz = next(v.shape[0] for k, v in batch.items()
               if k not in _TIME_MAJOR_KEYS)
    if bsz == 1:
        yield batch
        return
    for i in range(bsz):
        yield {k: (v[:, i:i + 1] if k in _TIME_MAJOR_KEYS else v[i:i + 1])
               for k, v in batch.items()}


class Runner:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.is_flow = cfg.method in FLOW_METHODS
        if self.is_flow:
            assert cfg.model.arch in FLOW_ARCHS, (
                f"arch {cfg.model.arch!r} unsupported in the flow path "
                f"(pspnet/deeplabv3 per reference flow/base.py:94-103; "
                f"vit is a TPU extension)"
            )
        self.rng = jax.random.PRNGKey(cfg.trainer.seed)
        run_name = cfg.trainer.run_name or cfg.runid or uuid.uuid4().hex[:8]
        self.logger = RunLogger(cfg.trainer.log_dir, run_name,
                                wandb_project=cfg.wandb,
                                tags=[cfg.tag] if cfg.tag else None)
        self.ckpt = CheckpointManager(
            os.path.join(self.logger.log_dir, "checkpoints"),
            save_top_k=cfg.trainer.save_top_k,
        )
        # data parallelism over all (or trainer.num_devices) chips by
        # default, like the reference's DDP over all GPUs
        # (configs/train_base.yaml:24, base/cli.py:159)
        avail = len(jax.devices())
        n = avail if cfg.trainer.num_devices is None \
            else min(cfg.trainer.num_devices, avail)
        self.mesh = create_mesh(devices=jax.devices()[:n]) if n > 1 else None
        self.num_devices = n if self.mesh is not None else 1
        self._build_model()

    # ------------------------------------------------------------------
    # model / state construction
    # ------------------------------------------------------------------

    def _build_model(self):
        cfg = self.cfg
        self.model = build_model(
            cfg.model.arch, classes=cfg.model.classes, layers=cfg.model.layers,
            image_size=cfg.model.test_w,
            semisupervised=(cfg.method == "contrastive" and cfg.model.semisupervised),
            with_aux=cfg.model.aux, remat=cfg.model.remat, dtype=_dtype(cfg),
        )
        self.sample_input = jnp.zeros(
            (1, self.cfg.data.train_h, self.cfg.data.train_w, 3), jnp.float32
        )
        self.num_classes = cfg.model.classes

    def _pretrained_variables(self):
        cfg = self.cfg
        if not cfg.model.pretrained or not cfg.model.pretrained_path:
            return None
        import torch
        from floodseg_tpu.models.torch_import import convert_resnet_backbone
        from floodseg_tpu.models.resnet import DEPTH_BLOCKS
        sd = torch.load(cfg.model.pretrained_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        p, s = convert_resnet_backbone(
            sd, DEPTH_BLOCKS[cfg.model.layers],
            deep_base=(cfg.model.arch == "pspnet"),
        )
        return {"params": {"backbone": p}, "batch_stats": {"backbone": s}}

    def _max_iter(self, steps_per_epoch: int) -> int:
        return max(1, steps_per_epoch * self.cfg.trainer.max_epochs)

    # ------------------------------------------------------------------
    # transforms / loaders (BaseDataModule + FlowBaseDataModule parity)
    # ------------------------------------------------------------------

    def _list_path(self, name: str) -> str:
        d = self.cfg.data
        if d.data_variant:
            return os.path.join(d.data_root, "list", d.data_variant, name)
        return os.path.join(d.data_root, "list", name)

    def _transforms(self) -> Dict[str, Compose]:
        cfg = self.cfg
        d = cfg.data
        th, tw = d.train_h, d.train_w
        if not self.is_flow:
            resize = (d.resize_h, d.resize_w)
            return {
                "train": build_train_transform(th, tw, d.data_classes_ignore,
                                               d.scale_min, d.scale_max, resize,
                                               normalize=not d.normalize_on_device),
                "val": build_val_transform(th, tw, d.data_classes_ignore, resize),
                "test": build_test_transform(d.data_classes_ignore, resize,
                                             normalize=False),
            }
        # FlowBaseDataModule sizing rules (flow/base.py:360-375)
        scale_min, scale_max = d.scale_min, d.scale_max
        if d.resize_factor != 1.0:
            scale_min = 1.0
        if d.no_cropping:
            factor = 1.5
            resize = (int(th * factor) + 1, int(tw * factor) + 1)
            resize_val_test = (th, tw)
            scale_min = 1.0 / factor + 0.001
            scale_max = 1.0
        else:
            resize = (int(d.resize_h * d.resize_factor),
                      int(d.resize_w * d.resize_factor))
            resize_val_test = resize
        test_resize = (int(resize_val_test[0] * d.resize_factor_test),
                       int(resize[1] * d.resize_factor_test))
        predict_resize = (int(resize_val_test[0] * d.resize_factor_predict),
                          int(resize[1] * d.resize_factor_predict))
        if d.arch == "vit":
            # the vit flow extension needs patch-multiple WHOLE frames so the
            # token grid spans exactly the frame the MV grids are normalized
            # to (SegmenterViT.encode asserts it). Only test/predict feed
            # whole frames to encode: train always crops to (th, tw) and val
            # crops (or, under no_cropping, resizes to (th, tw)) — both
            # already patch-multiple via round_train. Rounding the train
            # resize would BREAK the no_cropping scale_min invariant
            # (flow/base.py:366-370 sizes resize so the smallest RandScale
            # output still covers the crop).
            _rv = lambda hw: (max(32, round_train(hw[0], "vit")),
                              max(32, round_train(hw[1], "vit")))
            test_resize = _rv(test_resize)
            predict_resize = _rv(predict_resize)
        return {
            "train": build_train_transform(
                th, tw, d.data_classes_ignore, scale_min, scale_max, resize,
                with_rotate=d.no_warp, crop_padding=None,
                normalize=not d.normalize_on_device,
            ),
            "val": build_val_transform(th, tw, d.data_classes_ignore,
                                       resize_val_test, crop=not d.no_cropping,
                                       crop_padding=None),
            "test": build_test_transform(d.data_classes_ignore, test_resize,
                                         normalize=True),
            "predict": build_test_transform(d.data_classes_ignore,
                                            predict_resize, normalize=True),
        }

    def _dataset(self, split: str, list_name: str, type_: str = "l",
                 transform=None):
        d = self.cfg.data
        if self.is_flow:
            return FlowDataset(split, d.data_root,
                               self._list_path(list_name) if split != "predict" else None,
                               type=type_, transform=transform,
                               frame_delta=d.frame_delta, no_warp=d.no_warp,
                               predict_v_id=d.predict_v_id,
                               no_random_frame_delta=d.no_random_frame_delta)
        sem_split = {"l": split, "u": "test", "gt": split}[type_]
        return SemDataset(sem_split, d.data_root, self._list_path(list_name),
                          transform)

    def _train_datasets(self, transform, need_unlabeled: bool):
        """(labeled, unlabeled) train datasets.

        With train_u.txt present the labeled set is the full train list.
        Otherwise random-split train.txt into DISJOINT l/u by data_ratio —
        the labeled set shrinks too (reference BaseDataModule.setup,
        foundation.py:446-462 random_split([size_l, size_u]))."""
        ds_l = self._dataset("train", "train.txt", "l", transform)
        if not need_unlabeled:
            return ds_l, None
        if os.path.exists(self._list_path("train_u.txt")):
            return ds_l, self._dataset("train", "train_u.txt", "u", transform)
        ds_u = self._dataset("train", "train.txt", "u", transform)
        items = list(ds_l.items)
        rng = np.random.default_rng(self.cfg.trainer.seed)
        perm = rng.permutation(len(items))
        size_l = int(self.cfg.data.data_ratio * len(items))
        if size_l == 0 or size_l == len(items):
            # silently overlapping l/u sets would fake semi-supervision;
            # the reference's random_split([size_l, 0]) starves its
            # unlabeled loader the same way, just without the message
            raise ValueError(
                f"data.data_ratio={self.cfg.data.data_ratio} splits "
                f"{len(items)} train items into l={size_l}/"
                f"u={len(items) - size_l}; a semi-supervised method needs "
                "both non-empty — adjust data_ratio or provide train_u.txt")
        ds_l.items = [items[i] for i in perm[:size_l]]
        ds_u.items = [items[i] for i in perm[size_l:]]
        for ds in (ds_l, ds_u):
            if hasattr(ds, "length"):
                ds.length = len(ds.items)
        return ds_l, ds_u

    def _loader(self, ds, batch_size, shuffle=False, infinite=False,
                drop_last=False, device_put=None, workers=None,
                seed_offset=0):
        d = self.cfg.data
        return DataLoader(ds, batch_size=batch_size, shuffle=shuffle,
                          num_workers=d.workers if workers is None else workers,
                          seed=self.cfg.trainer.seed + seed_offset,
                          infinite=infinite, drop_last=drop_last,
                          device_put=device_put)

    # ------------------------------------------------------------------
    # fit
    # ------------------------------------------------------------------

    def _train_loaders(self, tf):
        """Infinite per-role train loaders + steps_per_epoch.

        Per-device batch semantics: data.batch_size is per chip and each
        loader yields the global batch, like Lightning DDP where each of N
        processes loads batch_size samples (configs/train_base.yaml:22-24).
        Each role gets its OWN shuffle stream (seed offset): the reference
        uses independent shuffle=True DataLoaders per role (gan.py:261-275)
        — with a shared stream the gan "gt" batch would be bit-identical to
        the "l" batch every step."""
        cfg = self.cfg
        train_l, train_u = self._train_datasets(
            tf["train"], need_unlabeled=cfg.method in SEMI_METHODS)
        global_batch = cfg.data.batch_size * self.num_devices
        # an infinite drop_last loader over a set smaller than the batch
        # yields NOTHING and the fit loop would block on next() forever —
        # fail loudly instead (any device count)
        small = {name: len(ds) for name, ds in
                 (("labeled", train_l),) + ((("unlabeled", train_u),)
                                            if train_u is not None else ())
                 if len(ds) < global_batch}
        if small:
            raise ValueError(
                f"global batch {global_batch} ({cfg.data.batch_size} x "
                f"{self.num_devices} devices) exceeds the train set(s) "
                f"{small}; lower data.batch_size / trainer.num_devices or "
                f"adjust data.data_ratio")
        # the producer thread does the host->device transfer (and mesh
        # sharding), overlapping it with the previous step's compute
        loaders = {"l": self._loader(train_l, global_batch, shuffle=True,
                                     infinite=True, drop_last=True,
                                     device_put=self._device_batch)}
        steps_per_epoch = max(1, len(train_l) // global_batch)
        if train_u is not None:
            loaders["u"] = self._loader(train_u, global_batch,
                                        shuffle=True, infinite=True,
                                        drop_last=True, seed_offset=1,
                                        device_put=self._device_batch)
            # max_size_cycle (configs/train_base.yaml:38)
            steps_per_epoch = max(steps_per_epoch,
                                  len(train_u) // global_batch)
        if cfg.method in ("gan", "flow_gan"):
            # the discriminator's real examples come from the LABELED split
            # (reference gan.py:270 builds the gt loader over
            # dataset_train_l) — never from images whose labels belong to
            # the unlabeled split
            train_gt = self._dataset("train", "train.txt", "gt", tf["train"])
            train_gt.items = list(train_l.items)
            if hasattr(train_gt, "length"):
                train_gt.length = len(train_gt.items)
            loaders["gt"] = self._loader(train_gt, global_batch,
                                         shuffle=True, infinite=True,
                                         drop_last=True, seed_offset=2,
                                         device_put=self._device_batch)
        if cfg.trainer.limit_train_batches is not None:
            steps_per_epoch = min(steps_per_epoch,
                                  cfg.trainer.limit_train_batches)
        return loaders, steps_per_epoch

    def fit(self, torch_ckpt: Optional[str] = None):
        cfg = self.cfg
        tf = self._transforms()
        loaders, steps_per_epoch = self._train_loaders(tf)
        val_ds = self._dataset("val", "val.txt", "l", tf["val"])
        val_loader = self._loader(val_ds, cfg.data.batch_size_val)

        max_iter = self._max_iter(steps_per_epoch)
        state, train_fn, eval_fn = self._build_states_and_steps(max_iter)
        self._eval_fn = eval_fn  # reused by a later validate() call

        if torch_ckpt is not None:
            # warm-start fine-tuning from an imported reference Lightning
            # checkpoint (fresh optimizer state; a floodseg resume below,
            # if one exists, wins — it means THIS run was interrupted)
            state = self._graft_torch_ckpt(state, torch_ckpt)
        start_epoch = 0
        if cfg.trainer.resume and self.ckpt.last_path is not None:
            # crash recovery / resume-by-runid (base/cli.py:114-118)
            state = self.ckpt.restore(state, self.ckpt.last_path)
            last_epoch = self.ckpt.last_epoch
            start_epoch = (last_epoch + 1) if last_epoch is not None else 0
            print(f"resumed from {self.ckpt.last_path} at epoch {start_epoch}",
                  flush=True)
        if self.mesh is not None:
            state = jax.device_put(state, replicated_sharding(self.mesh))

        best_metric, best_epoch = -np.inf, -1
        wait_count = 0  # EarlyStopping counts VALIDATION checks, not epochs
        # EarlyStopping state survives resume (Lightning restores the
        # callback from the checkpoint): without it the first post-resume
        # validation always counts as an improvement and patience restarts
        es_path = os.path.join(self.logger.log_dir, "early_stop.json")
        if start_epoch > 0 and os.path.exists(es_path):
            with open(es_path) as f:
                es = json.load(f)
            best_metric = (-np.inf if es.get("best_metric") is None
                           else float(es["best_metric"]))
            best_epoch = int(es.get("best_epoch", -1))
            wait_count = int(es.get("wait_count", 0))
        val_every = max(1, cfg.trainer.check_val_every_n_epoch)
        global_step = start_epoch * steps_per_epoch
        iters = {k: iter(v) for k, v in loaders.items()}
        for epoch in range(start_epoch, cfg.trainer.max_epochs):
            t0 = time.time()
            train_meter = MetricMeter(self.num_classes)
            loss_sum, loss_n = 0.0, 0
            epoch_metrics = []
            for _ in range(steps_per_epoch):
                batch = {k: next(it) for k, it in iters.items()}
                if len(batch) == 1:
                    batch = batch["l"]
                step_rng = jax.random.fold_in(self.rng, global_step)
                state, metrics = train_fn(state, batch, step_rng, epoch)
                # keep metrics on device: a float() here would sync every
                # step and stall the dispatch pipeline; they are read back
                # together at epoch end
                epoch_metrics.append(metrics)
                global_step += 1
            # one batched D2H transfer for the whole epoch's metrics
            for metrics in jax.device_get(epoch_metrics):
                loss_sum += float(metrics["loss"])
                loss_n += 1
                train_meter.update(metrics["intersection"], metrics["union"],
                                   metrics["target"])
            train_summary = train_meter.summary()
            self.logger.log({"train_loss_epoch": loss_sum / max(loss_n, 1),
                             "train_miou_epoch": train_summary["miou"],
                             "epoch_time": time.time() - t0,
                             "epoch": epoch}, global_step)

            # validation (flow: whole-frame interp; single-frame: center
            # crop), every check_val_every_n_epoch epochs
            # (configs/train_base.yaml:12, honored by the Lightning Trainer)
            # limit_val_batches=0 disables validation entirely (Lightning
            # semantics); None = unlimited
            do_val = ((epoch + 1) % val_every == 0
                      and cfg.trainer.limit_val_batches != 0)
            ckpt_metrics = {}
            if do_val:
                val_meter = MetricMeter(self.num_classes)
                for bi, batch in enumerate(val_loader):
                    if cfg.trainer.limit_val_batches is not None \
                            and bi >= cfg.trainer.limit_val_batches:
                        break
                    m = eval_fn(state, _jnp_batch(batch), epoch)
                    val_meter.update(m["intersection"], m["union"], m["target"])
                vs = val_meter.summary()
                val_miou = vs["miou"]
                ckpt_metrics["val_miou_epoch"] = val_miou
                self.logger.log({"val_miou_epoch": val_miou,
                                 "val_macc_epoch": vs["macc"],
                                 "val_accuracy_epoch": vs["allacc"]}, global_step)
                print(f"epoch {epoch}: loss {loss_sum / max(loss_n, 1):.4f} "
                      f"val_miou {val_miou:.4f}", flush=True)
            else:
                print(f"epoch {epoch}: loss {loss_sum / max(loss_n, 1):.4f} "
                      f"(val every {val_every} epochs)", flush=True)

            # skipped-val epochs write only the crash-fallback last-{epoch}:
            # an un-evaluated model never occupies a top-k slot
            self.ckpt.save(state, epoch, ckpt_metrics)

            # EarlyStopping(patience, min_delta) on val_miou_epoch (cli.py:104)
            stop = False
            if do_val:
                if val_miou > best_metric + cfg.trainer.early_stopping_min_delta:
                    best_metric, best_epoch, wait_count = val_miou, epoch, 0
                else:
                    wait_count += 1
                    if wait_count >= cfg.trainer.early_stopping_patience:
                        print(f"early stopping at epoch {epoch} "
                              f"(best {best_metric:.4f} @ {best_epoch})",
                              flush=True)
                        stop = True
            with open(es_path, "w") as f:
                json.dump({"best_metric": (float(best_metric)
                                           if np.isfinite(best_metric)
                                           else None),
                           "best_epoch": best_epoch,
                           "wait_count": wait_count}, f)
            if stop:
                break

        self.ckpt.wait()  # drain async checkpoint writes before returning
        if np.isfinite(best_metric):
            self.logger.update_summary({"best_val_miou": best_metric,
                                        "best_epoch": best_epoch})
        else:  # no validation epoch ever ran: -inf would break metrics.json
            self.logger.update_summary({"best_epoch": best_epoch})
        self._state = state
        return state

    def _device_batch(self, batch):
        """Host batch -> device: batch-dim sharded over the mesh when data
        parallelism is active, plain transfer otherwise. With
        normalize_on_device, frames cross the link as float16 raw pixels."""
        if self.cfg.data.normalize_on_device:
            batch = {k: (v.astype(np.float16) if k in _FRAME_KEYS else v)
                     for k, v in batch.items()}
        if self.mesh is None:
            return _jnp_batch(batch)
        return shard_batch(batch, self.mesh)

    def _norm_wrap(self, fn, batch_argnums=(1,)):
        """Fuse (x - mean)/std of the frame keys into the step when the
        train pipeline ships raw pixels (data.normalize_on_device)."""
        if not self.cfg.data.normalize_on_device:
            return fn
        from floodseg_tpu.data.transforms import MEAN, STD
        mean = jnp.asarray(MEAN, jnp.float32)
        std = jnp.asarray(STD, jnp.float32)

        def norm(tree):
            if not isinstance(tree, dict):
                return tree
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out[k] = norm(v)
                elif k in _FRAME_KEYS:
                    out[k] = (v.astype(jnp.float32) - mean) / std
                else:
                    out[k] = v
            return out

        batch_argnums = set(batch_argnums)

        def wrapped(*args):
            args = [norm(a) if i in batch_argnums else a
                    for i, a in enumerate(args)]
            return fn(*args)

        return wrapped

    def _jit_train(self, fn, batch_argnums=(1,), donate_argnums=(0,)):
        """jit a train step; under a mesh the batch args are sharded and the
        rest replicated (grad all-reduce + SyncBN via XLA, SURVEY §2.3).

        Input states are DONATED: the step's output reuses their HBM, which
        is what lets U2PL train at the reference's 873px crop without
        rematerialization (measured +27% steps/s on v5e vs remat)."""
        fn = self._norm_wrap(fn, batch_argnums)
        if self.mesh is None:
            return jax.jit(fn, donate_argnums=donate_argnums)
        return sharded_jit(fn, self.mesh, batch_argnums=batch_argnums,
                           donate_argnums=donate_argnums)

    def restore_best(self, state):
        """Restore the best-val checkpoint into ``state``'s structure, for
        after-fit test/predict (reference base/cli.py:169-187 re-evaluates
        ``best_model_path``). Falls back to the final state when no
        checkpoint was written (e.g. limit_val_batches=0 smoke fits)."""
        path = self.ckpt.best_path
        if path is None:
            return state
        state = self.ckpt.restore(state, path)
        self._state = state
        return state

    # ------------------------------------------------------------------
    # per-method states and step functions
    # ------------------------------------------------------------------

    def _build_states_and_steps(self, max_iter: int):
        cfg = self.cfg
        m = cfg.model
        pre = self._pretrained_variables()
        tx = make_optimizer(m.optim.lr, max_iter,
                            optimizer=m.optim.optim.lower(),
                            momentum=m.optim.momentum,
                            weight_decay=m.optim.weight_decay,
                            power=m.power)
        sched = poly_schedule(m.optim.lr, max_iter, m.power)

        if cfg.method == "supervised":
            state = create_train_state(self.model, self.rng, self.sample_input,
                                       tx, pretrained_variables=pre)
            loss_fn = sup.make_loss_fn(m.loss.loss, m.aux_weight if m.aux else 0.0,
                                       m.ignore_index, m.loss.thresh, m.loss.min_kept)
            step = self._jit_train(sup.make_train_step(
                self.model, loss_fn, self.num_classes, m.ignore_index, sched))
            ev = jax.jit(sup.make_eval_step(self.model, self.num_classes,
                                            m.ignore_index))
            return state, (lambda s, b, r, e: step(s, b, r)), \
                (lambda s, b, e: ev(s, b))

        if cfg.method == "flow_supervised":
            state = create_train_state(self.model, self.rng, self.sample_input,
                                       tx, pretrained_variables=pre)
            loss_fn = sup.make_loss_fn(m.loss.loss, 0.0, m.ignore_index,
                                       m.loss.thresh, m.loss.min_kept)
            interp_step, plain_step = flow_mod.make_flow_train_step(
                self.model, loss_fn, self.num_classes, m.ignore_index,
                m.feature_based, m.no_warp)
            interp_step = self._jit_train(interp_step)
            plain_step = self._jit_train(plain_step)
            coin = np.random.default_rng(cfg.trainer.seed)

            def train_fn(s, b, r, e):
                # host-side no_interpolation coin (flow/model.py:37)
                if m.no_interpolation_percentage > 0 and \
                        coin.random() < m.no_interpolation_percentage:
                    return plain_step(s, b, r)
                return interp_step(s, b, r)

            ev = jax.jit(flow_mod.make_flow_eval_step(
                self.model, self.num_classes, m.ignore_index,
                m.feature_based, m.no_warp))
            return state, train_fn, (lambda s, b, e: ev(s, b))

        if cfg.method in ("gan", "flow_gan"):
            self.model_d = S4GANDiscriminator(num_classes=self.num_classes,
                                              dtype=_dtype(cfg))
            tx_d = make_optimizer(m.optim.lr_D, max_iter, optimizer="adam",
                                  betas=(0.9, 0.99), weight_decay=0.0,
                                  head_lr_scale=1.0, power=m.power)
            # The gan loss never touches the aux head — torch skips those
            # params entirely (see exclude_subtrees; no-op for archs
            # without an aux head, e.g. vit and the flow models).
            tx_g = exclude_subtrees(tx, ("aux", "aux_classifier"))
            state_g = create_train_state(self.model, self.rng, self.sample_input,
                                         tx_g, pretrained_variables=pre)
            state_d = create_train_state(
                self.model_d, self.rng,
                jnp.zeros((1, self.cfg.data.train_h, self.cfg.data.train_w,
                           self.num_classes + 3), jnp.float32), tx_d)
            g_fwd = (gan_mod.flow_g_forward(self.model, m.feature_based, m.no_warp)
                     if cfg.method == "flow_gan"
                     else gan_mod.single_frame_g_forward(self.model))
            step = self._jit_train(gan_mod.make_gan_train_step(
                g_fwd, self.model_d, self.num_classes, m.ignore_index,
                m.threshold_st, m.lambda_fm, m.lambda_st,
                gt_norm_by_labeled_max=(cfg.method == "gan")),
                batch_argnums=(2,), donate_argnums=(0, 1))

            def train_fn(s, b, r, e):
                sg, sd, metrics = step(s[0], s[1], b, r)
                return (sg, sd), metrics

            if cfg.method == "flow_gan":
                ev0 = jax.jit(flow_mod.make_flow_eval_step(
                    self.model, self.num_classes, m.ignore_index,
                    m.feature_based, m.no_warp))
            else:
                ev0 = jax.jit(sup.make_eval_step(self.model, self.num_classes,
                                                 m.ignore_index))

            return (state_g, state_d), train_fn, (lambda s, b, e: ev0(s[0], b))

        if cfg.method == "contrastive":
            ccfg = u2pl_mod.ContrastiveConfig(
                enabled=m.contrastive.enabled,
                negative_high_entropy=m.contrastive.negative_high_entropy,
                low_rank=m.contrastive.low_rank,
                high_rank=m.contrastive.high_rank,
                current_class_threshold=m.contrastive.current_class_threshold,
                current_class_negative_threshold=m.contrastive.current_class_negative_threshold,
                low_entropy_threshold=m.contrastive.low_entropy_threshold,
                num_negatives=m.contrastive.num_negatives,
                num_queries=m.contrastive.num_queries,
                temperature=m.contrastive.temperature,
                loss_weight=m.contrastive.loss_weight,
                max_enqueue=m.contrastive.max_enqueue,
                # the reference divides the contra loss by the DDP world
                # size (contrastive.py:379-382) — tie to the actual mesh
                num_devices=self.num_devices,
            )
            state = u2pl_mod.create_u2pl_state(
                self.model, self.rng, self.sample_input, tx,
                bank_capacity=m.contrastive.bank_capacity,
                bank_class0_capacity=m.contrastive.bank_class0_capacity,
                num_classes=self.num_classes)
            if pre is not None:
                merged = create_train_state(self.model, self.rng,
                                            self.sample_input, tx,
                                            pretrained_variables=pre)
                state = state._replace(student=merged)
            sup_step, semi_step = u2pl_mod.make_u2pl_steps(
                self.model, self.num_classes, ccfg, m.ignore_index,
                m.aux_weight if m.aux else 0.0, m.loss.thresh, m.loss.min_kept,
                m.unsupervised_apply_aug, m.unsupervised_drop_percent,
                m.unsupervised_loss_weight, m.ema_decay,
                true_ema=m.contrastive.true_ema)
            sup_step = self._jit_train(sup_step)
            semi_step = self._jit_train(semi_step)
            boundary = {"synced": False}
            max_epochs = cfg.trainer.max_epochs
            sup_only = m.sup_only_epoch
            steps_per_epoch = max(1, max_iter // max(max_epochs, 1))
            # rel_step comes from HOST counters (the fit loop calls train_fn
            # exactly steps_per_epoch times per epoch): reading
            # s.student.step would force a device round-trip on EVERY semi
            # step, defeating the deferred-metric-readback pipelining
            host_step = {"epoch": -1, "i": 0}

            def train_fn(s, b, r, e):
                if e != host_step["epoch"]:
                    host_step["epoch"], host_step["i"] = e, 0
                i = host_step["i"]
                host_step["i"] = i + 1
                if e < sup_only:
                    return sup_step(s, b, r)
                # sync student->teacher exactly once, at the boundary EPOCH
                # (contrastive.py:214-219). A resume past the boundary must
                # NOT re-sync — that would clobber the restored EMA teacher.
                if e == sup_only and not boundary["synced"]:
                    s = u2pl_mod.sync_teacher(s)
                boundary["synced"] = True
                rel = (e - sup_only) * steps_per_epoch + i
                return semi_step(s, b, r, jnp.float32(e / max_epochs),
                                 jnp.int32(max(rel, 0)))

            # compiled eval (a bare model.apply here would dispatch the
            # hundreds of ops of a PSPNet-101 forward eagerly per val batch);
            # both teacher and student variables share one program shape
            ev = jax.jit(sup.make_eval_step(self.model, self.num_classes,
                                            m.ignore_index))

            def eval_fn(s, b, e):
                # serve the teacher after warmup (contrastive.py:176-180)
                variables = (
                    _EvalState(s.teacher_params, s.teacher_batch_stats)
                    if e >= sup_only else
                    _EvalState(s.student.params, s.student.batch_stats)
                )
                return ev(variables, b)

            return state, train_fn, eval_fn

        raise ValueError(f"unknown method {cfg.method!r}")

    # ------------------------------------------------------------------
    # evaluation state helpers
    # ------------------------------------------------------------------

    def load_for_eval(self, ckpt_path: Optional[str] = None):
        """Build a fresh state structure and restore a checkpoint into it
        (reference: test.sh/predict.sh load logs/<run>/last.ckpt)."""
        state, _, eval_fn = self._build_states_and_steps(max_iter=1)
        self._eval_fn = eval_fn
        path = ckpt_path or self.ckpt.last_path or self.ckpt.best_path
        if path is None:
            print("[runner] no checkpoint found — evaluating fresh init")
            self._state = state
            return state
        state = self.ckpt.restore(state, path)
        self._state = state
        return state

    def load_torch_ckpt(self, path: str):
        """Import a reference Lightning ``.ckpt`` (or bare state_dict file)
        into a fresh state for this config's method — the bridge from a
        reference-trained run to floodseg_tpu eval (test.sh/predict.sh
        equivalents on reference weights). Covers all five methods:
        generator/student params+BN stats, the s4GAN discriminator, and the
        U2PL teacher (marked synced so eval serves it, contrastive.py:176-180).
        """
        state, _, eval_fn = self._build_states_and_steps(max_iter=1)
        self._eval_fn = eval_fn
        state = self._graft_torch_ckpt(state, path)
        self._state = state
        return state

    def _graft_torch_ckpt(self, state, path: str):
        """Graft an imported reference checkpoint's weights into ``state``
        (any state built by ``_build_states_and_steps`` — eval or train;
        optimizer state is untouched, so a fit() warm start begins with
        fresh moments like the reference's own pretrained-backbone init)."""
        from floodseg_tpu.models.lightning_import import (
            graft_variables, load_torch_file,
        )

        imported = load_torch_file(path)
        if imported["arch"] != self.cfg.model.arch:
            raise ValueError(
                f"checkpoint is a {imported['arch']} model but the config "
                f"says model.arch={self.cfg.model.arch!r}")
        fam = imported["method_family"]
        if fam.split("_")[0] not in self.cfg.method:
            print(f"[import] note: checkpoint looks like {fam!r}, config "
                  f"method is {self.cfg.method!r} — weights graft anyway",
                  flush=True)
        roles = imported["roles"]

        def graft_into(st, var):
            new = st.replace(params=graft_variables(st.params, var["params"]))
            if "batch_stats" in var:
                new = new.replace(batch_stats=graft_variables(
                    st.batch_stats, var["batch_stats"]))
            return new

        if self.cfg.method in ("gan", "flow_gan"):
            sg, sd_ = state
            sg = graft_into(sg, roles["model"])
            if "discriminator" in roles:
                sd_ = sd_.replace(params=graft_variables(
                    sd_.params, roles["discriminator"]["params"]))
            state = (sg, sd_)
        elif self.cfg.method == "contrastive":
            state = state._replace(student=graft_into(state.student,
                                                      roles["model"]))
            if "teacher" in roles:
                t = roles["teacher"]
                state = state._replace(
                    teacher_params=graft_variables(state.teacher_params,
                                                   t["params"]),
                    teacher_batch_stats=graft_variables(
                        state.teacher_batch_stats, t.get("batch_stats", {})),
                    teacher_synced=jnp.asarray(True))
        else:
            state = graft_into(state, roles["model"])
        print(f"[import] loaded {fam} {imported['arch']} checkpoint "
              f"(epoch {imported.get('epoch')}) from {path}", flush=True)
        return state

    def _int8_decode(self) -> bool:
        """Resolve model.int8_decode (None = auto: pspnet/deeplabv3 decoder
        on an int8-MXU backend; 688 vs 526 and 864 vs 603 fps on one v5e).
        Validated in tests/test_quant.py (pspnet: end-to-end on a trained
        head; deeplabv3: worst-case random-logit argmax agreement); forced
        True errors loudly on unsupported decoders (vit MaskTransformer)."""
        v = self.cfg.model.int8_decode
        if v is not None:
            return bool(v)
        from floodseg_tpu.ops.quant import int8_auto_default
        return int8_auto_default(self.cfg.model.arch)

    def _eval_variables(self, state):
        if self.cfg.method in ("gan", "flow_gan"):
            st = state[0]
            return {"params": st.params, "batch_stats": st.batch_stats}
        if self.cfg.method == "contrastive":
            # the teacher is served only once training crossed the
            # sup_only_epoch boundary sync (contrastive.py:177-180); before
            # that it is still its random init — evaluate the student
            synced = getattr(state, "teacher_synced", None)
            if synced is None or bool(np.asarray(synced)):
                return {"params": state.teacher_params,
                        "batch_stats": state.teacher_batch_stats}
            return {"params": state.student.params,
                    "batch_stats": state.student.batch_stats}
        return {"params": state.params, "batch_stats": state.batch_stats}

    # ------------------------------------------------------------------
    # test / predict
    # ------------------------------------------------------------------

    def validate(self, state=None) -> Dict:
        """One pass over the val split (the LightningCLI ``validate``
        subcommand, inherited by the reference — base/cli.py:198 wires
        after_validate like after_fit)."""
        cfg = self.cfg
        if cfg.trainer.limit_val_batches == 0:
            # same semantics as the fit loop: 0 DISABLES validation
            # (Lightning); logging an empty meter would fabricate 0.0 mIoU
            return {}
        state = state if state is not None else self._state
        eval_fn = getattr(self, "_eval_fn", None)
        if eval_fn is None:  # not via load_for_eval: build (and cache) it
            _, _, eval_fn = self._build_states_and_steps(max_iter=1)
            self._eval_fn = eval_fn
        tf = self._transforms()
        val_ds = self._dataset("val", "val.txt", "l", tf["val"])
        loader = self._loader(val_ds, cfg.data.batch_size_val)
        meter = MetricMeter(self.num_classes)
        for bi, batch in enumerate(loader):
            if cfg.trainer.limit_val_batches is not None \
                    and bi >= cfg.trainer.limit_val_batches:
                break
            # past-warmup epoch: contrastive eval serves the teacher
            m = eval_fn(state, _jnp_batch(batch), cfg.trainer.max_epochs)
            meter.update(m["intersection"], m["union"], m["target"])
        s = meter.summary()
        results = {"val_miou_epoch": s["miou"],
                   "val_macc_epoch": s["macc"],
                   "val_accuracy_epoch": s["allacc"]}
        self.logger.update_summary(results)
        return results

    def test(self, state=None) -> Dict:
        cfg = self.cfg
        if cfg.trainer.limit_test_batches == 0:
            # 0 disables the pass (mirrors limit_val_batches in the fit
            # loop) instead of logging a fabricated 0.0 mIoU
            return {}
        state = state if state is not None else self._state
        variables = self._eval_variables(state)
        tf = self._transforms()
        results = {}
        meters = {}
        # prediction-image table (reference LogWandBPredictionsCallback,
        # base/cli.py:24-65): collect (image, colorized gt, prediction)
        table_rows = []
        table_colors = None
        if cfg.trainer.log_test_images:
            cp = os.path.join(cfg.data.data_root, "list", "colors.txt")
            if os.path.exists(cp):
                pal = np.loadtxt(cp).astype(np.uint8)
                # pad to 256 entries so ignore-index pixels render black
                table_colors = np.zeros((256, 3), np.uint8)
                table_colors[: len(pal)] = pal
        # build the jitted test programs ONCE — they are shape-stable across
        # both held-out video lists, so per-list rebuilds only re-trace
        if self.is_flow:
            crop_fn = flow_mod.make_flow_test_crop_fn(
                self.model, self.num_classes, cfg.model.feature_based,
                cfg.model.no_warp)
            eval_whole = jax.jit(flow_mod.make_flow_eval_step(
                self.model, self.num_classes, cfg.model.ignore_index,
                cfg.model.feature_based, cfg.model.no_warp))
        else:
            crop_forward = make_crop_forward(self.model, self.num_classes,
                                             mesh=self.mesh)
        for idx, list_name in enumerate(["test.txt", "test2.txt"]):
            path = self._list_path(list_name)
            if not os.path.exists(path):
                continue
            # reference test datasets use labeled split semantics
            # (foundation.py:459-462 builds them with split='val')
            if self.is_flow:
                ds = self._dataset("test", list_name, "l", tf["test"])
            else:
                ds = SemDataset("val", cfg.data.data_root, path, tf["test"])
            # test loader sizing follows the reference's datamodule
            # (foundation.py:491-492 batch_size_test / workers_test); the
            # sliding-window programs stay per-sample — the loader batch is
            # split again below (the whole-frame flow path IS batched)
            loader = self._loader(ds, cfg.data.batch_size_test,
                                  workers=cfg.data.workers_test)
            meter = MetricMeter(self.num_classes)
            for bi, batch in enumerate(loader):
                if cfg.trainer.limit_test_batches is not None \
                        and bi >= cfg.trainer.limit_test_batches:
                    break
                if self.is_flow and cfg.model.no_cropping:
                    m = eval_whole(_EvalState(variables["params"],
                                              variables["batch_stats"]),
                                   _jnp_batch(batch))
                    meter.update(m["intersection"], m["union"], m["target"])
                    continue
                for sub in _iter_single_samples(batch):
                    if self.is_flow:
                        pred = flow_sliding_window_test(
                            crop_fn, variables, sub, self.num_classes,
                            cfg.model.test_h, cfg.model.test_w)
                        label = np.asarray(sub["label"])[0]
                    else:
                        image = np.asarray(sub["frame_current"])[0]
                        label = np.asarray(sub["label"])[0]
                        pred = multi_scale_test(
                            crop_forward, variables, image, self.num_classes,
                            cfg.model.test_h, cfg.model.test_w,
                            scales=cfg.model.test_scales,
                            base_size=cfg.model.test_base_size)
                    i, u, t = intersection_and_union(
                        jnp.asarray(pred), jnp.asarray(label), self.num_classes,
                        cfg.model.ignore_index)
                    meter.update(i, u, t)
                    if (table_colors is not None
                            and len(table_rows) < cfg.trainer.log_test_images):
                        key = ("frame_current" if "frame_current" in sub
                               else "frame_prev")
                        frame = np.asarray(sub[key])[0]
                        if self.is_flow:  # flow test pipeline normalizes
                            from floodseg_tpu.data.transforms import MEAN, STD
                            frame = frame * STD + MEAN
                        table_rows.append([
                            np.clip(frame, 0, 255).astype(np.uint8),
                            table_colors[np.asarray(label, np.int64)],
                            table_colors[np.asarray(pred, np.int64)],
                        ])
            meters[idx] = meter
            s = meter.summary()
            results[f"test_miou{idx + 1}_epoch"] = s["miou"]
            results[f"test_macc{idx + 1}_epoch"] = s["macc"]
            results[f"test_accuracy{idx + 1}_epoch"] = s["allacc"]
            results[f"test_miou{idx + 1}_epoch_classes"] = s["iou_class"]
        if "test_miou2_epoch" in results:
            results["test_miou_epoch"] = (results["test_miou1_epoch"]
                                          + results["test_miou2_epoch"]) / 2
        if table_rows:
            # uploaded as one table at test end (base/cli.py:64-65)
            self.logger.log_image_table(
                "test_outputs", ["image", "ground truth", "prediction"],
                table_rows)
        self.logger.update_summary(results)
        return results

    def predict(self, state=None) -> Dict:
        cfg = self.cfg
        if not self.is_flow:
            return {}
        state = state if state is not None else self._state
        variables = self._eval_variables(state)
        tf = self._transforms()
        ds = self._dataset("predict", "test.txt", "u", tf["predict"])
        colors_path = os.path.join(cfg.data.data_root, "list", "colors.txt")
        colors = np.loadtxt(colors_path).astype("uint8") if os.path.exists(colors_path) else None
        if not cfg.model.no_cropping:
            # The reference's DEFAULT predict is crop-based: predict_step
            # routes through compute_output + compute_predict_crop unless
            # no_cropping (flow/base.py:270-274). All crops of a window run
            # as one device batch; grids renormalized per crop.
            crop_fn = flow_mod.make_flow_predict_crop_fn(
                self.model, n=cfg.data.frame_delta,
                num_classes=self.num_classes,
                feature_based=cfg.model.feature_based,
                no_warp=cfg.model.no_warp, default_grid=ds.default_grid,
                int8_decode=self._int8_decode())
            out_size = (cfg.data.resize_h, cfg.data.resize_w)
            ch, cw = cfg.model.test_h, cfg.model.test_w
            from floodseg_tpu.train.evaluate import flow_sliding_window_predict

            def predict_fn(v, fp, fn_, ml, mr):
                batch = {"frame_prev": fp, "frame_next": fn_,
                         "mvs_left": ml, "mvs_right": mr}
                return flow_sliding_window_predict(
                    crop_fn, v, batch, self.num_classes, ch, cw, out_size)

            summary = run_predict(
                predict_fn, variables, self._loader(ds, 1), self.num_classes,
                colors=colors,
                save_images_dir=os.path.join(self.logger.log_dir, "frames",
                                             cfg.data.predict_v_id)
                if cfg.model.save_images else None,
                video_path=os.path.join(self.logger.log_dir, "video",
                                        f"{cfg.data.predict_v_id}.avi")
                if cfg.model.save_video else None,
                compute_metrics=cfg.model.compute_metrics,
            )
            self.logger.update_summary(summary)
            return summary
        predict_fn = flow_mod.make_flow_predict_fn(
            self.model, n=cfg.data.frame_delta,
            feature_based=cfg.model.feature_based, no_warp=cfg.model.no_warp,
            out_size=(cfg.data.resize_h, cfg.data.resize_w),
            default_grid=ds.default_grid,
            int8_decode=self._int8_decode(),
            int8_encode=cfg.model.int8_encode)
        cached_fns = None
        if self.mesh is None:
            # sequential single-chip video: reuse each window's next-key
            # encoding as the following window's prev-key (identical outputs)
            cached_fns = flow_mod.make_cached_flow_predict_fn(
                self.model, n=cfg.data.frame_delta,
                feature_based=cfg.model.feature_based,
                no_warp=cfg.model.no_warp,
                out_size=(cfg.data.resize_h, cfg.data.resize_w),
                default_grid=ds.default_grid,
                int8_decode=self._int8_decode(),
                int8_encode=cfg.model.int8_encode)
        if self.mesh is not None:
            # clip-parallel inference: one key-frame window per chip
            # (shard_map over ICI; the reference predicts on a single GPU)
            from floodseg_tpu.parallel.mesh import make_dp_predict_fn
            dp_fn = make_dp_predict_fn(predict_fn, self.mesh)
            n_dev, single_fn = self.num_devices, predict_fn

            def predict_dispatch(v, fp, fn_, ml, mr):
                if fp.shape[0] == n_dev:
                    out = dp_fn(v, fp, fn_, ml, mr)      # (D, n, H, W)
                    return out.reshape((-1,) + out.shape[2:])
                # remainder batch: clips one at a time
                outs = [single_fn(v, fp[i:i + 1], fn_[i:i + 1],
                                  ml[:, i:i + 1], mr[:, i:i + 1])
                        for i in range(fp.shape[0])]
                return jnp.concatenate(outs, axis=0)

            predict_fn = predict_dispatch
        loader = self._loader(
            ds, self.num_devices if self.mesh is not None else 1)
        summary = run_predict(
            predict_fn, variables, loader, self.num_classes, colors=colors,
            save_images_dir=os.path.join(self.logger.log_dir, "frames",
                                         cfg.data.predict_v_id)
            if cfg.model.save_images else None,
            video_path=os.path.join(self.logger.log_dir, "video",
                                    f"{cfg.data.predict_v_id}.avi")
            if cfg.model.save_video else None,
            compute_metrics=cfg.model.compute_metrics,
            cached_fns=cached_fns,
        )
        self.logger.update_summary(summary)
        return summary

"""Lightning ``.ckpt`` -> floodseg_tpu variables, one call.

The reference evaluates/serves from full Lightning checkpoints
(test.sh/predict.sh pass ``--ckpt_path logs/<run>/last.ckpt``;
base/cli.py:166-187 re-tests best_model_path). A Lightning ckpt is a torch
pickle ``{"state_dict": ..., "epoch": ..., ...}`` whose state_dict keys are
prefixed by the LightningModule attribute tree:

  supervised.py      ``model.*``            (PSPNetSemi / DeepLabv3Semi /
                                             VITSemi — wrapper layouts below)
  gan.py             ``model_G.*``, ``model_D.*``        (gan.py:111-122)
  contrastive.py     ``model.*``, ``model_teacher.*``    (contrastive.py:148-160)
  flow/supervised.py ``model_G.*``  where model_G = FlowModel(flow/model.py:26)
  flow/gan.py        ``model_G.*``, ``model_D.*``

Arch wrapper layouts inside a role (reference files):
  PSPNet             layer0..4 / ppm / cls / aux          (model/pspnet.py)
  + semisupervised   ModelRepresentation: model.* + rep.* (model/wrapper.py:7-28)
  FlowPSPNet         model.layer0..4 / model.ppm / model.decoder (=cls); the
                     shared modules appear AGAIN as model.layers.* and
                     model.encoder.* — duplicate aliases of the same tensors
                     (model/pspnet.py:113-141); no aux
  DeepLabv3          model.backbone/classifier/aux_classifier (torchvision,
                     model/deeplabv3.py:11-19)
  FlowDeepLabv3      model.encoder.model.* (=backbone) + model.decoder.*
                     (=classifier)                        (model/deeplabv3.py:47-54)
  VITSegmentModel    model.encoder/decoder (Segmenter)    (model/vit.py:13-56)
  + semisupervised   ModelRepresentation over it, rep = VITRepModel with
                     rep.rep_model.* (1-layer MaskTransformer, model/vit.py:60-87)

Everything converts through models/torch_import.py; this module only
recognizes layouts, strips prefixes, and grafts the result into a concrete
eval/train state.
"""

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from floodseg_tpu.models.torch_import import (
    _bn,
    _conv,
    _np,
    _seg_head,
    convert_deeplabv3_state_dict,
    convert_mask_transformer,
    convert_pspnet_state_dict,
    convert_s4gan_discriminator,
    convert_segmenter_state_dict,
)


def _sub(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _detect_layers(sd: Mapping, stem: str = "") -> int:
    """ResNet depth from the layer3 block count (3/4/{6,23,36}/3)."""
    idx = -1
    probe = f"{stem}layer3."
    for k in sd:
        if k.startswith(probe):
            try:
                idx = max(idx, int(k[len(probe):].split(".")[0]))
            except ValueError:
                pass
    return {5: 50, 22: 101, 35: 152}.get(idx, 50)


def _convert_role(sd: Mapping) -> Tuple[str, dict]:
    """One role's state dict (``model.``/``model_G.``/``model_teacher.``
    prefix already stripped) -> (arch, variables)."""
    # --- pspnet family ---
    if "layer0.0.weight" in sd:                      # bare PSPNet(Semi)
        return "pspnet", convert_pspnet_state_dict(
            sd, _detect_layers(sd))
    if "model.cls.0.weight" in sd:                   # ModelRepresentation
        merged = _sub(sd, "model.")
        merged.update({k: v for k, v in sd.items() if k.startswith("rep.")})
        return "pspnet", convert_pspnet_state_dict(
            merged, _detect_layers(merged))
    if "model.decoder.0.weight" in sd and "model.layer0.0.weight" in sd:
        # FlowModel(FlowPSPNet): decoder==cls, aux dropped, and the shared
        # backbone modules also appear under model.layers./model.encoder.
        # (aliases of the SAME tensors) — read only the canonical names
        flat = _sub(sd, "model.")
        flat = {k: v for k, v in flat.items()
                if not k.startswith(("layers.", "encoder."))}
        for k in list(flat):
            if k.startswith("decoder."):
                flat["cls." + k[len("decoder."):]] = flat.pop(k)
        return "pspnet", convert_pspnet_state_dict(
            flat, _detect_layers(flat))

    # --- deeplabv3 family (torchvision layout) ---
    if "model.backbone.conv1.weight" in sd:          # DeepLabv3 wrapper
        return "deeplabv3", convert_deeplabv3_state_dict(
            _sub(sd, "model."), _detect_layers(sd, "model.backbone."))
    if "model.model.backbone.conv1.weight" in sd:    # ModelRepresentation
        out = convert_deeplabv3_state_dict(
            _sub(sd, "model.model."),
            _detect_layers(sd, "model.model.backbone."))
        if "rep.0.weight" in sd:
            out["params"]["rep"], out["batch_stats"]["rep"] = _seg_head(
                sd, "rep.0", "rep.1", "rep.4")
        return "deeplabv3", out
    if "model.encoder.model.conv1.weight" in sd:     # FlowModel(FlowDeepLabv3)
        flat = {}
        for k, v in sd.items():
            if k.startswith("model.encoder.model."):
                flat["backbone." + k[len("model.encoder.model."):]] = v
            elif k.startswith("model.decoder."):
                flat["classifier." + k[len("model.decoder."):]] = v
        return "deeplabv3", convert_deeplabv3_state_dict(
            flat, _detect_layers(flat, "backbone."))

    # --- vit (Segmenter) family ---
    # (convert_segmenter_state_dict consumes the VITSegmentModel layout,
    # i.e. keys model.encoder.* / model.decoder.*)
    if "model.encoder.cls_token" in sd:              # VITSegmentModel
        n = _count_blocks(sd, "model.encoder.blocks.")
        d = _count_blocks(sd, "model.decoder.blocks.")
        return "vit", convert_segmenter_state_dict(
            sd, n_layers=n, dec_layers=d)
    if "model.model.encoder.cls_token" in sd:        # ModelRepresentation
        n = _count_blocks(sd, "model.model.encoder.blocks.")
        d = _count_blocks(sd, "model.model.decoder.blocks.")
        out = convert_segmenter_state_dict(
            _sub(sd, "model."), n_layers=n, dec_layers=d)
        if "rep.rep_model.cls_emb" in sd:
            out["params"]["rep"] = convert_mask_transformer(
                sd, _count_blocks(sd, "rep.rep_model.blocks."),
                "rep.rep_model.")
        return "vit", out

    raise ValueError(
        "unrecognized reference model layout; sample keys: "
        + ", ".join(sorted(sd)[:8]))


def _count_blocks(sd: Mapping, prefix: str) -> int:
    idx = [int(k[len(prefix):].split(".")[0]) for k in sd
           if k.startswith(prefix)]
    return max(idx) + 1 if idx else 0


def import_lightning_checkpoint(ckpt: Mapping) -> dict:
    """Convert a loaded Lightning checkpoint (or bare state_dict).

    Returns ``{"arch", "method_family", "roles": {...}, "epoch"}`` where
    roles maps ``model`` (student/generator) and optionally ``teacher`` /
    ``discriminator`` to ``{"params", "batch_stats"}`` variable trees.
    """
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, Mapping) else ckpt
    sd = {k: _np(v) for k, v in sd.items()}

    roles: Dict[str, dict] = {}
    if any(k.startswith("model_G.") for k in sd):
        arch, roles["model"] = _convert_role(_sub(sd, "model_G."))
        # FlowModel wrappers are recognizable by names unique to them:
        # FlowPSPNet's ``layers.`` alias / FlowDeepLabv3's OutTransformModule
        # (a vit GAN also has model.decoder.*, so that prefix cannot decide)
        is_flow = any(k.startswith(("model_G.model.layers.",
                                    "model_G.model.encoder.model."))
                      for k in sd)
        has_d = any(k.startswith("model_D.") for k in sd)
        family = ("flow_gan" if is_flow and has_d
                  else "flow_supervised" if is_flow
                  else "gan")
    elif any(k.startswith("model_teacher.") for k in sd):
        family = "contrastive"
        arch, roles["model"] = _convert_role(_sub(sd, "model."))
        _, roles["teacher"] = _convert_role(_sub(sd, "model_teacher."))
    else:
        family = "supervised"
        arch, roles["model"] = _convert_role(_sub(sd, "model."))
    if any(k.startswith("model_D.") for k in sd):
        roles["discriminator"] = {
            "params": convert_s4gan_discriminator(sd, "model_D.")}

    epoch = ckpt.get("epoch") if isinstance(ckpt, Mapping) else None
    return {"arch": arch, "method_family": family, "roles": roles,
            "epoch": epoch}


def graft_variables(target: Any, src: Any, path: str = "",
                    strict_cover: bool = False) -> Any:
    """Merge converted ``src`` leaves into (a copy of) ``target``.

    Every src leaf must exist in target with a matching shape (loud error
    otherwise — a silently unmatched key would leave that weight at random
    init, the failure mode test_train_trajectory guards against). Leaves
    present in target but not in src are KEPT (e.g. the aux head when
    importing a flow checkpoint, which never had one). With
    ``strict_cover``, uncovered PARAM leaves raise instead.
    """
    import jax.numpy as jnp

    if isinstance(target, Mapping):
        if not isinstance(src, Mapping):
            raise ValueError(f"{path or '<root>'}: expected a sub-tree")
        extra = set(src) - set(target)
        if extra:
            raise ValueError(
                f"{path or '<root>'}: converted keys {sorted(extra)} missing "
                f"from the model (have {sorted(target)})")
        out = dict(target)
        for k, v in src.items():
            out[k] = graft_variables(target[k], v, f"{path}/{k}",
                                     strict_cover)
        if strict_cover:
            missing = set(target) - set(src)
            if missing:
                raise ValueError(
                    f"{path or '<root>'}: model keys {sorted(missing)} not "
                    "covered by the checkpoint")
        return out
    leaf = np.asarray(src)
    tgt = np.asarray(target)
    if leaf.shape != tgt.shape:
        raise ValueError(
            f"{path}: shape {leaf.shape} != model {tgt.shape}")
    return jnp.asarray(leaf, dtype=tgt.dtype)


def load_torch_file(path: str) -> dict:
    """``torch.load`` + import (torch needed only to unpickle the file)."""
    import torch

    return import_lightning_checkpoint(
        torch.load(path, map_location="cpu", weights_only=False))

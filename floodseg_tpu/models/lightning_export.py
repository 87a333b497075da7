"""floodseg_tpu variables -> reference Lightning ``state_dict``, one call.

The inverse of models/lightning_import.py: converts trained floodseg_tpu
variable trees into the reference's torch ``state_dict`` layouts so a
floodseg-trained model can be evaluated/served by the reference's own
stack (``test.sh``/``predict.sh`` with ``--ckpt_path``) or compared in its
tooling. Emits the SAME five method layouts the importer recognizes:

  supervised   ``model.*``               (bare arch, or ModelRepresentation
                                          ``model.model.*`` + ``model.rep.*``
                                          when a rep head is present)
  contrastive  ``model.*`` + ``model_teacher.*``
  gan          ``model_G.*`` (+ ``model_D.*``)
  flow_*       ``model_G.model.*``  — FlowModel wrappers, including
               FlowPSPNet's duplicate ``layers.``/``encoder.`` aliases of
               the shared backbone tensors (model/pspnet.py:127-139: the
               same modules are registered three times, so the reference's
               ``state_dict()`` really does contain every alias key and a
               strict ``load_state_dict`` demands them all)

Layout conversions (inverse of models/torch_import.py):
  conv   HWIO -> OIHW; linear (in, out) -> (out, in)
  BN     scale/bias -> weight/bias; batch_stats mean/var ->
         running_mean/running_var, plus the ``num_batches_tracked`` leaf a
         strict torch load requires (emitted as 0 — torch only reads it to
         continue momentum-free averaging, which the reference never uses)

Values are emitted as numpy arrays (f32 for any low-precision params);
``torch.save({"state_dict": {k: torch.from_numpy(v)}})`` on the result is a
loadable Lightning checkpoint. Round-trip (export -> import -> identical
variables) and strict-load-into-the-reference-modules are pinned by
tests/test_lightning_export.py.
"""

from typing import Any, Dict, Mapping, Optional

import numpy as np


def _np32(a) -> np.ndarray:
    a = np.asarray(a)
    if a.dtype not in (np.float32, np.float64, np.int32, np.int64):
        a = a.astype(np.float32)  # bf16/f16 params -> f32 tensors
    return a


def _conv(out: dict, params: Mapping, key: str) -> None:
    out[f"{key}.weight"] = _np32(params["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in params:
        out[f"{key}.bias"] = _np32(params["bias"])


def _bn(out: dict, params: Mapping, stats: Mapping, key: str) -> None:
    out[f"{key}.weight"] = _np32(params["scale"])
    out[f"{key}.bias"] = _np32(params["bias"])
    out[f"{key}.running_mean"] = _np32(stats["mean"])
    out[f"{key}.running_var"] = _np32(stats["var"])
    out[f"{key}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _linear(out: dict, params: Mapping, key: str) -> None:
    out[f"{key}.weight"] = _np32(params["kernel"]).T
    if "bias" in params:
        out[f"{key}.bias"] = _np32(params["bias"])


def _seg_head(out: dict, p: Mapping, s: Mapping,
              conv1_key: str, bn_key: str, conv2_key: str) -> None:
    """Inverse of torch_import._seg_head (the Sequential 0/1/4 indices)."""
    _conv(out, p["conv1"], conv1_key)
    _bn(out, p["bn"], s["bn"], bn_key)
    _conv(out, p["conv2"], conv2_key)


def export_resnet_backbone(p: Mapping, s: Mapping, deep_base: bool = True,
                           prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse of torch_import.convert_resnet_backbone."""
    out: Dict[str, np.ndarray] = {}
    _conv(out, p["conv1"], prefix + "conv1")
    _bn(out, p["bn1"], s["bn1"], prefix + "bn1")
    if deep_base:
        _conv(out, p["conv2"], prefix + "conv2")
        _bn(out, p["bn2"], s["bn2"], prefix + "bn2")
        _conv(out, p["conv3"], prefix + "conv3")
        _bn(out, p["bn3"], s["bn3"], prefix + "bn3")
    for name in p:
        if not name.startswith("layer"):
            continue
        li, bi = name[len("layer"):].split("_block")
        src = f"{prefix}layer{li}.{bi}"
        blk_p, blk_s = p[name], s[name]
        for ci in (1, 2, 3):
            _conv(out, blk_p[f"conv{ci}"], f"{src}.conv{ci}")
            _bn(out, blk_p[f"bn{ci}"], blk_s[f"bn{ci}"], f"{src}.bn{ci}")
        if "downsample_conv" in blk_p:
            _conv(out, blk_p["downsample_conv"], f"{src}.downsample.0")
            _bn(out, blk_p["downsample_bn"], blk_s["downsample_bn"],
                f"{src}.downsample.1")
    return out


def export_pspnet_variables(variables: Mapping,
                            flow: bool = False) -> Dict[str, np.ndarray]:
    """Variables -> reference PSPNet naming (model/pspnet.py): the deep-base
    stem lives in the ``layer0`` Sequential at indices 0/1, 3/4, 6/7
    (relu/maxpool are parameterless), heads are ``cls``/``aux``/``rep``
    Sequentials at indices 0/1/4. ``flow`` emits the FlowPSPNet layout
    instead: ``cls`` renamed ``decoder``, no aux, plus the ``layers.{i}``
    and ``encoder.{0.{i},1}`` duplicate aliases of the shared tensors."""
    p, s = variables["params"], variables["batch_stats"]
    bb = export_resnet_backbone(p["backbone"], s["backbone"], deep_base=True)
    out: Dict[str, np.ndarray] = {}
    stem = {"conv1": "layer0.0", "bn1": "layer0.1", "conv2": "layer0.3",
            "bn2": "layer0.4", "conv3": "layer0.6", "bn3": "layer0.7"}
    for k, v in bb.items():
        mod, leaf = k.split(".", 1)
        out[f"{stem[mod]}.{leaf}" if mod in stem else k] = v

    for i in range(4):
        _conv(out, p["ppm"][f"bin{i}_conv"], f"ppm.features.{i}.1")
        _bn(out, p["ppm"][f"bin{i}_bn"], s["ppm"][f"bin{i}_bn"],
            f"ppm.features.{i}.2")

    cls_name = "decoder" if flow else "cls"
    _seg_head(out, p["cls"], s["cls"],
              f"{cls_name}.0", f"{cls_name}.1", f"{cls_name}.4")
    if not flow and "aux" in p:
        _seg_head(out, p["aux"], s["aux"], "aux.0", "aux.1", "aux.4")

    if flow:
        # FlowPSPNet registers the shared backbone three times
        # (model/pspnet.py:120-139): layer{i}, layers.{i}, encoder.0.{i};
        # and ppm twice: ppm, encoder.1. state_dict repeats shared tensors
        # under every registered path, so a faithful export must too.
        aliases = {}
        for k, v in out.items():
            for i in range(5):
                if k.startswith(f"layer{i}."):
                    rest = k[len(f"layer{i}."):]
                    aliases[f"layers.{i}.{rest}"] = v
                    aliases[f"encoder.0.{i}.{rest}"] = v
            if k.startswith("ppm."):
                aliases["encoder.1." + k[len("ppm."):]] = v
        out.update(aliases)
    return out


def export_deeplabv3_variables(variables: Mapping) -> Dict[str, np.ndarray]:
    """Variables -> torchvision ``deeplabv3_resnet*`` naming (the layout the
    reference builds from torch.hub, model/deeplabv3.py:11-19)."""
    p, s = variables["params"], variables["batch_stats"]
    out = export_resnet_backbone(p["backbone"], s["backbone"],
                                 deep_base=False, prefix="backbone.")
    cp, cs = p["classifier"], s["classifier"]
    _conv(out, cp["aspp"]["b0_conv"], "classifier.0.convs.0.0")
    _bn(out, cp["aspp"]["b0_bn"], cs["aspp"]["b0_bn"],
        "classifier.0.convs.0.1")
    for i in (1, 2, 3):
        _conv(out, cp["aspp"][f"b{i}_conv"], f"classifier.0.convs.{i}.0")
        _bn(out, cp["aspp"][f"b{i}_bn"], cs["aspp"][f"b{i}_bn"],
            f"classifier.0.convs.{i}.1")
    _conv(out, cp["aspp"]["pool_conv"], "classifier.0.convs.4.1")
    _bn(out, cp["aspp"]["pool_bn"], cs["aspp"]["pool_bn"],
        "classifier.0.convs.4.2")
    _conv(out, cp["aspp"]["project_conv"], "classifier.0.project.0")
    _bn(out, cp["aspp"]["project_bn"], cs["aspp"]["project_bn"],
        "classifier.0.project.1")
    _conv(out, cp["conv"], "classifier.1")
    _bn(out, cp["bn"], cs["bn"], "classifier.2")
    _conv(out, cp["classifier"], "classifier.4")
    if "aux_classifier" in p:
        ap, as_ = p["aux_classifier"], s["aux_classifier"]
        _conv(out, ap["conv"], "aux_classifier.0")
        _bn(out, ap["bn"], as_["bn"], "aux_classifier.1")
        _conv(out, ap["classifier"], "aux_classifier.4")
    return out


def _export_block(out: dict, p: Mapping, prefix: str) -> None:
    for ln in ("norm1", "norm2"):
        out[f"{prefix}.{ln}.weight"] = _np32(p[ln]["scale"])
        out[f"{prefix}.{ln}.bias"] = _np32(p[ln]["bias"])
    _linear(out, p["attn"]["qkv"], f"{prefix}.attn.qkv")
    _linear(out, p["attn"]["proj"], f"{prefix}.attn.proj")
    _linear(out, p["mlp"]["fc1"], f"{prefix}.mlp.fc1")
    _linear(out, p["mlp"]["fc2"], f"{prefix}.mlp.fc2")


def export_vit_encoder(p: Mapping, prefix: str = "",
                       n_channels: int = 3) -> Dict[str, np.ndarray]:
    """Inverse of torch_import.convert_vit_encoder: the patchify matmul
    kernel (P*P*C, D) with (py, px, c) feature order folds back into the
    strided patch conv weight (D, C, P, P)."""
    out: Dict[str, np.ndarray] = {}
    k = _np32(p["patch_proj"]["kernel"])
    d = k.shape[1]
    patch = int(round((k.shape[0] // n_channels) ** 0.5))
    if patch * patch * n_channels != k.shape[0]:
        raise ValueError(f"patch kernel rows {k.shape[0]} are not "
                         f"P*P*{n_channels}")
    out[f"{prefix}patch_embed.proj.weight"] = (
        k.reshape(patch, patch, n_channels, d).transpose(3, 2, 0, 1))
    out[f"{prefix}patch_embed.proj.bias"] = _np32(p["patch_proj"]["bias"])
    out[f"{prefix}cls_token"] = _np32(p["cls_token"])
    out[f"{prefix}pos_embed"] = _np32(p["pos_embed"])
    out[f"{prefix}norm.weight"] = _np32(p["norm"]["scale"])
    out[f"{prefix}norm.bias"] = _np32(p["norm"]["bias"])
    for name in p:
        if name.startswith("block"):
            _export_block(out, p[name], f"{prefix}blocks.{name[5:]}")
    return out


def export_mask_transformer(p: Mapping,
                            prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    _linear(out, p["proj_dec"], f"{prefix}proj_dec")
    out[f"{prefix}cls_emb"] = _np32(p["cls_emb"])
    out[f"{prefix}proj_patch"] = _np32(p["proj_patch"])
    out[f"{prefix}proj_classes"] = _np32(p["proj_classes"])
    for ln in ("decoder_norm", "mask_norm"):
        out[f"{prefix}{ln}.weight"] = _np32(p[ln]["scale"])
        out[f"{prefix}{ln}.bias"] = _np32(p[ln]["bias"])
    for name in p:
        if name.startswith("block"):
            _export_block(out, p[name], f"{prefix}blocks.{name[5:]}")
    return out


def export_s4gan_discriminator(p: Mapping) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for i, li in enumerate((0, 3, 6, 9)):
        _conv(out, p[f"conv{i + 1}"], f"layers.{li}")
    _linear(out, p["final"], "final.0")
    return out


def _export_role(arch: str, variables: Mapping,
                 flow: bool = False) -> Dict[str, np.ndarray]:
    """One role's variables -> its within-role reference layout (the exact
    key sets lightning_import._convert_role dispatches on)."""
    p = variables["params"]
    if arch == "pspnet":
        inner = export_pspnet_variables(variables, flow=flow)
        if flow:
            return {f"model.{k}": v for k, v in inner.items()}
        if "rep" in p:
            # ModelRepresentation(model=PSPNet, rep=Sequential 0/1/4)
            out = {f"model.{k}": v for k, v in inner.items()}
            rep: Dict[str, np.ndarray] = {}
            _seg_head(rep, p["rep"], variables["batch_stats"]["rep"],
                      "rep.0", "rep.1", "rep.4")
            out.update(rep)
            return out
        return inner
    if arch == "deeplabv3":
        inner = export_deeplabv3_variables(variables)
        if flow:
            # FlowModel(FlowDeepLabv3): encoder=OutTransformModule(backbone)
            # -> model.encoder.model.*, decoder=classifier -> model.decoder.*
            # (no aux_classifier in the flow wrapper, deeplabv3.py:47-54)
            out = {}
            for k, v in inner.items():
                if k.startswith("backbone."):
                    out["model.encoder.model." + k[len("backbone."):]] = v
                elif k.startswith("classifier."):
                    out["model.decoder." + k[len("classifier."):]] = v
            return out
        if "rep" in p:
            out = {f"model.model.{k}": v for k, v in inner.items()}
            rep = {}
            _seg_head(rep, p["rep"], variables["batch_stats"]["rep"],
                      "rep.0", "rep.1", "rep.4")
            out.update(rep)
            return out
        return {f"model.{k}": v for k, v in inner.items()}
    if arch == "vit":
        if flow:
            raise ValueError(
                "the reference has no vit flow layout (flow/base.py:94-103 "
                "raises NotImplementedError); a floodseg vit flow model "
                "cannot be exported to a reference-loadable checkpoint")
        inner = export_vit_encoder(p["encoder"], "model.encoder.")
        inner.update(export_mask_transformer(p["decoder"], "model.decoder."))
        if "rep" in p:
            out = {f"model.{k}": v for k, v in inner.items()}
            out.update(export_mask_transformer(p["rep"], "rep.rep_model."))
            return out
        return inner
    raise ValueError(f"unknown arch {arch!r}")


def export_lightning_checkpoint(
    arch: str,
    roles: Mapping[str, Mapping],
    method_family: str,
    epoch: Optional[int] = None,
) -> Dict[str, Any]:
    """Assemble a Lightning-checkpoint dict from per-role variable trees.

    ``roles`` maps ``model`` (student/generator; ``{"params", ...,
    "batch_stats"}``) and optionally ``teacher`` / ``discriminator`` —
    the same shape import_lightning_checkpoint returns, so
    ``export(**import(ckpt))`` reproduces the original key layout.
    """
    flow = method_family.startswith("flow")
    sd: Dict[str, np.ndarray] = {}
    if method_family in ("gan", "flow_gan", "flow_supervised"):
        g_prefix = "model_G."
    else:
        g_prefix = "model."
    for k, v in _export_role(arch, roles["model"], flow=flow).items():
        sd[g_prefix + k] = v
    if "teacher" in roles:
        if method_family != "contrastive":
            raise ValueError("a teacher role implies method contrastive")
        for k, v in _export_role(arch, roles["teacher"]).items():
            sd["model_teacher." + k] = v
    if "discriminator" in roles:
        for k, v in export_s4gan_discriminator(
                roles["discriminator"]["params"]).items():
            sd["model_D." + k] = v
    out: Dict[str, Any] = {"state_dict": sd}
    if epoch is not None:
        out["epoch"] = int(epoch)
    return out

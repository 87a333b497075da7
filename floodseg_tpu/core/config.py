"""Layered dataclass config system.

Mirrors the reference's LightningCLI surface (/root/reference/base/cli.py):
- layered YAML configs, later files win (train.sh:16 stacks
  train_base.yaml + train_<method>.yaml + dataset config);
- dot-path CLI overrides (``--model.arch=vit --data.batch_size=4``);
- linked/derived arguments (cli.py:82-94): square crops (train_w -> train_h),
  test size = train size, arch/semisupervised/no_warp/no_cropping/
  predict_v_id propagated between model and data;
- arch-dependent size rounding ``round_train`` (foundation.py:34-42).
"""

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml


def round_train(x: int, arch: str) -> int:
    """pspnet/deeplabv3: 8k+1; vit: multiple of 32 (foundation.py:34-42)."""
    if arch == "vit":
        return x // 32 * 32
    return (x - 1) // 8 * 8 + 1


@dataclass
class OptimConfig:
    optim: str = "SGD"
    lr: float = 1e-4
    lr_D: float = 1e-4          # discriminator (gan.py OptimKWArgs)
    momentum: float = 0.9
    weight_decay: float = 1e-4


@dataclass
class LossConfig:
    loss: str = "ohem"           # "ohem" | "cross_entropy"
    thresh: float = 0.7
    min_kept: int = 100000


@dataclass
class ContrastiveCfg:
    enabled: bool = True
    negative_high_entropy: bool = True
    low_rank: int = 3
    high_rank: int = 20
    current_class_threshold: float = 0.3
    current_class_negative_threshold: float = 1.0
    low_entropy_threshold: float = 20.0
    num_negatives: int = 50
    num_queries: int = 256
    temperature: float = 0.5
    loss_weight: float = 1.0
    max_enqueue: int = 1024
    bank_capacity: int = 30000        # reference queue_size (contrastive.py:172)
    bank_class0_capacity: int = 50000
    # The reference's boundary copy t.data = s.data ALIASES teacher and
    # student storage, making its EMA a no-op (teacher params == student
    # params after warmup). False replicates that de facto behavior;
    # True enables the real EMA the reference code appears to implement.
    true_ema: bool = False


@dataclass
class ModelConfig:
    arch: str = "pspnet"
    classes: int = 5
    layers: int = 101
    test_h: int = 873
    test_w: int = 873
    ignore_index: int = 255
    test_scales: List[float] = field(default_factory=lambda: [1.0])
    test_base_size: int = 2048   # long-side at scale 1.0 (foundation.py:183)
    power: float = 0.9
    aux: bool = True
    aux_weight: float = 0.4
    pretrained: bool = True
    pretrained_path: Optional[str] = None
    semisupervised: bool = False
    # (the reference's only_segmentation hparam is declared but never read
    # anywhere — foundation.py:61 — so it is deliberately not carried)
    # flow
    feature_based: bool = True
    no_warp: bool = False
    no_cropping: bool = False
    no_interpolation_percentage: float = 0.0
    # TPU predict acceleration: run the decoder's heavy convs in int8 on
    # the MXU (BN folded, dynamic per-tensor activation scales;
    # ops/quant.py). No reference equivalent; checkpoints are unaffected.
    # None = auto: enabled for the pspnet (SegHead) and deeplabv3
    # (DeepLabHead) flow predict when the backend has the 2x int8 MXU path
    # (tpu/axon), off elsewhere (CPU int8 convs are slower; the vit
    # MaskTransformer has no int8 path). True forces it (loud error on
    # unsupported heads); False forces full-precision decode.
    int8_decode: Optional[bool] = None
    # W8A8 PTQ of the whole ResNet trunk in the flow predict programs
    # (ops/quant.py::int8_resnet_trunk). Opt-in, NOT auto: encoder error
    # feeds every downstream stage (warps, blends, decode), so it ships off
    # pending a real-pretrained-weights validation. pspnet/deeplabv3 only.
    int8_encode: bool = False
    predict_v_id: str = "florida-01"
    save_images: bool = False
    save_video: bool = True
    compute_metrics: bool = True
    # s4GAN
    threshold_st: float = 0.6
    lambda_fm: float = 0.1
    lambda_st: float = 1.0
    # U2PL
    sup_only_epoch: int = 2
    unsupervised_apply_aug: str = "cutmix"
    unsupervised_drop_percent: float = 80.0
    unsupervised_loss_weight: float = 1.0
    ema_decay: float = 0.99
    # numerics
    remat: bool = False     # jax.checkpoint backbone blocks (memory vs ~30% time)
    dtype: str = "float32"       # "float32" | "bfloat16"
    optim: OptimConfig = field(default_factory=OptimConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    contrastive: ContrastiveCfg = field(default_factory=ContrastiveCfg)


@dataclass
class DataConfig:
    data_root: str = "dataset/flow/"
    data_variant: Optional[str] = "all"
    data_classes_ignore: List[int] = field(default_factory=list)
    batch_size: int = 2
    batch_size_val: int = 1
    batch_size_test: int = 1
    train_h: int = 873
    train_w: int = 873
    workers: int = 8
    workers_test: int = 8
    # fit-path host->device transfer optimization: the train pipeline skips
    # Normalize, frames travel as float16 raw pixels (half the bytes) and
    # (x - mean)/std fuses into the compiled train step
    normalize_on_device: bool = False
    ignore_index: int = 255
    semisupervised: bool = False
    data_ratio: float = 1.0
    scale_min: float = 0.5
    scale_max: float = 2.0
    resize_h: int = 1072
    resize_w: int = 1920
    no_cropping: bool = False
    no_warp: bool = False
    predict_v_id: str = "florida-01"
    # flow
    frame_delta: int = 25
    resize_factor: float = 1.0
    resize_factor_test: float = 1.0
    resize_factor_predict: float = 1.0
    no_random_frame_delta: bool = False
    arch: str = "pspnet"


@dataclass
class TrainerConfig:
    max_epochs: int = 100
    seed: int = 42
    log_dir: str = "logs"
    run_name: Optional[str] = None
    check_val_every_n_epoch: int = 1
    early_stopping_patience: int = 10
    early_stopping_min_delta: float = 1e-3
    save_top_k: int = 5
    # test-output image table (reference LogWandBPredictionsCallback,
    # base/cli.py:24-65 — constructed there but not registered by default;
    # 0 keeps that default): rows of (image, colorized gt, prediction)
    log_test_images: int = 0
    limit_train_batches: Optional[int] = None
    limit_val_batches: Optional[int] = None
    limit_test_batches: Optional[int] = None
    num_devices: Optional[int] = None   # default: all
    debug_nans: bool = False            # jax debug_nans for CI numerics hunts
    resume: bool = True                 # auto-resume from last checkpoint


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    method: str = "supervised"   # supervised|gan|contrastive|flow_supervised|flow_gan
    ckpt_path: Optional[str] = None
    wandb: Optional[str] = None
    runid: Optional[str] = None
    tag: Optional[str] = None


def _update_dataclass(obj, values: Dict[str, Any]):
    for k, v in values.items():
        if not hasattr(obj, k):
            raise KeyError(f"unknown config key {k!r} on {type(obj).__name__}")
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _update_dataclass(cur, v)
        else:
            setattr(obj, k, v)


def _set_dotted(obj, path: str, value: Any):
    parts = path.split(".")
    for p in parts[:-1]:
        obj = getattr(obj, p)
    leaf = parts[-1]
    if not hasattr(obj, leaf):
        raise KeyError(f"unknown config key {path!r}")
    cur = getattr(obj, leaf)
    if isinstance(value, str):
        if cur is not None and not isinstance(cur, str):
            value = yaml.safe_load(value)
        elif cur is None and _field_wants_yaml(type(obj), leaf):
            # Optional[int/float/bool] fields default to None — coerce by
            # the annotation, not the (absent) current value
            value = yaml.safe_load(value)
    setattr(obj, leaf, value)


def _field_wants_yaml(cls, name: str) -> bool:
    import typing
    t = typing.get_type_hints(cls).get(name)
    if t is None:
        return False
    args = [a for a in typing.get_args(t) if a is not type(None)]
    return (all(a is not str for a in args)) if args else (t is not str)


def load_config(config_files: List[str], overrides: Optional[Dict[str, Any]] = None,
                link: bool = True) -> Config:
    """Layer YAML files (later wins), apply dot-path overrides, derive links."""
    cfg = Config()
    for path in config_files:
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        _update_dataclass(cfg, raw)
    for k, v in (overrides or {}).items():
        _set_dotted(cfg, k, v)
    if link:
        apply_links(cfg)
    return cfg


def apply_links(cfg: Config) -> Config:
    """Reference link_arguments (base/cli.py:82-94): square crops, test size
    follows train size, shared flags propagate model <-> data."""
    cfg.data.arch = cfg.model.arch
    cfg.data.train_h = round_train(cfg.data.train_w, cfg.model.arch)
    cfg.data.train_w = round_train(cfg.data.train_w, cfg.model.arch)
    cfg.model.test_h = cfg.data.train_h
    cfg.model.test_w = cfg.data.train_w
    cfg.data.semisupervised = cfg.model.semisupervised
    cfg.data.no_warp = cfg.model.no_warp
    cfg.data.no_cropping = cfg.model.no_cropping
    # predict_v_id: whichever side was explicitly changed wins (model first,
    # mirroring the reference's model -> data link direction)
    default_vid = ModelConfig().predict_v_id
    if cfg.model.predict_v_id != default_vid:
        cfg.data.predict_v_id = cfg.model.predict_v_id
    elif cfg.data.predict_v_id != default_vid:
        cfg.model.predict_v_id = cfg.data.predict_v_id
    cfg.data.ignore_index = cfg.model.ignore_index
    return cfg


def parse_cli_overrides(argv: List[str]) -> Dict[str, Any]:
    """``--model.arch vit`` / ``--model.arch=vit`` style pairs."""
    out: Dict[str, Any] = {}
    i = 0
    while i < len(argv):
        a = argv[i]
        if not a.startswith("--"):
            raise SystemExit(f"unexpected argument {a!r}")
        a = a[2:]
        if "=" in a:
            k, v = a.split("=", 1)
            out[k] = v
            i += 1
        else:
            if i + 1 >= len(argv):
                raise SystemExit(f"missing value for --{a}")
            out[a] = argv[i + 1]
            i += 2
    return out


def config_to_dict(cfg) -> Dict:
    return dataclasses.asdict(cfg)

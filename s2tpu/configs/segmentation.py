"""Segmentation experiment config tree: base -> model preset -> run-type -> CLI.

Mirrors the reference's layered dataclass+partial composition
(src/configs/segmentation.py:33-204) with TPU-native training knobs:
``torch.compile`` flags become jit/remat options, Lightning ``devices``
becomes a mesh spec, ``precision`` becomes an explicit compute dtype.
"""

from __future__ import annotations

import dataclasses
import enum
import typing
from dataclasses import dataclass, field

from s2tpu.configs.data_config import BANDS, LABEL_MAPS, BandsMixin


class ModelName(str, enum.Enum):
    FC_PRITHVI_BACKBONE = "fc-prithvi-backbone"
    EFFICIENTNET_UNET_B0 = "efficientnet-unet-b0"
    EFFICIENTNET_UNET_B1 = "efficientnet-unet-b1"
    EFFICIENTNET_UNET_B2 = "efficientnet-unet-b2"
    EFFICIENTNET_UNET_B3 = "efficientnet-unet-b3"
    EFFICIENTNET_UNET_B4 = "efficientnet-unet-b4"
    EFFICIENTNET_UNET_B5 = "efficientnet-unet-b5"
    EFFICIENTNET_UNET_B6 = "efficientnet-unet-b6"
    EFFICIENTNET_UNET_B7 = "efficientnet-unet-b7"


class LossType(str, enum.Enum):
    CE = "ce"
    FOCAL = "focal"
    DICE = "dice"
    DICE_FOCAL = "dice_focal"


class LRSchedulerType(str, enum.Enum):
    STEP = "step"
    COSINE = "cosine"


@dataclass
class DatasetConfig(BandsMixin):
    aoi: str
    label_map: str
    n_time_frames: int = 1
    squeeze_time_dim: bool = False  # (C,H,W) vs (C,1,H,W) per-sample shape
    data_dir: str | None = None  # override DATA_DIR (tests / packed corpora)
    # Spectral band set: which Sentinel-2 bands the segment rasters carry, in
    # raster band order. Drives the model's in_channels, the acquisition
    # evalscript, and statistics lengths. Default = the 6 Prithvi-HLS bands
    # (reference data_config.py:72); "all12" trains on every L2A band
    # (BASELINE config #3). Accepts a BAND_SETS name or an explicit list.
    bands: list[str] = field(default_factory=lambda: list(BANDS))
    # Multi-temporal input for single-frame models (BASELINE config #3's
    # B5 on quarterly composites): fold the T axis into channels just before
    # the model — (B, T, H, W, C) -> (B, H, W, T*C), frame-major channel
    # order. The ViT consumes T natively (tubelet); this is the UNet path.
    stack_time_into_channels: bool = False
    # __post_init__ (band parsing) + in_channels come from BandsMixin.


@dataclass
class DatamoduleConfig:
    dataset_cfg: DatasetConfig
    batch_size: int
    data_split: tuple[float, float, float]
    val_batch_size_multiplier: int = 2
    augment: bool = True
    random_horizontal_flip_p: float = 0.5
    random_vertical_flip_p: float = 0.5
    random_crop_size: int = 224
    # Apply the random H/V flips on the host during the crop gather (free:
    # a reversed memcpy in the C++ gather / a numpy view, overlapped with
    # device compute) instead of as select/reverse ops inside the XLA step.
    # Ignored (flips stay on device) when train.device_corpus is set.
    host_flips: bool = True
    class_distribution: list[float] | None = None  # enables weighted sampling
    prefetch: int = 2  # host->device prefetch depth
    shuffle_seed: int = 0


@dataclass
class TrainConfig:
    # optimizer
    lr: float = 1.5e-6
    weight_decay: float = 0.05
    betas: tuple[float, float] = (0.9, 0.999)

    # loss
    loss_type: LossType = LossType.CE
    masked_loss: bool = True  # ignore class 0 (unlabeled) in loss + metrics
    weighted_loss: bool = False
    label_smoothing: float = 0.0
    focal_loss_gamma: float | None = 2.0
    dice_eps: float | None = 1e-8
    dice_focal_dice_weight: float | None = 0.5
    dice_focal_focal_weight: float | None = 0.5

    # compilation / numerics (TPU analogue of torch.compile + precision flags)
    compute_dtype: str = "bfloat16"  # activations/matmul dtype
    # Parameter STORAGE dtype. "bfloat16" keeps model params in bf16 (half the
    # per-pass weight HBM reads, no per-step f32->bf16 casts) with an f32
    # master copy inside the optimizer state (train_state.with_f32_master),
    # so small Adam deltas are never rounded away. "float32" = plain storage.
    param_dtype: str = "float32"
    remat: bool = False  # jax.checkpoint the encoder to trade FLOPs for HBM
    # UNet-only: run the early encoder blocks on the c-major space-to-depth
    # layout (see EfficientNetUNetConfig.packed_early_blocks for variants:
    # False / "grouped" / "dense"). Layout-only — same params/checkpoints.
    packed_early_blocks: bool | str = False
    donate_state: bool = True  # donate train-state buffers to the jit'd step
    # Upload the packed corpus to HBM once and crop on device — per step the
    # host sends only index/offset vectors (see s2tpu/data/device_corpus.py).
    device_corpus: bool = False
    # Shard the corpus segment axis over the 'data' mesh (corpora beyond
    # per-chip HBM): each device holds N/D segments and contributes B/D
    # samples per step from its own shard; multi-host holds per-host blocks.
    device_corpus_sharded: bool = False
    # Fuse N consecutive train steps into ONE XLA program (lax.scan over the
    # donated state) in device-corpus mode, where per-step input is only the
    # int32 index/offset vectors. Amortizes per-step host dispatch latency —
    # the host wakes once per N optimizer steps. Semantics are bit-identical
    # to N single steps (same per-step RNG fold on state.step). Ignored in
    # host-streamed mode (each step needs a fresh host batch).
    steps_per_dispatch: int = 1
    # When > 0, replace BN running statistics with exact statistics pooled
    # over this many train batches before each validation pass
    # (trainer.recalibrate_bn). Essential for short runs: the encoder's
    # 0.99 BN EMA (reference parity) needs hundreds of steps to converge.
    bn_recalibration_batches: int = 0

    # fc-prithvi-backbone: initialize the backbone from an s2tpu MAE
    # pretraining checkpoint directory (our own pretrain -> finetune flow)
    # instead of the converted Prithvi_100M.pt.
    backbone_ckpt: str | None = None
    # fc-prithvi-backbone: freeze the ViT encoder (stop_gradient + optax
    # zero-update mask; reference preset field segmentation.py:171 ->
    # prithvi_segmentation.py:152-154). False trains the full network.
    frozen_backbone: bool = True
    # Two-phase finetune (BASELINE config #4 "frozen-then-unfrozen"): train
    # with the frozen backbone until this epoch, then unfreeze — the trainer
    # rebuilds the model/optimizer/jitted steps at the transition (fresh Adam
    # moments; params/BN stats/step carry over). None = single phase.
    unfreeze_backbone_at_epoch: int | None = None
    # LR multiplier applied at the unfreeze transition (phase 2 trains the
    # full network — head-only LRs destabilize a pretrained encoder; measured
    # on the pretrain->finetune anchor: lr=1e-3 unfrozen scored 0.9146 vs
    # 0.9574 frozen). 1.0 = keep the schedule unchanged.
    unfreeze_lr_scale: float = 1.0

    # Parameter EMA: maintain an exponential moving average of the params
    # inside the optimizer state (train_state.with_param_ema); validation,
    # epoch image logging, BN recalibration, and `cli/infer` (default;
    # `--no-ema` opts out) then run
    # on the averaged weights (trainer.eval_state). Standard production
    # smoothing the reference lacks (torch.optim.swa_utils unused there).
    # None disables; typical values 0.99-0.9999.
    ema_decay: float | None = None

    # Gradient accumulation: split each batch into N sequential microbatches
    # (lax.scan inside the jit'd step) and apply one optimizer update on the
    # averaged gradients. Effective batch stays datamodule.batch_size;
    # activation memory drops to one microbatch. BN batch statistics are
    # computed per microbatch (running stats updated sequentially).
    grad_accum_steps: int = 1

    # trainer
    max_epochs: int = -1
    log_interval: int = 50
    # Per-layer gradient/parameter norm logging every N steps (reference
    # logger.watch(log="all", log_freq=30), train_segmentation.py:272).
    # 0 disables; the watch reductions are only added to the step program
    # when a run logger is attached, so benches stay unaffected.
    watch_interval: int = 30
    num_devices: int = -1  # -1 = all visible devices; data-parallel mesh size
    overfit_batches: int = 0  # >0: repeat the first N batches (sanity preset)

    # logger / run identity
    use_wandb_logger: bool = True
    project_name: str = "sentinel-segmentation"
    wandb_entity: str | None = None
    run_name: str | None = None
    tags: list[str] = field(default_factory=list)

    seed: int = 42
    class_distribution: list[float] | None = None  # filled from dataset stats

    # lr scheduler
    lr_scheduler_type: LRSchedulerType | None = None
    step_lr_sched_step_size: int | None = None
    step_lr_sched_gamma: float | None = None
    cosine_lr_sched_first_cycle_steps: int | None = None
    cosine_lr_sched_cycle_mult: float | None = None
    cosine_lr_sched_max_lr: float | None = None
    cosine_lr_sched_min_lr: float | None = None
    cosine_lr_sched_warmup_steps: int | None = None
    cosine_lr_sched_gamma: float | None = None

    # checkpointing
    ckpt_every_n_epochs: int = 1
    ckpt_keep: int = 1

    def __post_init__(self) -> None:
        # JSON round-trips (checkpoint config.json) deliver enums as strings.
        if isinstance(self.loss_type, str):
            self.loss_type = LossType(self.loss_type)
        if isinstance(self.lr_scheduler_type, str):
            self.lr_scheduler_type = LRSchedulerType(self.lr_scheduler_type)


@dataclass
class Config:
    model_name: ModelName
    datamodule: DatamoduleConfig
    train: TrainConfig
    num_classes: int | None = None  # derived from the label map

    def __post_init__(self) -> None:
        if isinstance(self.model_name, str):
            self.model_name = ModelName(self.model_name)
        if self.model_name.value.startswith("efficientnet-unet"):
            ds = self.datamodule.dataset_cfg
            assert ds.n_time_frames == 1 or ds.stack_time_into_channels, (
                "EfficientNet-UNet is single-frame: T>1 needs "
                "stack_time_into_channels (--stack-time) to fold frames into channels"
            )
            ds.squeeze_time_dim = ds.n_time_frames == 1
        if self.num_classes is None:
            self.num_classes = LABEL_MAPS[self.datamodule.dataset_cfg.label_map].num_classes

    def build_model(self, dtype=None):
        """Instantiate the Flax module for ``model_name`` (factory, like get_model).

        ``dtype`` is the computation dtype (defaults to train.compute_dtype);
        parameters initialize in float32 (train.param_dtype="bfloat16" makes
        the trainer store them in bf16 with an f32 master in the optimizer).
        """
        import jax.numpy as jnp

        assert self.num_classes is not None
        if dtype is None:
            dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[self.train.compute_dtype]
        name = self.model_name.value
        if name.startswith("efficientnet-unet"):
            from s2tpu.models.efficientnet_unet import EfficientNetUNet, EfficientNetUNetConfig

            ds = self.datamodule.dataset_cfg
            in_ch = ds.in_channels * (
                ds.n_time_frames if ds.stack_time_into_channels else 1
            )
            return EfficientNetUNet(
                EfficientNetUNetConfig(
                    version=name.rsplit("-", 1)[-1],
                    in_channels=in_ch,
                    num_classes=self.num_classes,
                    class_distribution=self.train.class_distribution,
                    packed_early_blocks=self.train.packed_early_blocks,
                ),
                dtype=dtype,
            )
        if name == ModelName.FC_PRITHVI_BACKBONE.value:
            from s2tpu.models.prithvi_mae import PrithviConfig
            from s2tpu.models.prithvi_seg import PrithviSegmentationConfig, PrithviSegmentationNet

            # Patch grid follows the training crop (14x14 at the reference's
            # 224; any /16 crop works — the sincos table regenerates).
            crop = self.datamodule.random_crop_size
            assert crop % 16 == 0, f"fc-prithvi-backbone needs a /16 crop, got {crop}"
            t = self.datamodule.dataset_cfg.n_time_frames
            return PrithviSegmentationNet(
                PrithviSegmentationConfig(
                    num_frames=t,
                    num_classes=self.num_classes,
                    fcn_out_channels=256,
                    fcn_num_convs=1,
                    fcn_dropout=0.1,
                    frozen_backbone=self.train.frozen_backbone,
                    patch_height=crop // 16,
                    patch_width=crop // 16,
                    backbone=PrithviConfig(
                        num_frames=t,
                        img_size=crop,
                        in_chans=self.datamodule.dataset_cfg.in_channels,
                    ),
                ),
                dtype=dtype,
            )
        raise ValueError(f"Unknown model: {self.model_name}")


def base_config(model_name: ModelName | str, aoi: str = "fr", label_map: str = "cnes-multiclass") -> Config:
    """Default experiment config (parity with BASE_CONFIG, segmentation.py:127-162)."""
    return Config(
        model_name=ModelName(model_name),
        datamodule=DatamoduleConfig(
            dataset_cfg=DatasetConfig(aoi=aoi, label_map=label_map),
            batch_size=32,
            data_split=(0.8, 0.2, 0.0),
            val_batch_size_multiplier=2,
            augment=True,
            random_horizontal_flip_p=0.5,
            random_vertical_flip_p=0.5,
        ),
        train=TrainConfig(),
    )


RunType = typing.Literal["train", "debug", "overfit", "tune"]


def effective_batch_size(config: Config) -> int:
    """Global samples per optimizer step — which is ``datamodule.batch_size``
    itself: unlike the reference, where Lightning's loader batch is PER-DEVICE
    and must be multiplied by ``devices`` (prithvi_mae_finetune.py:117-118),
    this framework's batch is global by construction (sharded over the data
    mesh, trainer.py:198; split across processes, pipeline.py:90), so a
    device/process multiplication here would double-count and over-scale the
    LR by the mesh size on multi-chip runs. ``grad_accum_steps`` does NOT
    multiply either — accumulation splits the same batch into microbatches
    (TrainConfig.grad_accum_steps)."""
    return config.datamodule.batch_size


def apply_linear_lr_scaling(config: Config, reference_bs: int = 32) -> Config:
    """The MAE linear LR-scaling rule (configs/mae.py:158, reference
    prithvi_mae_finetune.py:101-118) ported to segmentation: treat
    ``config.train.lr`` as the base LR at ``reference_bs`` effective samples
    per step and scale it linearly to the configured effective batch.
    Large-batch runs (VERDICT r4 #1: the north-star constraint is equal mIoU,
    not equal batch size) keep per-sample learning progress comparable to the
    bs=32 anchors this way. Call AFTER batch_size/num_devices are final."""
    config.train.lr = config.train.lr * effective_batch_size(config) / reference_bs
    return config


def set_run_type(config: Config, run_type: RunType) -> Config:
    return {"train": lambda c: c, "debug": debug, "overfit": overfit, "tune": tune_preset}[run_type](config)


def debug(config: Config) -> Config:
    config.train.num_devices = 1
    config.datamodule.batch_size = 1
    config.train.compute_dtype = "float32"
    config.train.tags.append("debug")
    return config


def tune_preset(config: Config) -> Config:
    config.train.tags.append("tune")
    config.train.use_wandb_logger = False  # trials log through the tune JSONL summary
    return config


def overfit(config: Config) -> Config:
    config.train.overfit_batches = 1
    config.datamodule.augment = False
    config.train.tags.append("overfit")
    return config


def config_to_dict(config: Config) -> dict:
    """Flatten a config tree for logging/ckpt metadata (hyperparameter record)."""
    return dataclasses.asdict(config)

"""Prithvi MAE pretrain/finetune config (parity: src/configs/prithvi_mae_finetune.py).

Carries over the MAE linear LR-scaling rule ``lr = base * effective_bs / 256``
(prithvi_mae_finetune.py:101-118). In the reference the loader batch is
per-device and ``effective_bs = batch_size * devices``; here
``datamodule.batch_size`` is already the GLOBAL per-optimizer-step batch
(sharded over the data mesh / split across processes), so the effective batch
is the configured batch itself — multiplying by the device count would
double-count and over-scale the LR by the mesh size on multi-chip runs.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


from s2tpu.configs.data_config import BandsMixin


class MAELRSchedulerType(str, enum.Enum):
    STEP = "step"
    COSINE_WARM_RESTARTS = "cosine_warm_restarts"


@dataclass
class MAEDatasetConfig(BandsMixin):
    aoi: str
    n_time_frames: int = 1
    data_dir: str | None = None
    # Spectral band set (see segmentation.DatasetConfig.bands): a BAND_SETS
    # name, comma list, or explicit list. Any set other than the Prithvi-HLS
    # six trains from scratch (the published Prithvi_100M.pt patch embed
    # belongs to those bands specifically) and normalizes with dataset
    # Welford statistics instead of the published Prithvi mean/std.
    # __post_init__ (band parsing) + in_channels come from BandsMixin.
    bands: "list[str] | str" = "default"


@dataclass
class MAEDatamoduleConfig:
    dataset_cfg: MAEDatasetConfig
    batch_size: int = 32
    augment: bool = True
    data_split: tuple[float, float, float] = (0.8, 0.2, 0.0)
    val_batch_size_multiplier: int = 2
    random_crop_size: int = 224
    prefetch: int = 2
    shuffle_seed: int = 0


@dataclass
class MAEModelConfig:
    num_frames: int = 1
    mask_ratio: float = 0.75
    norm_pix_loss: bool = False
    # "fused" = Pallas fused-attention kernels (fwd+bwd, probabilities stay
    # in VMEM, dense-native qkv layout) for L >= 128 — measured 1229.2 vs
    # 970.6 img/s (+27%) on the v5e MAE pretrain step vs "xla"
    # (scripts/profile_mae.py found 23 ms/step of materialized-softmax
    # traffic + padded per-head matmuls at L=197; PERF_NOTES r3 has the
    # variant-by-variant history). "xla" = jax.nn.dot_product_attention.
    attention_impl: str = "fused"
    # Pipeline parallelism: >1 stages the encoder blocks over the mesh's
    # 'model' axis (GPipe microbatch schedule, s2tpu/parallel/pipeline.py).
    # Requires mesh model-axis size == pipeline_stages and depth %
    # pipeline_stages == 0; mutually exclusive with tensor parallelism.
    pipeline_stages: int = 1
    # Microbatches per pipeline tick-schedule (bubble = (S-1)/(M+S-1)).
    # The per-data-shard batch must be divisible by this.
    pipeline_microbatches: int = 2


@dataclass
class MAETrainConfig:
    from_scratch: bool = False
    lr: float = 5e-4
    weight_decay: float = 0.05
    betas: tuple[float, float] = (0.9, 0.999)

    compute_dtype: str = "float32"
    # Parameter storage dtype; "bfloat16" = bf16 params + f32 master copy in
    # the optimizer state (see segmentation.TrainConfig.param_dtype).
    param_dtype: str = "float32"
    remat: bool = False
    donate_state: bool = True
    # Parameter EMA in the optimizer state (train_state.with_param_ema):
    # val reconstruction loss + recon image logging run on the averaged
    # weights, and downstream finetunes can start from them. None disables.
    ema_decay: float | None = None
    # Sequential microbatches per optimizer update (exact for the MAE loss:
    # the static keep count makes every microbatch's masked-patch count equal).
    grad_accum_steps: int = 1
    # Per-layer grad/param norm logging every N steps (0 disables).
    watch_interval: int = 30

    max_epochs: int = -1
    log_interval: int = 50
    num_devices: int = -1
    overfit_batches: int = 0
    # Upload the (unlabeled) corpus to HBM once; per step the host sends only
    # index/offset vectors (see s2tpu/data/device_corpus.py). Decisive on
    # slow host->device links: the MAE host pipeline measured ~60 img/s
    # through this environment's relay vs ~970 img/s device rate.
    device_corpus: bool = False
    # Shard the HBM corpus over the 'data' mesh axis (N/D segments per chip;
    # per-host blocks under multi-host). Mirrors segmentation's
    # device_corpus_sharded.
    device_corpus_sharded: bool = False
    # Fuse N consecutive train steps into one XLA program (lax.scan over the
    # donated state) in device-corpus mode: the host dispatches once per N
    # optimizer steps. Identical math to N single steps.
    steps_per_dispatch: int = 1

    use_wandb_logger: bool = True
    project_name: str = "prithvi-mae-finetune"
    wandb_entity: str | None = None
    run_name: str | None = None
    tags: list[str] = field(default_factory=list)
    log_img_in_train: bool = False

    seed: int = 42

    lr_scheduler_type: MAELRSchedulerType | None = None
    step_lr_sched_step_size: int | None = None
    step_lr_sched_gamma: float | None = None
    cosine_warm_restarts_T_0: int | None = None
    cosine_warm_restarts_eta_min: float | None = None

    ckpt_every_n_epochs: int = 1
    ckpt_keep: int = 1


@dataclass
class MAEConfig:
    model: MAEModelConfig
    datamodule: MAEDatamoduleConfig
    train: MAETrainConfig


def base_config(aoi: str = "at") -> MAEConfig:
    return MAEConfig(
        model=MAEModelConfig(num_frames=1),
        datamodule=MAEDatamoduleConfig(dataset_cfg=MAEDatasetConfig(aoi=aoi)),
        train=MAETrainConfig(),
    )


def _effective_bs(config: MAEConfig) -> int:
    # Global samples per optimizer step — see the module docstring for why
    # there is no device-count multiplication (batch_size is already global).
    return config.datamodule.batch_size


def pretrain(config: MAEConfig) -> MAEConfig:
    config.train.from_scratch = True
    config.datamodule.batch_size = 64
    config.train.lr = 1.5e-4 * _effective_bs(config) / 256  # MAE pretrain base-lr rule
    return config


def finetune(config: MAEConfig) -> MAEConfig:
    config.train.from_scratch = False
    config.datamodule.batch_size = 64
    config.train.lr = 5e-4 * _effective_bs(config) / 256  # MAE finetune base-lr rule
    return config


def debug(config: MAEConfig) -> MAEConfig:
    config.train.num_devices = 1
    config.datamodule.batch_size = 1
    config.train.log_img_in_train = True
    config.train.tags.append("debug")
    return config


def overfit(config: MAEConfig) -> MAEConfig:
    config.train.overfit_batches = 1
    config.datamodule.augment = False
    config.train.log_img_in_train = True
    config.train.tags.append("overfit")
    return config


def config_from_dict(d: dict) -> MAEConfig:
    """Rebuild an MAEConfig from a checkpoint's embedded config.json
    (inverse of dataclasses.asdict; serving CLIs restore the exact training
    configuration the same way cli/infer.py does for segmentation)."""
    ds = MAEDatasetConfig(**d["datamodule"]["dataset_cfg"])
    dm_kwargs = {k: v for k, v in d["datamodule"].items() if k != "dataset_cfg"}
    dm_kwargs["data_split"] = tuple(dm_kwargs["data_split"])
    train_kwargs = dict(d["train"])
    train_kwargs["betas"] = tuple(train_kwargs["betas"])
    return MAEConfig(
        model=MAEModelConfig(**d["model"]),
        datamodule=MAEDatamoduleConfig(dataset_cfg=ds, **dm_kwargs),
        train=MAETrainConfig(**train_kwargs),
    )

"""Prithvi MAE pretrain/finetune CLI.

Surface parity with reference train_mae_prithvi.py:253-299:

    python -m s2tpu.cli.train_mae <aoi> [--type pretrain|finetune|debug|overfit]
        [--from-scratch] [--bs N] [--epochs N] [--num-devices N] ...
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import pprint

from s2tpu.configs import mae as mae_cfg
from s2tpu.configs.data_config import AOIs
from s2tpu.configs.paths import CKPT_DIR, LOG_DIR
from s2tpu.utils import get_logger, get_unique_run_name

logger = get_logger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("aoi", choices=list(AOIs))
    p.add_argument(
        "--type", default="finetune", choices=["pretrain", "finetune", "debug", "overfit"]
    )
    p.add_argument("--from-scratch", action="store_true", help="random init (no Prithvi_100M.pt)")
    p.add_argument("--bs", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--log-interval", type=int, default=None)
    p.add_argument("--num-frames", type=int, default=None)
    p.add_argument("--crop", type=int, default=None, help="training crop size (/16; default 224)")
    p.add_argument(
        "--bands", default=None,
        help="spectral band set ('default', 'all12', or a comma list); non-6-band "
        "sets pretrain from scratch with dataset normalization statistics",
    )
    p.add_argument("--mask-ratio", type=float, default=None)
    p.add_argument("--name", default=None)
    p.add_argument("--wandb", action="store_true", help="DISABLE wandb logging")
    p.add_argument("--tags", nargs="+", default=[])
    p.add_argument("--num-devices", type=int, default=-1)
    p.add_argument("--compute-dtype", default=None, choices=["bfloat16", "float32"])
    p.add_argument(
        "--ema-decay", type=float, default=None,
        help="parameter EMA in the optimizer state; val loss + recon images "
        "use the averaged weights (typical 0.99-0.9999)",
    )
    p.add_argument("--data-dir", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--grad-accum", type=int, default=None, help="microbatches per optimizer update")
    p.add_argument(
        "--remat", action="store_true",
        help="rematerialize block activations in the backward pass (HBM for FLOPs)",
    )
    p.add_argument(
        "--pp", type=int, default=None, metavar="STAGES",
        help="pipeline-parallel encoder stages over the mesh's 'model' axis "
        "(GPipe microbatch schedule; --num-devices must be divisible by it)",
    )
    p.add_argument(
        "--pp-microbatches", type=int, default=None,
        help="microbatches per pipeline schedule (default 2)",
    )
    p.add_argument(
        "--device-corpus", action="store_true",
        help="upload the unlabeled corpus to HBM once; crop on device",
    )
    p.add_argument(
        "--device-corpus-sharded", action="store_true",
        help="shard the HBM corpus over the 'data' mesh (N/D segments per chip)",
    )
    p.add_argument(
        "--steps-per-dispatch", type=int, default=None,
        help="fuse N train steps into one XLA program (device-corpus mode; "
        "the host dispatches once per N optimizer steps)",
    )
    p.add_argument(
        "--resume-from", default=None,
        help="checkpoint dir of a previous run — restores latest state and continues",
    )
    p.add_argument(
        "--auto-resume", action="store_true",
        help="resume from this run's own checkpoint dir when it holds state "
        "(incl. a mid-epoch preemption save) — lets spot-instance restart "
        "loops rerun the SAME command line; requires a stable --name",
    )
    return p


def config_from_args(args: argparse.Namespace) -> mae_cfg.MAEConfig:
    config = mae_cfg.base_config(aoi=args.aoi)
    config.train.num_devices = args.num_devices
    preset = {
        "pretrain": mae_cfg.pretrain,
        "finetune": mae_cfg.finetune,
        "debug": mae_cfg.debug,
        "overfit": mae_cfg.overfit,
    }[args.type]
    config = preset(config)
    t, dmc = config.train, config.datamodule
    dmc.dataset_cfg.data_dir = args.data_dir or dmc.dataset_cfg.data_dir
    if args.bands:
        from s2tpu.configs.data_config import parse_bands

        dmc.dataset_cfg.bands = parse_bands(args.bands)
    dmc.batch_size = args.bs or dmc.batch_size
    if args.crop:
        assert args.crop % 16 == 0, f"--crop must be a multiple of the ViT patch size 16, got {args.crop}"
        dmc.random_crop_size = args.crop
    t.from_scratch = args.from_scratch or t.from_scratch
    t.lr = args.lr or t.lr
    t.max_epochs = args.epochs or t.max_epochs
    t.log_interval = args.log_interval or t.log_interval
    t.compute_dtype = args.compute_dtype or t.compute_dtype
    t.ema_decay = args.ema_decay if args.ema_decay is not None else t.ema_decay
    t.use_wandb_logger = False if args.wandb else t.use_wandb_logger
    t.tags.extend(args.tags)
    t.seed = args.seed if args.seed is not None else t.seed
    t.grad_accum_steps = args.grad_accum or t.grad_accum_steps
    t.remat = args.remat or t.remat
    t.device_corpus = args.device_corpus or args.device_corpus_sharded or t.device_corpus
    t.device_corpus_sharded = args.device_corpus_sharded or t.device_corpus_sharded
    t.steps_per_dispatch = (
        args.steps_per_dispatch if args.steps_per_dispatch is not None else t.steps_per_dispatch
    )
    if args.num_frames:
        config.model.num_frames = args.num_frames
        dmc.dataset_cfg.n_time_frames = args.num_frames
    if args.mask_ratio is not None:
        config.model.mask_ratio = args.mask_ratio
    if args.pp:
        config.model.pipeline_stages = args.pp
    if args.pp_microbatches:
        config.model.pipeline_microbatches = args.pp_microbatches
    # --auto-resume needs a run name (→ checkpoint dir) that is STABLE across
    # invocations of the same command line; otherwise append a unique id.
    t.run_name = (
        f"{args.name or 'run'}_{t.project_name}"
        if args.auto_resume
        else get_unique_run_name(name=args.name, postfix=t.project_name)
    )
    t.wandb_entity = os.getenv("WANDB_ENTITY")
    return config


def main(argv: list[str] | None = None) -> None:
    from s2tpu.checkpoint.orbax_io import CheckpointManager
    from s2tpu.configs.segmentation import DatamoduleConfig, DatasetConfig
    from s2tpu.data.dataset import TiffSource
    from s2tpu.data.pipeline import Datamodule
    from s2tpu.train.logging_utils import RunLogger
    from s2tpu.train.mae_trainer import MAETrainer

    args = build_parser().parse_args(argv)
    config = config_from_args(args)
    logger.info(f"MAE config ({args.type}):\n{pprint.pformat(dataclasses.asdict(config))}")

    # MAE corpus: sentinel rasters only, no labels needed.
    source = TiffSource(
        config.datamodule.dataset_cfg.aoi,
        "osm-multiclass",
        data_dir=config.datamodule.dataset_cfg.data_dir,
        require_labels=False,
    )
    dm = Datamodule(
        DatamoduleConfig(
            dataset_cfg=DatasetConfig(
                aoi=config.datamodule.dataset_cfg.aoi,
                label_map="osm-multiclass",
                data_dir=config.datamodule.dataset_cfg.data_dir,
                bands=list(config.datamodule.dataset_cfg.bands),
            ),
            batch_size=config.datamodule.batch_size,
            data_split=config.datamodule.data_split,
            val_batch_size_multiplier=config.datamodule.val_batch_size_multiplier,
            augment=config.datamodule.augment,
            random_crop_size=config.datamodule.random_crop_size,
            prefetch=config.datamodule.prefetch,
            shuffle_seed=config.datamodule.shuffle_seed,
        ),
        source=source,
    )
    run_logger = RunLogger(
        run_name=config.train.run_name,
        log_dir=LOG_DIR / "runs",
        project=config.train.project_name,
        entity=config.train.wandb_entity,
        tags=config.train.tags,
        config=dataclasses.asdict(config),
        use_wandb=config.train.use_wandb_logger,
    )
    ckpt_dir = (
        args.resume_from
        if args.resume_from
        else CKPT_DIR / config.train.project_name / config.train.run_name
    )
    ckpt = CheckpointManager(
        ckpt_dir, keep=config.train.ckpt_keep, config_dict=dataclasses.asdict(config)
    )
    trainer = MAETrainer(config, dm, run_logger=run_logger, checkpoint_manager=ckpt)
    start_epoch = (
        trainer.resume_from_checkpoint() if (args.resume_from or args.auto_resume) else 0
    )
    epochs = config.train.max_epochs if config.train.max_epochs > 0 else 10**6
    try:
        trainer.fit(epochs=epochs, start_epoch=start_epoch)
    finally:
        run_logger.finish()


if __name__ == "__main__":
    main()

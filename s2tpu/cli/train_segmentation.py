"""Segmentation training CLI.

Public surface parity with reference train_segmentation.py:292-345 (same
positionals/flags, with the argparse positional+required defect fixed) plus
TPU-native extras: --num-devices (data-parallel mesh size), --fsdp, --remat,
--compute-dtype, --crop.

    python -m s2tpu.cli.train_segmentation <aoi> <labels> <model> [flags]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import pprint

import numpy as np

from s2tpu.configs import segmentation as cfg_lib
from s2tpu.configs.data_config import AOIs, LABEL_MAPS
from s2tpu.configs.paths import CKPT_DIR, LOG_DIR
from s2tpu.utils import get_logger, get_unique_run_name

logger = get_logger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("aoi", choices=list(AOIs))
    p.add_argument("labels", choices=list(LABEL_MAPS))
    p.add_argument("model", choices=[m.value for m in cfg_lib.ModelName])
    p.add_argument("--type", default="train", choices=["train", "debug", "overfit", "tune"])
    p.add_argument("--loss-type", default=None, choices=[t.value for t in cfg_lib.LossType])
    p.add_argument("--lr-scheduler", default=None, choices=[t.value for t in cfg_lib.LRSchedulerType])
    p.add_argument("--bs", type=int, default=None, help="global batch size")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument(
        "--scale-lr-ref-bs", type=int, default=None, metavar="N",
        help="linear LR scaling: treat --lr as the base LR at N effective "
        "samples/step and scale to batch_size*num_devices (the MAE rule "
        "lr*eff_bs/256, configs/mae.py, ported to segmentation)",
    )
    p.add_argument("--epochs", type=int, default=None, help="number of epochs")
    p.add_argument("--log-interval", type=int, default=None)
    p.add_argument(
        "--watch-interval", type=int, default=None,
        help="grad/param-norm logging every N steps (0 disables; default 30)",
    )
    p.add_argument(
        "--bn-recal", type=int, default=None,
        help="pool exact BN statistics over N train batches before each val "
        "pass (short runs: the 0.99 BN EMA needs hundreds of steps to converge)",
    )
    p.add_argument("--recompute-mean-std", action="store_true")
    p.add_argument("--focal-loss-gamma", type=float, default=None)
    p.add_argument("--weighted-loss", action="store_true")
    p.add_argument("--weighted-sampling", action="store_true")
    p.add_argument("--cosine-lr-sched-first-cycle-steps", type=int, default=None)
    p.add_argument("--cosine-lr-sched-cycle-mult", type=float, default=None)
    p.add_argument("--cosine-lr-sched-max-lr", type=float, default=None)
    p.add_argument("--cosine-lr-sched-min-lr", type=float, default=None)
    p.add_argument("--cosine-lr-sched-warmup-steps", type=int, default=None)
    p.add_argument("--cosine-lr-sched-gamma", type=float, default=None)
    p.add_argument("--name", default=None, help="run-name prefix")
    p.add_argument("--wandb", action="store_true", help="DISABLE wandb logging")
    p.add_argument("--tags", nargs="+", default=[])
    # TPU-native knobs
    p.add_argument("--num-devices", type=int, default=-1, help="-1 = all visible devices")
    p.add_argument("--fsdp", action="store_true", help="shard params over the 'model' mesh axis")
    p.add_argument("--remat", action="store_true", help="rematerialize the forward pass")
    p.add_argument(
        "--device-corpus", action="store_true",
        help="upload the packed corpus to HBM once; crop/augment on device",
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
    p.add_argument("--compute-dtype", default=None, choices=["bfloat16", "float32"])
    p.add_argument(
        "--param-dtype", default=None, choices=["bfloat16", "float32"],
        help="parameter storage dtype (bfloat16 keeps an f32 master in the optimizer)",
    )
    p.add_argument(
        "--ema-decay", type=float, default=None,
        help="maintain a parameter EMA in the optimizer state and run "
        "validation/serving on the averaged weights (typical 0.99-0.9999)",
    )
    p.add_argument(
        "--source", default="auto", choices=["auto", "tiff", "packed", "records"],
        help="input backend: auto picks a packed corpus when one exists",
    )
    p.add_argument(
        "--bands", default=None,
        help="spectral band set: a named set ('default' = 6 Prithvi-HLS "
        "bands, 'all12' = every L2A band) or a comma list ('B02,B03,B04'); "
        "drives the model's in_channels (BASELINE config #3)",
    )
    p.add_argument("--crop", type=int, default=None, help="training crop size (default 224)")
    p.add_argument(
        "--time-frames", type=int, default=None,
        help="frames per sample (quarterly composites: 4); fc-prithvi folds "
        "time via tubelets, the UNet needs --stack-time",
    )
    p.add_argument(
        "--stack-time", action="store_true",
        help="fold the T axis into channels for single-frame models "
        "(BASELINE config #3: B5 on quarterly composites, in_channels = T*bands)",
    )
    p.add_argument("--data-dir", default=None, help="override DATA_DIR root")
    p.add_argument("--seed", type=int, default=None)
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
    p.add_argument(
        "--backbone-ckpt", default=None,
        help="fc-prithvi: init the backbone from an s2tpu MAE pretraining checkpoint dir",
    )
    p.add_argument(
        "--unfreeze-backbone", action="store_true",
        help="fc-prithvi: train the ViT encoder too (default: frozen, "
        "reference segmentation.py:171 frozen_backbone preset)",
    )
    p.add_argument(
        "--unfreeze-at-epoch", type=int, default=None,
        help="fc-prithvi two-phase finetune (BASELINE config #4): frozen "
        "backbone until this epoch, then unfreeze (fresh optimizer moments; "
        "params/BN/step carry over). Resume-safe.",
    )
    p.add_argument(
        "--unfreeze-lr-scale", type=float, default=None,
        help="LR multiplier applied at the unfreeze transition (full-network "
        "training usually wants ~0.1x the head-only LR)",
    )
    # --type tune knobs (random search; reference stubs train_segmentation.py:284-289)
    p.add_argument("--n-trials", type=int, default=10, help="tune: number of random-search trials")
    p.add_argument("--epochs-per-trial", type=int, default=3, help="tune: short-fit budget per trial")
    p.add_argument(
        "--tune-crops", default=None,
        help="tune: comma list of crop sizes to search (e.g. '128,224'); "
        "default keeps the configured crop fixed",
    )
    p.add_argument(
        "--tune-batch-sizes", default=None,
        help="tune: comma list of batch sizes to search; default keeps the "
        "configured batch size fixed",
    )
    p.add_argument(
        "--tune-eta", type=int, default=2,
        help="tune: ASHA successive-halving factor (1 disables pruning)",
    )
    return p


def config_from_args(args: argparse.Namespace) -> cfg_lib.Config:
    config = cfg_lib.base_config(args.model, aoi=args.aoi, label_map=args.labels)
    config = cfg_lib.set_run_type(config, args.type)
    t, dmc = config.train, config.datamodule
    dmc.dataset_cfg.data_dir = args.data_dir or dmc.dataset_cfg.data_dir
    if args.bands:
        from s2tpu.configs.data_config import parse_bands

        dmc.dataset_cfg.bands = parse_bands(args.bands)
    if args.time_frames:
        dmc.dataset_cfg.n_time_frames = args.time_frames
    if args.stack_time:
        dmc.dataset_cfg.stack_time_into_channels = True
    dmc.batch_size = args.bs or dmc.batch_size
    dmc.random_crop_size = args.crop or dmc.random_crop_size
    t.lr = args.lr or t.lr
    t.loss_type = cfg_lib.LossType(args.loss_type) if args.loss_type else t.loss_type
    t.max_epochs = args.epochs or t.max_epochs
    t.log_interval = args.log_interval or t.log_interval
    t.watch_interval = args.watch_interval if args.watch_interval is not None else t.watch_interval
    t.bn_recalibration_batches = (
        args.bn_recal if args.bn_recal is not None else t.bn_recalibration_batches
    )
    t.use_wandb_logger = False if args.wandb else t.use_wandb_logger
    t.tags.extend(args.tags)
    t.num_devices = args.num_devices
    t.remat = args.remat or t.remat
    t.device_corpus = args.device_corpus or args.device_corpus_sharded or t.device_corpus
    t.device_corpus_sharded = args.device_corpus_sharded or t.device_corpus_sharded
    t.steps_per_dispatch = (
        args.steps_per_dispatch if args.steps_per_dispatch is not None else t.steps_per_dispatch
    )
    t.compute_dtype = args.compute_dtype or t.compute_dtype
    t.param_dtype = args.param_dtype or t.param_dtype
    t.ema_decay = args.ema_decay if args.ema_decay is not None else t.ema_decay
    t.seed = args.seed if args.seed is not None else t.seed
    t.backbone_ckpt = args.backbone_ckpt or t.backbone_ckpt
    t.frozen_backbone = False if args.unfreeze_backbone else t.frozen_backbone
    t.unfreeze_backbone_at_epoch = (
        args.unfreeze_at_epoch if args.unfreeze_at_epoch is not None
        else t.unfreeze_backbone_at_epoch
    )
    t.unfreeze_lr_scale = (
        args.unfreeze_lr_scale if args.unfreeze_lr_scale is not None else t.unfreeze_lr_scale
    )
    t.weighted_loss = args.weighted_loss or t.weighted_loss
    t.focal_loss_gamma = args.focal_loss_gamma or t.focal_loss_gamma
    t.lr_scheduler_type = (
        cfg_lib.LRSchedulerType(args.lr_scheduler) if args.lr_scheduler else t.lr_scheduler_type
    )
    t.cosine_lr_sched_first_cycle_steps = args.cosine_lr_sched_first_cycle_steps
    t.cosine_lr_sched_cycle_mult = args.cosine_lr_sched_cycle_mult
    t.cosine_lr_sched_max_lr = args.cosine_lr_sched_max_lr
    t.cosine_lr_sched_min_lr = args.cosine_lr_sched_min_lr
    t.cosine_lr_sched_warmup_steps = args.cosine_lr_sched_warmup_steps
    t.cosine_lr_sched_gamma = args.cosine_lr_sched_gamma
    # --auto-resume needs a run name (→ checkpoint dir) that is STABLE across
    # invocations of the same command line; otherwise append a unique id.
    t.run_name = (
        f"{args.name or 'run'}_{t.project_name}"
        if args.auto_resume
        else get_unique_run_name(name=args.name, postfix=t.project_name)
    )
    t.wandb_entity = os.getenv("WANDB_ENTITY")
    if args.scale_lr_ref_bs:
        # After batch_size/num_devices are final (the rule reads both).
        cfg_lib.apply_linear_lr_scaling(config, reference_bs=args.scale_lr_ref_bs)
    # Re-validate: flags above mutate fields (n_time_frames, stack_time,
    # bands) that Config.__post_init__ checked at construction time.
    config.__post_init__()
    return config


def main(argv: list[str] | None = None) -> None:
    from s2tpu.checkpoint.orbax_io import CheckpointManager
    from s2tpu.data import statistics
    from s2tpu.data.pipeline import Datamodule
    from s2tpu.train.logging_utils import RunLogger
    from s2tpu.train.trainer import SegmentationTrainer

    from s2tpu.data.dataset import open_source

    args = build_parser().parse_args(argv)
    config = config_from_args(args)
    logger.info(f"Config ({args.type}):\n{pprint.pformat(dataclasses.asdict(config))}")

    ds_cfg = config.datamodule.dataset_cfg
    source = open_source(
        ds_cfg.aoi, ds_cfg.label_map, ds_cfg.data_dir,
        n_time_frames=ds_cfg.n_time_frames, kind=args.source,
    )
    logger.info(f"Input source: {type(source).__name__}")
    dm = Datamodule(config.datamodule, source=source)
    logger.info("Computing class distribution...")
    class_distribution = statistics.get_class_probabilities(
        dm.source, num_classes=config.num_classes, ignore_zero_label=config.train.masked_loss
    )
    config.train.class_distribution = class_distribution.tolist()
    if args.weighted_sampling:
        config.datamodule.class_distribution = class_distribution.tolist()
        dm = Datamodule(config.datamodule, source=source)  # rebuild with sampling weights

    from s2tpu.configs.data_config import DataDirs

    stats_path = DataDirs(ds_cfg.aoi, ds_cfg.label_map, data_dir=ds_cfg.data_dir).base_path / "mean_std.json"
    if stats_path is not None and stats_path.exists() and not args.recompute_mean_std:
        dm.set_mean_std(*statistics.load_mean_std(stats_path))
    else:
        logger.info("Computing per-band mean/std (Welford pass)...")
        stats = statistics.calculate_mean_std(dm.source, save_path=stats_path)
        dm.set_mean_std(np.asarray(stats["mean"]), np.asarray(stats["std"]))

    run_logger = RunLogger(
        run_name=config.train.run_name,
        log_dir=LOG_DIR / "runs",
        project=config.train.project_name,
        entity=config.train.wandb_entity,
        tags=config.train.tags,
        config=dataclasses.asdict(config),
        use_wandb=config.train.use_wandb_logger,
    )
    if args.type == "tune":
        from s2tpu.train.tune import SearchSpace, tune

        if args.n_trials < 1:
            run_logger.finish()
            raise SystemExit("--n-trials must be >= 1 for --type tune")
        space = SearchSpace(
            crop_sizes=tuple(int(c) for c in args.tune_crops.split(",")) if args.tune_crops else (),
            batch_sizes=tuple(int(b) for b in args.tune_batch_sizes.split(",")) if args.tune_batch_sizes else (),
        )
        saved_mean_std = dm.mean_std()

        def rebuild_dm(cfg):
            # Crop/batch-size trial dims live on the datamodule — rebuild it
            # per trial; normalization statistics are dataset properties and
            # carry over unchanged.
            trial_dm = Datamodule(cfg.datamodule, source=source)
            trial_dm.set_mean_std(*saved_mean_std)
            return trial_dm

        try:
            results = tune(
                config,
                datamodule_factory=rebuild_dm,
                n_trials=args.n_trials,
                epochs_per_trial=args.epochs_per_trial,
                seed=config.train.seed,
                space=space,
                eta=args.tune_eta,
            )
            for rank, r in enumerate(results):
                run_logger.log_scalars(
                    {"tune/val_loss": r.val_loss, "tune/val_iou": r.val_iou, **{
                        f"tune/param_{k}": float(v)
                        for k, v in r.params.items()
                        if isinstance(v, (int, float))
                    }},
                    step=rank,
                )
            best = results[0]
            logger.info(f"Best trial: {best.params} (val_loss {best.val_loss:.4f}, iou {best.val_iou:.4f})")
            print(f"best_params={best.params}")
        finally:
            run_logger.finish()
        return
    ckpt_dir = (
        args.resume_from
        if args.resume_from
        else CKPT_DIR / config.train.project_name / config.train.run_name
    )
    ckpt = CheckpointManager(
        ckpt_dir, keep=config.train.ckpt_keep, config_dict=dataclasses.asdict(config)
    )
    trainer = SegmentationTrainer(
        config,
        dm,
        run_logger=run_logger,
        checkpoint_manager=ckpt,
        param_sharding="fsdp" if args.fsdp else "replicated",
    )
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

"""Batch inference CLI: checkpoint -> per-segment class-map GeoTIFFs + logits.

Parity: reference experiments/inference_demo.py (Trainer.predict +
CustomWriter), upgraded with tiled sliding-window prediction over the full
512x512 segments and georeferenced raster output.

    python -m s2tpu.cli.infer <ckpt_dir> [--split val] [--tiled] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np

from s2tpu.configs.paths import OUT_DIR
from s2tpu.utils import get_logger

logger = get_logger(__name__)


def main(argv: list[str] | None = None) -> None:
    from s2tpu.checkpoint.orbax_io import CheckpointManager
    from s2tpu.configs import segmentation as cfg_lib
    from s2tpu.data.pipeline import Datamodule
    from s2tpu.data import statistics
    from s2tpu.geo.tiff import read_geotiff
    from s2tpu.infer.tiled import tiled_predict
    from s2tpu.infer.writer import PredictionWriter
    from s2tpu.train.trainer import SegmentationTrainer

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt_dir", help="checkpoint directory written by the training CLI")
    p.add_argument("--split", default="val", choices=["train", "val", "test"])
    p.add_argument("--tiled", action="store_true", help="full-segment tiled prediction")
    p.add_argument("--out", default=None)
    p.add_argument("--epoch", type=int, default=None, help="checkpoint epoch (default: best/latest)")
    p.add_argument("--data-dir", default=None)
    p.add_argument(
        "--no-ema", action="store_true",
        help="serve the raw (non-averaged) weights even when the checkpoint "
        "was trained with train.ema_decay (default: serve the EMA weights, "
        "matching the val metric the best-epoch selection used)",
    )
    p.add_argument(
        "--aot-cache", default=None, metavar="PATH",
        help="serialized-executable artifact for the tiled program: first run "
        "compiles and writes it, later processes deserialize instead of "
        "compiling (serving cold-start; see s2tpu/infer/aot.py)",
    )
    p.add_argument(
        "--int8", action="store_true",
        help="post-training int8 quantized serving: calibrates activation "
        "ranges on a few training batches, then runs every Dense/Conv as "
        "int8 x int8 -> int32 on the MXU (s2tpu/infer/quantize.py)",
    )
    p.add_argument(
        "--calib-batches", type=int, default=2,
        help="calibration batches for --int8 activation ranges",
    )
    args = p.parse_args(argv)
    # --int8 composes with --aot-cache: the quantized weights + activation
    # scales ride in the serving bundle as RUNTIME arguments of the program
    # (quantize_segmentation_trainer), so one serialized artifact serves any
    # checkpoint/calibration of the same model shape.

    ckpt = CheckpointManager(args.ckpt_dir)
    cfg_dict = ckpt.load_config()
    assert cfg_dict is not None, f"no config.json in {args.ckpt_dir}"
    config = _config_from_dict(cfg_dict)
    if args.data_dir:
        config.datamodule.dataset_cfg.data_dir = args.data_dir

    from s2tpu.parallel import mesh as mesh_lib

    dm = Datamodule(config.datamodule)
    stats_path = dm.source.data_dirs.base_path / "mean_std.json"
    if stats_path.exists():
        dm.set_mean_std(*statistics.load_mean_std(stats_path))
    # Inference runs single-device unless the batch is shardable over more.
    # Multi-host serving uses the LOCAL devices only: each process serves its
    # own segment slice independently (no cross-host program — serving needs
    # no collectives; see s2tpu/infer/tiled.py::multihost_segment_slice).
    n_proc, pid = jax.process_count(), jax.process_index()
    local_devices = jax.local_devices()
    n_dev = 1
    for n in range(len(local_devices), 0, -1):
        if config.datamodule.batch_size % n == 0:
            n_dev = n
            break
    trainer = SegmentationTrainer(
        config, dm, mesh=mesh_lib.make_mesh(n_dev, devices=local_devices)
    )
    epoch = args.epoch if args.epoch is not None else (ckpt.best_epoch() or ckpt.latest_epoch())
    trainer.state = ckpt.restore(trainer.state, epoch=epoch)
    logger.info(f"Restored checkpoint epoch {epoch}")
    if config.train.ema_decay and not args.no_ema:  # truthiness matches the trainers' gate
        # Serve the averaged weights: validation (and therefore best-epoch
        # selection) ran on them during training (trainer.eval_state).
        trainer.state = trainer.eval_state()
        logger.info(f"Serving EMA weights (decay {config.train.ema_decay})")

    out_dir = Path(args.out) if args.out else OUT_DIR / Path(args.ckpt_dir).name
    writer = PredictionWriter(out_dir, prefix=f"p{pid}_" if n_proc > 1 else "")

    predict_fn, predict_state = trainer.predict_step, trainer.state
    if args.int8:
        from s2tpu.infer.quantize import quantize_segmentation_trainer

        predict_fn, predict_state = quantize_segmentation_trainer(
            trainer, n_batches=args.calib_batches
        )
        logger.info(f"int8 serving: calibrated on {args.calib_batches} batches")

    if args.tiled:
        from s2tpu.infer.tiled import tiled_predict_many

        indices = {"train": dm.train_idx, "val": dm.val_idx, "test": dm.test_idx}[args.split]
        if n_proc > 1:
            from s2tpu.infer.tiled import multihost_segment_slice

            indices = multihost_segment_slice(indices, n_proc, pid)
            logger.info(f"multi-host serving: process {pid} takes {len(indices)} segments")
        group = 4  # segments per device call: tiles share one prediction queue
        for g in range(0, len(indices), group):
            chunk = indices[g : g + group]
            imgs, geos, seg_ids = [], [], []
            for i in chunk:
                seg_id = (
                    dm.source.label_index_for(int(i))
                    if hasattr(dm.source, "label_index_for")
                    else int(i)
                )
                if hasattr(dm.source, "read_with_geo"):
                    # (H, W, C) single-frame or (T, H, W, C) multi-temporal —
                    # the tiled program crops every frame at the same (y, x)
                    # and predict_step collapses T (tubelets / stack-time).
                    img, geo = dm.source.read_with_geo(int(i))
                else:
                    raw, geo = read_geotiff(dm.source.sentinel_files[int(i)])
                    img = np.ascontiguousarray(raw.transpose(1, 2, 0))
                imgs.append(img)
                geos.append(geo)
                seg_ids.append(seg_id)
            # pad the group to a fixed size so one program shape serves all calls
            real = len(imgs)
            while len(imgs) < group:
                imgs.append(np.zeros_like(imgs[0]))
            class_maps, _ = tiled_predict_many(
                predict_fn, predict_state, np.stack(imgs),
                num_classes=config.num_classes, tile=config.datamodule.random_crop_size,
                aot_cache=args.aot_cache,
                # multi-chip serving: segments sharded over the data axis
                mesh=trainer.mesh if n_dev > 1 and not args.aot_cache else None,
            )
            for seg_id, cm, geo in zip(seg_ids, class_maps[:real], geos):
                writer.write_class_map(seg_id, cm, geo=geo)
        logger.info(f"Wrote {len(indices)} tiled class maps to {out_dir}")
    else:
        for batch in dm.eval_batches(args.split):
            logits = predict_fn(predict_state, jax.numpy.asarray(batch.images))
            writer.write_batch(np.asarray(logits)[batch.mask])
        logger.info(f"Wrote batch logits to {out_dir}")


def _config_from_dict(d: dict):
    from s2tpu.configs.segmentation import Config, DatamoduleConfig, DatasetConfig, TrainConfig

    ds = DatasetConfig(**d["datamodule"]["dataset_cfg"])
    dm_kwargs = {k: v for k, v in d["datamodule"].items() if k != "dataset_cfg"}
    dm_kwargs["data_split"] = tuple(dm_kwargs["data_split"])
    train_kwargs = dict(d["train"])
    train_kwargs["betas"] = tuple(train_kwargs["betas"])
    return Config(
        model_name=d["model_name"],
        datamodule=DatamoduleConfig(dataset_cfg=ds, **dm_kwargs),
        train=TrainConfig(**train_kwargs),
        num_classes=d.get("num_classes"),
    )


if __name__ == "__main__":
    main()

"""Export MAE encoder embeddings: checkpoint -> per-segment feature vectors.

The downstream serving product of a self-supervised pretrain (the reference
consumes pretrained encoders only through PrithviSegmentationNet's
``forward_encoder(x, mask_ratio=0.0)``, prithvi_segmentation.py:156-162 —
this CLI exports those features standalone for linear probes / clustering /
retrieval):

    python -m s2tpu.cli.export_embeddings <ckpt_dir> [--split all] \
        [--pool mean|cls|tokens] [--crop N] [--bs N] [--int8] [--out F.npz]

Writes an .npz with ``embeddings`` (N, D) (or (N, 1+L, D) for --pool tokens),
``segment_ids`` (the on-disk segment stems), and the export settings.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from s2tpu.configs.paths import OUT_DIR
from s2tpu.utils import get_logger

logger = get_logger(__name__)


def main(argv: list[str] | None = None) -> None:
    import dataclasses

    import jax.numpy as jnp

    from s2tpu.checkpoint.orbax_io import CheckpointManager
    from s2tpu.configs import mae as mae_cfg
    from s2tpu.data.dataset import TiffSource
    from s2tpu.infer.embed import POOLS, calibrate_encoder_int8, center_crop, make_embed_fn
    from s2tpu.data.dataset import train_val_test_split
    from s2tpu.models.prithvi_mae import PrithviConfig, PrithviMAE
    from s2tpu.utils import load_prithvi_mean_std, load_prithvi_model_args

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt_dir", help="MAE checkpoint directory written by cli/train_mae")
    p.add_argument("--split", default="all", choices=["all", "train", "val", "test"])
    p.add_argument("--pool", default="mean", choices=list(POOLS))
    p.add_argument("--bs", type=int, default=32)
    p.add_argument(
        "--crop", type=int, default=None,
        help="center-crop size, multiple of the patch size (default: the "
        "training crop; 0 = the full segment — sincos pos-embeds are "
        "regenerated for any size, same as the reference's num_frames surgery)",
    )
    p.add_argument("--out", default=None, metavar="F.npz")
    p.add_argument("--epoch", type=int, default=None, help="checkpoint epoch (default: best/latest)")
    p.add_argument("--data-dir", default=None)
    p.add_argument(
        "--int8", action="store_true",
        help="int8 serving for the encoder forward (s2tpu/infer/quantize.py; "
        "measured +29%% on the matmul-dominated ViT, PERF_NOTES r3)",
    )
    p.add_argument("--calib-batches", type=int, default=2)
    args = p.parse_args(argv)

    ckpt = CheckpointManager(args.ckpt_dir)
    cfg_dict = ckpt.load_config()
    assert cfg_dict is not None, f"no config.json in {args.ckpt_dir}"
    config = mae_cfg.config_from_dict(cfg_dict)
    if args.data_dir:
        config.datamodule.dataset_cfg.data_dir = args.data_dir

    source = TiffSource(
        config.datamodule.dataset_cfg.aoi,
        "osm-multiclass",
        data_dir=config.datamodule.dataset_cfg.data_dir,
        require_labels=False,
        n_time_frames=config.model.num_frames,
    )
    if args.split == "all":
        indices = list(range(len(source)))
    else:
        tr, va, te = train_val_test_split(
            len(source), config.datamodule.data_split, seed=config.datamodule.shuffle_seed
        )
        indices = list({"train": tr, "val": va, "test": te}[args.split])
    assert indices, f"split '{args.split}' selects no segments"

    sample = source[indices[0]].x
    seg_hw = sample.shape[-3]
    crop = args.crop if args.crop is not None else config.datamodule.random_crop_size
    if crop == 0:
        crop = seg_hw
    crop = min(crop, seg_hw)

    model_config = PrithviConfig.from_model_args(
        load_prithvi_model_args(),
        num_frames=config.model.num_frames,
        img_size=crop,
    )
    model_config = dataclasses.replace(
        model_config, attention_impl=getattr(config.model, "attention_impl", "xla")
    )
    assert crop % model_config.patch_size == 0, (
        f"--crop {crop} must be a multiple of the patch size {model_config.patch_size}"
    )
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[config.train.compute_dtype]
    model = PrithviMAE(model_config, dtype=dtype)

    epoch = args.epoch if args.epoch is not None else (ckpt.best_epoch() or ckpt.latest_epoch())
    params = ckpt.restore_raw(epoch)["params"]
    logger.info(f"Restored MAE checkpoint epoch {epoch} from {args.ckpt_dir}")

    mean, std = (jnp.asarray(v) for v in load_prithvi_mean_std())

    def batches():
        for lo in range(0, len(indices), args.bs):
            chunk = indices[lo : lo + args.bs]
            imgs = np.stack([center_crop(np.asarray(source[i].x), crop) for i in chunk])
            yield chunk, imgs

    qstate = None
    if args.int8:
        import itertools

        calib = (imgs for _, imgs in itertools.islice(batches(), args.calib_batches))
        qstate = calibrate_encoder_int8(model, params, mean, std, calib)
        logger.info(f"int8 calibration done ({len(qstate)} encoder layers quantized)")

    embed = make_embed_fn(model, mean, std, pool=args.pool, qstate=qstate)
    chunks, ids = [], []
    for chunk, imgs in batches():
        chunks.append(np.asarray(embed(params, jnp.asarray(imgs)), np.float32))
        ids.extend(_segment_id(source, i) for i in chunk)
    embeddings = np.concatenate(chunks, axis=0)

    out = Path(args.out) if args.out else OUT_DIR / f"{Path(args.ckpt_dir).name}_embeddings.npz"
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        out,
        embeddings=embeddings,
        segment_ids=np.asarray(ids),
        meta=json.dumps(
            {
                "pool": args.pool,
                "crop": int(crop),
                "split": args.split,
                "int8": bool(args.int8),
                "epoch": int(epoch),
                "aoi": config.datamodule.dataset_cfg.aoi,
                "embed_dim": int(model_config.embed_dim),
            }
        ),
    )
    logger.info(f"Wrote {embeddings.shape} embeddings for {len(ids)} segments -> {out}")


def _segment_id(source, idx: int) -> str:
    if source.n_time_frames > 1:
        return str(source._groups[idx][0])
    return source.sentinel_files[idx].stem


if __name__ == "__main__":
    main()

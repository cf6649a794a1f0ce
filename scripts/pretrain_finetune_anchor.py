"""End-to-end MAE pretrain -> frozen-backbone finetune anchor on TPU.

The reference's headline Prithvi workload is: pretrain/continue the ViT-MAE
on unlabeled Sentinel-2, then finetune a segmentation head on the frozen
encoder (train_mae_prithvi.py + prithvi_segmentation.py). The published
Prithvi_100M.pt is absent from this image, so this script demonstrates the
full s2tpu pipeline self-contained: MAE-pretrain on the deterministic
synthetic AOI, checkpoint, then finetune `fc-prithvi-backbone` from that
checkpoint (train.backbone_ckpt flow) — and, for contrast, from a random
frozen encoder. Results append to MIOU.json.

Run: python scripts/pretrain_finetune_anchor.py [--mae-epochs 60 --seg-epochs 40]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/s2tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from s2tpu.checkpoint.orbax_io import CheckpointManager
from s2tpu.configs import mae as mae_cfg
from s2tpu.configs import segmentation as cfg_lib
from s2tpu.data import statistics
from s2tpu.data.dataset import TiffSource, make_synthetic_fixture
from s2tpu.data.pipeline import Datamodule
from s2tpu.parallel import mesh as mesh_lib
from s2tpu.train.mae_trainer import MAETrainer
from s2tpu.train.trainer import SegmentationTrainer


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mae-epochs", type=int, default=60)
    p.add_argument("--seg-epochs", type=int, default=40)
    # Head+neck-only training over a few hundred steps needs a real LR; the
    # reference's 1.5e-6 base is a full-finetune setting for long runs.
    p.add_argument("--seg-lr", type=float, default=1e-3)
    p.add_argument("--segments", type=int, default=128)
    p.add_argument("--with-random-baseline", action="store_true")
    p.add_argument(
        "--unfreeze-at", type=int, default=10,
        help="two-phase leg (BASELINE config #4): frozen backbone until this "
        "epoch, then full-network training (0 disables the leg)",
    )
    p.add_argument(
        "--unfreeze-lr-scale", type=float, default=0.1,
        help="phase-2 LR multiplier (1e-3 unfrozen measured 0.9146 vs 0.9574 "
        "frozen — full-network training needs a gentler LR)",
    )
    p.add_argument(
        "--mae-ckpt", default=None,
        help="skip pretraining and finetune from this existing MAE checkpoint dir",
    )
    p.add_argument(
        "--workdir", default=None,
        help="persist fixture+MAE checkpoint here (reruns pass --mae-ckpt <workdir>/mae_ckpt)",
    )
    p.add_argument("--out", default=str(Path(__file__).resolve().parents[1] / "MIOU.json"))
    p.add_argument(
        "--bands", default="default",
        help="band set for BOTH stages (BASELINE config #3: all12) — the MAE "
        "encoder pretrains at this width and the finetune ingests it via "
        "train.backbone_ckpt (the published 6-band Prithvi_100M.pt cannot "
        "initialize a 12-band backbone; this pipeline is the matched path)",
    )
    p.add_argument(
        "--time-frames", type=int, default=1,
        help="frames per sample for both stages (quarterly composites: 4; "
        "the ViT folds time via tubelet patch embedding)",
    )
    p.add_argument("--label-map", default="osm-multiclass")
    p.add_argument(
        "--difficulty", type=float, default=0.0,
        help="fixture hardness in [0,1] (see dataset.make_synthetic_fixture) "
        "— hard anchors land in the regression-sensitive 0.6-0.9 mIoU band",
    )
    p.add_argument("--crop", type=int, default=224, help="train crop (both stages)")
    p.add_argument("--seg-size", type=int, default=256, help="fixture segment size")
    p.add_argument("--mae-bs", type=int, default=None)
    p.add_argument("--seg-bs", type=int, default=None)
    args = p.parse_args()

    from s2tpu.configs.data_config import parse_bands

    bands = parse_bands(args.bands)
    label_map = args.label_map
    tmp = args.workdir or tempfile.mkdtemp(prefix="s2tpu_pf_")
    Path(tmp).mkdir(parents=True, exist_ok=True)
    make_synthetic_fixture(
        tmp, aoi="small", label_map=label_map, n_segments=args.segments,
        size=(args.seg_size, args.seg_size), seed=0, n_bands=len(bands),
        n_time=args.time_frames, difficulty=args.difficulty,
    )

    # ---- stage 1: MAE pretrain from scratch on the unlabeled corpus -------
    if args.mae_ckpt:
        ckpt_dir = Path(args.mae_ckpt)
        mae_hist, mae_s = [{"train/loss": float("nan")}], 0.0
    else:
        mcfg = mae_cfg.pretrain(mae_cfg.base_config(aoi="small"))
        mcfg.datamodule.dataset_cfg.data_dir = tmp
        mcfg.datamodule.dataset_cfg.bands = list(bands)
        mcfg.datamodule.dataset_cfg.n_time_frames = args.time_frames
        mcfg.model.num_frames = args.time_frames
        mcfg.datamodule.batch_size = args.mae_bs or (32 if args.time_frames == 1 else 16)
        mcfg.datamodule.random_crop_size = args.crop
        mcfg.datamodule.data_split = (0.9, 0.1, 0.0)
        mcfg.train.compute_dtype = "bfloat16"
        mcfg.train.from_scratch = True
        # index-only steps (relay is ~40 MB/s); T>1 corpora upload as
        # (N, T, H, W, C) and gather per-frame-aligned crops on device
        mcfg.train.device_corpus = True
        # Per-epoch async Orbax saves stall ~110 s each through the relay
        # (the next save waits on the previous); a quarter-cadence keeps
        # crash-resume without serializing the run on checkpoint IO.
        mcfg.train.ckpt_every_n_epochs = max(args.mae_epochs // 4, 1)
        mae_source = TiffSource(
            "small", label_map, data_dir=tmp, require_labels=False,
            n_time_frames=args.time_frames,
        )
        # The generic Datamodule consumes the segmentation DatamoduleConfig;
        # mirror the train_mae CLI's construction from the MAE config fields.
        mae_dm = Datamodule(
            cfg_lib.DatamoduleConfig(
                dataset_cfg=cfg_lib.DatasetConfig(
                    aoi="small", label_map=label_map, data_dir=tmp,
                    bands=list(bands), n_time_frames=args.time_frames,
                ),
                batch_size=mcfg.datamodule.batch_size,
                data_split=mcfg.datamodule.data_split,
                val_batch_size_multiplier=mcfg.datamodule.val_batch_size_multiplier,
                augment=mcfg.datamodule.augment,
                random_crop_size=mcfg.datamodule.random_crop_size,
                prefetch=mcfg.datamodule.prefetch,
                shuffle_seed=mcfg.datamodule.shuffle_seed,
            ),
            source=mae_source,
        )
        ckpt_dir = Path(tmp) / "mae_ckpt"
        mae_ckpt = CheckpointManager(ckpt_dir, keep=1)
        mae_tr = MAETrainer(mcfg, mae_dm, mesh=mesh_lib.make_mesh(1), checkpoint_manager=mae_ckpt)
        t0 = time.time()
        mae_hist = mae_tr.fit(epochs=args.mae_epochs)
        mae_ckpt.wait()
        mae_s = time.time() - t0

    # ---- stage 2: frozen-backbone finetune from the MAE checkpoint --------
    def finetune(backbone_ckpt: str | None, unfreeze_at: int | None = None) -> dict:
        c = cfg_lib.base_config("fc-prithvi-backbone", aoi="small", label_map=label_map)
        c.datamodule.dataset_cfg.data_dir = tmp
        c.datamodule.dataset_cfg.bands = list(bands)
        c.datamodule.dataset_cfg.n_time_frames = args.time_frames
        c.datamodule.batch_size = args.seg_bs or (16 if args.time_frames == 1 else 8)
        c.datamodule.random_crop_size = args.crop
        c.datamodule.data_split = (0.75, 0.25, 0.0)
        c.train.compute_dtype = "bfloat16"
        c.train.lr = args.seg_lr
        c.train.backbone_ckpt = backbone_ckpt
        c.train.unfreeze_backbone_at_epoch = unfreeze_at
        c.train.unfreeze_lr_scale = args.unfreeze_lr_scale
        # (no BN recalibration: the FCN head's decay-0.9 BNs converge in
        # ~25 steps; the ViT backbone is LayerNorm-only)
        src = TiffSource("small", label_map, data_dir=tmp, n_time_frames=args.time_frames)
        dm = Datamodule(c.datamodule, source=src)
        dist = statistics.get_class_probabilities(
            src, num_classes=c.num_classes, ignore_zero_label=True
        )
        c.train.class_distribution = dist.tolist()
        tr = SegmentationTrainer(c, dm, mesh=mesh_lib.make_mesh(1))
        hist = tr.fit(epochs=args.seg_epochs)
        best = max(hist, key=lambda h: h.get("val/iou", -1.0))
        return {
            "best_val_iou": round(best.get("val/iou", float("nan")), 4),
            "best_val_acc": round(best.get("val/accuracy", float("nan")), 4),
            "best_epoch": best["epoch"],
            "images_per_sec": round(hist[-1].get("train/images_per_sec", 0.0), 1),
        }

    # --mae-ckpt reruns the finetune legs only; carry the measured pretrain
    # stats forward from the existing record instead of overwriting with NaN.
    mae_stats = {}
    if args.mae_ckpt:
        out_prev = Path(args.out)
        if out_prev.exists():
            prev = json.loads(out_prev.read_text())
            for r in prev if isinstance(prev, list) else [prev]:
                # Same identity key as the dedup below: bands/time-frames
                # must match, or a rerun could inherit pretrain stats from
                # a different configuration's record.
                if (
                    r.get("model") == "fc-prithvi-backbone"
                    and r.get("pipeline", "").startswith("s2tpu MAE")
                    and r.get("bands", "default") == args.bands
                    and r.get("n_time_frames", 1) == args.time_frames
                    and r.get("difficulty", 0.0) == args.difficulty
                ):
                    mae_stats = {
                        k: r[k] for k in ("mae_final_train_loss", "mae_pretrain_s") if k in r
                    }

    pretrained = finetune(str(ckpt_dir))
    record = {
        "model": "fc-prithvi-backbone",
        "label_map": label_map,
        "dataset": (
            f"synthetic {label_map} seed0 n={args.segments} "
            f"{args.seg_size}^2 (deterministic"
            + (f", difficulty={args.difficulty}" if args.difficulty else "")
            + ")"
        ),
        "pipeline": "s2tpu MAE pretrain (from scratch) -> frozen-backbone finetune",
        **({"difficulty": args.difficulty} if args.difficulty else {}),
        **({"bands": args.bands} if args.bands != "default" else {}),
        **({"n_time_frames": args.time_frames} if args.time_frames != 1 else {}),
        "mae_epochs": args.mae_epochs,
        "mae_final_train_loss": round(mae_hist[-1].get("train/loss", float("nan")), 4),
        "mae_pretrain_s": round(mae_s, 1),
        **mae_stats,
        "seg_epochs": args.seg_epochs,
        "seg_lr": args.seg_lr,
        **{f"pretrained_{k}": v for k, v in pretrained.items()},
        "backend": jax.default_backend(),
    }
    if args.unfreeze_at:
        # BASELINE config #4: frozen->UNFROZEN two-phase finetune (same MAE
        # checkpoint, same epoch budget; the backbone trains from
        # --unfreeze-at on). Expected: >= the frozen leg's mIoU.
        record["unfreeze_at_epoch"] = args.unfreeze_at
        record["unfreeze_lr_scale"] = args.unfreeze_lr_scale
        record.update({
            f"two_phase_{k}": v
            for k, v in finetune(str(ckpt_dir), unfreeze_at=args.unfreeze_at).items()
        })
    if args.with_random_baseline:
        record.update({f"random_frozen_{k}": v for k, v in finetune(None).items()})

    out = Path(args.out)
    existing = json.loads(out.read_text()) if out.exists() else []
    existing = existing if isinstance(existing, list) else [existing]
    # Replace only the matching PIPELINE record (train_convergence.py writes
    # pipeline-less records for the same model/map — keep those).
    key = (record["model"], record["label_map"], args.bands, args.time_frames, args.difficulty)
    existing = [
        r
        for r in existing
        if not (
            r.get("pipeline", "").startswith("s2tpu MAE")
            and (
                r.get("model"), r.get("label_map", "osm-multiclass"),
                r.get("bands", "default"), r.get("n_time_frames", 1),
                r.get("difficulty", 0.0),
            ) == key
        )
    ]
    existing.append(record)
    out.write_text(json.dumps(existing, indent=2) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()

"""Hyperparameter-tune campaign on the hard synthetic fixture — VERDICT r4 #5/#6.

The tune machinery (s2tpu/train/tune.py: 9-dim space, ASHA successive-halving,
optional optuna TPE) was fully tested but had never produced a number anyone
can cite. This campaign runs it for real on the B5 hard-fixture anchor
(difficulty 0.7 — the regression-sensitive regime where hyperparameters
actually matter, unlike the saturating default fixture):

1. N ASHA trials (rungs 1/2/4/8 epochs, eta=2) over lr, weight decay, loss
   type, focal gamma, class weighting, scheduler, warmup;
2. the winning params AND the hand-picked defaults each train to a converged
   40-epoch anchor on the same fixture (identical budget, BN recal);
3. both mIoUs land in MIOU.json (model "efficientnet-unet-b5",
   label_map "osm-multiclass", difficulty 0.7, tuned=True/absent).

Run: python scripts/tune_campaign.py [--n-trials 16 --trial-epochs 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/s2tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from s2tpu.configs import segmentation as cfg_lib
from s2tpu.data import statistics
from s2tpu.data.dataset import TiffSource, make_synthetic_fixture, pack_dataset
from s2tpu.data.pipeline import Datamodule
from s2tpu.parallel import mesh as mesh_lib
from s2tpu.train.trainer import SegmentationTrainer
from s2tpu.train.tune import SearchSpace, TrialResult, apply_trial, tune


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="efficientnet-unet-b5")
    p.add_argument("--label-map", default="osm-multiclass")
    p.add_argument("--difficulty", type=float, default=0.7)
    p.add_argument("--segments", type=int, default=128)
    p.add_argument("--n-trials", type=int, default=16)
    p.add_argument("--trial-epochs", type=int, default=8)
    p.add_argument("--converge-epochs", type=int, default=40)
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--crop", type=int, default=224)
    p.add_argument("--out", default=str(Path(__file__).resolve().parents[1] / "MIOU.json"))
    args = p.parse_args()

    tmp = tempfile.mkdtemp(prefix="s2tpu_tunecamp_")
    make_synthetic_fixture(
        tmp, aoi="small", label_map=args.label_map, n_segments=args.segments,
        size=(256, 256), seed=0, difficulty=args.difficulty,
    )

    def base_config() -> cfg_lib.Config:
        c = cfg_lib.base_config(args.model, aoi="small", label_map=args.label_map)
        c.datamodule.dataset_cfg.data_dir = tmp
        c.datamodule.batch_size = args.bs
        c.datamodule.random_crop_size = args.crop
        c.datamodule.data_split = (0.75, 0.25, 0.0)
        c.train.compute_dtype = "bfloat16"
        c.train.lr = 3e-4  # the hand-picked default the campaign must beat
        c.train.device_corpus = True
        c.train.bn_recalibration_batches = 3  # val losses must be meaningful at 1-epoch rungs
        c.__post_init__()
        return c

    source = pack_dataset(
        TiffSource("small", args.label_map, data_dir=tmp), Path(tmp) / "packed"
    )
    cfg0 = base_config()
    dist = statistics.get_class_probabilities(
        source, num_classes=cfg0.num_classes, ignore_zero_label=True
    )
    cfg0.train.class_distribution = dist.tolist()
    mesh = mesh_lib.make_mesh(1)

    def dm_factory(cfg: cfg_lib.Config) -> Datamodule:
        return Datamodule(cfg.datamodule, source=source)

    # Crop/batch pinned: shape changes would recompile per trial on the remote
    # TPU compiler; the 7 remaining dims are the ones with accuracy leverage.
    space = SearchSpace()
    t0 = time.time()
    results = tune(
        cfg0, dm_factory, n_trials=args.n_trials, epochs_per_trial=args.trial_epochs,
        seed=0, space=space, mesh=mesh,
    )
    tune_s = time.time() - t0
    best = results[0]
    print(f"tune: best {best.params} val_loss {best.val_loss:.4f} iou {best.val_iou:.4f}")

    def converge(cfg: cfg_lib.Config, tag: str) -> dict:
        trainer = SegmentationTrainer(cfg, dm_factory(cfg), mesh=mesh)
        hist = trainer.fit(epochs=args.converge_epochs)
        b = max(hist, key=lambda h: h.get("val/iou", -1.0))
        rec = {
            "best_val_iou": round(b.get("val/iou", float("nan")), 4),
            "best_val_acc": round(b.get("val/accuracy", float("nan")), 4),
            "best_epoch": b["epoch"],
            "train_images_per_sec": round(hist[-1].get("train/images_per_sec", 0.0), 1),
        }
        print(f"{tag}: {rec}")
        return rec

    tuned_cfg = apply_trial(cfg0, best.params, args.converge_epochs)
    tuned = converge(tuned_cfg, "tuned")
    default_cfg = base_config()
    default_cfg.train.class_distribution = dist.tolist()
    default = converge(default_cfg, "default")

    record = {
        "model": args.model,
        "label_map": args.label_map,
        "dataset": (
            f"synthetic {args.label_map} seed0 n={args.segments} 256^2 "
            f"(deterministic, difficulty={args.difficulty})"
        ),
        "difficulty": args.difficulty,
        "campaign": (
            f"ASHA tune: {args.n_trials} trials, rung budget {args.trial_epochs} "
            f"epochs, eta=2 ({sum(r.epochs_trained for r in results)} trial-epochs, "
            f"{sum(1 for r in results if r.pruned)} pruned, {round(tune_s, 1)}s)"
        ),
        "crop": args.crop,
        "batch_size": args.bs,
        "epochs": args.converge_epochs,
        "tuned_params": {
            k: (round(v, 6) if isinstance(v, float) else v) for k, v in best.params.items()
        },
        **{f"tuned_{k}": v for k, v in tuned.items()},
        **{f"default_{k}": v for k, v in default.items()},
        "backend": jax.default_backend(),
    }
    out = Path(args.out)
    existing = json.loads(out.read_text()) if out.exists() else []
    existing = existing if isinstance(existing, list) else [existing]
    existing = [r for r in existing if "campaign" not in r or (
        r.get("model"), r.get("label_map"), r.get("difficulty")
    ) != (record["model"], record["label_map"], record["difficulty"])]
    existing.append(record)
    out.write_text(json.dumps(existing, indent=2) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()

"""Steady-state multi-temporal (T>1) training throughput — VERDICT r4 #2.

The r4 T=4 convergence anchors recorded 9.9 img/s (B5 stack-time all12) and
13.8 img/s (fc-prithvi tubelet) in MIOU.json with no attribution. Those rates
are wall-clock over 6-step epochs on a tiny fixture — dominated by per-epoch
eval + BN recalibration + host dispatch, not by the training step. This bench
isolates the actual fused train-step rate for the same configs the way
bench.py does for T=1: device corpus in HBM, ``steps_per_dispatch`` fused
optimizer steps per dispatch, timed over several windows after warmup.

Run (one config per invocation; TPU):
    python scripts/bench_multitemporal.py --model efficientnet-unet-b5 \
        --stack-time --bs 16
    python scripts/bench_multitemporal.py --model fc-prithvi-backbone --bs 8

Prints one JSON line per run: {"metric", "value", "unit", "mfu", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/s2tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="efficientnet-unet-b5")
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--crop", type=int, default=224)
    p.add_argument("--time-frames", type=int, default=4)
    p.add_argument("--bands", default="all12")
    p.add_argument("--stack-time", action="store_true")
    p.add_argument("--segments", type=int, default=32)
    p.add_argument("--seg-size", type=int, default=256)
    p.add_argument("--steps-per-dispatch", type=int, default=10)
    p.add_argument("--windows", type=int, default=4)
    args = p.parse_args()

    from s2tpu.configs import segmentation as cfg_lib
    from s2tpu.configs.data_config import parse_bands
    from s2tpu.data.dataset import Sample
    from s2tpu.data.pipeline import Datamodule
    from s2tpu.parallel import mesh as mesh_lib
    from s2tpu.train.trainer import SegmentationTrainer

    bands = parse_bands(args.bands)
    C, T, hw = len(bands), args.time_frames, args.seg_size

    class SyntheticSource:
        def __init__(self, n: int) -> None:
            rng = np.random.default_rng(0)
            shape = (n, T, hw, hw, C) if T > 1 else (n, hw, hw, C)
            self.images = rng.integers(0, 4000, size=shape, dtype=np.int16)
            self.labels = rng.integers(0, 4, size=(n, hw, hw)).astype(np.uint8)

        def __len__(self) -> int:
            return self.images.shape[0]

        def __getitem__(self, idx: int) -> Sample:
            return Sample(x=self.images[idx], y=self.labels[idx])

    config = cfg_lib.base_config(args.model, aoi="at", label_map="osm-multiclass")
    config.datamodule.dataset_cfg.bands = bands
    config.datamodule.dataset_cfg.n_time_frames = T
    config.datamodule.dataset_cfg.stack_time_into_channels = args.stack_time
    config.datamodule.batch_size = args.bs
    config.datamodule.random_crop_size = args.crop
    config.datamodule.data_split = (1.0, 0.0, 0.0)
    config.train.compute_dtype = "bfloat16"
    config.train.device_corpus = True
    config.train.steps_per_dispatch = args.steps_per_dispatch
    if args.model.startswith("fc-prithvi"):
        config.train.frozen_backbone = False  # anchor parity: from-scratch
    config.__post_init__()

    source = SyntheticSource(args.segments)
    dm = Datamodule(config.datamodule, source=source)
    dm.set_mean_std(np.full(C, 1500.0, np.float32), np.full(C, 900.0, np.float32))
    trainer = SegmentationTrainer(config, dm, mesh=mesh_lib.make_mesh(1))
    state = trainer.state
    rng = np.random.default_rng(1)
    K, B = args.steps_per_dispatch, args.bs

    def draw():
        idx = rng.integers(0, trainer.corpus.n, size=(K, B)).astype(np.int32)
        ys = rng.integers(0, hw - args.crop + 1, size=(K, B)).astype(np.int32)
        xs = rng.integers(0, hw - args.crop + 1, size=(K, B)).astype(np.int32)
        return idx, ys, xs

    def run_window(state):
        return trainer.train_step_indexed_multi(
            state, trainer.corpus.images, trainer.corpus.labels, *draw(), trainer.base_rng
        )

    for _ in range(2):
        state, metrics = run_window(state)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.windows):
        state, metrics = run_window(state)
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - t0
    n_steps = args.windows * K
    ips = B * n_steps / elapsed

    from s2tpu.train.profiling import mfu_from_lowered

    mfu = mfu_from_lowered(
        lambda: trainer.train_step_indexed_multi.lower(
            state, trainer.corpus.images, trainer.corpus.labels, *draw(), trainer.base_rng
        ),
        n_steps, elapsed,
    )

    tag = args.model.replace("efficientnet-unet", "effunet").replace("-", "_")
    record = {
        "metric": f"train_images_per_sec_T{T}_{tag}_bs{B}_{args.crop}_{args.bands}",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "ms_per_step": round(1000 * elapsed / n_steps, 2),
        "mode": f"device_corpus+steps_per_dispatch={K}",
        **({"stack_time": True} if args.stack_time else {}),
        **({"mfu": round(mfu, 4)} if mfu is not None else {}),
        "backend": jax.default_backend(),
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()

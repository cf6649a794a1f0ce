"""Benchmark harness: train images/sec/chip on the flagship config.

Headline config (BASELINE.md): EfficientNet-UNet-B5, 6-band 224x224 crops,
batch 32, bf16 — the full jit'd train step (on-device augmentation, forward,
loss, backward, Adam update, confusion-matrix metrics) with donated state,
i.e. exactly what one chip executes per step in production training.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
compares against a conservative estimate of the reference PyTorch stack
(torch.compile max-autotune, bf16, channels_last) on one A100-80GB for the
same model/shape: ~230 images/sec. BASELINE.json's target is >=4x that.

Prints exactly one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/s2tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REF_A100_IMG_PER_SEC = 230.0  # estimated reference throughput (see docstring)

BATCH = 32
CROP = 224
STEPS = 20
WARMUP = 3


def main() -> None:
    from s2tpu.configs import segmentation as cfg_lib
    from s2tpu.data.pipeline import Datamodule
    from s2tpu.parallel import mesh as mesh_lib
    from s2tpu.train.trainer import SegmentationTrainer

    # In-memory synthetic source: bench measures the train step, not disk IO.
    class SyntheticSource:
        def __init__(self, n: int = 64, hw: int = 256) -> None:
            rng = np.random.default_rng(0)
            self.images = rng.integers(0, 4000, size=(n, hw, hw, 6), dtype=np.int16)
            self.labels = rng.integers(0, 4, size=(n, hw, hw)).astype(np.uint8)

        def __len__(self) -> int:
            return self.images.shape[0]

        def __getitem__(self, idx: int):
            from s2tpu.data.dataset import Sample

            return Sample(x=self.images[idx], y=self.labels[idx])

    config = cfg_lib.base_config("efficientnet-unet-b5", aoi="at", label_map="osm-multiclass")
    config.datamodule.batch_size = BATCH
    config.datamodule.random_crop_size = CROP
    config.datamodule.data_split = (1.0, 0.0, 0.0)
    config.train.compute_dtype = "bfloat16"

    dm = Datamodule(config.datamodule, source=SyntheticSource())
    dm.set_mean_std(np.full(6, 1500.0, np.float32), np.full(6, 900.0, np.float32))
    mesh = mesh_lib.make_mesh(1)
    trainer = SegmentationTrainer(config, dm, mesh=mesh)

    rng = np.random.default_rng(1)
    images = jax.device_put(
        rng.integers(0, 4000, size=(BATCH, CROP, CROP, 6), dtype=np.int16),
        mesh_lib.data_sharding(mesh),
    )
    labels = jax.device_put(
        rng.integers(0, 4, size=(BATCH, CROP, CROP)).astype(np.int32),
        mesh_lib.data_sharding(mesh),
    )

    state = trainer.state
    for _ in range(WARMUP):
        state, metrics = trainer.train_step(state, images, labels, trainer.base_rng)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = trainer.train_step(state, images, labels, trainer.base_rng)
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - t0

    images_per_sec = BATCH * STEPS / elapsed

    # MFU from XLA's own cost model (flops of the whole train step program).
    mfu = None
    try:
        lowered = trainer.train_step.lower(state, images, labels, trainer.base_rng)
        cost = lowered.compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops_per_step = float(cost.get("flops", 0.0))
        peak = 197e12  # TPU v5e bf16 peak FLOP/s
        if flops_per_step > 0:
            mfu = flops_per_step * (STEPS / elapsed) / peak
    except Exception:  # noqa: BLE001 — MFU is informational only
        pass

    record = {
        "metric": "train_images_per_sec_per_chip_effunet_b5_bs32_224_bf16",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / REF_A100_IMG_PER_SEC, 3),
    }
    if mfu is not None:
        record["mfu"] = round(mfu, 4)
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())

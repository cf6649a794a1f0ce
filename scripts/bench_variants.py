"""Quick variant bench: batch sizes and XLA flag sets for the B5 train step."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/s2tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from s2tpu.configs import segmentation as cfg_lib
from s2tpu.data.dataset import Sample
from s2tpu.data.pipeline import Datamodule
from s2tpu.parallel import mesh as mesh_lib
from s2tpu.train.trainer import SegmentationTrainer


class SyntheticSource:
    def __init__(self, n=8, hw=256):
        rng = np.random.default_rng(0)
        self.images = rng.integers(0, 4000, size=(n, hw, hw, 6), dtype=np.int16)
        self.labels = rng.integers(0, 4, size=(n, hw, hw)).astype(np.uint8)

    def __len__(self):
        return self.images.shape[0]

    def __getitem__(self, idx):
        return Sample(x=self.images[idx], y=self.labels[idx])


def run(batch, steps=20, version="b5"):
    import os

    config = cfg_lib.base_config(f"efficientnet-unet-{version}", aoi="at", label_map="osm-multiclass")
    config.datamodule.batch_size = batch
    config.datamodule.random_crop_size = 224
    config.datamodule.data_split = (1.0, 0.0, 0.0)
    config.train.compute_dtype = "bfloat16"
    peb = os.environ.get("PACKED_EARLY", "")
    if peb:  # "grouped" | "dense" | "" (off)
        config.train.packed_early_blocks = peb
    dm = Datamodule(config.datamodule, source=SyntheticSource())
    dm.set_mean_std(np.full(6, 1500.0, np.float32), np.full(6, 900.0, np.float32))
    trainer = SegmentationTrainer(config, dm, mesh=mesh_lib.make_mesh(1))
    rng = np.random.default_rng(1)
    images = jax.device_put(rng.integers(0, 4000, size=(batch, 224, 224, 6), dtype=np.int16))
    labels = jax.device_put(rng.integers(0, 4, size=(batch, 224, 224)).astype(np.int32))
    state = trainer.state
    for _ in range(3):
        state, m = trainer.train_step(state, images, labels, trainer.base_rng)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = trainer.train_step(state, images, labels, trainer.base_rng)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / steps
    print(f"bs={batch}: {dt*1e3:7.2f} ms/step  {batch/dt:7.1f} img/s", flush=True)


if __name__ == "__main__":
    for b in (int(a) for a in (sys.argv[1:] or ["32", "64", "128"])):
        run(b)

"""Capture a trace of the B5 train step and print the op-level breakdown.

Parses the xprof trace into a framework-op table (ms per op bucket) so
PERF_NOTES can be updated without TensorBoard.
"""

import sys
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
from s2tpu.train.profiling import trace

BATCH, CROP = 32, 224


class SyntheticSource:
    def __init__(self, n=8, hw=256):
        rng = np.random.default_rng(0)
        self.images = rng.integers(0, 4000, size=(n, hw, hw, 6), dtype=np.int16)
        self.labels = rng.integers(0, 4, size=(n, hw, hw)).astype(np.uint8)

    def __len__(self):
        return self.images.shape[0]

    def __getitem__(self, idx):
        return Sample(x=self.images[idx], y=self.labels[idx])


def main():
    config = cfg_lib.base_config("efficientnet-unet-b5", aoi="at", label_map="osm-multiclass")
    config.datamodule.batch_size = BATCH
    config.datamodule.random_crop_size = CROP
    config.datamodule.data_split = (1.0, 0.0, 0.0)
    config.train.compute_dtype = "bfloat16"
    dm = Datamodule(config.datamodule, source=SyntheticSource())
    dm.set_mean_std(np.full(6, 1500.0, np.float32), np.full(6, 900.0, np.float32))
    trainer = SegmentationTrainer(config, dm, mesh=mesh_lib.make_mesh(1))
    rng = np.random.default_rng(1)
    images = jax.device_put(rng.integers(0, 4000, size=(BATCH, CROP, CROP, 6), dtype=np.int16))
    labels = jax.device_put(rng.integers(0, 4, size=(BATCH, CROP, CROP)).astype(np.int32))

    state = trainer.state
    for _ in range(3):
        state, m = trainer.train_step(state, images, labels, trainer.base_rng)
    jax.block_until_ready(m["loss"])

    out_dir = Path("/tmp/s2tpu_profile")
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    with trace("b5_step", log_dir=out_dir):
        for _ in range(5):
            state, m = trainer.train_step(state, images, labels, trainer.base_rng)
        jax.block_until_ready(m["loss"])
    print("trace captured:", out_dir, flush=True)

    # Summarize with xprof's tool API.
    xplane = sorted(out_dir.rglob("*.xplane.pb"))
    print("planes:", [str(p) for p in xplane])
    try:
        from xprof.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data([str(xplane[-1])], "framework_op_stats", {"tqx": "out:csv"})
        csv_path = Path("/tmp/s2tpu_profile/op_stats.csv")
        csv_path.write_bytes(data if isinstance(data, bytes) else data.encode())
        print("wrote", csv_path)
    except Exception as e:  # noqa: BLE001
        print("xprof tool conversion failed:", e)


if __name__ == "__main__":
    main()

"""Capture a trace of the MAE pretrain step and print the op-level breakdown.

Mirrors scripts/profile_step.py for the Prithvi-100M MAE workload (bs=64,
224², mask 0.75, bf16) so the gap between the measured step and the
roofline_mae.py bound can be attributed to real op buckets.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/s2tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from s2tpu.configs import mae as mae_cfg
from s2tpu.configs.segmentation import DatamoduleConfig, DatasetConfig
from s2tpu.data.dataset import Sample
from s2tpu.data.pipeline import Datamodule
from s2tpu.parallel import mesh as mesh_lib
from s2tpu.train.mae_trainer import MAETrainer
from s2tpu.train.profiling import trace

BATCH, CROP = 64, 224


class SyntheticSource:
    def __init__(self, n=4, hw=256):
        rng = np.random.default_rng(0)
        self.images = rng.integers(0, 4000, size=(n, hw, hw, 6), dtype=np.int16)
        self.labels = np.zeros((n, hw, hw), np.uint8)

    def __len__(self):
        return self.images.shape[0]

    def __getitem__(self, idx):
        return Sample(x=self.images[idx], y=self.labels[idx])


def main():
    config = mae_cfg.base_config(aoi="at")
    config.train.from_scratch = True
    config.train.compute_dtype = "bfloat16"
    config.datamodule.batch_size = BATCH
    config.datamodule.random_crop_size = CROP
    dm = Datamodule(
        DatamoduleConfig(
            dataset_cfg=DatasetConfig(aoi="at", label_map="osm-multiclass"),
            batch_size=BATCH,
            data_split=(1.0, 0.0, 0.0),
            random_crop_size=CROP,
        ),
        source=SyntheticSource(),
    )
    trainer = MAETrainer(config, dm, mesh=mesh_lib.make_mesh(1))
    rng = np.random.default_rng(1)
    img = jax.device_put(rng.integers(0, 4000, size=(BATCH, CROP, CROP, 6), dtype=np.int16))

    state = trainer.state
    for _ in range(3):
        state, m = trainer.train_step(state, img, trainer.base_rng)
    jax.block_until_ready(m["loss"])

    out_dir = Path("/tmp/s2tpu_profile_mae")
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    with trace("mae_step", log_dir=out_dir):
        for _ in range(5):
            state, m = trainer.train_step(state, img, trainer.base_rng)
        jax.block_until_ready(m["loss"])
    print("trace captured:", out_dir, flush=True)

    xplane = sorted(out_dir.rglob("*.xplane.pb"))
    print("planes:", [str(p) for p in xplane])
    try:
        from xprof.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data([str(xplane[-1])], "framework_op_stats", {"tqx": "out:csv"})
        csv_path = out_dir / "op_stats.csv"
        csv_path.write_bytes(data if isinstance(data, bytes) else data.encode())
        print("wrote", csv_path)
    except Exception as e:  # noqa: BLE001
        print("xprof tool conversion failed:", e)


if __name__ == "__main__":
    main()

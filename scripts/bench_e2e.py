"""End-to-end training throughput: packed corpus -> native gather ->
prefetch -> jit'd step. Measures what production training actually sustains,
input pipeline included (vs bench.py's device-resident step measurement).
"""

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
from s2tpu.data.dataset import PackedPaths, PackedSource
from s2tpu.data.pipeline import Datamodule, prefetch_to_device
from s2tpu.parallel import mesh as mesh_lib
from s2tpu.train.trainer import SegmentationTrainer

BATCH = 32
CROP = 224
N_SEGMENTS = 256


def build_packed_corpus(tmp: Path) -> PackedSource:
    rng = np.random.default_rng(0)
    paths = PackedPaths.for_dir(tmp)
    tmp.mkdir(parents=True, exist_ok=True)
    images = np.lib.format.open_memmap(
        paths.images, mode="w+", dtype=np.int16, shape=(N_SEGMENTS, 256, 256, 6)
    )
    labels = np.lib.format.open_memmap(
        paths.labels, mode="w+", dtype=np.uint8, shape=(N_SEGMENTS, 256, 256)
    )
    for i in range(N_SEGMENTS):
        images[i] = rng.integers(0, 4000, size=(256, 256, 6), dtype=np.int16)
        labels[i] = rng.integers(0, 4, size=(256, 256)).astype(np.uint8)
    images.flush()
    labels.flush()
    paths.meta.write_text('{"n": %d, "height": 256, "width": 256, "channels": 6}' % N_SEGMENTS)
    return PackedSource(tmp)


def main():
    tmp = Path(tempfile.mkdtemp(prefix="s2tpu_e2e_"))
    source = build_packed_corpus(tmp)

    config = cfg_lib.base_config("efficientnet-unet-b5", aoi="at", label_map="osm-multiclass")
    config.datamodule.batch_size = BATCH
    config.datamodule.random_crop_size = CROP
    config.datamodule.data_split = (1.0, 0.0, 0.0)
    config.train.compute_dtype = "bfloat16"
    dm = Datamodule(config.datamodule, source=source)
    dm.set_mean_std(np.full(6, 1500.0, np.float32), np.full(6, 900.0, np.float32))
    mesh = mesh_lib.make_mesh(1)
    trainer = SegmentationTrainer(config, dm, mesh=mesh)

    # warmup epoch compiles + fills caches
    m = trainer.run_train_epoch(epoch=0)
    t0 = time.perf_counter()
    images = 0
    for epoch in range(1, 4):
        m = trainer.run_train_epoch(epoch)
        images += (len(dm.train_idx) // BATCH) * BATCH
    elapsed = time.perf_counter() - t0
    print(
        f"end-to-end train (packed memmap + native gather + prefetch): "
        f"{images / elapsed:.1f} img/s vs device-step bench (see bench.py)"
    )


if __name__ == "__main__":
    main()

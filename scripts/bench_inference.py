"""Inference benchmark: tiled full-segment prediction throughput in km²/sec.

One 512x512 segment at 10 m/px covers 5.12 km x 5.12 km = 26.21 km². The
benchmark runs the tiled sliding-window predictor (224 tiles, 32 px overlap,
Hann-blended on device) with EfficientNet-UNet-B5 over synthetic segments
and reports km²/sec — the second north-star metric of BASELINE.json.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/s2tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from s2tpu.configs import segmentation as cfg_lib
from s2tpu.data.dataset import Sample
from s2tpu.data.pipeline import Datamodule
from s2tpu.infer.tiled import tiled_predict
from s2tpu.parallel import mesh as mesh_lib
from s2tpu.train.trainer import SegmentationTrainer

KM2_PER_SEGMENT = 5.12 * 5.12


class SyntheticSource:
    def __init__(self, n=4, hw=512):
        rng = np.random.default_rng(0)
        self.images = rng.integers(0, 4000, size=(n, hw, hw, 6), dtype=np.int16)
        self.labels = rng.integers(0, 4, size=(n, hw, hw)).astype(np.uint8)

    def __len__(self):
        return self.images.shape[0]

    def __getitem__(self, idx):
        return Sample(x=self.images[idx], y=self.labels[idx])


def main():
    config = cfg_lib.base_config("efficientnet-unet-b5", aoi="at", label_map="osm-multiclass")
    config.datamodule.batch_size = 8
    config.datamodule.data_split = (1.0, 0.0, 0.0)
    config.train.compute_dtype = "bfloat16"
    src = SyntheticSource()
    dm = Datamodule(config.datamodule, source=src)
    dm.set_mean_std(np.full(6, 1500.0, np.float32), np.full(6, 900.0, np.float32))
    trainer = SegmentationTrainer(config, dm, mesh=mesh_lib.make_mesh(1))

    from s2tpu.infer.tiled import tiled_predict_many

    modes = {"bf16": (trainer.predict_step, trainer.state)}
    if "--int8" in sys.argv or "--both" in sys.argv:
        from s2tpu.infer.quantize import quantize_segmentation_trainer

        modes["int8"] = quantize_segmentation_trainer(trainer, n_batches=1)
        if "--both" not in sys.argv:
            del modes["bf16"]

    batch_imgs = jnp.asarray(src.images)  # 4 segments per call
    n_rep, n_rounds = 8, 3  # interleave modes across rounds: relay noise is
    # large (~±20% wall), so report the best round per mode
    best: dict[str, float] = {}
    for mode, (predict_fn, state) in modes.items():  # warmup/compile
        tiled_predict_many(
            predict_fn, state, batch_imgs, num_classes=4, tile=224, overlap=32, batch_size=12
        )
    for _ in range(n_rounds):
        for mode, (predict_fn, state) in modes.items():
            t0 = time.perf_counter()
            for _ in range(n_rep):
                class_maps, _ = tiled_predict_many(
                    predict_fn, state, batch_imgs, num_classes=4,
                    tile=224, overlap=32, batch_size=12,
                )
            elapsed = time.perf_counter() - t0
            best[mode] = max(best.get(mode, 0.0), n_rep * len(src) / elapsed)
    for mode, seg_per_sec in best.items():
        print(
            f"tiled inference [{mode}]: {seg_per_sec:.2f} segments/s = "
            f"{seg_per_sec * KM2_PER_SEGMENT:.1f} km²/s "
            f"(512² segments, B5, 224-tile, 32 overlap, 4-segment groups; best of {n_rounds})"
        )


if __name__ == "__main__":
    main()

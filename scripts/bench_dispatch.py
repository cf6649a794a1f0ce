"""Dispatch-amortization bench: steps_per_dispatch in device-corpus mode.

Measures the B5 train step (headline config: bs=32, 224-crop, bf16) on one
chip in three dispatch regimes:
  * streamed   — bench.py's loop: one host dispatch per step, batch already
                 on device (upper-bounds any host-streamed pipeline);
  * corpus k=1 — device-corpus index-only steps, one dispatch per step
                 (host ships 3 int32 vectors, crops gathered on device);
  * corpus k=K — steps_per_dispatch: K optimizer steps fused into ONE XLA
                 program via lax.scan; the host wakes once per K steps.

The k=K regime removes per-step host dispatch latency entirely — on this
environment's remote-TPU relay that latency is ~4 ms/step (PERF_NOTES r3
"B5 residual attribution"), on a normal TPU-VM host it is smaller but
nonzero. The fused number is the honest device rate of the production
device-corpus path.

Env: K (default 20), STEPS (default 60 total per regime).
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/s2tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from s2tpu.configs import segmentation as cfg_lib
from s2tpu.data.pipeline import Datamodule
from s2tpu.parallel import mesh as mesh_lib
from s2tpu.train.trainer import SegmentationTrainer

BATCH = 32
CROP = 224
K = int(os.environ.get("K", "20"))
STEPS = int(os.environ.get("STEPS", "60"))
N_SEGMENTS = 64


class SyntheticSource:
    def __init__(self, n: int = N_SEGMENTS, hw: int = 256) -> None:
        rng = np.random.default_rng(0)
        self.images = rng.integers(0, 4000, size=(n, hw, hw, 6), dtype=np.int16)
        self.labels = rng.integers(0, 4, size=(n, hw, hw)).astype(np.uint8)

    def __len__(self) -> int:
        return self.images.shape[0]

    def __getitem__(self, idx: int):
        from s2tpu.data.dataset import Sample

        return Sample(x=self.images[idx], y=self.labels[idx])


def build_trainer(device_corpus: bool) -> SegmentationTrainer:
    config = cfg_lib.base_config("efficientnet-unet-b5", aoi="at", label_map="osm-multiclass")
    config.datamodule.batch_size = BATCH
    config.datamodule.random_crop_size = CROP
    config.datamodule.data_split = (1.0, 0.0, 0.0)
    config.train.compute_dtype = "bfloat16"
    config.train.device_corpus = device_corpus
    dm = Datamodule(config.datamodule, source=SyntheticSource())
    dm.set_mean_std(np.full(6, 1500.0, np.float32), np.full(6, 900.0, np.float32))
    return SegmentationTrainer(config, dm, mesh=mesh_lib.make_mesh(1))


def sample_idx(rng: np.random.Generator, k: int | None = None):
    shape = (BATCH,) if k is None else (k, BATCH)
    return (
        rng.integers(0, N_SEGMENTS, size=shape).astype(np.int32),
        rng.integers(0, 256 - CROP, size=shape).astype(np.int32),
        rng.integers(0, 256 - CROP, size=shape).astype(np.int32),
    )


def main() -> None:
    rng = np.random.default_rng(1)

    # --- streamed (bench.py regime) -----------------------------------
    t = build_trainer(device_corpus=False)
    images = jax.device_put(
        rng.integers(0, 4000, size=(BATCH, CROP, CROP, 6), dtype=np.int16),
        mesh_lib.data_sharding(t.mesh),
    )
    labels = jax.device_put(
        rng.integers(0, 4, size=(BATCH, CROP, CROP)).astype(np.int32),
        mesh_lib.data_sharding(t.mesh),
    )
    state = t.state
    for _ in range(3):
        state, m = t.train_step(state, images, labels, t.base_rng)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = t.train_step(state, images, labels, t.base_rng)
    jax.block_until_ready(m["loss"])
    streamed = BATCH * STEPS / (time.perf_counter() - t0)
    print(f"streamed  (1 dispatch/step, on-device batch): {streamed:7.1f} img/s")
    del t, state, images, labels

    # --- device corpus, k=1 -------------------------------------------
    t = build_trainer(device_corpus=True)
    state = t.state
    for _ in range(3):
        state, m = t.train_step_indexed(state, t.corpus.images, t.corpus.labels, *sample_idx(rng), t.base_rng)
    jax.block_until_ready(m["loss"])
    draws = [sample_idx(rng) for _ in range(STEPS)]
    t0 = time.perf_counter()
    for d in draws:
        state, m = t.train_step_indexed(state, t.corpus.images, t.corpus.labels, *d, t.base_rng)
    jax.block_until_ready(m["loss"])
    k1 = BATCH * STEPS / (time.perf_counter() - t0)
    print(f"corpus k=1  (1 dispatch/step, on-device gather): {k1:7.1f} img/s")

    # --- device corpus, fused k=K --------------------------------------
    n_windows = max(STEPS // K, 1)
    for _ in range(1):
        state, m = t.train_step_indexed_multi(
            state, t.corpus.images, t.corpus.labels, *sample_idx(rng, K), t.base_rng
        )
    jax.block_until_ready(m["loss"])
    wdraws = [sample_idx(rng, K) for _ in range(n_windows)]
    t0 = time.perf_counter()
    for d in wdraws:
        state, m = t.train_step_indexed_multi(state, t.corpus.images, t.corpus.labels, *d, t.base_rng)
    jax.block_until_ready(m["loss"])
    fused = BATCH * K * n_windows / (time.perf_counter() - t0)
    print(f"corpus k={K} (1 dispatch/{K} steps, fused scan):  {fused:7.1f} img/s")
    print(f"fused vs streamed: {fused / streamed:+.1%}   fused vs corpus k=1: {fused / k1:+.1%}")


if __name__ == "__main__":
    main()

"""Benchmark harness: train images/sec/chip on the flagship config.

Headline config (BASELINE.md): EfficientNet-UNet-B5, 6-band 224x224 crops,
batch 32, bf16 — the full jit'd train step (on-device augmentation, forward,
loss, backward, Adam update, confusion-matrix metrics) with donated state,
i.e. exactly what one chip executes per step in production training.

Two measurement modes (BENCH_MODE env):
  * ``corpus`` (default) — the production fast path: the dataset lives in
    HBM (``--device-corpus``) and ``--steps-per-dispatch K`` fuses K full
    optimizer steps into ONE XLA program (lax.scan over the donated state),
    so the host ships only (K, B) int32 index/offset vectors per dispatch.
    This is what a real training run uses; it also amortizes this box's
    axon-relay dispatch latency (~3.8 ms/step wall-device gap, PERF_NOTES),
    which a normal TPU-VM host overlaps anyway.
  * ``streamed`` — the r1/r2 measurement: one dispatch per optimizer step
    with the batch already on device (isolates the single-step program).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
compares against a conservative estimate of the reference PyTorch stack
(torch.compile max-autotune, bf16, channels_last) on one A100-80GB for the
same model/shape: ~230 images/sec. BASELINE.json's target is >=4x that.

Prints exactly one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import s2tpu  # noqa: F401 — re-applies an explicit JAX_PLATFORMS env request

jax.config.update("jax_compilation_cache_dir", "/tmp/s2tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REF_A100_IMG_PER_SEC = 230.0  # estimated reference throughput (see docstring)

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
CROP = int(os.environ.get("BENCH_CROP", "224"))
MODEL = os.environ.get("BENCH_MODEL", "efficientnet-unet-b5")
MODE = os.environ.get("BENCH_MODE", "corpus")
K = int(os.environ.get("BENCH_STEPS_PER_DISPATCH", "10"))  # corpus mode
WINDOWS = int(os.environ.get("BENCH_WINDOWS", "4"))  # timed fused windows
STEPS = 20  # streamed mode
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

    config = cfg_lib.base_config(MODEL, aoi="at", label_map="osm-multiclass")
    config.datamodule.batch_size = BATCH
    config.datamodule.random_crop_size = CROP
    config.datamodule.data_split = (1.0, 0.0, 0.0)
    config.train.compute_dtype = "bfloat16"
    # Layout-only (numerically exact, same checkpoints): the e=1 encoder
    # blocks on the c-major space-to-depth layout with the dense
    # structural-zero depthwise kernel — measured +3.6% on the v5e
    # (PERF_NOTES r3). BENCH_PACKED_EARLY=0|grouped|dense overrides.
    pe = os.environ.get("BENCH_PACKED_EARLY", "dense")
    config.train.packed_early_blocks = False if pe in ("0", "false", "") else pe

    source = SyntheticSource()
    dm = Datamodule(config.datamodule, source=source)
    dm.set_mean_std(np.full(6, 1500.0, np.float32), np.full(6, 900.0, np.float32))
    mesh = mesh_lib.make_mesh(1)
    rng = np.random.default_rng(1)

    mode = MODE
    trainer = None
    if mode == "corpus":
        hw = source.images.shape[1]
        # The whole corpus path — INCLUDING trainer construction, which
        # uploads the corpus into HBM — is guarded: any failure (e.g. corpus
        # + state OOM on a smaller part) falls back to the streamed
        # measurement instead of zeroing out the bench record.
        try:
            config.train.device_corpus = True
            config.train.steps_per_dispatch = K
            trainer = SegmentationTrainer(config, dm, mesh=mesh)
            state = trainer.state

            def draw_window():
                idx = rng.integers(0, trainer.corpus.n, size=(K, BATCH)).astype(np.int32)
                ys = rng.integers(0, hw - CROP + 1, size=(K, BATCH)).astype(np.int32)
                xs = rng.integers(0, hw - CROP + 1, size=(K, BATCH)).astype(np.int32)
                return idx, ys, xs

            def run_window(state):
                idx, ys, xs = draw_window()
                return trainer.train_step_indexed_multi(
                    state, trainer.corpus.images, trainer.corpus.labels,
                    idx, ys, xs, trainer.base_rng,
                )

            for _ in range(2):  # compile + one clean warmup window
                state, metrics = run_window(state)
            jax.block_until_ready(metrics["loss"])
            t0 = time.perf_counter()
            for _ in range(WINDOWS):
                state, metrics = run_window(state)
            jax.block_until_ready(metrics["loss"])
            elapsed = time.perf_counter() - t0
            n_steps = WINDOWS * K
            lower_args = (
                state, trainer.corpus.images, trainer.corpus.labels,
                *draw_window(), trainer.base_rng,
            )
            lower = lambda: trainer.train_step_indexed_multi.lower(*lower_args)  # noqa: E731
            # XLA's cost model counts a lax.scan body ONCE (not x trip
            # count), so the K-fused program's reported flops already equal
            # one optimizer step's (verified: corpus-mode MFU matched the
            # streamed single-step MFU exactly at div=1, and was 10x low at
            # div=K).
            flops_div = 1
        except Exception as e:  # noqa: BLE001 — never zero out the bench record
            print(f"bench: corpus mode failed ({type(e).__name__}: {e}); "
                  "falling back to streamed", file=sys.stderr)
            mode = "streamed"
            trainer = None  # rebuild below: windows may have consumed donated state
            config.train.device_corpus = False
            config.train.steps_per_dispatch = 1
    if mode == "streamed":
        if trainer is None:
            trainer = SegmentationTrainer(config, dm, mesh=mesh)
        state = trainer.state
        images = jax.device_put(
            rng.integers(0, 4000, size=(BATCH, CROP, CROP, 6), dtype=np.int16),
            mesh_lib.data_sharding(mesh),
        )
        labels = jax.device_put(
            rng.integers(0, 4, size=(BATCH, CROP, CROP)).astype(np.int32),
            mesh_lib.data_sharding(mesh),
        )
        for _ in range(WARMUP):
            state, metrics = trainer.train_step(state, images, labels, trainer.base_rng)
        jax.block_until_ready(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics = trainer.train_step(state, images, labels, trainer.base_rng)
        jax.block_until_ready(metrics["loss"])
        elapsed = time.perf_counter() - t0
        n_steps = STEPS
        lower = lambda: trainer.train_step.lower(state, images, labels, trainer.base_rng)  # noqa: E731
        flops_div = 1

    images_per_sec = BATCH * n_steps / elapsed

    # MFU from XLA's own cost model (flops of the whole train-step program).
    mfu = None
    try:
        cost = lower().compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops_per_step = float(cost.get("flops", 0.0)) / flops_div
        peak = 197e12  # TPU v5e bf16 peak FLOP/s
        if flops_per_step > 0:
            mfu = flops_per_step * (n_steps / elapsed) / peak
    except Exception:  # noqa: BLE001 — MFU is informational only
        pass

    record = {
        "metric": f"train_images_per_sec_per_chip_{MODEL.replace('efficientnet-unet', 'effunet').replace('-', '_')}_bs{BATCH}_{CROP}_bf16",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / REF_A100_IMG_PER_SEC, 3),
    }
    if mfu is not None:
        record["mfu"] = round(mfu, 4)
    record["mode"] = mode if mode == "streamed" else f"device_corpus+steps_per_dispatch={K}"
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())

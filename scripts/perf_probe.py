"""Performance ablation probe for the B5 train step on TPU.

Measures: forward-only, full train step, train step without the CM metric,
and batch-size scaling — the data that decides where optimization effort
goes next. Results append to PERF_NOTES.md.
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


def build(batch, version="b5"):
    config = cfg_lib.base_config(f"efficientnet-unet-{version}", aoi="at", label_map="osm-multiclass")
    config.datamodule.batch_size = batch
    config.datamodule.random_crop_size = 224
    config.datamodule.data_split = (1.0, 0.0, 0.0)
    config.train.compute_dtype = "bfloat16"
    dm = Datamodule(config.datamodule, source=SyntheticSource())
    dm.set_mean_std(np.full(6, 1500.0, np.float32), np.full(6, 900.0, np.float32))
    trainer = SegmentationTrainer(config, dm, mesh=mesh_lib.make_mesh(1))
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 4000, size=(batch, 224, 224, 6), dtype=np.int16))
    lbl = jnp.asarray(rng.integers(0, 4, size=(batch, 224, 224)).astype(np.int32))
    return trainer, img, lbl


def timeit(fn, steps=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    results = {}

    trainer, img, lbl = build(32)
    state = trainer.state

    def full(_):
        nonlocal state
        state, m = trainer.train_step(state, img, lbl, trainer.base_rng)
        return m["loss"]

    t = timeit(full)
    results["train_bs32"] = 32 / t
    print(f"train bs32: {32 / t:.1f} img/s ({t * 1e3:.1f} ms)", flush=True)

    def fwd(_):
        return trainer.predict_step(state, img)  # state: live (train donated the original)

    t = timeit(fwd)
    results["fwd_bs32"] = 32 / t
    print(f"fwd bs32: {32 / t:.1f} img/s ({t * 1e3:.1f} ms)", flush=True)

    # train step with metrics stripped (measures CM cost)
    import optax
    from s2tpu.data.augment import augment_batch

    model = trainer.model

    def bare_step(state, images, labels, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        aug_key, drop_key = jax.random.split(step_rng)
        x, y = augment_batch(images, labels, aug_key, trainer.mean, trainer.std,
                             dtype=trainer.compute_dtype, train=True)

        def loss_fn(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": drop_key},
            )
            return trainer.loss_fn(logits, y).total, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = trainer.tx.update(grads, state.opt_state, state.params)
        return state.replace(step=state.step + 1, params=optax.apply_updates(state.params, updates),
                             batch_stats=new_stats, opt_state=new_opt), loss

    bare = jax.jit(bare_step, donate_argnames=("state",))
    state2 = trainer._init_state()

    def run_bare(_):
        nonlocal state2
        state2, loss = bare(state2, img, lbl, trainer.base_rng)
        return loss

    t = timeit(run_bare)
    results["train_bs32_nometrics"] = 32 / t
    print(f"train bs32 no-metrics: {32 / t:.1f} img/s ({t * 1e3:.1f} ms)", flush=True)

    # batch scaling
    trainer64, img64, lbl64 = build(64)
    state64 = trainer64.state

    def full64(_):
        nonlocal state64
        state64, m = trainer64.train_step(state64, img64, lbl64, trainer64.base_rng)
        return m["loss"]

    t = timeit(full64, steps=10)
    results["train_bs64"] = 64 / t
    print(f"train bs64: {64 / t:.1f} img/s ({t * 1e3:.1f} ms)", flush=True)

    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()

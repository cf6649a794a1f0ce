"""MAE encoder embedding-export throughput: bf16 vs int8 (one v5e chip).

The serving product of cli/export_embeddings.py — one jit'd
normalize -> patchify -> ViT-B encoder (mask_ratio=0) -> mean-pool program
at the training crop. int8 routes every encoder Dense through the MXU's
int8 path (s2tpu/infer/quantize.py).

Usage: python scripts/bench_embed.py [--int8|--both] [--bs N] [--crop N]
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

from s2tpu.infer.embed import calibrate_encoder_int8, make_embed_fn
from s2tpu.models.prithvi_mae import PrithviConfig, PrithviMAE
from s2tpu.utils import load_prithvi_mean_std, load_prithvi_model_args


def main() -> None:
    bs = int(sys.argv[sys.argv.index("--bs") + 1]) if "--bs" in sys.argv else 32
    crop = int(sys.argv[sys.argv.index("--crop") + 1]) if "--crop" in sys.argv else 224
    modes = ["bf16"]
    if "--int8" in sys.argv:
        modes = ["int8"]
    if "--both" in sys.argv:
        modes = ["bf16", "int8"]

    cfg = PrithviConfig.from_model_args(load_prithvi_model_args(), num_frames=1, img_size=crop)
    model = PrithviMAE(cfg, dtype=jnp.bfloat16)
    raw = jnp.asarray(
        np.random.default_rng(0).integers(0, 4000, size=(bs, crop, crop, 6)).astype(np.int16)
    )
    variables = jax.jit(lambda: model.init(jax.random.key(0), raw[:1, None].astype(jnp.float32), mask_ratio=0.0))()
    params = variables["params"]
    mean, std = (jnp.asarray(v) for v in load_prithvi_mean_std())

    fns = {}
    for mode in modes:
        qstate = None
        if mode == "int8":
            qstate = calibrate_encoder_int8(model, params, mean, std, [np.asarray(raw)])
        fns[mode] = make_embed_fn(model, mean, std, pool="mean", qstate=qstate)

    steps, rounds = 20, 3
    best: dict[str, float] = {}
    for mode, fn in fns.items():  # compile
        float(fn(params, raw).sum())
    for _ in range(rounds):
        for mode, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(steps):
                out = fn(params, raw)
            float(out.sum())  # scalar fetch: relay-safe completion barrier
            dt = time.perf_counter() - t0
            rate = bs * steps / dt
            best[mode] = max(best.get(mode, 0.0), rate)
    for mode, rate in best.items():
        print(f"embed {mode}: crop={crop} bs={bs}  {rate:8.1f} img/s/chip")


if __name__ == "__main__":
    main()

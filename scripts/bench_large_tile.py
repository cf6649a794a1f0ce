"""Large-tile Prithvi segmentation inference: km^2/s at tile 512 vs 224.

Tile 512 -> 32x32 patch grid, L=1025 tokens: the flash-attention Pallas
kernel engages (attention_impl="flash", l>=512). Each 10 m pixel covers
1e-4 km^2.
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

from s2tpu.models.prithvi_mae import PrithviConfig
from s2tpu.models.prithvi_seg import PrithviSegmentationConfig, PrithviSegmentationNet
from s2tpu.utils import load_prithvi_model_args

KM2_PER_PIXEL = 1e-4  # 10 m x 10 m


def bench(tile: int, batch: int, impl: str, int8: bool = False) -> None:
    args = load_prithvi_model_args()
    backbone = PrithviConfig.from_model_args(args, num_frames=1, img_size=tile)
    backbone = type(backbone)(**{**backbone.__dict__, "attention_impl": impl})
    cfg = PrithviSegmentationConfig(
        num_frames=1, num_classes=4, frozen_backbone=False,
        patch_height=tile // 16, patch_width=tile // 16, backbone=backbone,
    )
    model = PrithviSegmentationNet(cfg, dtype=jnp.bfloat16)
    x = jnp.zeros((batch, 1, tile, tile, 6), jnp.bfloat16)
    variables = jax.jit(lambda: model.init(jax.random.key(0), x, train=False))()

    if int8:
        from s2tpu.infer.quantize import (
            collect_input_maxabs, quantize_weights, quantized_apply,
        )

        xc = jnp.asarray(
            np.random.default_rng(0).normal(size=x.shape).astype(np.float32), jnp.bfloat16
        )
        vals = jax.jit(
            lambda v, x: collect_input_maxabs(model, v, x, train=False)
        )(variables, xc)
        scales = {p: float(v) / 127.0 for p, v in vals.items() if float(v) > 0}
        qstate = quantize_weights(variables["params"], scales)
        fwd = jax.jit(
            lambda v, x: jnp.argmax(
                quantized_apply(model, v, qstate, x, train=False), axis=-1
            ).sum()
        )
    else:
        # Reduce to one scalar and fetch it: on the remote-device transport,
        # block_until_ready alone has returned early for dispatch-only graphs.
        fwd = jax.jit(
            lambda v, x: jnp.argmax(model.apply(v, x, train=False), axis=-1).sum()
        )
    _ = int(fwd(variables, x))
    t0 = time.perf_counter()
    steps = 10
    for _ in range(steps):
        out = fwd(variables, x)
    _ = int(out)
    dt = (time.perf_counter() - t0) / steps
    px_per_s = batch * tile * tile / dt
    print(
        f"tile={tile} bs={batch} attn={impl}{' int8' if int8 else ''}: {dt*1e3:7.2f} ms/batch  "
        f"{px_per_s * KM2_PER_PIXEL:8.1f} km^2/s",
        flush=True,
    )


if __name__ == "__main__":
    int8_only = "--int8" in sys.argv
    if not int8_only:
        bench(224, 32, "xla")
        bench(512, 8, "xla")
        bench(512, 8, "flash")
    bench(224, 32, "xla", int8=True)
    bench(512, 8, "flash", int8=True)

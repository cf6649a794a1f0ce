"""Measure AOT-executable serving cold-start vs XLA compilation.

Builds the flagship tiled-inference program (EfficientNet-UNet-B5 predict
over Hann-blended 224-tiles of 512² segments — the serving configuration
from scripts/bench_inference.py), then times:

  compile   jit lower+compile (persistent-cache state reported as found)
  export    serialize + write artifact
  load      deserialize_and_load from the artifact (the cold-replica path)

and verifies the deserialized executable's logits match the jit program.

Run on TPU: python scripts/bench_aot.py
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/s2tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

GROUP, SEG, TILE, OVERLAP, BATCH = 4, 512, 224, 32, 8


def main() -> None:
    from s2tpu.configs import segmentation as cfg_lib
    from s2tpu.infer.tiled import _tiled_logits_impl

    config = cfg_lib.base_config("efficientnet-unet-b5", aoi="at", label_map="osm-multiclass")
    model = config.build_model()
    x0 = jnp.zeros((BATCH, TILE, TILE, 6), jnp.bfloat16)
    variables = jax.jit(lambda: model.init(jax.random.key(0), x0, train=False))()

    def predict_fn(variables, tiles):
        return model.apply(variables, tiles.astype(jnp.bfloat16), train=False)

    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 4000, size=(GROUP, SEG, SEG, 6), dtype=np.int16)
    )
    bound = jax.jit(
        functools.partial(
            _tiled_logits_impl, predict_fn, tile=TILE, stride=TILE - OVERLAP,
            num_classes=config.num_classes, batch_size=BATCH,
        )
    )

    t0 = time.time()
    compiled = bound.lower(variables, images).compile()
    t_compile = time.time() - t0

    path = Path("/tmp/s2tpu_b5_tiled.aot")
    from jax.experimental import serialize_executable as se

    t0 = time.time()
    payload, in_tree, out_tree = se.serialize(compiled)
    t_ser = time.time() - t0

    import pickle

    meta = {"exec_device_ids": [d.id for d in compiled.runtime_executable().local_devices()]}
    path.write_bytes(pickle.dumps({"meta": meta, "payload": payload, "in_tree": in_tree, "out_tree": out_tree}))
    size_mb = path.stat().st_size / 2**20

    t0 = time.time()
    blob = pickle.loads(path.read_bytes())
    by_id = {d.id: d for d in jax.devices()}
    loaded = se.deserialize_and_load(
        blob["payload"], blob["in_tree"], blob["out_tree"],
        execution_devices=[by_id[i] for i in blob["meta"]["exec_device_ids"]],
    )
    t_load = time.time() - t0

    ref = jax.block_until_ready(compiled(variables, images))
    t0 = time.time()
    out = jax.block_until_ready(loaded(variables, images))
    t_run = time.time() - t0
    match = bool(jnp.allclose(ref, out, atol=0, rtol=0))

    print(
        f"compile {t_compile:.2f}s | serialize {t_ser:.2f}s ({size_mb:.1f} MB) | "
        f"deserialize+load {t_load:.2f}s | warm run {t_run:.3f}s | bit-identical: {match}"
    )


if __name__ == "__main__":
    main()

"""AOT executable export/load tests (s2tpu/infer/aot.py).

The reference hides recompilation behind torch.compile's inductor cache
(src/configs/segmentation.py:147-153); the TPU-native serving path ships a
serialized XLA executable next to the checkpoint so a cold replica never
compiles. These tests exercise the artifact roundtrip, every staleness
rejection path (signature, statics, torn file), and the tiled-inference
integration end-to-end on the CPU backend.
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2tpu.infer import aot
from s2tpu.infer.tiled import tiled_predict_many


def _toy_jit():
    return jax.jit(lambda w, x: jnp.tanh(x @ w).sum(axis=-1))


def test_export_load_roundtrip(tmp_path):
    path = tmp_path / "toy.aot"
    w = jnp.ones((8, 4), jnp.float32)
    x = jnp.arange(16, dtype=jnp.float32).reshape(2, 8)
    compiled = aot.export_jitted(path, _toy_jit(), w, x, statics="toy")
    assert path.exists()
    want = np.asarray(compiled(w, x))

    art = aot.load_executable(path, w, x, statics="toy")
    assert art is not None
    assert art.meta["statics"] == "toy"
    np.testing.assert_allclose(np.asarray(art(w, x)), want, rtol=1e-6)


def test_load_rejects_signature_mismatch(tmp_path):
    path = tmp_path / "toy.aot"
    w = jnp.ones((8, 4), jnp.float32)
    x = jnp.ones((2, 8), jnp.float32)
    aot.export_jitted(path, _toy_jit(), w, x, statics="toy")
    # different batch size -> abstract signature differs -> recompile
    assert aot.load_executable(path, w, jnp.ones((3, 8), jnp.float32), statics="toy") is None
    # different dtype
    assert aot.load_executable(path, w, x.astype(jnp.bfloat16), statics="toy") is None
    # different statics string (e.g. another tile size)
    assert aot.load_executable(path, w, x, statics="other") is None


def test_load_survives_torn_or_missing_file(tmp_path):
    missing = tmp_path / "nope.aot"
    assert aot.load_executable(missing, jnp.ones(())) is None
    torn = tmp_path / "torn.aot"
    torn.write_bytes(b"\x00garbage")
    assert aot.load_executable(torn, jnp.ones(())) is None
    # structurally valid pickle but wrong schema
    torn.write_bytes(pickle.dumps({"meta": {}}))
    assert aot.load_executable(torn, jnp.ones(())) is None


def _mean_plus_channel(state, tiles):
    base = tiles.astype(jnp.float32).mean(axis=-1, keepdims=True)
    return base + jnp.arange(3, dtype=jnp.float32)[None, None, None, :]


def test_tiled_predict_aot_cache_matches_and_reloads(tmp_path):
    """aot_cache never changes results — warm or cold, artifact or fallback.

    On CPU some thunks in the tiled program do not survive executable
    serialization ("wrapped_broadcast not found" at dispatch); the loader
    must then fall back to a fresh compile transparently. On TPU the warm
    path deserializes and runs (measured in scripts/bench_aot.py).
    """
    rng = np.random.default_rng(0)
    images = rng.integers(0, 100, size=(2, 96, 96, 2)).astype(np.int16)
    kw = dict(num_classes=3, tile=32, overlap=8, batch_size=4, return_logits=True)

    ref_maps, ref_logits = tiled_predict_many(_mean_plus_channel, None, images, **kw)

    cache = tmp_path / "tiled.aot"
    for _ in range(2):  # cold (export) then warm (load or dispatch-fallback)
        maps, logits = tiled_predict_many(
            _mean_plus_channel, None, images, aot_cache=str(cache), **kw
        )
        assert cache.exists()
        np.testing.assert_array_equal(maps, ref_maps)
        np.testing.assert_allclose(logits, ref_logits, rtol=1e-5, atol=1e-5)


def test_tiled_predict_aot_cache_stale_config_recompiles(tmp_path):
    """A cache written for one tile config must not serve another."""
    rng = np.random.default_rng(1)
    images = rng.integers(0, 100, size=(1, 64, 64, 2)).astype(np.int16)
    cache = tmp_path / "tiled.aot"
    tiled_predict_many(
        _mean_plus_channel, None, images, num_classes=3, tile=32, overlap=8,
        batch_size=4, aot_cache=str(cache),
    )
    # same dynamic signature possible, but statics (tile/stride) differ
    maps, _ = tiled_predict_many(
        _mean_plus_channel, None, images, num_classes=3, tile=32, overlap=16,
        batch_size=4, aot_cache=str(cache),
    )
    ref, _ = tiled_predict_many(
        _mean_plus_channel, None, images, num_classes=3, tile=32, overlap=16, batch_size=4,
    )
    np.testing.assert_array_equal(maps, ref)

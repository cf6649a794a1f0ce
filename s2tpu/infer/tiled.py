"""Tiled sliding-window inference with on-device stitching.

The reference predicts independent 224-crops only (inference_demo.py:32-41 —
"no sliding-window/stitched large-area inference", SURVEY.md §3.5); full
segments and arbitrary AOI mosaics need tiling. This module is the
capability extension named in BASELINE.json's north star: overlapping tiles
are gathered, predicted, and blended entirely on device — one jit'd program
per (image-shape, tile, stride) — with a separable Hann window so seams
average smoothly.

All shapes are static: the tile grid is computed in Python from the image
shape, the gather is a vmapped dynamic_slice, and the scatter-accumulate is
a fori_loop of dynamic_update_slice adds.
"""

from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np


def tile_offsets(size: int, tile: int, stride: int) -> list[int]:
    """Start offsets covering [0, size) with the last tile flush to the edge."""
    if size <= tile:
        return [0]
    offs = list(range(0, size - tile + 1, stride))
    if offs[-1] != size - tile:
        offs.append(size - tile)
    return offs


def hann_window(tile: int, eps: float = 1e-2) -> np.ndarray:
    """Separable 2D Hann blending window (eps floor keeps borders covered)."""
    w = np.hanning(tile + 2)[1:-1].astype(np.float32) + eps
    return np.outer(w, w)


def _tiled_logits_impl(
    predict_fn: typing.Callable,
    state,
    images: jax.Array,
    tile: int,
    stride: int,
    num_classes: int,
    batch_size: int,
) -> jax.Array:
    """(N, H, W, C) or (N, T, H, W, C) rasters -> (N, H, W, K) blended logits.

    Tiles from ALL images form one flat work queue consumed in
    ``batch_size`` chunks, so per-call dispatch and transfer overheads
    amortize across segments. Multi-temporal stacks crop every frame at the
    same (y, x) — ``predict_fn`` sees (B, T, tile, tile, C) and collapses T
    itself (ViT tubelets or stack-time channel folding; trainer._model_input).
    """
    n = images.shape[0]
    h, w = images.shape[-3], images.shape[-2]
    ys = tile_offsets(h, tile, stride)
    xs = tile_offsets(w, tile, stride)
    # (img, y, x) triples for every tile of every image
    coords = jnp.asarray(
        [(i, y, x) for i in range(n) for y in ys for x in xs], jnp.int32
    )
    n_tiles = coords.shape[0]
    pad = (-n_tiles) % batch_size
    coords_p = jnp.concatenate([coords, jnp.zeros((pad, 3), jnp.int32)]) if pad else coords

    window = jnp.asarray(hann_window(tile))

    def gather(c):
        if images.ndim == 5:  # (N, T, H, W, C): same spatial crop in every frame
            return jax.lax.dynamic_slice(
                images,
                (c[0], 0, c[1], c[2], 0),
                (1, images.shape[1], tile, tile, images.shape[-1]),
            )[0]
        return jax.lax.dynamic_slice(
            images, (c[0], c[1], c[2], 0), (1, tile, tile, images.shape[-1])
        )[0]

    acc = jnp.zeros((n, h, w, num_classes), jnp.float32)
    wsum = jnp.zeros((n, h, w, 1), jnp.float32)

    n_batches = coords_p.shape[0] // batch_size

    def body(b, carry):
        acc, wsum = carry
        batch_coords = jax.lax.dynamic_slice(coords_p, (b * batch_size, 0), (batch_size, 3))
        tiles = jax.vmap(gather)(batch_coords)
        logits = predict_fn(state, tiles).astype(jnp.float32)  # (B, t, t, K)

        def scatter(i, carry):
            acc, wsum = carry
            img, y, x = batch_coords[i, 0], batch_coords[i, 1], batch_coords[i, 2]
            tile_idx = b * batch_size + i
            valid = (tile_idx < n_tiles).astype(jnp.float32)
            wl = (logits[i] * window[:, :, None] * valid)[None]
            cur = jax.lax.dynamic_slice(acc, (img, y, x, 0), (1, tile, tile, num_classes))
            acc = jax.lax.dynamic_update_slice(acc, cur + wl, (img, y, x, 0))
            curw = jax.lax.dynamic_slice(wsum, (img, y, x, 0), (1, tile, tile, 1))
            wsum = jax.lax.dynamic_update_slice(
                wsum, curw + (window[:, :, None] * valid)[None], (img, y, x, 0)
            )
            return acc, wsum

        return jax.lax.fori_loop(0, batch_size, scatter, (acc, wsum))

    acc, wsum = jax.lax.fori_loop(0, n_batches, body, (acc, wsum))
    return acc / jnp.maximum(wsum, 1e-9)


_tiled_logits = functools.partial(
    jax.jit, static_argnames=("predict_fn", "tile", "stride", "num_classes", "batch_size")
)(_tiled_logits_impl)


def _aot_tiled_logits(
    aot_cache: str,
    predict_fn: typing.Callable,
    state,
    images: jax.Array,
    tile: int,
    stride: int,
    num_classes: int,
    batch_size: int,
) -> jax.Array:
    """Run the tiled program through a serialized-executable cache.

    First call per (config, signature) compiles once and writes the
    artifact; subsequent processes deserialize instead of compiling (the
    serving cold-start path — see s2tpu/infer/aot.py).
    """
    from s2tpu.infer import aot as aot_lib

    statics = (
        f"tiled_logits:{getattr(predict_fn, '__qualname__', repr(predict_fn))}"
        f":t{tile}:s{stride}:K{num_classes}:b{batch_size}"
    )
    art = aot_lib.load_executable(aot_cache, state, images, statics=statics)
    if art is not None:
        try:
            # block so a dispatch-time failure (e.g. XLA:CPU thunks that do
            # not survive serialization) surfaces here, not at the caller's
            # first np.asarray — then fall through to a fresh compile.
            return jax.block_until_ready(art(state, images))
        except Exception as exc:
            aot_lib.logger.info(
                "AOT artifact %s failed at dispatch (%s) — recompiling", aot_cache, exc
            )
    bound = jax.jit(
        functools.partial(
            _tiled_logits_impl,
            predict_fn,
            tile=tile,
            stride=stride,
            num_classes=num_classes,
            batch_size=batch_size,
        )
    )
    art = aot_lib.export_jitted(aot_cache, bound, state, images, statics=statics)
    return art(state, images)


def multihost_segment_slice(
    indices: typing.Sequence[int], n_proc: int | None = None, index: int | None = None
) -> list[int]:
    """Per-process segment assignment for multi-host tiled serving.

    Serving needs no collectives, so the DCN extension is host-level data
    decomposition: each process serves ``indices[process_index ::
    process_count]`` on its own addressable chips (a LOCAL mesh — no
    cross-host program) and writes its own output files. Segment-id-keyed
    filenames make concurrent writers conflict-free, and the union of files
    over processes is exactly the single-host output set
    (tests/test_multihost.py::test_two_process_tiled_serving). Round-robin
    keeps the per-host load balanced for any process count.
    """
    n_proc = jax.process_count() if n_proc is None else n_proc
    index = jax.process_index() if index is None else index
    return list(indices)[index::n_proc]


def tiled_predict(
    predict_fn: typing.Callable,
    state,
    image: np.ndarray | jax.Array,
    num_classes: int,
    tile: int = 224,
    overlap: int = 32,
    batch_size: int = 8,
    return_logits: bool = False,
) -> tuple[np.ndarray, np.ndarray | None]:
    """Predict a full (H, W, C) or (T, H, W, C) raster -> (class_map, logits?).

    ``predict_fn(state, tiles)`` maps (B, [T,] tile, tile, C) raw-DN tiles to
    (B, tile, tile, K) logits (e.g. SegmentationTrainer.predict_step).

    The blended logits stay on device unless ``return_logits`` — the argmax
    class map is K·4 bytes/px smaller, which matters when device→host
    bandwidth is the bottleneck (remote TPUs).
    """
    class_maps, logits = tiled_predict_many(
        predict_fn, state, jnp.asarray(image)[None], num_classes, tile, overlap,
        batch_size, return_logits,
    )
    return class_maps[0], (logits[0] if logits is not None else None)


def tiled_predict_many(
    predict_fn: typing.Callable,
    state,
    images: np.ndarray | jax.Array,
    num_classes: int,
    tile: int = 224,
    overlap: int = 32,
    batch_size: int = 8,
    return_logits: bool = False,
    aot_cache: str | None = None,
    mesh=None,
    data_axis: str | None = None,
) -> tuple[np.ndarray, np.ndarray | None]:
    """Batched tiled prediction over (N, H, W, C) or (N, T, H, W, C) rasters.

    Tiles from all N segments share one prediction queue — use this for
    whole-AOI inference so fixed per-call costs amortize. ``aot_cache``
    names a serialized-executable artifact: matching processes deserialize
    it (~ms) instead of compiling (minutes through a remote relay).

    ``mesh`` enables multi-chip serving: segments are sharded over the
    mesh's ``data_axis`` (state replicated) and every chip runs its own
    independent tile queue under one ``shard_map`` — embarrassingly
    parallel, zero collectives. N is zero-padded to a device multiple.
    """
    images = jnp.asarray(images)
    stride = tile - overlap
    n = images.shape[0]
    if data_axis is None:
        from s2tpu.parallel.mesh import DATA_AXIS as data_axis  # noqa: PLW0127
    if mesh is not None and mesh.shape.get(data_axis, 1) > 1:
        assert aot_cache is None, "aot_cache is a single-program path; use it per-host"
        d = mesh.shape[data_axis]
        pad = (-n) % d
        if pad:
            images = jnp.concatenate([images, jnp.zeros((pad,) + images.shape[1:], images.dtype)])
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec_state = jax.tree_util.tree_map(lambda _: P(), state)
        sharded = jax.jit(
            jax.shard_map(
                lambda st, imgs: _tiled_logits_impl(
                    predict_fn, st, imgs, tile, stride, num_classes, batch_size
                ),
                mesh=mesh,
                in_specs=(spec_state, P(data_axis)),
                out_specs=P(data_axis),
                check_vma=False,
            )
        )
        logits = sharded(
            jax.device_put(state, NamedSharding(mesh, P())),
            jax.device_put(images, NamedSharding(mesh, P(data_axis))),
        )[:n]
    elif aot_cache:
        logits = _aot_tiled_logits(
            aot_cache, predict_fn, state, images, tile, stride, num_classes, batch_size
        )
    else:
        logits = _tiled_logits(
            predict_fn, state, images, tile, stride, num_classes, batch_size
        )
    class_maps = np.asarray(jnp.argmax(logits, axis=-1).astype(jnp.uint8))
    return class_maps, (np.asarray(logits) if return_logits else None)

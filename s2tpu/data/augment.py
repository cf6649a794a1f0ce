"""On-device augmentation + normalization, fused into the jit'd train step.

The reference augments per-item on CPU workers with albumentations
(s2osm_datamodule.py:75-87). Here the host only slices raw int16 crops out of
the memmap; flips and normalization run on the TPU inside the same XLA
program as the forward pass, keyed by explicit `jax.random` keys — zero extra
HBM round-trips (XLA fuses normalize into the first conv's input) and exact
reproducibility under data parallelism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def random_crop_indices(
    rng: np.random.Generator, n: int, src_hw: tuple[int, int], crop: int
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side random crop offsets (crop happens on the host memmap slice)."""
    ys = rng.integers(0, src_hw[0] - crop + 1, size=n)
    xs = rng.integers(0, src_hw[1] - crop + 1, size=n)
    return ys, xs


def center_crop_offset(src_hw: tuple[int, int], crop: int) -> tuple[int, int]:
    return (src_hw[0] - crop) // 2, (src_hw[1] - crop) // 2


def pack_s2d_flat(images: jax.Array) -> jax.Array:
    """(B, 2H, 2W, C) -> (B, H, W, 4C) space-to-depth, phase-major.

    Feeding the UNet this layout keeps every full-resolution tensor off the
    device's narrow-channel (lane-padded) layouts — the raw 6-band raster
    pads 6 -> 128 lanes (21x memory waste) in channels-last form.
    """
    b, h2, w2, c = images.shape
    h, w = h2 // 2, w2 // 2
    x = images.reshape(b, h, 2, w, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, 4 * c)


def normalize(
    images: jax.Array, mean: jax.Array, std: jax.Array, dtype=jnp.bfloat16, s2d: bool = False
) -> jax.Array:
    """(B, H, W, C) raw DN -> standardized compute-dtype activations.

    s2d packs to (B, H/2, W/2, 4C) BEFORE the float conversion so the wide
    normalize/cast passes run on the lane-friendly layout."""
    if s2d:
        images = pack_s2d_flat(images)
        mean = jnp.tile(mean, 4)
        std = jnp.tile(std, 4)
    x = images.astype(jnp.float32)
    x = (x - mean.astype(jnp.float32)) / std.astype(jnp.float32)
    return x.astype(dtype)


def random_flips(
    images: jax.Array,
    labels: jax.Array | None,
    key: jax.Array,
    p_horizontal: float = 0.5,
    p_vertical: float = 0.5,
) -> tuple[jax.Array, jax.Array | None]:
    """Per-sample H/V flips on (B, [T,] H, W, C) images (+ (B, H, W) labels).

    Implemented as `where(flip, reversed, original)` — a static-shape select
    XLA lowers to a cheap fused gather, no data-dependent control flow. The
    spatial axes are the last three (H, W, C), so multi-temporal (B, T, H,
    W, C) batches flip all frames of a sample consistently.
    """
    kh, kv = jax.random.split(key)
    b = images.shape[0]
    bshape = (b,) + (1,) * (images.ndim - 1)
    do_h = jax.random.uniform(kh, bshape) < p_horizontal
    do_v = jax.random.uniform(kv, bshape) < p_vertical
    flip_w = images[..., :, ::-1, :]
    flip_h = lambda x: jnp.flip(x, axis=-3)  # noqa: E731
    images = jnp.where(do_h, flip_w, images)
    images = jnp.where(do_v, flip_h(images), images)
    if labels is not None:
        lshape = (b,) + (1,) * (labels.ndim - 1)
        lh = do_h.reshape(lshape)
        lv = do_v.reshape(lshape)
        labels = jnp.where(lh, labels[..., :, ::-1], labels)
        labels = jnp.where(lv, jnp.flip(labels, axis=-2), labels)
    return images, labels


def augment_batch(
    images: jax.Array,
    labels: jax.Array | None,
    key: jax.Array,
    mean: jax.Array,
    std: jax.Array,
    p_horizontal: float = 0.5,
    p_vertical: float = 0.5,
    dtype=jnp.bfloat16,
    train: bool = True,
    s2d: bool = False,
) -> tuple[jax.Array, jax.Array | None]:
    """Full on-device transform: flips (train only), then (optionally
    space-to-depth-packed) normalize."""
    if train:
        images, labels = random_flips(images, labels, key, p_horizontal, p_vertical)
    return normalize(images, mean, std, dtype=dtype, s2d=s2d), labels

"""Isolated corpus crop-gather bench (VERDICT r3 item #1).

The device-corpus train step gathers B random (crop, crop) windows from the
(N, H, W, C) int16 HBM corpus each step via vmap-of-dynamic_slice
(trainer.py corpus_gather). r3 bucket attribution charged ~15 ms/step to
this gather inside the fused K-step program — ~100x its memory bound
(19 MB/step at 819 GB/s = 0.023 ms). This bench times the gather ALONE in a
K-iteration lax.scan (one dispatch, chained carry, scalar fetch) so relay
dispatch latency cannot pollute per-step numbers, and compares layouts:

  A  current: vmap dynamic_slice at (i, y, x, 0) -> (B,crop,crop,C)
  B  row-slab: vmap dynamic_slice at (i, y, 0, 0) -> (B,crop,W,C), then
     vmap dynamic_slice x on the slab
  C  take-then-crop: corpus[idx] (leading-axis gather) then (y,x) slices
  D  flat-lane slab: corpus viewed (N, H, W*C); slab at (i, y, 0) with full
     lanes, reshape, then x-crop
  n  no-gather control (scan overhead + consume cost)

Each variant's scan body consumes the crops with a cheap sum into the carry
(prevents DCE; the sum reads the same bytes the train step would).

Env: K (scan length, default 50), N (corpus segments, default 64),
REPS (timed dispatches, default 5).
"""

import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/s2tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = int(os.environ.get("B", "32"))
CROP = int(os.environ.get("CROP", "224"))
HW = 256
C = 6
K = int(os.environ.get("K", "50"))
N = int(os.environ.get("N", "64"))
REPS = int(os.environ.get("REPS", "5"))


def gather_a(images, labels, i, y, x):
    def one(i, y, x):
        img = jax.lax.dynamic_slice(images, (i, y, x, 0), (1, CROP, CROP, C))[0]
        lbl = jax.lax.dynamic_slice(labels, (i, y, x), (1, CROP, CROP))[0]
        return img, lbl

    return jax.vmap(one)(i, y, x)


def gather_b(images, labels, i, y, x):
    def slab(i, y):
        img = jax.lax.dynamic_slice(images, (i, y, 0, 0), (1, CROP, HW, C))[0]
        lbl = jax.lax.dynamic_slice(labels, (i, y, 0), (1, CROP, HW))[0]
        return img, lbl

    imgs, lbls = jax.vmap(slab)(i, y)

    def crop_x(img, lbl, x):
        return (
            jax.lax.dynamic_slice(img, (0, x, 0), (CROP, CROP, C)),
            jax.lax.dynamic_slice(lbl, (0, x), (CROP, CROP)),
        )

    return jax.vmap(crop_x)(imgs, lbls, x)


def gather_c(images, labels, i, y, x):
    imgs = jnp.take(images, i, axis=0)
    lbls = jnp.take(labels, i, axis=0)

    def crop(img, lbl, y, x):
        return (
            jax.lax.dynamic_slice(img, (y, x, 0), (CROP, CROP, C)),
            jax.lax.dynamic_slice(lbl, (y, x), (CROP, CROP)),
        )

    return jax.vmap(crop)(imgs, lbls, y, x)


def gather_d(images, labels, i, y, x):
    flat = images.reshape(N, HW, HW * C)

    def slab(i, y):
        img = jax.lax.dynamic_slice(flat, (i, y, 0), (1, CROP, HW * C))[0]
        lbl = jax.lax.dynamic_slice(labels, (i, y, 0), (1, CROP, HW))[0]
        return img, lbl

    imgs, lbls = jax.vmap(slab)(i, y)
    imgs = imgs.reshape(B, CROP, HW, C)

    def crop_x(img, lbl, x):
        return (
            jax.lax.dynamic_slice(img, (0, x, 0), (CROP, CROP, C)),
            jax.lax.dynamic_slice(lbl, (0, x), (CROP, CROP)),
        )

    return jax.vmap(crop_x)(imgs, lbls, x)


def make_prog(gather):
    @jax.jit
    def prog(images, labels, idx, ys, xs):
        def body(carry, per):
            i, y, x = per
            if gather is None:
                return carry + jnp.sum(i), None
            img, lbl = gather(images, labels, i, y, x)
            return carry + jnp.sum(img.astype(jnp.int32)) + jnp.sum(lbl), None

        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), (idx, ys, xs))
        return out

    return prog


def main() -> None:
    rng = np.random.default_rng(0)
    images = jax.device_put(rng.integers(0, 4000, size=(N, HW, HW, C), dtype=np.int16))
    labels = jax.device_put(rng.integers(0, 4, size=(N, HW, HW)).astype(np.int32))
    idx = rng.integers(0, N, size=(K, B)).astype(np.int32)
    ys = rng.integers(0, HW - CROP + 1, size=(K, B)).astype(np.int32)
    xs = rng.integers(0, HW - CROP + 1, size=(K, B)).astype(np.int32)

    variants = {
        "none": None,
        "A vmap dslice (i,y,x)": gather_a,
        "B row-slab then x-crop": gather_b,
        "C take[i] then (y,x)": gather_c,
        "D flat-lane slab": gather_d,
    }
    base = None
    for name, g in variants.items():
        prog = make_prog(g)
        out = int(prog(images, labels, idx, ys, xs))  # compile + run
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = int(prog(images, labels, idx, ys, xs))
            times.append(time.perf_counter() - t0)
        per_step = min(times) / K * 1e3
        if name == "none":
            base = per_step
            print(f"{name:26s} {per_step:8.3f} ms/step  (control, checksum {out})")
        else:
            print(f"{name:26s} {per_step:8.3f} ms/step  (net {per_step - base:7.3f} ms)")


if __name__ == "__main__":
    main()

"""Pallas TPU depthwise convolution with custom VJP.

Profiling the B5-UNet train step (scripts/perf_probe.py + xprof) shows XLA's
grouped-convolution lowering of depthwise layers is the single hottest item:
~18.5 ms/step backward + 5 ms forward of a 113 ms step. A depthwise conv is
not a matmul at all — it is k² shifted elementwise multiply-adds per
channel — so the MXU path XLA picks is the wrong tool. This kernel computes
it directly on the VPU with channels on the lane dimension:

  forward:   out[y,x,c] = Σ_taps w[dy,dx,c] · in[y+dy, x+dx, c]
  d_input:   correlate cotangent with the spatially-flipped kernel
  d_weight:  per-tap elementwise product reduced over (y,x), batched per
             image, summed over batch outside the kernel

Stride-1 SAME convolutions only (34 of 39 MBConv blocks in B5); stride-2
layers fall back to lax.conv. Channels are processed in 128-lane tiles; the
grid is (batch, channel-tiles) and each program holds one padded (H+k-1,
W+k-1, 128) input block in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _fwd_kernel(x_ref, w_ref, o_ref, *, k: int, h: int, w: int):
    """x: (1, h+k-1, w+k-1, C) padded; w: (k*k, C); o: (1, h, w, C)."""
    acc = jnp.zeros((h, w, x_ref.shape[-1]), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            tap = w_ref[dy * k + dx, :].astype(jnp.float32)  # (C,)
            window = x_ref[0, dy : dy + h, dx : dx + w, :].astype(jnp.float32)
            acc += window * tap[None, None, :]
    o_ref[0] = acc.astype(o_ref.dtype)


def _dw_kernel(x_ref, g_ref, dw_ref, *, k: int, h: int, w: int):
    """Per-image filter gradient: dw[tap, c] = Σ_{y,x} g[y,x,c]·x[y+dy,x+dx,c]."""
    g = g_ref[0].astype(jnp.float32)  # (h, w, C)
    for dy in range(k):
        for dx in range(k):
            window = x_ref[0, dy : dy + h, dx : dx + w, :].astype(jnp.float32)
            dw_ref[0, dy * k + dx, :] = (g * window).sum(axis=(0, 1))


def _pad_channels(x: jax.Array) -> tuple[jax.Array, int]:
    c = x.shape[-1]
    pad = (-c) % LANE
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x, c


def _same_pad(x: jax.Array, k: int) -> jax.Array:
    """TF-style SAME padding for stride 1: (k-1)//2 before, k//2 after."""
    lo, hi = (k - 1) // 2, k // 2
    return jnp.pad(x, [(0, 0), (lo, hi), (lo, hi), (0, 0)])


def _forward(x: jax.Array, w: jax.Array, interpret: bool) -> jax.Array:
    b, h, wd, _ = x.shape
    k = w.shape[0]
    xp, c_real = _pad_channels(_same_pad(x, k))
    wp, _ = _pad_channels(w.reshape(k * k, -1))
    c = xp.shape[-1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, h=h, w=wd),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, c), x.dtype),
        grid=(b, c // LANE),
        in_specs=[
            pl.BlockSpec(
                (1, h + k - 1, wd + k - 1, LANE), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((k * k, LANE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wd, LANE), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, wp)
    return out[..., :c_real]


def _grad_weight(x: jax.Array, g: jax.Array, k: int, interpret: bool) -> jax.Array:
    b, h, wd, _ = x.shape
    xp, c_real = _pad_channels(_same_pad(x, k))
    gp, _ = _pad_channels(g)
    c = xp.shape[-1]
    partials = pl.pallas_call(
        functools.partial(_dw_kernel, k=k, h=h, w=wd),
        out_shape=jax.ShapeDtypeStruct((b, k * k, c), jnp.float32),
        grid=(b, c // LANE),
        in_specs=[
            pl.BlockSpec(
                (1, h + k - 1, wd + k - 1, LANE), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, h, wd, LANE), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k * k, LANE), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, gp)
    return partials.sum(axis=0)[:, :c_real].reshape(k, k, c_real)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise_conv2d_s1(x: jax.Array, w: jax.Array, interpret: bool = False) -> jax.Array:
    """Stride-1 SAME depthwise conv: (B, H, W, C) · (k, k, C) -> (B, H, W, C)."""
    return _forward(x, w, interpret)


def _vjp_fwd(x, w, interpret):
    return _forward(x, w, interpret), (x, w)


def _vjp_bwd(interpret, residuals, g):
    x, w = residuals
    k = w.shape[0]
    # d_input: correlate g with the spatially flipped kernel (still SAME/s1
    # because flipping swaps the lo/hi SAME padding for even kernels; for
    # odd k — all EfficientNet kernels — padding is symmetric).
    w_flip = w[::-1, ::-1, :]
    dx = _forward(g, w_flip, interpret).astype(x.dtype)
    dw = _grad_weight(x, g, k, interpret).astype(w.dtype)
    return dx, dw


depthwise_conv2d_s1.defvjp(_vjp_fwd, _vjp_bwd)


def _lax_depthwise(x: jax.Array, w: jax.Array, stride: int) -> jax.Array:
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x,
        w[:, :, None, :],
        (stride, stride),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def depthwise_conv2d(
    x: jax.Array, w: jax.Array, stride: int = 1, interpret: bool | None = None
) -> jax.Array:
    """Depthwise conv dispatch.

    ``w`` is (k, k, C) — one filter per channel (HWC layout; equivalent to
    flax's (k, k, 1, C) grouped kernel squeezed). On TPU, stride-1 layers
    run the Pallas kernel; stride-2 layers and non-TPU backends use the
    standard lax lowering (pass ``interpret=True`` to force the Pallas
    kernel through the interpreter, e.g. in tests).
    """
    if interpret is None:
        if jax.default_backend() != "tpu":
            return _lax_depthwise(x, w, stride)
        interpret = False
    if stride == 1:
        return depthwise_conv2d_s1(x, w, interpret)
    return _lax_depthwise(x, w, stride)

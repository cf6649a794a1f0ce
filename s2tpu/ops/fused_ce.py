"""Pallas fused weighted/focal cross-entropy over per-pixel logits.

The TPU analogue of the fused loss the reference gets implicitly from
torch.compile (SURVEY.md §2 native-code statement): one kernel pass computes
max/log-sum-exp, the label gather (as a one-hot dot — no scatter/gather
serialization on TPU), the class-weight lookup, the ignore-index mask, and
optionally the focal modulation — per-pixel loss and weight come out without
ever materializing log-softmax in HBM. The custom VJP computes
``w * (softmax - onehot)`` (CE) or the focal chain-rule product in a second
kernel, again without HBM round-trips.

Reduction to the torch-semantics weighted mean (sum(w*ce)/sum(w)) or the
focal plain mean happens outside in XLA (two scalars).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 1024


def _fwd_kernel(logits_ref, labels_ref, weights_ref, loss_ref, w_ref, *, ignore_index, gamma):
    logits = logits_ref[:].astype(jnp.float32)  # (BN, K)
    labels = labels_ref[:]  # (BN, 1)
    k = logits.shape[1]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) == labels).astype(jnp.float32)
    m = logits.max(axis=1, keepdims=True)
    lse = m + jnp.log(jnp.exp(logits - m).sum(axis=1, keepdims=True))
    picked = (logits * onehot).sum(axis=1, keepdims=True)
    ce = (lse - picked)[:, 0]  # (BN,)
    class_w = weights_ref[0]  # (K,)
    w = (onehot * class_w[None, :]).sum(axis=1)
    valid = jnp.ones(ce.shape, jnp.float32)
    if ignore_index is not None:
        valid = (labels[:, 0] != ignore_index).astype(jnp.float32)
    if gamma is not None:
        ce_v = ce * valid  # torch: ignored pixels have ce=0 before modulation
        pt = jnp.exp(-ce_v)
        loss_ref[:] = (w * (1.0 - pt) ** gamma * ce_v)[:, None]
        w_ref[:] = valid[:, None]
    else:
        loss_ref[:] = (ce * w * valid)[:, None]
        w_ref[:] = (w * valid)[:, None]


def _bwd_kernel(logits_ref, labels_ref, weights_ref, g_ref, dlogits_ref, *, ignore_index, gamma):
    logits = logits_ref[:].astype(jnp.float32)
    labels = labels_ref[:]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) == labels).astype(jnp.float32)
    m = logits.max(axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / e.sum(axis=1, keepdims=True)  # softmax
    class_w = weights_ref[0]
    w = (onehot * class_w[None, :]).sum(axis=1, keepdims=True)
    valid = jnp.ones((logits.shape[0], 1), jnp.float32)
    if ignore_index is not None:
        valid = (labels != ignore_index).astype(jnp.float32)
    dce = p - onehot  # d(ce)/d(logits)
    if gamma is not None:
        lse = m + jnp.log(e.sum(axis=1, keepdims=True))
        ce = ((lse - (logits * onehot).sum(axis=1, keepdims=True))) * valid
        pt = jnp.exp(-ce)
        one_minus = 1.0 - pt
        # d/d(ce) [ w * (1-pt)^g * ce ], pt = exp(-ce)
        dfocal_dce = w * (one_minus**gamma + gamma * one_minus ** (gamma - 1.0) * pt * ce)
        scale = dfocal_dce * valid
    else:
        scale = w * valid
    dlogits_ref[:] = (g_ref[0, 0] * scale * dce).astype(dlogits_ref.dtype)


def _pad_rows(x, multiple):
    pad = (-x.shape[0]) % multiple
    if pad:
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, widths)
    return x


def _run_fwd(logits2d, labels2d, weights, ignore_index, gamma, interpret):
    n, k = logits2d.shape
    grid = (n // BLOCK_N,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, ignore_index=ignore_index, gamma=gamma),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_N, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(logits2d, labels2d, weights)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_ce_per_pixel(logits, labels, class_weights, ignore_index=None, gamma=None, interpret=None):
    """Per-pixel fused CE/focal: (..., K) logits, (...) labels ->
    (loss_flat, weight_flat) over padded flattened pixels.

    CE mode (gamma=None): loss = w_y * ce, weight = w_y (masked); the
    weighted mean is loss.sum()/weight.sum().
    Focal mode: loss = alpha_y * (1-pt)^gamma * ce (masked), weight = valid;
    the torch-parity mean is loss.sum()/total_pixel_count.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = logits.shape[-1]
    l2 = _pad_rows(logits.reshape(-1, k), BLOCK_N)
    lab2 = _pad_rows(labels.reshape(-1, 1).astype(jnp.int32), BLOCK_N)
    if ignore_index is None:
        # padding rows must not contribute: route them through label 0 w/ weight of label 0
        pass
    w = jnp.asarray(class_weights, jnp.float32).reshape(1, -1)
    loss, weight = _run_fwd(l2, lab2, w, ignore_index, gamma, interpret)
    loss, weight = loss[:, 0], weight[:, 0]
    n_real = logits.reshape(-1, k).shape[0]
    row_valid = jnp.arange(loss.shape[0]) < n_real
    return loss * row_valid, weight * row_valid


def _vjp_fwd(logits, labels, class_weights, ignore_index, gamma, interpret):
    out = fused_ce_per_pixel(logits, labels, class_weights, ignore_index, gamma, interpret)
    return out, (logits, labels, class_weights)


def _vjp_bwd(ignore_index, gamma, interpret, residuals, cotangents):
    logits, labels, class_weights = residuals
    g_loss, _g_weight = cotangents  # weight output treated as non-differentiable
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = logits.shape[-1]
    l2 = _pad_rows(logits.reshape(-1, k), BLOCK_N)
    lab2 = _pad_rows(labels.reshape(-1, 1).astype(jnp.int32), BLOCK_N)
    w = jnp.asarray(class_weights, jnp.float32).reshape(1, -1)
    # Upstream cotangent is uniform when the caller reduces with sum/mean —
    # take the first element (documented contract: reduce with a scalar op).
    g_scalar = g_loss.reshape(-1)[0].reshape(1, 1)
    n = l2.shape[0]
    dlogits = pl.pallas_call(
        functools.partial(_bwd_kernel, ignore_index=ignore_index, gamma=gamma),
        out_shape=jax.ShapeDtypeStruct((n, k), logits.dtype),
        grid=(n // BLOCK_N,),
        in_specs=[
            pl.BlockSpec((BLOCK_N, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_N, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(l2, lab2, w, g_scalar)
    n_real = logits.reshape(-1, k).shape[0]
    dlogits = dlogits[:n_real].reshape(logits.shape)
    return dlogits, None, None


fused_ce_per_pixel.defvjp(_vjp_fwd, _vjp_bwd)


def fused_cross_entropy(
    logits, labels, class_weights=None, ignore_index=None, interpret=None
):
    """Weighted masked mean CE with torch semantics (drop-in for
    s2tpu.train.losses.cross_entropy on the hot path, label_smoothing=0)."""
    k = logits.shape[-1]
    cw = class_weights if class_weights is not None else jnp.ones((k,), jnp.float32)
    loss, weight = fused_ce_per_pixel(logits, labels, cw, ignore_index, None, interpret)
    return loss.sum() / jnp.maximum(weight.sum(), 1e-12)


def fused_focal_loss(
    logits, labels, alpha, gamma, ignore_index=None, interpret=None
):
    """Focal loss with torch-parity mean over all (unmasked-count) pixels."""
    loss, _ = fused_ce_per_pixel(logits, labels, alpha, ignore_index, gamma, interpret)
    n_real = 1
    for s in labels.shape:
        n_real *= s
    return loss.sum() / n_real

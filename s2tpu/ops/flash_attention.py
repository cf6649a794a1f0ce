"""Pallas TPU flash attention (non-causal, MAE/ViT-shaped).

The reference's attention lives inside timm's ViT Block and materializes the
full (L, L) score matrix. At the Prithvi training length (L=197) XLA's fused
``jax.nn.dot_product_attention`` is already optimal, so that remains the
training path (models/prithvi_mae.py). This kernel is the long-sequence
path — large-tile inference, where L = (tile/16)^2 * T tokens grows into the
thousands and the O(L^2) score matrix stops fitting in VMEM.

Design (one program per (batch*heads, q-block)):
  * online-softmax streaming over key blocks — running max m, normalizer l,
    and accumulator acc are carried through a fori_loop, so VMEM holds only
    (BQ, BK) scores at a time;
  * q@k^T and p@v both hit the MXU with preferred f32 accumulation;
  * sequence is padded to the block size with -inf masking on padded keys.

Backward uses a custom VJP that recomputes standard attention under XLA —
training at L~200 never routes here, and the inference path needs no grad.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, seq_len: int):
    """One q-block against all k/v blocks with online softmax.

    q_ref: (1, BQ, D); k_ref/v_ref: (1, L_pad, D); o_ref: (1, BQ, D).
    """
    q = q_ref[0].astype(jnp.float32) * scale  # (BQ, D)
    bq = q.shape[0]
    d = q.shape[1]
    l_pad = k_ref.shape[1]
    num_kb = l_pad // block_k

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)  # (BK, D)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK)
        # mask out padded keys
        key_ids = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        s = jnp.where(key_ids < seq_len, s, NEG_INF)
        m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    _, l_fin, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_forward(
    q: jax.Array, k: jax.Array, v: jax.Array, block_q: int, block_k: int, interpret: bool
) -> jax.Array:
    b, l, h, d = q.shape
    scale = 1.0 / (d**0.5)
    # (B, L, H, D) -> (B*H, L_pad, D)
    def fold(x):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, l, d)
        return _pad_to(x, 1, max(block_q, block_k))

    qf, kf, vf = fold(q), fold(k), fold(v)
    l_pad = qf.shape[1]
    grid = (b * h, l_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k, seq_len=l),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :l, :].reshape(b, h, l, d).transpose(0, 2, 1, 3)


def _reference_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """XLA attention on (B, L, H, D) — backward path + numerics oracle."""
    d = q.shape[-1]
    s = jnp.einsum("blhd,bmhd->bhlm", q.astype(jnp.float32), k.astype(jnp.float32)) / (d**0.5)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhlm,bmhd->blhd", p, v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool | None = None,
) -> jax.Array:
    """(B, L, H, D) q/k/v -> (B, L, H, D) attention output."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash_forward(q, k, v, block_q, block_k, interpret)


def _fwd(q, k, v, block_q, block_k, interpret):
    return flash_attention(q, k, v, block_q, block_k, interpret), (q, k, v)


def _bwd(block_q, block_k, interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(_reference_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused short-sequence attention (training path, Pallas fwd + bwd)
# ---------------------------------------------------------------------------
# At MAE training lengths (L=50 encoder, L=197 decoder) XLA's attention
# materializes the (B, H, L, L) probabilities in f32 HBM — measured 23 ms of
# the 62.75 ms Prithvi-MAE step on v5e (decoder softmax 8 ms as 'sub' +
# scores/AV matmuls 15 ms; scripts/profile_mae.py). The score matrix for one
# head is tiny (≤1024² f32 = 4 MB), so instead of streaming-flash we run ONE
# program per (batch item, head-group) that keeps q, k, v, scores entirely in
# VMEM: fwd = qk^T → softmax → pv with zero HBM traffic for the
# probabilities, and bwd recomputes p in VMEM and emits dq/dk/dv with plain
# MXU matmuls.
#
# Two measured design rules (first version was 1.2x SLOWER than XLA):
#   * operate on the model's native (B, L, H, D) layout — gridding over
#     (B, H/G) with full-L blocks removes ALL wrapper ops (the fold/unfold
#     transpose+pad+slice around a (B*H, L_pad, D) kernel cost ~14 ms/step);
#   * matmuls run in the INPUT dtype (bf16) with f32 accumulation via
#     preferred_element_type — upcasting inputs to f32 first forced the MXU
#     onto its f32 path (~8x slower).
# No padding masks needed: blocks span exactly L, and Mosaic's internal tile
# padding never enters the softmax reductions.

DEFAULT_HEAD_GROUP = 8
FUSED_MAX_LEN = 1024  # beyond this the score matrix stops being VMEM-friendly
FUSED_MIN_LEN = 128  # below this XLA's materialized softmax is already cheap
# Mosaic's default scoped-vmem budget per program; kernels whose estimated
# footprint exceeds ~85% of it must route to the streaming kernel instead.
SCOPED_VMEM_LIMIT = 16 * 1024 * 1024


def fused_fits_vmem(l: int, dim: int, num_heads: int) -> bool:  # noqa: ARG001
    """Whether the fused (whole-score-matrix-in-VMEM) kernels fit Mosaic's
    scoped-vmem budget at this geometry. The binding constraint is the
    BACKWARD dense kernel, one program per batch item:

    - pipelined block buffers, double-buffered bf16: qkv in (L, 3D), dqkv
      out (L, 3D), o + do in (L, D) each -> 2 * 2B * L * 8D = 32*L*D bytes;
    - f32 score-shaped scratch live concurrently (s, p, dp, ds) plus the
      bf16 p cast -> ~18*L*L bytes.

    At the Prithvi T=4 decoder (L=785, D=512) this predicts 24.0 MB — the
    exact scoped-vmem OOM Mosaic reported (24.27M vs the 16M limit); at the
    T=1 decoder (L=197) it is 3.9 MB. Callers should fall back to
    `flash_attention` (streaming, O(L) VMEM) when this returns False."""
    blocks = 32 * l * dim
    scratch = 18 * l * l
    return blocks + scratch <= int(SCOPED_VMEM_LIMIT * 0.85)


def _fused_fwd_kernel(qkv_ref, o_ref, *, scale: float):
    """qkv_ref: (3, 1, H, L, D) packed; o_ref: (1, H, L, D). One program per
    BATCH ITEM with a static unroll over heads — a per-(batch, head) grid
    measured ~5 us/program of dispatch latency (1024 programs dwarfed the
    actual math); 64 programs amortize it 16x. All slices are leading-dim
    squeezes (Mosaic supports those; a unit dim between the sublane and lane
    dims does not lower)."""
    for i in range(qkv_ref.shape[2]):
        q = qkv_ref[0, 0, i]  # (L, D), input dtype
        k = qkv_ref[1, 0, i]
        v = qkv_ref[2, 0, i]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (L, L) f32
        m = s.max(axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / p.sum(axis=-1, keepdims=True)
        o_ref[0, i] = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _fused_bwd_kernel(qkv_ref, o_ref, do_ref, dqkv_ref, *, scale: float):
    """Recompute p in VMEM, then dv = p^T do; ds = p*(do v^T - delta) with
    delta = rowsum(do*o) (o saved from forward); dq = (ds*scale) k;
    dk = (ds*scale)^T q. Same packed-qkv layout and per-batch-item grid as
    forward."""
    for i in range(qkv_ref.shape[2]):
        q = qkv_ref[0, 0, i]
        k = qkv_ref[1, 0, i]
        v = qkv_ref[2, 0, i]
        do = do_ref[0, i]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m = s.max(axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / p.sum(axis=-1, keepdims=True)
        pc = p.astype(v.dtype)
        dv = jax.lax.dot_general(
            pc, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, D)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, L) f32
        o = o_ref[0, i]
        delta = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[0, 0, i] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[1, 0, i] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[2, 0, i] = dv.astype(dqkv_ref.dtype)


def _qkv_spec(h: int, l: int, d: int):
    return pl.BlockSpec((3, 1, h, l, d), lambda b: (0, b, 0, 0, 0), memory_space=pltpu.VMEM)


def _o_spec(h: int, l: int, d: int):
    return pl.BlockSpec((1, h, l, d), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fused_attention_qkv(qkv: jax.Array, interpret: bool | None = None) -> jax.Array:
    """Short-sequence fused attention on a packed head-major qkv tensor.

    qkv: (3, B, H, L, D) -> out (B, H, L, D). Training-grade: Pallas forward
    AND backward; the (L, L) probabilities never touch HBM (XLA's attention
    materializes them in f32 — measured 23 ms of the 62.75 ms MAE step).
    The packed input lets the caller produce q/k/v with ONE einsum and no
    per-tensor squeeze copies. Use for L <= FUSED_MAX_LEN; beyond that use
    flash_attention (streaming)."""
    out, _ = _fused_fwd_qkv(qkv, interpret)
    return out


def _fused_fwd_qkv(qkv, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _, b, h, l, d = qkv.shape
    assert l <= FUSED_MAX_LEN, (l, "use flash_attention for long sequences")
    scale = 1.0 / (d**0.5)
    out = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, l, d), qkv.dtype),
        grid=(b,),
        in_specs=[_qkv_spec(h, l, d)],
        out_specs=_o_spec(h, l, d),
        interpret=interpret,
    )(qkv)
    return out, (qkv, out)


def _fused_bwd_qkv(interpret, residuals, dout):
    qkv, out = residuals
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _, b, h, l, d = qkv.shape
    scale = 1.0 / (d**0.5)
    dqkv = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        grid=(b,),
        in_specs=[_qkv_spec(h, l, d), _o_spec(h, l, d), _o_spec(h, l, d)],
        out_specs=_qkv_spec(h, l, d),
        interpret=interpret,
    )(qkv, out, dout)
    return (dqkv,)


fused_attention_qkv.defvjp(_fused_fwd_qkv, _fused_bwd_qkv)


def _fused_fwd_dense_kernel(qkv_ref, o_ref, *, scale: float, num_heads: int):
    """Dense-layout fused attention: qkv_ref (1, L, 3*D) exactly as
    ``nn.Dense(3*dim)`` produces it (last axis ordered [p, h, d] — q block
    first, then k, then v, heads contiguous within each). Head slicing moves
    INSIDE the kernel as static lane slices, so the surrounding program is
    two plain (B·L, D)-major matmuls — the layouts XLA schedules best. The
    einsum-form wrapper (`_QKVEinsum`) measured ~7 ms/step of worse dot
    layouts on the MAE decoder; this variant trades that for in-kernel lane
    relayouts (D_h=32 slices off 128-lane tiles)."""
    dim = qkv_ref.shape[2] // 3
    dh = dim // num_heads
    for i in range(num_heads):
        q = qkv_ref[0, :, i * dh : (i + 1) * dh]  # (L, Dh)
        k = qkv_ref[0, :, dim + i * dh : dim + (i + 1) * dh]
        v = qkv_ref[0, :, 2 * dim + i * dh : 2 * dim + (i + 1) * dh]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m = s.max(axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / p.sum(axis=-1, keepdims=True)
        o_ref[0, :, i * dh : (i + 1) * dh] = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _fused_bwd_dense_kernel(qkv_ref, o_ref, do_ref, dqkv_ref, *, scale: float, num_heads: int):
    """Backward for the dense layout — same math as _fused_bwd_kernel with
    per-head lane slices on (1, L, 3*D) / (1, L, D) refs."""
    dim = qkv_ref.shape[2] // 3
    dh = dim // num_heads
    for i in range(num_heads):
        q = qkv_ref[0, :, i * dh : (i + 1) * dh]
        k = qkv_ref[0, :, dim + i * dh : dim + (i + 1) * dh]
        v = qkv_ref[0, :, 2 * dim + i * dh : 2 * dim + (i + 1) * dh]
        do = do_ref[0, :, i * dh : (i + 1) * dh]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m = s.max(axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / p.sum(axis=-1, keepdims=True)
        pc = p.astype(v.dtype)
        dv = jax.lax.dot_general(
            pc, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = o_ref[0, :, i * dh : (i + 1) * dh]
        delta = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dqkv_ref[0, :, i * dh : (i + 1) * dh] = jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, dim + i * dh : dim + (i + 1) * dh] = jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * dim + i * dh : 2 * dim + (i + 1) * dh] = dv.astype(dqkv_ref.dtype)


def _fused_fwd_dense_kernel_paired(qkv_ref, o_ref, *, scale: float, num_heads: int):
    """TODO-#2 experiment (VERDICT r3 #7) — measured r4, REJECTED: two heads
    per iteration, batched over a leading pair axis so each MXU pass carries
    a (2, L, D_h) operand. The (L, 2*dh) lane slice is contiguous in the
    dense layout, but Mosaic rejects the lane-splitting relayout outright
    (`unsupported shape cast vector<1x197x64> -> vector<197x2x32>`), and the
    pass-count analysis shows packing can't win anyway: MXU cost is one pass
    per 128x128 OUTPUT tile, so the (L, L) score and (L, dh) AV outputs cost
    the same number of passes whether the contraction is dh=32 or a packed
    64. D_h=32 lane padding is intrinsic to the published 16-head decoder
    geometry. Kept behind S2TPU_FUSED_PAIRED=1 as the documented negative
    result (runs under interpret=True for parity; reproduces the Mosaic
    error on real TPU). Full numbers in PERF_NOTES.md r4."""
    dim = qkv_ref.shape[2] // 3
    dh = dim // num_heads
    l = qkv_ref.shape[1]
    for i in range(num_heads // 2):
        lo = 2 * i * dh
        # (L, 2*dh) -> (2, L, dh): pair axis leads, heads stay lane-contiguous
        q = qkv_ref[0, :, lo : lo + 2 * dh].reshape(l, 2, dh).transpose(1, 0, 2)
        k = qkv_ref[0, :, dim + lo : dim + lo + 2 * dh].reshape(l, 2, dh).transpose(1, 0, 2)
        v = qkv_ref[0, :, 2 * dim + lo : 2 * dim + lo + 2 * dh].reshape(l, 2, dh).transpose(1, 0, 2)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (2, L, L)
        m = s.max(axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / p.sum(axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (2, L, dh)
        o_ref[0, :, lo : lo + 2 * dh] = (
            o.transpose(1, 0, 2).reshape(l, 2 * dh).astype(o_ref.dtype)
        )


def _dense_spec(l: int, c: int):
    return pl.BlockSpec((1, l, c), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_attention_dense(
    qkv: jax.Array, num_heads: int, interpret: bool | None = None
) -> jax.Array:
    """Fused attention on the raw ``nn.Dense(3*dim)`` output.

    qkv: (B, L, 3*D) -> out (B, L, D), both in the plain token-major layout,
    so the projections before and after are ordinary Dense matmuls with
    XLA's preferred layouts — no head-major einsums or transposes anywhere
    in the program. Heads are split inside the kernel (static lane slices).
    """
    out, _ = _fused_fwd_dense(qkv, num_heads, interpret)
    return out


def _fused_fwd_dense(qkv, num_heads, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, l, c3 = qkv.shape
    assert c3 % 3 == 0 and (c3 // 3) % num_heads == 0, (c3, num_heads)
    assert l <= FUSED_MAX_LEN, (l, "use flash_attention for long sequences")
    dim = c3 // 3
    scale = 1.0 / ((dim // num_heads) ** 0.5)
    # S2TPU_FUSED_PAIRED=1: the two-heads-per-MXU-pass experiment (fwd only;
    # see _fused_fwd_dense_kernel_paired). Trace-time env read — flip it
    # between bench runs, not mid-program.
    paired = os.environ.get("S2TPU_FUSED_PAIRED") == "1" and num_heads % 2 == 0
    fwd_kernel = _fused_fwd_dense_kernel_paired if paired else _fused_fwd_dense_kernel
    out = pl.pallas_call(
        functools.partial(fwd_kernel, scale=scale, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((b, l, dim), qkv.dtype),
        grid=(b,),
        in_specs=[_dense_spec(l, c3)],
        out_specs=_dense_spec(l, dim),
        interpret=interpret,
    )(qkv)
    return out, (qkv, out)


def _fused_bwd_dense(num_heads, interpret, residuals, dout):
    qkv, out = residuals
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, l, c3 = qkv.shape
    dim = c3 // 3
    scale = 1.0 / ((dim // num_heads) ** 0.5)
    dqkv = pl.pallas_call(
        functools.partial(_fused_bwd_dense_kernel, scale=scale, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        grid=(b,),
        in_specs=[_dense_spec(l, c3), _dense_spec(l, dim), _dense_spec(l, dim)],
        out_specs=_dense_spec(l, c3),
        interpret=interpret,
    )(qkv, out, dout)
    return (dqkv,)


fused_attention_dense.defvjp(_fused_fwd_dense, _fused_bwd_dense)


def fused_attention_bhld(
    q: jax.Array, k: jax.Array, v: jax.Array, interpret: bool | None = None
) -> jax.Array:
    """(B, H, L, D) q/k/v convenience wrapper around fused_attention_qkv."""
    return fused_attention_qkv(jnp.stack([q, k, v]), interpret)


def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    head_group: int = DEFAULT_HEAD_GROUP,  # kept for API compat; unused
    interpret: bool | None = None,
) -> jax.Array:
    """(B, L, H, D) convenience wrapper around fused_attention_qkv."""
    del head_group
    out = fused_attention_bhld(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), interpret
    )
    return out.transpose(0, 2, 1, 3)

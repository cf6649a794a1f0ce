"""MAE encoder embedding extraction — the downstream use of a pretrained MAE.

The reference's only consumer of a pretrained MAE is PrithviSegmentationNet,
whose forward calls ``backbone.forward_encoder(x, mask_ratio=0.0)``
(reference src/modules/prithvi_segmentation.py:156-162). This module exports
those encoder tokens standalone: per-segment feature vectors for linear
probes, clustering, retrieval, or indexing — the standard serving product of
a self-supervised pretrain. TPU-native details:

  * the whole extract runs as ONE jit'd program per batch shape (normalize →
    patchify → encoder → pool), bf16 on the MXU;
  * pos-embeds are fixed sincos constants recomputed from the config, so any
    /patch_size crop size works with the same checkpoint (the same surgery
    the reference does for num_frames, utils.py:62-96);
  * optional int8 serving (``qstate``): every encoder Dense runs as
    int8 x int8 -> int32 via the s2tpu/infer/quantize.py interceptor —
    measured +29% on the matmul-dominated ViT forward (PERF_NOTES r3).
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
import numpy as np

from s2tpu.data.augment import augment_batch
from s2tpu.models.prithvi_mae import PrithviMAE

POOLS = ("mean", "cls", "tokens")


def make_embed_fn(
    model: PrithviMAE,
    mean: jax.Array,
    std: jax.Array,
    pool: str = "mean",
    qstate: dict | None = None,
) -> typing.Callable[[dict, jax.Array], jax.Array]:
    """jit'd ``(params, raw images) -> embeddings``.

    Input: raw-DN images, (B, H, W, C) or (B, T, H, W, C). Preprocessing is
    the MAE trainer's eval path (same normalize, same dtype). Output:
    (B, D) for pool='mean' (masked-token-free average of patch tokens) or
    'cls' (the class token), (B, 1+L, D) for 'tokens'.
    """
    assert pool in POOLS, f"pool must be one of {POOLS}"

    def embed(params: dict, images: jax.Array) -> jax.Array:
        x, _ = augment_batch(
            images, None, jax.random.key(0), mean, std, dtype=model.dtype, train=False
        )
        x = x[:, None] if x.ndim == 4 else x

        def forward() -> jax.Array:
            tokens, _, _ = model.apply(
                {"params": params}, x, 0.0, method=PrithviMAE.forward_encoder
            )
            return tokens

        if qstate is not None:
            from flax import linen as nn

            from s2tpu.infer.quantize import make_quant_interceptor

            with nn.intercept_methods(make_quant_interceptor(qstate)):
                tokens = forward()
        else:
            tokens = forward()
        if pool == "cls":
            return tokens[:, 0]
        if pool == "mean":
            return jnp.mean(tokens[:, 1:], axis=1)
        return tokens

    return jax.jit(embed)


def calibrate_encoder_int8(
    model: PrithviMAE,
    params: dict,
    mean: jax.Array,
    std: jax.Array,
    batches: typing.Iterable[np.ndarray],
) -> dict:
    """int8 qstate for the encoder-only forward: activation max-abs recorded
    under a jit'd interception pass over ``batches`` (raw-DN images), weights
    quantized per-output-channel. Only layers the encoder forward actually
    touches are calibrated — decoder params stay float and unused."""
    from s2tpu.infer.quantize import (
        collect_forward_maxabs,
        quantize_weights,
        scales_from_maxabs,
    )

    def forward_for(images: jax.Array):
        x, _ = augment_batch(
            images, None, jax.random.key(0), mean, std, dtype=model.dtype, train=False
        )
        x = x[:, None] if x.ndim == 4 else x
        return lambda: model.apply({"params": params}, x, 0.0, method=PrithviMAE.forward_encoder)

    collect = jax.jit(lambda imgs: collect_forward_maxabs(forward_for(imgs)))
    maxabs: dict[str, float] = {}
    n = 0
    for batch in batches:
        for p, v in collect(jnp.asarray(batch)).items():
            maxabs[p] = max(maxabs.get(p, 0.0), float(v))
        n += 1
    assert n > 0, "no calibration batches"
    return quantize_weights(params, scales_from_maxabs(maxabs))


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    """Center crop on the trailing (H, W, C) axes of a (…, H, W, C) array."""
    h, w = img.shape[-3], img.shape[-2]
    assert h >= size and w >= size, f"segment {h}x{w} smaller than crop {size}"
    h0, w0 = (h - size) // 2, (w - size) // 2
    return img[..., h0 : h0 + size, w0 : w0 + size, :]

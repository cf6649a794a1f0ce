"""Prithvi segmentation head: ViT tokens -> dense per-pixel logits.

Capability parity with reference src/modules/prithvi_segmentation.py: the
encoder runs with mask_ratio=0, the cls token is dropped, tokens are
reshaped to the 14x14 patch grid, a 4-stage transpose-conv neck (LN+GELU
after stages 1 and 3, 16x total upsample) produces dense features, and an
FCN head (n x [conv3x3-BN-ReLU] + dropout + 1x1) emits class logits.

Frozen-backbone mode applies ``stop_gradient`` to the encoder output and
runs the encoder in eval mode; the trainer additionally freezes the
parameters with an optax mask so the optimizer never touches them.
Channel-last everywhere; neck/head compute in `dtype` with f32 logits.
"""

from __future__ import annotations

import typing
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from s2tpu.models.prithvi_mae import PrithviConfig, PrithviMAE

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


@dataclass(frozen=True)
class PrithviSegmentationConfig:
    num_frames: int
    num_classes: int
    fcn_out_channels: int = 256
    fcn_num_convs: int = 1
    fcn_dropout: float = 0.1
    frozen_backbone: bool = True
    embed_dim: int = 768
    patch_height: int = 14
    patch_width: int = 14
    backbone: PrithviConfig | None = None

    @property
    def output_embed_dim(self) -> int:
        # All frames' tokens are folded into channels: D_out = D * T.
        return self.embed_dim * self.num_frames

    def backbone_config(self) -> PrithviConfig:
        if self.backbone is not None:
            return self.backbone
        return PrithviConfig(num_frames=self.num_frames, embed_dim=self.embed_dim)


class Neck(nn.Module):
    """Token grid -> 16x upsampled dense embedding (4 transpose convs)."""

    out_channels: int
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def up(name: str, feats: int) -> nn.ConvTranspose:
            return nn.ConvTranspose(
                feats, (2, 2), strides=(2, 2), kernel_init=conv_init, dtype=self.dtype, name=name
            )

        x = up("up0", self.out_channels)(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln0")(x)
        x = nn.gelu(x, approximate=False)
        x = up("up1", self.out_channels)(x)
        x = up("up2", self.out_channels)(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln1")(x)
        x = nn.gelu(x, approximate=False)
        x = up("up3", self.out_channels)(x)
        return x


class FCNHead(nn.Module):
    num_classes: int
    out_channels: int
    num_convs: int
    dropout: float
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        for i in range(self.num_convs):
            x = nn.Conv(
                self.out_channels, (3, 3), padding="SAME", kernel_init=conv_init, dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            # torch nn.BatchNorm2d default momentum=0.1 == flax decay 0.9
            # (reference prithvi_segmentation.py FCNHead).
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype, name=f"bn{i}"
            )(x)
            x = nn.relu(x)
        x = nn.Dropout(rate=self.dropout)(x, deterministic=not train)
        return nn.Conv(
            self.num_classes, (1, 1), kernel_init=conv_init, dtype=jnp.float32, name="classifier"
        )(x.astype(jnp.float32))


class PrithviSegmentationNet(nn.Module):
    """(B, T, H, W, C) frames -> (B, H, W, num_classes) logits."""

    config: PrithviSegmentationConfig
    dtype: typing.Any = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        self.backbone = PrithviMAE(cfg.backbone_config(), dtype=self.dtype, name="backbone")
        self.neck = Neck(cfg.output_embed_dim, dtype=self.dtype, name="neck")
        self.head = FCNHead(
            cfg.num_classes, cfg.fcn_out_channels, cfg.fcn_num_convs, cfg.fcn_dropout,
            dtype=self.dtype, name="head",
        )

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        tokens, _, _ = self.backbone.forward_encoder(x, mask_ratio=0.0)
        if cfg.frozen_backbone:
            tokens = jax.lax.stop_gradient(tokens)
        tokens = tokens[:, 1:, :]  # drop cls
        b = tokens.shape[0]
        # (B, T*gh*gw, D) -> (B, gh, gw, D*T): frames fold into channels.
        t = cfg.num_frames
        gh, gw = cfg.patch_height, cfg.patch_width
        grid = tokens.reshape(b, t, gh, gw, -1)
        grid = grid.transpose(0, 2, 3, 1, 4).reshape(b, gh, gw, -1)
        dense = self.neck(grid)
        return self.head(dense, train=train)

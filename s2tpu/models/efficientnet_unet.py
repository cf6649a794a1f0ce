"""EfficientNet-UNet (B0-B7) in Flax — NHWC, TPU-native.

Capability parity with reference src/modules/efficientnet_unet.py: the same
compound-scaled MBConv encoder (width/depth coefficients, divisor-8 filter
rounding, SE ratio 0.25, drop-connect), a U-Net decoder with transpose-conv
upsampling over four skip stages plus an input-concat stage, and
class-prior bias init of the 1x1 classifier.

TPU-first design differences (not a translation):
  * NHWC activations / HWIO kernels everywhere — the native XLA-TPU conv
    layout; the reference is NCHW.
  * Skip features are collected at explicit static reduction stages
    {1/2, 1/4, 1/8, 1/16} (first block output after each downsampling),
    replacing the reference's fragile runtime shape heuristic
    (efficientnet_unet.py:259, documented quirk #10). This reproduces the
    exact same tensors for 224-sized inputs and stays correct for any size.
  * Decoder concat widths are derived from the encoder's computed filter
    counts rather than the reference's per-version magic tables
    (efficientnet_unet.py:154-165, incl. the "38 not 35" hack = 32 + in_ch).
  * BatchNorm statistics under data parallelism are global automatically:
    the train step is one jit'd XLA program over the global batch, so batch
    reductions become cross-device collectives (sync-BN without sync-BN code).
  * Computation runs in `dtype` (bf16 by default at train time) with f32
    parameters and f32 BN statistics.
"""

from __future__ import annotations

import math
import typing
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

# (width_coefficient, depth_coefficient, resolution, dropout_rate) per version.
SCALING: dict[str, tuple[float, float, int, float]] = {
    "b0": (1.0, 1.0, 224, 0.2),
    "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3),
    "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4),
    "b5": (1.6, 2.2, 456, 0.4),
    "b6": (1.8, 2.6, 528, 0.5),
    "b7": (2.0, 3.1, 600, 0.5),
}

# Canonical EfficientNet stage definitions (kernel, repeats, in, out, expand,
# stride, se_ratio) — the compact block-string table of the original paper.
STAGES: list[tuple[int, int, int, int, int, int, float]] = [
    (3, 1, 32, 16, 1, 1, 0.25),
    (3, 2, 16, 24, 6, 2, 0.25),
    (5, 2, 24, 40, 6, 2, 0.25),
    (3, 3, 40, 80, 6, 2, 0.25),
    (5, 3, 80, 112, 6, 1, 0.25),
    (5, 4, 112, 192, 6, 2, 0.25),
    (3, 1, 192, 320, 6, 1, 0.25),
]


def round_filters(filters: int, width: float | None, divisor: int = 8, min_depth: int | None = None) -> int:
    """Width-scale a filter count, rounding to the divisor (never down >10%)."""
    if width is None:
        return filters
    filters *= width
    min_depth = min_depth or divisor
    new = max(min_depth, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float | None) -> int:
    return int(math.ceil(depth * repeats)) if depth is not None else repeats


@dataclass(frozen=True)
class BlockSpec:
    kernel_size: int
    in_filters: int
    out_filters: int
    expand_ratio: int
    stride: int
    se_ratio: float
    skip: bool = True


def build_block_specs(width: float, depth: float, divisor: int = 8, min_depth: int | None = None) -> list[BlockSpec]:
    specs: list[BlockSpec] = []
    for k, r, i, o, e, s, se in STAGES:
        i, o = round_filters(i, width, divisor, min_depth), round_filters(o, width, divisor, min_depth)
        r = round_repeats(r, depth)
        specs.append(BlockSpec(k, i, o, e, s, se))
        specs.extend(BlockSpec(k, o, o, e, 1, se) for _ in range(r - 1))
    return specs


@dataclass(frozen=True)
class EfficientNetUNetConfig:
    version: str
    in_channels: int
    num_classes: int
    bn_momentum: float = 0.99  # EMA decay (flax semantics; == torch 1-momentum)
    bn_epsilon: float = 1e-3
    depth_divisor: int = 8
    drop_connect_rate: float | None = 0.2
    min_depth: int | None = None
    class_distribution: tuple[float, ...] | None = None
    dropout_rate: float | None = None
    width_coefficient: float | None = None
    depth_coefficient: float | None = None
    concat_input: bool = True

    def __post_init__(self) -> None:
        if self.version not in SCALING:
            raise ValueError(f"No EfficientNet version {self.version!r}")
        if self.class_distribution is not None and not isinstance(self.class_distribution, tuple):
            object.__setattr__(self, "class_distribution", tuple(self.class_distribution))

    @property
    def scaling(self) -> tuple[float, float, float]:
        w, d, _, drop = SCALING[self.version]
        return (
            self.width_coefficient or w,
            self.depth_coefficient or d,
            self.dropout_rate or drop,
        )


conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
dense_init = nn.initializers.xavier_normal()


def class_prior_bias_init(class_distribution: typing.Sequence[float] | None):
    """Initialize classifier bias from the label prior (rare-class warm start).

    Binary maps get the positive-class log-odds; multiclass gets log-prior.
    Parity: reference utils.py:174-188.
    """
    if class_distribution is None:
        return nn.initializers.zeros

    def init(key, shape, dtype=jnp.float32):
        dist = jnp.asarray(class_distribution, jnp.float32) + 1e-6
        if dist.shape[0] == 2:
            return jnp.full(shape, jnp.log(dist[1] / dist[0]), dtype)
        return jnp.log(dist).astype(dtype)

    return init


class DepthwiseConv(nn.Module):
    """Depthwise conv layer routing to the Pallas kernel on TPU.

    Parameter name/shape ("kernel", (k, k, 1, C)) matches what `nn.Conv`
    with feature_group_count would create, so checkpoints and the torch
    converter are agnostic to which implementation runs.
    """

    kernel_size: int
    stride: int
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from s2tpu.ops.depthwise_conv import depthwise_conv2d

        k, c = self.kernel_size, x.shape[-1]
        kernel = self.param("kernel", conv_init, (k, k, 1, c), jnp.float32)
        return depthwise_conv2d(
            x.astype(self.dtype), kernel[:, :, 0, :].astype(self.dtype), stride=self.stride
        )


class MBConv(nn.Module):
    """Mobile inverted bottleneck: expand -> depthwise -> SE -> project."""

    spec: BlockSpec
    bn_momentum: float
    bn_epsilon: float
    drop_rate: float
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        s = self.spec
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            name=name,
        )
        identity = x
        mid = s.in_filters * s.expand_ratio
        if s.expand_ratio != 1:
            x = nn.Conv(mid, (1, 1), use_bias=False, kernel_init=conv_init, dtype=self.dtype, name="expand_conv")(x)
            x = nn.silu(bn("expand_bn")(x))
        x = DepthwiseConv(
            kernel_size=s.kernel_size, stride=s.stride, dtype=self.dtype, name="depthwise_conv"
        )(x)
        x = nn.silu(bn("depthwise_bn")(x))
        if 0 < s.se_ratio <= 1:
            squeezed = max(1, int(s.in_filters * s.se_ratio))
            se = jnp.mean(x, axis=(1, 2), keepdims=True)
            se = nn.Conv(squeezed, (1, 1), kernel_init=conv_init, dtype=self.dtype, name="se_reduce")(se)
            se = nn.silu(se)
            se = nn.Conv(mid, (1, 1), kernel_init=conv_init, dtype=self.dtype, name="se_expand")(se)
            x = x * nn.sigmoid(se)
        x = nn.Conv(
            s.out_filters, (1, 1), use_bias=False, kernel_init=conv_init, dtype=self.dtype, name="project_conv"
        )(x)
        x = bn("project_bn")(x)
        if s.skip and s.stride == 1 and s.in_filters == s.out_filters:
            if train and self.drop_rate > 0.0:
                keep = 1.0 - self.drop_rate
                mask = jax.random.bernoulli(self.make_rng("dropout"), keep, (x.shape[0], 1, 1, 1))
                x = x / keep * mask.astype(x.dtype)
            x = x + identity
        return x


class EfficientNetEncoder(nn.Module):
    """Compound-scaled MBConv encoder with an optional classification head.

    ``encode()`` returns (head_features, skip_pyramid) where the pyramid is
    [1/32 conv_head, 1/16, 1/8, 1/4, 1/2] — deepest first, matching the
    decoder's consumption order.
    """

    config: EfficientNetUNetConfig
    dtype: typing.Any = jnp.float32

    @property
    def block_specs(self) -> list[BlockSpec]:
        w, d, _ = self.config.scaling
        return build_block_specs(w, d, self.config.depth_divisor, self.config.min_depth)

    @property
    def head_filters(self) -> int:
        w, _, _ = self.config.scaling
        return round_filters(1280, w, self.config.depth_divisor, self.config.min_depth)

    @property
    def skip_filters(self) -> list[int]:
        """Channel widths of the skip pyramid (excluding conv_head), deepest (1/16) first."""
        specs = self.block_specs
        out: list[int] = []
        reduction = 2  # after stem
        for i, s in enumerate(specs):
            if s.stride == 2:
                reduction *= 2
            if (s.stride == 2 or i == 0) and reduction < 32:
                out.append(s.out_filters)
        return list(reversed(out))

    def setup(self) -> None:
        cfg = self.config
        w, d, dropout = cfg.scaling
        self._specs = self.block_specs
        self.stem_conv = nn.Conv(
            round_filters(32, w, cfg.depth_divisor, cfg.min_depth),
            (3, 3),
            strides=(2, 2),
            padding="SAME",
            use_bias=False,
            kernel_init=conv_init,
            dtype=self.dtype,
            name="stem_conv",
        )
        self.stem_bn = nn.BatchNorm(
            momentum=cfg.bn_momentum, epsilon=cfg.bn_epsilon, dtype=self.dtype, name="stem_bn"
        )
        n = len(self._specs)
        self.blocks = [
            MBConv(
                spec=s,
                bn_momentum=cfg.bn_momentum,
                bn_epsilon=cfg.bn_epsilon,
                drop_rate=(cfg.drop_connect_rate or 0.0) * i / n,
                dtype=self.dtype,
                name=f"block_{i}",
            )
            for i, s in enumerate(self._specs)
        ]
        self.head_conv = nn.Conv(
            self.head_filters, (1, 1), use_bias=False, kernel_init=conv_init, dtype=self.dtype, name="head_conv"
        )
        self.head_bn = nn.BatchNorm(
            momentum=cfg.bn_momentum, epsilon=cfg.bn_epsilon, dtype=self.dtype, name="head_bn"
        )
        self.dropout = nn.Dropout(rate=dropout)
        self.fc = nn.Dense(cfg.num_classes, kernel_init=dense_init, name="fc")

    def encode(self, x: jax.Array, train: bool = False) -> tuple[jax.Array, list[jax.Array]]:
        cfg_bn = self.stem_bn
        x = nn.silu(cfg_bn(self.stem_conv(x), use_running_average=not train))
        skips: list[jax.Array] = []
        reduction = 2
        for i, (block, spec) in enumerate(zip(self.blocks, self._specs)):
            if spec.stride == 2:
                reduction *= 2
            x = block(x, train=train)
            # First block output at each resolution < 1/32 feeds the decoder
            # (static equivalent of the reference's shape-change heuristic).
            if (i == 0 or spec.stride == 2) and reduction < 32:
                skips.insert(0, x)
        x = nn.silu(self.head_bn(self.head_conv(x), use_running_average=not train))
        return x, [x, *skips]

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """ImageNet-style classification head: (B, H, W, C) -> (B, num_classes)."""
        x, _ = self.encode(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        x = self.dropout(x, deterministic=not train)
        return self.fc(x.astype(jnp.float32))


class DoubleConv(nn.Module):
    features: int
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        for i in range(2):
            x = nn.Conv(
                self.features, (3, 3), padding="SAME", kernel_init=conv_init, dtype=self.dtype, name=f"conv{i}"
            )(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class EfficientNetUNet(nn.Module):
    """U-Net over the EfficientNet encoder: per-pixel K-class logits at input res."""

    config: EfficientNetUNetConfig
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        identity = x
        encoder = EfficientNetEncoder(cfg, dtype=self.dtype, name="encoder")
        _, features = encoder.encode(x, train=train)
        y = features[0]
        up_features = [512, 256, 128, 64]
        for i, (feats, skip) in enumerate(zip(up_features, features[1:])):
            y = nn.ConvTranspose(
                feats, (2, 2), strides=(2, 2), kernel_init=conv_init, dtype=self.dtype, name=f"up_conv{i}"
            )(y)
            y = jnp.concatenate([y, skip.astype(y.dtype)], axis=-1)
            y = DoubleConv(feats, dtype=self.dtype, name=f"double_conv{i}")(y, train=train)
        if cfg.concat_input:
            y = nn.ConvTranspose(
                32, (2, 2), strides=(2, 2), kernel_init=conv_init, dtype=self.dtype, name="input_up_conv"
            )(y)
            y = jnp.concatenate([y, identity.astype(y.dtype)], axis=-1)
            y = DoubleConv(32, dtype=self.dtype, name="input_double_conv")(y, train=train)
        # Classifier in f32: logits feed the loss, keep them full precision.
        y = nn.Conv(
            cfg.num_classes,
            (1, 1),
            kernel_init=conv_init,
            bias_init=class_prior_bias_init(cfg.class_distribution),
            dtype=jnp.float32,
            name="classifier",
        )(y.astype(jnp.float32))
        return y

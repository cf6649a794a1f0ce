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
    # Decoder BatchNorm EMA decay. The reference decoder uses torch
    # nn.BatchNorm2d defaults (momentum=0.1 == flax decay 0.9, reference
    # efficientnet_unet.py:168-176), unlike the encoder's EfficientNet 0.99.
    decoder_bn_momentum: float = 0.9
    # When set, every BN (encoder + decoder) uses this EMA decay instead —
    # 0.0 makes running stats equal the current batch's exact statistics,
    # which is what the BN-recalibration pass uses (trainer.recalibrate_bn).
    bn_momentum_override: float | None = None
    # Run the full-resolution input-concat stage in a space-to-depth packed
    # layout (112^2 x 4C instead of 224^2 x C): with <=38 channels the
    # channels-last tensors pad to 128 TPU lanes, wasting ~4x memory
    # bandwidth and MXU output columns — the stage measured ~30% of the B5
    # train step (PERF_NOTES r2 profile). Identical parameters and math
    # (same tree, same shapes); packed kernels are built from the dense ones
    # at trace time. Disable for exact op-order parity with the reference.
    packed_input_stage: bool = True
    # Run the early encoder blocks (stride-1, expand_ratio=1 — the narrow
    # 112^2 stage) on the c-major space-to-depth layout. Same
    # tree/semantics as the dense path. Variants:
    #   False     — dense layout (channels pad to 128 TPU lanes).
    #   "grouped" (or True) — feature_group_count=C packed depthwise +
    #               phase-tiled 1x1 project + PackedBN. Measured r2: XLA
    #               lowers tiny 4-in/4-out grouped convs poorly (449.6 vs
    #               513.9 img/s on B5) — kept as the documented experiment.
    #   "dense"   — depthwise as a full-width 4Cx4C structural-zero conv
    #               (_packed_dw_dense_kernel): MXU matmul structure, C x
    #               FLOP tax that is trivial at C in {24, 48}.
    packed_early_blocks: bool | str = False

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

    @property
    def enc_bn_momentum(self) -> float:
        return self.bn_momentum if self.bn_momentum_override is None else self.bn_momentum_override

    @property
    def dec_bn_momentum(self) -> float:
        return (
            self.decoder_bn_momentum
            if self.bn_momentum_override is None
            else self.bn_momentum_override
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




def _pack_cmajor(x: jax.Array) -> jax.Array:
    """(B, 2H, 2W, C) -> (B, H, W, C*4) space-to-depth, CHANNEL-major: flat
    index c*4 + (a*2+b). Groups of 4 consecutive channels hold one source
    channel's phases, so grouped convs (feature_group_count=C) express
    packed depthwise convolution with contiguous groups."""
    b, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    x = x.reshape(b, h, 2, w, 2, c).transpose(0, 1, 3, 5, 2, 4)  # b h w c a b2
    return x.reshape(b, h, w, c * 4)


def _unpack_cmajor(x: jax.Array, channels: int) -> jax.Array:
    """(B, H, W, C*4) c-major -> (B, 2H, 2W, C)."""
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, channels, 2, 2).transpose(0, 1, 4, 2, 5, 3)  # b h a w b2 c
    return x.reshape(b, 2 * h, 2 * w, channels)


def _packed_dw_kernel(w: jax.Array) -> jax.Array:
    """Depthwise kernel (k, k, 1, C) -> grouped packed kernel
    (k, k, 4, 4C) for feature_group_count=C over the c-major layout
    (stride-1 SAME; same phase-alignment rule as _packed_conv3x3_kernel)."""
    kh = w.shape[0]
    assert kh == 3, "packed depthwise supports k=3 (the e=1 stages)"
    c = w.shape[3]
    out = jnp.zeros((3, 3, 4, 4 * c), w.dtype)
    for a in range(2):
        for b in range(2):
            for alpha in range(2):
                for beta in range(2):
                    for dY in (-1, 0, 1):
                        dy = 2 * dY + alpha - a
                        if dy not in (-1, 0, 1):
                            continue
                        for dX in (-1, 0, 1):
                            dx = 2 * dX + beta - b
                            if dx not in (-1, 0, 1):
                                continue
                            p_in = alpha * 2 + beta
                            p_out = a * 2 + b
                            out = out.at[dY + 1, dX + 1, p_in, p_out::4].set(w[dy + 1, dx + 1, 0, :])
    return out


def _packed_dw_dense_kernel(w: jax.Array) -> jax.Array:
    """Depthwise kernel (3, 3, 1, C) -> DENSE packed kernel (3, 3, 4C, 4C)
    over the c-major layout (stride-1 SAME), channel-diagonal with
    structural zeros across channels.

    Same phase-alignment rule as :func:`_packed_dw_kernel`, but expressed as
    a full-width conv instead of feature_group_count=C: XLA lowers tiny
    4-in/4-out grouped convs poorly (the r2 packed-early-blocks rejection,
    PERF_NOTES), while a dense 4Cx4C conv keeps full MXU matmul structure.
    The structural-zero FLOP tax is C x the depthwise FLOPs - trivial next
    to the memory-padding savings at C in {24, 48} (24 pads to 128 lanes
    dense; 96 pads to 128 packed)."""
    kh = w.shape[0]
    assert kh == 3, "packed depthwise supports k=3 (the e=1 stages)"
    c = w.shape[3]
    eye = jnp.eye(c, dtype=w.dtype)
    out = jnp.zeros((3, 3, 4 * c, 4 * c), w.dtype)
    for a in range(2):
        for b in range(2):
            for alpha in range(2):
                for beta in range(2):
                    for dY in (-1, 0, 1):
                        dy = 2 * dY + alpha - a
                        if dy not in (-1, 0, 1):
                            continue
                        for dX in (-1, 0, 1):
                            dx = 2 * dX + beta - b
                            if dx not in (-1, 0, 1):
                                continue
                            p_in = alpha * 2 + beta
                            p_out = a * 2 + b
                            out = out.at[dY + 1, dX + 1, p_in::4, p_out::4].set(
                                eye * w[dy + 1, dx + 1, 0, :]
                            )
    return out


def _phase_tiled_1x1_kernel(w: jax.Array) -> jax.Array:
    """Dense (Cin, Cout) channel-dot kernel -> (1, 1, 4Cin, 4Cout) c-major
    phase-diagonal conv kernel (each phase gets the same weights)."""
    cin, cout = w.shape
    k = jnp.zeros((1, 1, 4 * cin, 4 * cout), w.dtype)
    for p in range(4):
        k = k.at[0, 0, p::4, p::4].set(w)
    return k


class _DenseParams(nn.Module):
    """Parameter holder matching nn.Dense(use_bias=False)'s tree."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", conv_init, (self.in_features, self.features))


class PackedBN(nn.Module):
    """BatchNorm over the c-major packed layout (B, H, W, C*4) with exact
    nn.BatchNorm semantics and an identical parameter/stats tree: statistics
    per source channel c reduce over (B, H, W, phase)."""

    features: int
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (c,))
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones, None, (c,))
        if train:
            xf = x.astype(jnp.float32)
            m_flat = xf.mean(axis=(0, 1, 2))  # (4C,)
            sq_flat = (xf * xf).mean(axis=(0, 1, 2))
            mean = m_flat.reshape(c, 4).mean(-1)
            var = sq_flat.reshape(c, 4).mean(-1) - mean * mean
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
        shift = (bias - mean * scale * jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
        return x.astype(self.dtype) * jnp.repeat(inv, 4) + jnp.repeat(shift, 4)


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
    def __call__(self, x: jax.Array, packed: bool | str = False) -> jax.Array:
        from s2tpu.ops.depthwise_conv import depthwise_conv2d

        if packed:
            # c-major space-to-depth layout. Two expressions of the same
            # math: "grouped" (feature_group_count=C, one 4-phase group per
            # source channel) and "dense" (full-width 4Cx4C kernel with
            # structural zeros - keeps MXU matmul structure; see
            # _packed_dw_dense_kernel).
            assert self.stride == 1
            c = x.shape[-1] // 4
            kernel = self.param("kernel", conv_init, (self.kernel_size, self.kernel_size, 1, c), jnp.float32)
            dense = packed == "dense"
            builder = _packed_dw_dense_kernel if dense else _packed_dw_kernel
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                builder(kernel.astype(self.dtype)),
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=1 if dense else c,
            )
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
    def __call__(self, x: jax.Array, train: bool, packed: bool | str = False) -> jax.Array:
        if packed:
            return self._packed(x, train, variant=packed if isinstance(packed, str) else "grouped")
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
        # 1x1 "convs" are channel dots (nn.Dense over the last axis): the
        # same math, but gradients lower to plain matmuls — XLA's conv
        # filter-grad path picks pathological layouts for some 1x1 shapes
        # (measured 4.9x slower fwd+bwd at 112^2 24->144; scripts/bench_1x1.py).
        if s.expand_ratio != 1:
            x = nn.Dense(mid, use_bias=False, kernel_init=conv_init, dtype=self.dtype, name="expand_conv")(x)
            x = nn.silu(bn("expand_bn")(x))
        x = DepthwiseConv(
            kernel_size=s.kernel_size, stride=s.stride, dtype=self.dtype, name="depthwise_conv"
        )(x)
        x = nn.silu(bn("depthwise_bn")(x))
        if 0 < s.se_ratio <= 1:
            squeezed = max(1, int(s.in_filters * s.se_ratio))
            se = jnp.mean(x, axis=(1, 2), keepdims=True)
            se = nn.Dense(squeezed, kernel_init=conv_init, dtype=self.dtype, name="se_reduce")(se)
            se = nn.silu(se)
            se = nn.Dense(mid, kernel_init=conv_init, dtype=self.dtype, name="se_expand")(se)
            x = x * nn.sigmoid(se)
        x = nn.Dense(
            s.out_filters, use_bias=False, kernel_init=conv_init, dtype=self.dtype, name="project_conv"
        )(x)
        x = bn("project_bn")(x)
        if s.skip and s.stride == 1 and s.in_filters == s.out_filters:
            if train and self.drop_rate > 0.0:
                keep = 1.0 - self.drop_rate
                mask = jax.random.bernoulli(self.make_rng("dropout"), keep, (x.shape[0], 1, 1, 1))
                x = x / keep * mask.astype(x.dtype)
            x = x + identity
        return x

    def _packed(self, x: jax.Array, train: bool, variant: str = "grouped") -> jax.Array:
        """Block evaluated on the c-major space-to-depth layout (e=1, s=1
        stages only: depthwise + SE + project, no expand). Identical
        parameter/stats tree to the dense branch."""
        s = self.spec
        assert s.expand_ratio == 1 and s.stride == 1, s
        c = s.in_filters
        identity = x
        x = DepthwiseConv(
            kernel_size=s.kernel_size, stride=1, dtype=self.dtype, name="depthwise_conv"
        )(x, packed=variant)
        x = nn.silu(PackedBN(
            c, momentum=self.bn_momentum, epsilon=self.bn_epsilon, dtype=self.dtype,
            name="depthwise_bn",
        )(x, train))
        if 0 < s.se_ratio <= 1:
            squeezed = max(1, int(s.in_filters * s.se_ratio))
            bsz = x.shape[0]
            pooled = x.mean(axis=(1, 2)).reshape(bsz, c, 4).mean(-1)  # (B, C)
            se = pooled[:, None, None, :]
            se = nn.Dense(squeezed, kernel_init=conv_init, dtype=self.dtype, name="se_reduce")(se)
            se = nn.silu(se)
            se = nn.Dense(c, kernel_init=conv_init, dtype=self.dtype, name="se_expand")(se)
            x = x * jnp.repeat(nn.sigmoid(se), 4, axis=-1)
        proj_k = _DenseParams(s.out_filters, c, name="project_conv")()
        x = jax.lax.conv_general_dilated(
            x,
            _phase_tiled_1x1_kernel(proj_k.astype(self.dtype)),
            (1, 1),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = PackedBN(
            s.out_filters, momentum=self.bn_momentum, epsilon=self.bn_epsilon,
            dtype=self.dtype, name="project_bn",
        )(x, train)
        if s.skip and s.in_filters == s.out_filters:
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
        # Raw kernel holder (same tree as nn.Conv): encode() applies it as a
        # dense stride-2 conv or, for space-to-depth-packed inputs, as the
        # equivalent k2 packed conv (_packed_stem_kernel).
        self.stem_conv = _ConvParams(
            round_filters(32, w, cfg.depth_divisor, cfg.min_depth),
            cfg.in_channels,
            ksize=(3, 3),
            use_bias=False,
            name="stem_conv",
        )
        self.stem_bn = nn.BatchNorm(
            momentum=cfg.enc_bn_momentum, epsilon=cfg.bn_epsilon, dtype=self.dtype, name="stem_bn"
        )
        n = len(self._specs)
        self.blocks = [
            MBConv(
                spec=s,
                bn_momentum=cfg.enc_bn_momentum,
                bn_epsilon=cfg.bn_epsilon,
                drop_rate=(cfg.drop_connect_rate or 0.0) * i / n,
                dtype=self.dtype,
                name=f"block_{i}",
            )
            for i, s in enumerate(self._specs)
        ]
        self.head_conv = nn.Dense(
            self.head_filters, use_bias=False, kernel_init=conv_init, dtype=self.dtype, name="head_conv"
        )
        self.head_bn = nn.BatchNorm(
            momentum=cfg.enc_bn_momentum, epsilon=cfg.bn_epsilon, dtype=self.dtype, name="head_bn"
        )
        self.dropout = nn.Dropout(rate=dropout)
        self.fc = nn.Dense(cfg.num_classes, kernel_init=dense_init, name="fc")

    def encode(
        self, x: jax.Array, train: bool = False, packed: bool = False
    ) -> tuple[jax.Array, list[jax.Array]]:
        kernel, _ = self.stem_conv()
        if packed:
            # x: (B, H/2, W/2, 4*in_channels) space-to-depth input
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                _packed_stem_kernel(kernel.astype(self.dtype)),
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                (2, 2),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        cfg_bn = self.stem_bn
        x = nn.silu(cfg_bn(x, use_running_average=not train))
        skips: list[jax.Array] = []
        reduction = 2
        # Early narrow blocks on the c-major packed layout (see
        # packed_early_blocks). Pack once after the stem; unpack before the
        # first block that strides or expands.
        blocks_packed: bool | str = False
        if self.config.packed_early_blocks and self._specs and (
            self._specs[0].stride == 1 and self._specs[0].expand_ratio == 1
        ):
            x = _pack_cmajor(x)
            pe = self.config.packed_early_blocks
            blocks_packed = pe if isinstance(pe, str) else "grouped"
        for i, (block, spec) in enumerate(zip(self.blocks, self._specs)):
            if blocks_packed and not (spec.stride == 1 and spec.expand_ratio == 1):
                x = _unpack_cmajor(x, self._specs[i - 1].out_filters)
                blocks_packed = False
            if spec.stride == 2:
                reduction *= 2
            x = block(x, train=train, packed=blocks_packed)
            # First block output at each resolution < 1/32 feeds the decoder
            # (static equivalent of the reference's shape-change heuristic).
            if (i == 0 or spec.stride == 2) and reduction < 32:
                skips.insert(0, _unpack_cmajor(x, spec.out_filters) if blocks_packed else x)
        if blocks_packed:
            x = _unpack_cmajor(x, self._specs[-1].out_filters)
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
    # torch nn.BatchNorm2d default momentum=0.1 == flax decay 0.9 (reference
    # _double_conv, efficientnet_unet.py:168-176).
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        for i in range(2):
            x = nn.Conv(
                self.features, (3, 3), padding="SAME", kernel_init=conv_init, dtype=self.dtype, name=f"conv{i}"
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=self.bn_momentum, dtype=self.dtype, name=f"bn{i}"
            )(x)
            x = nn.relu(x)
        return x


def _pack_s2d(x: jax.Array) -> jax.Array:
    """(B, 2H, 2W, C) -> (B, H, W, 4, C): space-to-depth with phase index
    a*2+b for output pixel (2i+a, 2j+b)."""
    b, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    return x.reshape(b, h, 2, w, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, 4, c)


def _unpack_s2d(x: jax.Array) -> jax.Array:
    """(B, H, W, 4, C) -> (B, 2H, 2W, C) — inverse of _pack_s2d."""
    b, h, w, _, c = x.shape
    return x.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def _packed_conv3x3_kernel(w: jax.Array) -> jax.Array:
    """Dense 3x3 kernel (3, 3, Cin, Cout) -> packed kernel (3, 3, 4Cin, 4Cout)
    computing the same stride-1 SAME conv in the space-to-depth layout.

    Output phase (a, b) at packed (i, j) is 224-pixel (2i+a, 2j+b); its 3x3
    window spans packed rows i-1..i+1 with phase-dependent taps:
    dy = 2*dY + alpha - a must lie in {-1, 0, 1} for a contribution from
    input phase alpha at packed row offset dY (zero otherwise). SAME padding
    in packed space reproduces SAME padding in pixel space exactly (padded
    packed rows carry both phases of out-of-image pixel rows).
    """
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for a in range(2):
        for b in range(2):
            for alpha in range(2):
                for beta in range(2):
                    for dY in (-1, 0, 1):
                        dy = 2 * dY + alpha - a
                        if dy not in (-1, 0, 1):
                            continue
                        for dX in (-1, 0, 1):
                            dx = 2 * dX + beta - b
                            if dx not in (-1, 0, 1):
                                continue
                            pi, po = alpha * 2 + beta, a * 2 + b
                            k = k.at[
                                dY + 1, dX + 1, pi * cin : (pi + 1) * cin, po * cout : (po + 1) * cout
                            ].set(w[dy + 1, dx + 1])
    return k


def _packed_stem_kernel(w: jax.Array) -> jax.Array:
    """Stride-2 SAME 3x3 stem kernel (3, 3, Cin, Cout) -> (2, 2, 4Cin, Cout)
    consuming the space-to-depth-packed input directly (output is the dense
    half-resolution stem activation).

    XLA's SAME for k3 s2 on even sizes pads (0, 1): out[i] reads pixel rows
    {2i, 2i+1, 2i+2} = packed rows i..i+1 with dy = 2*kdy + alpha; the
    packed conv is k2 s1 SAME (also (0, 1) padding) — exact.
    """
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for kdy in range(2):
        for alpha in range(2):
            dy = 2 * kdy + alpha
            if dy > 2:
                continue
            for kdx in range(2):
                for beta in range(2):
                    dx = 2 * kdx + beta
                    if dx > 2:
                        continue
                    pi = alpha * 2 + beta
                    k = k.at[kdy, kdx, pi * cin : (pi + 1) * cin, :].set(w[dy, dx])
    return k


class _ConvTransposeParams(nn.Module):
    """Parameter holder matching nn.ConvTranspose's tree (kernel + bias)."""

    features: int
    in_features: int
    ksize: tuple[int, int] = (2, 2)

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", conv_init, (*self.ksize, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's tree (kernel [+ bias])."""

    features: int
    in_features: int
    ksize: tuple[int, int] = (3, 3)
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", conv_init, (*self.ksize, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        return kernel, bias


class PackedDoubleConv(nn.Module):
    """DoubleConv evaluated in the space-to-depth layout.

    Parameter/stats tree is identical to DoubleConv (conv0/bn0/conv1/bn1 with
    dense (3, 3, Cin, C) kernels); the packed 4Cin->4C kernels are built from
    them at trace time. BatchNorm runs on the (B, H, W, 4, C) tensor, so its
    statistics reduce over (B, H, W, phase) — exactly the (B, 2H, 2W) pixel
    population of the dense layout — with (C,) params/stats as usual.
    """

    features: int
    in_features: int
    dtype: typing.Any = jnp.float32
    bn_momentum: float = 0.9  # decoder default (see DoubleConv)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        # x: (B, H, W, 4, Cin) -> (B, H, W, 4, features)
        b, h, w, _, _ = x.shape
        cin = self.in_features
        for i in range(2):
            kernel, bias = _ConvParams(self.features, cin, name=f"conv{i}")()
            packed = _packed_conv3x3_kernel(kernel.astype(self.dtype))
            y = jax.lax.conv_general_dilated(
                x.reshape(b, h, w, 4 * cin).astype(self.dtype),
                packed,
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = y.reshape(b, h, w, 4, self.features) + bias.astype(self.dtype)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=self.bn_momentum, dtype=self.dtype, name=f"bn{i}"
            )(y)
            x = nn.relu(y)
            cin = self.features
        return x


class EfficientNetUNet(nn.Module):
    """U-Net over the EfficientNet encoder: per-pixel K-class logits at input res."""

    config: EfficientNetUNetConfig
    dtype: typing.Any = jnp.float32

    def _packed_up_stage(
        self, y: jax.Array, skip: jax.Array, feats: int, up_name: str, dc_name: str, train: bool
    ) -> jax.Array:
        """up-conv + skip-concat + double-conv evaluated in the space-to-depth
        layout: y (B, h, w, Cin) at HALF the output resolution, skip at the
        full output resolution -> packed (B, h, w, 4, feats)."""
        up_k, up_b = _ConvTransposeParams(feats, y.shape[-1], name=up_name)()
        # flax ConvTranspose(k2 s2): out[2i+a, 2j+b, o] = in[i,j,:] @ kernel[1-a, 1-b]
        y4 = jnp.einsum("bhwc,xyco->bhwxyo", y, up_k[::-1, ::-1].astype(y.dtype))
        bsz, hp, wp = y4.shape[:3]
        y4 = y4.reshape(bsz, hp, wp, 4, feats) + up_b.astype(y.dtype)
        skip4 = (skip if skip.ndim == 5 else _pack_s2d(skip)).astype(y.dtype)
        y4 = jnp.concatenate([y4, skip4], axis=-1)
        return PackedDoubleConv(
            feats, feats + skip.shape[-1], dtype=self.dtype,
            bn_momentum=self.config.dec_bn_momentum, name=dc_name,
        )(y4, train=train)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (B, H, W, in_channels) raster — or, when packed_input_stage,
        optionally the pre-packed (B, H/2, W/2, 4*in_channels) space-to-depth
        layout (the trainer feeds this so the device never materializes a
        narrow-channel full-resolution tensor)."""
        cfg = self.config
        encoder = EfficientNetEncoder(cfg, dtype=self.dtype, name="encoder")
        identity = x
        identity4 = None
        if cfg.packed_input_stage:
            if x.shape[-1] == cfg.in_channels:
                identity4 = _pack_s2d(x)
            else:
                assert x.shape[-1] == 4 * cfg.in_channels, x.shape
                bsz, hp, wp = x.shape[:3]
                identity4 = x.reshape(bsz, hp, wp, 4, cfg.in_channels)
            xin = identity4.reshape(*identity4.shape[:3], 4 * cfg.in_channels)
            _, features = encoder.encode(xin, train=train, packed=True)
        else:
            assert x.shape[-1] == cfg.in_channels, x.shape
            _, features = encoder.encode(x, train=train)
        y = features[0]
        up_features = [512, 256, 128, 64]
        for i, (feats, skip) in enumerate(zip(up_features, features[1:])):
            # Packing quadruples the conv FLOPs (the phase-aligned kernel is
            # 75% structural zeros the MXU still multiplies), so it only wins
            # when lane waste is >=4x, i.e. C <= 32: measured 512->444 img/s
            # regression when applied at C=64 (stage 3). For the standard
            # widths only the 32-channel input stage qualifies.
            if cfg.packed_input_stage and feats <= 32:
                y = _unpack_s2d(
                    self._packed_up_stage(y, skip, feats, f"up_conv{i}", f"double_conv{i}", train)
                )
                continue
            y = nn.ConvTranspose(
                feats, (2, 2), strides=(2, 2), kernel_init=conv_init, dtype=self.dtype, name=f"up_conv{i}"
            )(y)
            y = jnp.concatenate([y, skip.astype(y.dtype)], axis=-1)
            y = DoubleConv(
                feats, dtype=self.dtype, bn_momentum=cfg.dec_bn_momentum, name=f"double_conv{i}"
            )(y, train=train)
        classifier = nn.Dense(
            cfg.num_classes,
            kernel_init=conv_init,
            bias_init=class_prior_bias_init(cfg.class_distribution),
            dtype=jnp.float32,
            name="classifier",
        )
        if cfg.concat_input and cfg.packed_input_stage:
            # Space-to-depth full-resolution stage: same parameters, packed
            # 112^2 x 4C layout (channels fill the 128 lanes). See
            # EfficientNetUNetConfig.packed_input_stage.
            y4 = self._packed_up_stage(
                y, identity4, 32, "input_up_conv", "input_double_conv", train
            )
            logits4 = classifier(y4.astype(jnp.float32))
            return _unpack_s2d(logits4)
        if cfg.concat_input:
            y = nn.ConvTranspose(
                32, (2, 2), strides=(2, 2), kernel_init=conv_init, dtype=self.dtype, name="input_up_conv"
            )(y)
            y = jnp.concatenate([y, identity.astype(y.dtype)], axis=-1)
            y = DoubleConv(
                32, dtype=self.dtype, bn_momentum=cfg.dec_bn_momentum, name="input_double_conv"
            )(y, train=train)
        # Classifier in f32: logits feed the loss, keep them full precision.
        return classifier(y.astype(jnp.float32))

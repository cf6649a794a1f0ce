"""Prithvi-100M ViT-MAE in Flax — TPU-native.

Capability parity with reference src/modules/prithvi.py (the published
NASA/IBM Prithvi-100M masked autoencoder): 3D sincos position embeddings
with the 6/6/4-sixteenths w/h/t split, tubelet patch embedding, per-sample
argsort-of-noise random masking with a static keep count, ViT-B encoder
(12x768), 8x512 decoder, and normalized-pixel MSE on masked patches.

TPU-first design decisions:
  * Patch embedding is a reshape + one dense matmul, not a Conv3d: stride ==
    kernel makes them mathematically identical, and a single (B*L, p*p*t*C) x
    (p*p*t*C, D) matmul maps straight onto the MXU instead of a strided
    convolution. Token order (t, h, w row-major) matches the reference's
    Conv3d+flatten, so converted checkpoints line up.
  * Input layout is (B, T, H, W, C) channel-last.
  * Masking keeps a static ``len_keep = int(L * (1 - ratio))`` so every
    shape in the program is fixed (prithvi.py:265 is already static; the
    argsort/gather shuffle is reproduced with take_along_axis).
  * Attention runs through a pluggable kernel: XLA's fused
    ``jax.nn.dot_product_attention`` by default (optimal at L~200), the
    Pallas flash-attention kernel (s2tpu.ops.flash_attention) for long
    sequences (large-tile inference).
"""

from __future__ import annotations

import typing
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# sincos position embeddings (numpy — computed once at init, never traced)
# ---------------------------------------------------------------------------
def sincos_1d(embed_dim: int, positions: np.ndarray) -> np.ndarray:
    """(M,) positions -> (M, embed_dim) interleaved [sin | cos] embedding."""
    assert embed_dim % 2 == 0
    omega = 1.0 / 10000 ** (np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0))
    angles = np.outer(positions.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(angles), np.cos(angles)], axis=1)


def sincos_3d(embed_dim: int, grid_size: tuple[int, int, int], cls_token: bool = False) -> np.ndarray:
    """3D (t, h, w) sincos embedding, dims split 6/6/4 sixteenths for w/h/t.

    Parity: reference prithvi.py:54-81 (same split, same tiling order, so
    converted pos-embeds match bit-for-bit up to float precision).
    """
    assert embed_dim % 16 == 0
    t, h, w = grid_size
    dim_w = embed_dim // 16 * 6
    dim_h = embed_dim // 16 * 6
    dim_t = embed_dim // 16 * 4
    emb_w = np.tile(sincos_1d(dim_w, np.arange(w)), (t * h, 1))
    emb_h = np.tile(np.repeat(sincos_1d(dim_h, np.arange(h)), w, axis=0), (t, 1))
    emb_t = np.repeat(sincos_1d(dim_t, np.arange(t)), h * w, axis=0)
    pos = np.concatenate([emb_w, emb_h, emb_t], axis=1)
    if cls_token:
        pos = np.concatenate([np.zeros((1, embed_dim)), pos], axis=0)
    return pos.astype(np.float32)


# ---------------------------------------------------------------------------
# configuration
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class PrithviConfig:
    img_size: int = 224
    patch_size: int = 16
    num_frames: int = 1
    tubelet_size: int = 1
    in_chans: int = 6
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_pix_loss: bool = False
    # LayerNorm epsilon. The reference-as-committed builds its Blocks with
    # torch's default (1e-5) — prithvi.py:147 passes bare nn.LayerNorm —
    # while the upstream published Prithvi code uses 1e-6. We match the
    # reference (the behavioral contract); set 1e-6 to match upstream.
    layer_norm_eps: float = 1e-5
    attention_impl: str = "xla"  # "xla" | "flash" (Pallas kernel)
    # Tensor parallelism: mesh axis name to shard attention heads / MLP
    # hidden over (requires an ambient mesh via jax.set_mesh). None = off.
    tp_axis: str | None = None
    # Batch mesh axis carried through the TP constraints — omitting it made
    # the partitioner reshard dp-sharded activations to match (SPMD
    # "involuntary full rematerialization" warnings, VERDICT r1).
    dp_axis: str | None = "data"
    # Context parallelism: mesh axis to shard the TOKEN axis over in the
    # LayerNorm/MLP regions of every block (long-sequence / large-tile
    # inference). With tp_axis set on the same axis this is Ulysses-style:
    # the partitioner inserts all-to-alls at the attention boundary (tokens
    # sharded outside, heads sharded inside); without tp_axis it degrades to
    # gather-KV attention. None = off.
    cp_axis: str | None = None

    @property
    def grid_size(self) -> tuple[int, int, int]:
        return (
            self.num_frames // self.tubelet_size,
            self.img_size // self.patch_size,
            self.img_size // self.patch_size,
        )

    @property
    def num_patches(self) -> int:
        t, h, w = self.grid_size
        return t * h * w

    @property
    def patch_dim(self) -> int:
        return self.tubelet_size * self.patch_size * self.patch_size * self.in_chans

    @staticmethod
    def from_model_args(args: dict, **overrides) -> "PrithviConfig":
        """Build from the published Prithvi_100M_config.yaml model_args dict."""
        merged = dict(args)
        merged.update(overrides)
        return PrithviConfig(
            img_size=merged["img_size"],
            patch_size=merged["patch_size"],
            num_frames=merged["num_frames"],
            tubelet_size=merged["tubelet_size"],
            in_chans=merged["in_chans"],
            embed_dim=merged["embed_dim"],
            depth=merged["depth"],
            num_heads=merged["num_heads"],
            decoder_embed_dim=merged["decoder_embed_dim"],
            decoder_depth=merged["decoder_depth"],
            decoder_num_heads=merged["decoder_num_heads"],
        )


# ---------------------------------------------------------------------------
# patchify / unpatchify (pure reshapes, no compute)
# ---------------------------------------------------------------------------
def patchify(imgs: jax.Array, patch: int, tubelet: int) -> jax.Array:
    """(B, T, H, W, C) -> (B, L, tub*p*p*C) with (t, h, w) token order.

    Per-patch feature order is (tub, p, q, c) — channel-fastest — chosen to
    match the reference's ``(tub p q c)`` einops pattern (prithvi.py:243) so
    converted decoder_pred weights are layout-compatible.
    """
    b, t, h, w, c = imgs.shape
    gt, gh, gw = t // tubelet, h // patch, w // patch
    x = imgs.reshape(b, gt, tubelet, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # b gt gh gw tub p q c
    return x.reshape(b, gt * gh * gw, tubelet * patch * patch * c)


def unpatchify(tokens: jax.Array, grid: tuple[int, int, int], patch: int, tubelet: int, channels: int) -> jax.Array:
    """(B, L, tub*p*p*C) -> (B, T, H, W, C) — inverse of patchify."""
    b = tokens.shape[0]
    gt, gh, gw = grid
    x = tokens.reshape(b, gt, gh, gw, tubelet, patch, patch, channels)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # b gt tub gh p gw q c
    return x.reshape(b, gt * tubelet, gh * patch, gw * patch, channels)


# ---------------------------------------------------------------------------
# transformer blocks
# ---------------------------------------------------------------------------
def _constrain(x: jax.Array, spec) -> jax.Array:
    """Sharding constraint that is a no-op outside jit / without a mesh."""
    from jax.sharding import PartitionSpec

    try:
        return jax.lax.with_sharding_constraint(x, PartitionSpec(*spec))
    except (ValueError, RuntimeError):
        return x  # no ambient mesh (single-device / eager use)


class _QKVEinsum(nn.Module):
    """q/k/v straight into the head-major (3, B, H, L, Dh) layout.

    Same parameters as ``nn.Dense(dim*3)`` — identical param paths
    (``<name>/kernel``, ``<name>/bias``), shapes, and init — so converted
    checkpoints are interchangeable between the xla and fused paths. The
    einsum writes the head-major layout directly instead of reshaping +
    transposing the (B, L, 3D) Dense output (XLA folds the output
    permutation into the matmul's layout)."""

    dim: int
    num_heads: int
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        head_dim = self.dim // self.num_heads
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.dim * 3)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.dim * 3,))
        k5 = kernel.reshape(x.shape[-1], 3, self.num_heads, head_dim).astype(self.dtype)
        out = jnp.einsum("bli,iphd->pbhld", x, k5)
        return out + bias.reshape(3, 1, self.num_heads, 1, head_dim).astype(self.dtype)  # (3,B,H,L,Dh)


class _ProjEinsum(nn.Module):
    """Output projection consuming (B, H, L, Dh) without a transpose: the
    (H, Dh) pair contracts jointly against the reshaped Dense kernel. Param
    paths/shapes/init identical to ``nn.Dense(dim)``."""

    dim: int
    num_heads: int
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x_bhld: jax.Array) -> jax.Array:
        head_dim = self.dim // self.num_heads
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (self.dim, self.dim))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.dim,))
        k3 = kernel.reshape(self.num_heads, head_dim, self.dim).astype(self.dtype)
        return jnp.einsum("bhld,hdo->blo", x_bhld, k3) + bias.astype(self.dtype)


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: typing.Any = jnp.float32
    impl: str = "xla"
    tp_axis: str | None = None
    dp_axis: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, l, _ = x.shape
        head_dim = self.dim // self.num_heads
        from s2tpu.ops.flash_attention import FUSED_MAX_LEN, FUSED_MIN_LEN, fused_fits_vmem

        if (
            self.impl == "fused"
            and FUSED_MIN_LEN <= l <= FUSED_MAX_LEN
            # The whole-score-matrix kernels must fit Mosaic's scoped-vmem
            # budget; at multi-temporal decoder lengths (T=4: L=785) the
            # backward kernel's footprint is ~24 MB vs the 16 MB limit, so
            # those route to the streaming flash path below.
            and fused_fits_vmem(l, self.dim, self.num_heads)
        ):
            # Training-grade fused attention: Pallas fwd+bwd keep the (L, L)
            # probabilities in VMEM (XLA materializes them in f32 HBM —
            # measured 23 ms of the 62.75 ms MAE step; scripts/profile_mae.py).
            if not self.tp_axis:
                # Dense-native layout: the qkv/proj projections are ordinary
                # (B·L, D)-major Dense matmuls and the head split happens
                # inside the kernel as static lane slices — the head-major
                # einsum forms measured ~7 ms/step of worse dot layouts
                # (PERF_NOTES r3).
                from s2tpu.ops.flash_attention import fused_attention_dense

                qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype, name="qkv")(x)
                out = fused_attention_dense(qkv, self.num_heads)  # (B, L, D)
                return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

            # Tensor parallelism needs heads as a real tensor axis to shard,
            # so the packed head-major einsum form stays for tp_axis runs.
            from s2tpu.ops.flash_attention import fused_attention_qkv

            qkv = _QKVEinsum(self.dim, self.num_heads, dtype=self.dtype, name="qkv")(x)
            qkv = _constrain(qkv, (None, self.dp_axis, self.tp_axis, None, None))
            out = fused_attention_qkv(qkv)  # (B, H, L, Dh)
            out = _constrain(out, (self.dp_axis, self.tp_axis, None, None))
            return _ProjEinsum(self.dim, self.num_heads, dtype=self.dtype, name="proj")(out)

        qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, l, 3, self.num_heads, head_dim), 3, axis=2)
        q, k, v = (t.squeeze(2) for t in (q, k, v))  # (B, L, H, Dh)
        if self.tp_axis:
            # tensor parallelism: heads sharded over the model axis, batch
            # kept on the data axis (constraints must agree with the
            # upstream dp sharding or the partitioner rematerializes)
            q, k, v = (_constrain(t, (self.dp_axis, None, self.tp_axis, None)) for t in (q, k, v))
        if (self.impl == "fused" or self.impl == "flash") and l >= 512:
            from s2tpu.ops.flash_attention import flash_attention

            out = flash_attention(q, k, v)
        else:
            out = jax.nn.dot_product_attention(q, k, v)
        if self.tp_axis:
            out = _constrain(out, (self.dp_axis, None, self.tp_axis, None))
        out = out.reshape(b, l, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    """Pre-norm ViT block (timm `Block` semantics: LN-MHA-res, LN-MLP-res)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    dtype: typing.Any = jnp.float32
    attention_impl: str = "xla"
    tp_axis: str | None = None
    dp_axis: str | None = None
    cp_axis: str | None = None
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.cp_axis:
            # sequence parallelism: tokens sharded through LN/MLP; attention
            # resharding (all-to-all / gather) is inserted by the partitioner
            x = _constrain(x, (self.dp_axis, self.cp_axis, None))
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(
            self.dim, self.num_heads, dtype=self.dtype, impl=self.attention_impl,
            tp_axis=self.tp_axis, dp_axis=self.dp_axis, name="attn",
        )(y)
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        if self.tp_axis:
            # tensor parallelism: MLP hidden dim sharded over the model axis
            y = _constrain(y, (self.dp_axis, None, self.tp_axis))
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        out = x + y
        if self.cp_axis:
            out = _constrain(out, (self.dp_axis, self.cp_axis, None))
        return out


# ---------------------------------------------------------------------------
# masking
# ---------------------------------------------------------------------------
def random_masking(
    x: jax.Array, mask_ratio: float, rng: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-sample shuffle-keep masking with static keep count.

    Returns (x_kept (B, L_keep, D), mask (B, L) 1=removed, ids_restore (B, L)).
    """
    b, l, d = x.shape
    len_keep = int(l * (1 - mask_ratio))
    noise = jax.random.uniform(rng, (b, l))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_kept = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
    mask = jnp.ones((b, l), x.dtype).at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_kept, mask, ids_restore


# ---------------------------------------------------------------------------
# the model
# ---------------------------------------------------------------------------
class PrithviMAE(nn.Module):
    """Masked autoencoder with a ViT backbone over (B, T, H, W, C) frames."""

    config: PrithviConfig
    dtype: typing.Any = jnp.float32

    def setup(self) -> None:
        cfg = self.config
        self.patch_proj = nn.Dense(
            cfg.embed_dim,
            use_bias=True,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            name="patch_proj",
        )
        self.cls_token = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, cfg.embed_dim))
        # Fixed (non-learned) sincos position embeddings, stored as constants.
        self.pos_embed = jnp.asarray(sincos_3d(cfg.embed_dim, cfg.grid_size, cls_token=True))
        self.decoder_pos_embed = jnp.asarray(
            sincos_3d(cfg.decoder_embed_dim, cfg.grid_size, cls_token=True)
        )
        self.encoder_blocks = [
            Block(
                cfg.embed_dim,
                cfg.num_heads,
                cfg.mlp_ratio,
                dtype=self.dtype,
                attention_impl=cfg.attention_impl,
                tp_axis=cfg.tp_axis,
                dp_axis=cfg.dp_axis if (cfg.tp_axis or cfg.cp_axis) else None,
                cp_axis=cfg.cp_axis,
                ln_eps=cfg.layer_norm_eps,
                name=f"block_{i}",
            )
            for i in range(cfg.depth)
        ]
        self.encoder_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="encoder_norm")

        self.decoder_embed = nn.Dense(cfg.decoder_embed_dim, dtype=self.dtype, name="decoder_embed")
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, cfg.decoder_embed_dim)
        )
        self.decoder_blocks = [
            Block(
                cfg.decoder_embed_dim,
                cfg.decoder_num_heads,
                cfg.mlp_ratio,
                dtype=self.dtype,
                attention_impl=cfg.attention_impl,
                tp_axis=cfg.tp_axis,
                dp_axis=cfg.dp_axis if (cfg.tp_axis or cfg.cp_axis) else None,
                cp_axis=cfg.cp_axis,
                ln_eps=cfg.layer_norm_eps,
                name=f"decoder_block_{i}",
            )
            for i in range(cfg.decoder_depth)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="decoder_norm")
        self.decoder_pred = nn.Dense(cfg.patch_dim, dtype=self.dtype, name="decoder_pred")

    def encoder_pre(
        self, imgs: jax.Array, mask_ratio: float = 0.0, mask_rng: jax.Array | None = None
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Everything forward_encoder does before the blocks: patch embed +
        pos + masking + cls. Split out so pipeline parallelism
        (s2tpu.parallel.pipeline) can run the block stack externally."""
        cfg = self.config
        x = patchify(imgs.astype(self.dtype), cfg.patch_size, cfg.tubelet_size)
        x = self.patch_proj(x)
        x = x + self.pos_embed[None, 1:, :].astype(x.dtype)
        if mask_ratio > 0.0:
            assert mask_rng is not None, "mask_ratio > 0 requires a masking rng"
            x, mask, ids_restore = random_masking(x, mask_ratio, mask_rng)
        else:
            b, l, _ = x.shape
            mask = jnp.zeros((b, l), x.dtype)
            ids_restore = jnp.broadcast_to(jnp.arange(l), (b, l))
        cls = (self.cls_token + self.pos_embed[None, :1, :]).astype(x.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (x.shape[0], 1, x.shape[-1])), x], axis=1)
        return x, mask, ids_restore

    def encoder_post(self, x: jax.Array) -> jax.Array:
        """Final encoder LayerNorm (pipeline-parallel counterpart hook)."""
        return self.encoder_norm(x)

    def forward_encoder(
        self, imgs: jax.Array, mask_ratio: float = 0.0, mask_rng: jax.Array | None = None
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """(B, T, H, W, C) -> (tokens (B, 1+L_keep, D), mask, ids_restore)."""
        x, mask, ids_restore = self.encoder_pre(imgs, mask_ratio, mask_rng)
        for block in self.encoder_blocks:
            x = block(x)
        return self.encoder_norm(x), mask, ids_restore

    def decoder_pre(self, tokens: jax.Array, ids_restore: jax.Array) -> jax.Array:
        """Everything forward_decoder does before the blocks: embed + mask-token
        unshuffle + pos. Split out so pipeline parallelism
        (s2tpu.parallel.pipeline) can run the decoder block stack externally."""
        x = self.decoder_embed(tokens)
        b, _, d = x.shape
        l = ids_restore.shape[1]
        n_masked = l + 1 - x.shape[1]
        mask_tokens = jnp.broadcast_to(self.mask_token.astype(x.dtype), (b, n_masked, d))
        full = jnp.concatenate([x[:, 1:, :], mask_tokens], axis=1)
        full = jnp.take_along_axis(full, ids_restore[:, :, None], axis=1)
        x = jnp.concatenate([x[:, :1, :], full], axis=1)
        return x + self.decoder_pos_embed[None].astype(x.dtype)

    def decoder_post(self, x: jax.Array) -> jax.Array:
        """Final decoder LayerNorm + pixel projection, cls dropped
        (pipeline-parallel counterpart hook)."""
        x = self.decoder_norm(x)
        x = self.decoder_pred(x)
        return x[:, 1:, :]

    def forward_decoder(self, tokens: jax.Array, ids_restore: jax.Array) -> jax.Array:
        """Unshuffle with mask tokens, decode, project to patch pixels (no cls)."""
        x = self.decoder_pre(tokens, ids_restore)
        for block in self.decoder_blocks:
            x = block(x)
        return self.decoder_post(x)

    def __call__(
        self, imgs: jax.Array, mask_ratio: float = 0.75, mask_rng: jax.Array | None = None
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Full MAE pass -> (loss, pred (B, L, patch_dim), mask (B, L))."""
        from s2tpu.train.losses import mae_reconstruction_loss

        cfg = self.config
        latent, mask, ids_restore = self.forward_encoder(imgs, mask_ratio, mask_rng)
        pred = self.forward_decoder(latent, ids_restore)
        target = patchify(imgs, cfg.patch_size, cfg.tubelet_size)
        loss = mae_reconstruction_loss(pred, target, mask, norm_pix=cfg.norm_pix_loss)
        return loss, pred, mask

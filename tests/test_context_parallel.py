"""Context-parallel (token-sharded) large-tile ViT inference on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from s2tpu.models.prithvi_mae import PrithviConfig
from s2tpu.models.prithvi_seg import PrithviSegmentationConfig, PrithviSegmentationNet
from s2tpu.parallel import mesh as mesh_lib
import pytest


def _seg_for_tile(tile: int, cp: bool) -> PrithviSegmentationNet:
    backbone = PrithviConfig(
        img_size=tile, patch_size=16, num_frames=1, in_chans=6,
        embed_dim=64, depth=2, num_heads=4, decoder_embed_dim=48,
        decoder_depth=1, decoder_num_heads=4,
        tp_axis=mesh_lib.MODEL_AXIS if cp else None,
        cp_axis=mesh_lib.MODEL_AXIS if cp else None,
    )
    cfg = PrithviSegmentationConfig(
        num_frames=1, num_classes=4, frozen_backbone=False,
        embed_dim=64, patch_height=tile // 16, patch_width=tile // 16,
        backbone=backbone,
    )
    return PrithviSegmentationNet(cfg)


@pytest.mark.slow
def test_cp_large_tile_matches_unsharded(rng):
    """512-tile (1024-token) segmentation: token-axis sharding over 'model'
    must reproduce the unsharded forward (VERDICT r1 #7: context-parallel
    large-tile inference)."""
    tile = 512
    imgs = jnp.asarray(rng.normal(size=(2, 1, tile, tile, 6)).astype(np.float32))

    plain = _seg_for_tile(tile, cp=False)
    variables = jax.jit(lambda: plain.init(jax.random.key(0), imgs[:1], train=False))()
    with jax.default_matmul_precision("highest"):
        ref = jax.jit(lambda v, x: plain.apply(v, x, train=False))(variables, imgs)

        mesh = mesh_lib.make_mesh(8, model_parallel=4)
        with jax.set_mesh(mesh):
            cp_model = _seg_for_tile(tile, cp=True)
            sharded_vars = mesh_lib.replicate_pytree(variables, mesh)
            x = jax.device_put(imgs, mesh_lib.data_sharding(mesh))
            out = jax.jit(lambda v, x: cp_model.apply(v, x, train=False))(sharded_vars, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-4)
        # class maps identical
        np.testing.assert_array_equal(
            np.asarray(out).argmax(-1), np.asarray(ref).argmax(-1)
        )


def test_cp_pos_embed_regenerates_for_tile():
    """Large-tile backbone gets a correctly-sized sincos table (no interp)."""
    cfg = PrithviConfig(img_size=512, patch_size=16, num_frames=1, embed_dim=64,
                        depth=1, num_heads=4, decoder_embed_dim=48, decoder_depth=1,
                        decoder_num_heads=4, in_chans=6)
    assert cfg.grid_size == (1, 32, 32)
    assert cfg.num_patches == 1024

"""End-to-end inference CLI: train -> checkpoint -> restore -> tiled rasters."""

import numpy as np
import pytest

from s2tpu.checkpoint.orbax_io import CheckpointManager
from s2tpu.configs import segmentation as cfg_lib
from s2tpu.configs.segmentation import config_to_dict
from s2tpu.data.pipeline import Datamodule
from s2tpu.parallel import mesh as mesh_lib
from s2tpu.train.trainer import SegmentationTrainer


@pytest.mark.slow
def test_infer_cli_roundtrip(fixture_dir, tmp_path):
    c = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    c.datamodule.dataset_cfg.data_dir = str(fixture_dir)
    c.datamodule.batch_size = 2
    c.datamodule.data_split = (0.5, 0.5, 0.0)
    c.datamodule.random_crop_size = 64
    c.train.compute_dtype = "float32"
    c.train.run_name = "inferrun"

    dm = Datamodule(c.datamodule)
    ckpt_dir = tmp_path / "ckpt"
    mgr = CheckpointManager(ckpt_dir, keep=1, config_dict=config_to_dict(c))
    trainer = SegmentationTrainer(c, dm, mesh=mesh_lib.make_mesh(1), checkpoint_manager=mgr)
    trainer.fit(epochs=1)
    mgr.close()

    from s2tpu.cli.infer import main

    out_dir = tmp_path / "preds"
    main([str(ckpt_dir), "--tiled", "--out", str(out_dir), "--data-dir", str(fixture_dir)])
    preds = sorted(out_dir.glob("pred_*.tif"))
    assert len(preds) == 3  # val split of 6 segments

    from s2tpu.geo.tiff import read_geotiff

    data, geo = read_geotiff(preds[0])
    assert data.shape == (1, 96, 96)
    assert data.max() <= 3
    assert geo is not None  # georeferencing carried through

    # batch-logits mode too
    out2 = tmp_path / "logits"
    main([str(ckpt_dir), "--out", str(out2), "--data-dir", str(fixture_dir)])
    batches = sorted(out2.glob("batch_*.npy"))
    assert len(batches) >= 1
    logits = np.load(batches[0])
    assert logits.shape[-1] == 4


@pytest.mark.slow
def test_infer_cli_multitemporal_roundtrip(tmp_path):
    """A T=2 stack-time model (BASELINE config #3 shape) serves through the
    tiled CLI: TiffSource.read_with_geo stacks both frames, the tiled program
    crops them together, predict_step folds T into channels."""
    from s2tpu.data.dataset import make_synthetic_fixture

    make_synthetic_fixture(
        tmp_path / "data", aoi="small", label_map="osm-multiclass",
        n_segments=6, n_time=2, size=(96, 96),
    )
    c = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    c.datamodule.dataset_cfg.data_dir = str(tmp_path / "data")
    c.datamodule.dataset_cfg.n_time_frames = 2
    c.datamodule.dataset_cfg.squeeze_time_dim = False
    c.datamodule.dataset_cfg.stack_time_into_channels = True
    c.datamodule.batch_size = 2
    c.datamodule.data_split = (0.5, 0.5, 0.0)
    c.datamodule.random_crop_size = 64
    c.train.compute_dtype = "float32"
    c.train.run_name = "inferrun_t2"

    dm = Datamodule(c.datamodule)
    ckpt_dir = tmp_path / "ckpt"
    mgr = CheckpointManager(ckpt_dir, keep=1, config_dict=config_to_dict(c))
    trainer = SegmentationTrainer(c, dm, mesh=mesh_lib.make_mesh(1), checkpoint_manager=mgr)
    trainer.fit(epochs=1)
    mgr.close()

    from s2tpu.cli.infer import main

    out_dir = tmp_path / "preds"
    main([str(ckpt_dir), "--tiled", "--out", str(out_dir), "--data-dir", str(tmp_path / "data")])
    preds = sorted(out_dir.glob("pred_*.tif"))
    assert len(preds) == 3  # val split of 6 segments

    from s2tpu.geo.tiff import read_geotiff

    data, geo = read_geotiff(preds[0])
    assert data.shape == (1, 96, 96)
    assert data.max() <= 3
    assert geo is not None


def test_flash_attention_impl_in_vit(rng):
    """Attention(impl='flash') == XLA attention inside the ViT block (L>=512)."""
    import jax
    import jax.numpy as jnp

    from s2tpu.models.prithvi_mae import Attention

    x = jnp.asarray(rng.normal(size=(1, 512, 64)).astype(np.float32))
    attn_x = Attention(64, 4, impl="xla")
    variables = attn_x.init(jax.random.key(0), x)
    out_xla = attn_x.apply(variables, x)
    attn_f = Attention(64, 4, impl="flash")
    out_flash = attn_f.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla), rtol=2e-3, atol=2e-4)

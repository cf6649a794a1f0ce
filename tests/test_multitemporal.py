"""Multi-temporal (T>1) pipeline tests: grouped frames -> (B,T,H,W,C) batches."""

import numpy as np
import pytest

from s2tpu.configs.segmentation import DatamoduleConfig, DatasetConfig
from s2tpu.data.dataset import TiffSource, make_synthetic_fixture
from s2tpu.data.pipeline import Datamodule


def test_multitemporal_source(tmp_path):
    make_synthetic_fixture(tmp_path, aoi="vie", label_map="osm-multiclass", n_segments=3, n_time=4, size=(48, 48))
    src = TiffSource("vie", "osm-multiclass", data_dir=tmp_path, n_time_frames=3)
    assert len(src) == 3  # 3 segments, each with >= 3 frames
    s = src[0]
    assert s.x.shape == (3, 48, 48, 6)
    assert s.y.shape == (48, 48)
    assert src.label_index_for(0) == 0


def test_multitemporal_batches(tmp_path):
    make_synthetic_fixture(tmp_path, aoi="vie", label_map="osm-multiclass", n_segments=4, n_time=2, size=(48, 48))
    cfg = DatamoduleConfig(
        dataset_cfg=DatasetConfig(
            aoi="vie", label_map="osm-multiclass", data_dir=str(tmp_path), n_time_frames=2
        ),
        batch_size=2,
        data_split=(1.0, 0.0, 0.0),
        random_crop_size=32,
    )
    dm = Datamodule(cfg)
    batch = next(iter(dm.train_batches(epoch=0)))
    assert batch.images.shape == (2, 2, 32, 32, 6)
    assert batch.labels.shape == (2, 32, 32)


def test_multitemporal_flips_consistent():
    import jax
    import jax.numpy as jnp

    from s2tpu.data.augment import random_flips

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 3, 8, 8, 2)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, size=(4, 8, 8)).astype(np.int32))
    fx, fy = random_flips(x, y, jax.random.key(1), p_horizontal=1.0, p_vertical=0.0)
    # horizontal flip reverses W on all frames and labels
    np.testing.assert_array_equal(np.asarray(fx), np.asarray(x)[..., :, ::-1, :])
    np.testing.assert_array_equal(np.asarray(fy), np.asarray(y)[..., :, ::-1])


def test_single_frame_flips_unchanged_semantics():
    import jax
    import jax.numpy as jnp

    from s2tpu.data.augment import random_flips

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 8, 8, 2)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, size=(3, 8, 8)).astype(np.int32))
    fx, fy = random_flips(x, y, jax.random.key(1), p_horizontal=0.0, p_vertical=1.0)
    np.testing.assert_array_equal(np.asarray(fx), np.asarray(x)[:, ::-1])
    np.testing.assert_array_equal(np.asarray(fy), np.asarray(y)[:, ::-1])


# ------------------------------------------- r4: UNet frame-stacking (T->C)
@pytest.mark.slow
def test_stack_time_into_channels_trains_unet(tmp_path):
    """BASELINE config #3's B5 path: quarterly composites feed a single-frame
    UNet by folding T into channels ((B,T,H,W,C) -> (B,H,W,T*C), frame-major).
    End-to-end: fixture -> 5D batches -> stacked model input -> finite loss."""
    import jax.numpy as jnp

    from s2tpu.configs import segmentation as cfg_lib
    from s2tpu.parallel import mesh as mesh_lib
    from s2tpu.train.trainer import SegmentationTrainer

    make_synthetic_fixture(
        tmp_path, aoi="small", label_map="osm-multiclass", n_segments=4,
        n_time=2, size=(48, 48),
    )
    cfg = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    cfg.datamodule.dataset_cfg.data_dir = str(tmp_path)
    cfg.datamodule.dataset_cfg.n_time_frames = 2
    cfg.datamodule.dataset_cfg.stack_time_into_channels = True
    cfg.__post_init__()  # re-validate after mutation (the CLI does the same)
    cfg.datamodule.batch_size = 2
    cfg.datamodule.random_crop_size = 32
    cfg.datamodule.data_split = (1.0, 0.0, 0.0)
    cfg.train.compute_dtype = "float32"
    model = cfg.build_model(dtype=jnp.float32)
    assert model.config.in_channels == 12  # 2 frames x 6 bands

    trainer = SegmentationTrainer(cfg, Datamodule(cfg.datamodule), mesh=mesh_lib.make_mesh(1))
    metrics = trainer.run_train_epoch(0)
    assert np.isfinite(metrics["loss"])


def test_stack_time_fold_order():
    """The fold is frame-major: output channel t*C+c == frame t, band c."""
    import jax.numpy as jnp

    from s2tpu.configs import segmentation as cfg_lib
    from s2tpu.train.trainer import SegmentationTrainer

    cfg = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    cfg.datamodule.dataset_cfg.n_time_frames = 3
    cfg.datamodule.dataset_cfg.stack_time_into_channels = True
    cfg.__post_init__()
    x = np.arange(1 * 3 * 4 * 4 * 6, dtype=np.float32).reshape(1, 3, 4, 4, 6)
    folded = SegmentationTrainer._model_input(
        type("T", (), {"config": cfg})(), jnp.asarray(x)
    )
    assert folded.shape == (1, 4, 4, 18)
    for t in range(3):
        np.testing.assert_array_equal(np.asarray(folded)[0, :, :, t * 6 : (t + 1) * 6], x[0, t])


def test_unet_multitemporal_without_stacking_rejected():
    from s2tpu.configs import segmentation as cfg_lib

    cfg = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    cfg.datamodule.dataset_cfg.n_time_frames = 4
    with pytest.raises(AssertionError, match="stack_time_into_channels"):
        cfg.__post_init__()


def test_stack_time_cli_flags():
    from s2tpu.cli.train_segmentation import build_parser, config_from_args

    args = build_parser().parse_args([
        "small", "osm-multiclass", "efficientnet-unet-b5",
        "--time-frames", "4", "--stack-time", "--bands", "all12",
    ])
    config = config_from_args(args)
    ds = config.datamodule.dataset_cfg
    assert ds.n_time_frames == 4 and ds.stack_time_into_channels
    assert config.build_model().config.in_channels == 48  # 4 frames x 12 bands
